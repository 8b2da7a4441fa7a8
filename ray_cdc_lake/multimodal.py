"""multimodal operators (training-data extensions) — filled in incrementally."""

from __future__ import annotations


def registry():
    return {}, {}
