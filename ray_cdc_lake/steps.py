"""User-extension surface: a pluggable pipeline-step registry.

Reference analog (SURVEY.md §2.10): NiFi dynamic properties are the
bundle's plugin points — arbitrary dotted paths in GenerateJsonFromProps
(:29-35,126-136), folder-mapping overrides in Jhove (:38-43,227-244),
expression-language parameterization per record (ReorderFiles.kt:333-342).
Here the equivalent is a registry of named STEP FACTORIES: each step is
``config -> (pa.Table -> pa.Table)`` (or an actor class), and a pipeline
is declared as ``[(step_name, config), ...]`` then applied to any
Dataset. Users register their own steps with ``@register_step``.

Every built-in transform is exposed as a step, so a reference user's
"flow" (a chain of configured processors) maps 1:1 onto a step list.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import TYPE_CHECKING, Any

import pyarrow as pa

if TYPE_CHECKING:
    import ray.data

StepFn = Callable[[pa.Table], pa.Table]
StepFactory = Callable[..., StepFn]

_REGISTRY: dict[str, StepFactory] = {}


def register_step(name: str) -> Callable[[StepFactory], StepFactory]:
    def deco(factory: StepFactory) -> StepFactory:
        if name in _REGISTRY:
            raise ValueError(f"step {name!r} already registered")
        _REGISTRY[name] = factory
        return factory

    return deco


def available_steps() -> list[str]:
    return sorted(_REGISTRY)


@dataclass
class PipelineSpec:
    """A declared pipeline: ordered (step, config) pairs — the engine's
    flow.xml. Serializable (plain data), so specs can live in config."""

    steps: list[tuple[str, dict[str, Any]]] = field(default_factory=list)

    def apply(self, ds: "ray.data.Dataset") -> "ray.data.Dataset":
        for name, cfg in self.steps:
            factory = _REGISTRY.get(name)
            if factory is None:
                raise KeyError(
                    f"unknown step {name!r}; available: {available_steps()}"
                )
            ds = ds.map_batches(factory(**cfg), batch_format="pyarrow")
        return ds


# ---------------------------------------------------------------------------
# built-in steps (the bundle's processors as registry entries)
# ---------------------------------------------------------------------------


@register_step("normalize_content")
def _normalize_step(column: str = "content") -> StepFn:
    from .transforms import normalize_content

    return lambda b: normalize_content(b, column=column)


@register_step("sha256")
def _sha_step(column: str = "content", out: str = "content_sha256") -> StepFn:
    from .transforms import add_sha256

    return lambda b: add_sha256(b, column=column, out=out)


@register_step("path_safety")
def _safety_step(column: str = "path", out: str = "is_safe") -> StepFn:
    from .transforms import add_path_safety

    return lambda b: add_path_safety(b, column=column, out=out)


@register_step("canonical_ext")
def _ext_step(column: str, out: str) -> StepFn:
    from .transforms import to_canonical_ext

    return lambda b: to_canonical_ext(b, column, out)


@register_step("extract_item_id")
def _extract_step(column: str = "filename", out: str = "item_id") -> StepFn:
    from .transforms import extract_item_id

    return lambda b: extract_item_id(b, column=column, out=out)


@register_step("compile_changes")
def _compile_step() -> StepFn:
    from .events import compile_changes

    return compile_changes


@register_step("filter_route")
def _route_filter_step(column: str, keep: str) -> StepFn:
    """Relationship routing as a step: keep rows whose route column equals
    ``keep`` (the success/failure fan-out of SURVEY.md §1.2)."""
    import pyarrow.compute as pc

    return lambda b: b.filter(pc.equal(b[column], keep))
