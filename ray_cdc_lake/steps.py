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


# ---------------------------------------------------------------------------
# per-record parameterization — the expression-language analog
# ---------------------------------------------------------------------------

import re as _re

_PARAM_RE = _re.compile(r"^\$\{([A-Za-z_][A-Za-z0-9_.]*)\}$")


@dataclass(frozen=True)
class ColumnRef:
    """A config value resolved per ROW from a batch column — NiFi's
    ``evaluateAttributeExpressions`` against FlowFile attributes
    (ReorderFiles.kt:333-342), re-expressed over columns: the config
    string ``'${width}'`` means "read this parameter from the ``width``
    column of each record"."""

    column: str


def parse_param(value: Any) -> Any:
    """'${col}' -> ColumnRef('col'); anything else passes through."""
    if isinstance(value, str):
        m = _PARAM_RE.match(value)
        if m:
            return ColumnRef(m.group(1))
    return value


def resolve_param(value: Any, batch: pa.Table) -> Any:
    """Resolve a (possibly per-record) step parameter against a batch:
    a literal returns unchanged; a ColumnRef / '${col}' string returns the
    column's values as a numpy array (vectorized — one resolution per
    batch, not a Python loop per row)."""
    value = parse_param(value)
    if isinstance(value, ColumnRef):
        if value.column not in batch.column_names:
            raise KeyError(
                f"per-record parameter references missing column "
                f"{value.column!r}; batch has {batch.column_names}"
            )
        return batch[value.column].to_numpy(zero_copy_only=False)
    return value


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
    ``keep`` (the success/failure fan-out of SURVEY.md §1.2). ``keep``
    may be per-record: ``'${expected}'`` compares route against the
    ``expected`` column row-by-row (vectorized)."""
    import pyarrow.compute as pc

    def fn(b: pa.Table) -> pa.Table:
        k = resolve_param(keep, b)
        if isinstance(k, str):
            return b.filter(pc.equal(b[column], k))
        return b.filter(pc.equal(b[column], pa.array(k)))

    return fn


@register_step("zero_pad")
def _zero_pad_step(column: str, width: "int | str" = 6, out: str | None = None) -> StepFn:
    """Zero-pad ``column`` to ``width`` characters — the ReorderFiles
    sequence zero-pad (ReorderFiles.kt:333-342), where the reference
    resolves the width per record via expression language. ``width`` may
    be a literal int or ``'${col}'``; per-record widths are applied
    vectorized per DISTINCT width (widths are small ints, so the distinct
    set is tiny)."""
    import numpy as np
    import pyarrow.compute as pc

    def fn(b: pa.Table) -> pa.Table:
        vals = pc.cast(b[column], pa.string())
        w = resolve_param(width, b)
        dst = out or column
        if isinstance(w, (int, np.integer)):
            padded = pc.utf8_lpad(vals, int(w), padding="0")
        else:
            w = np.asarray(w).astype(np.int64)
            padded = vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) else vals
            for uw in np.unique(w):
                mask = pa.array(w == uw)
                padded = pc.if_else(
                    mask, pc.utf8_lpad(vals, int(uw), padding="0"), padded
                )
        if dst in b.column_names:
            return b.set_column(b.schema.get_field_index(dst), dst, padded)
        return b.append_column(dst, padded)

    return fn


@register_step("route_threshold")
def _route_threshold_step(
    column: str,
    threshold: "float | str",
    out: str = "route",
    over: str = "over",
    under: str = "under",
) -> StepFn:
    """Route rows by comparing ``column`` to a threshold that is either a
    literal or a per-record ``'${col}'`` reference (the reference resolves
    routing properties per FlowFile the same way)."""
    import numpy as np

    def fn(b: pa.Table) -> pa.Table:
        thr = resolve_param(threshold, b)
        vals = b[column].to_numpy(zero_copy_only=False)
        routes = np.where(vals >= thr, over, under)
        return b.append_column(out, pa.array(routes.tolist(), type=pa.string()))

    return fn
