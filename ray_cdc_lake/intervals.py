"""Interval-overlap join: pair every left interval with every right
interval of the same key whose time ranges intersect
(``max(starts) <= min(ends)``, closed intervals).

Ray Data has no native range/interval join; the 100 TB-safe composition
is **temporal tiling**: the time axis is cut into fixed-width tiles and
each interval is replicated into every tile it touches (bounded fan-out:
``len/tile + 2`` copies), then ONE groupby on ``(tile, key-bucket)``
co-locates all candidates and a fully vectorized per-cell kernel
(lexsort + searchsorted windowing + repeat/cumsum pair expansion — no
per-row Python) emits the pairs.  An overlapping pair would surface in
every shared tile, so each pair is *attributed* to exactly one tile —
the one containing ``max(l_start, r_start)`` (both intervals cover that
point by definition of overlap) — and emitted only there; no dedup
shuffle afterwards.

Scale shape at 10^10 events: shuffle volume is input x fan-out (a small
constant when ``tile_width`` is chosen near the typical interval
length); each (tile, bucket) cell only has to fit a worker's heap —
the same partitioning contract as the LWW merge and the as-of join.
Long-tail intervals that would replicate into many tiles are the skew
hazard; the fan-out is computed per row, so a caller can cap it by
pre-splitting outliers (or widening ``tile_width``).

Reference analog: the batch-vs-repo "which in-flight changes touch the
same object window" reconciliation (ReorderFiles.kt:149-185) —
generalized from point lookups to arbitrary time ranges, the same way
asof.py generalizes its latest-image lookup.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .kernels import hash_utf8_u64

if TYPE_CHECKING:
    import ray.data


def _joined_keys(t: pa.Table, keys: tuple[str, ...]) -> pa.ChunkedArray:
    cols = [t[k].cast(pa.string()) for k in keys]
    if len(cols) == 1:
        return cols[0]
    # same NUL-aliasing guard as asof._joined_keys: the per-cell kernel
    # groups by the packed string, so NUL inside a key value would
    # silently merge distinct multi-key rows
    for k, c in zip(keys, cols):
        if pc.any(pc.match_substring(c, "\x00")).as_py():
            raise ValueError(
                f"join key column {k!r} contains NUL (\\x00), the "
                "multi-key pack separator — NUL-bearing keys would alias "
                "across columns; sanitize them first"
            )
    return pc.binary_join_element_wise(*cols, "\x00")


def _bucket_of(joined, num_buckets: int) -> np.ndarray:
    # vectorized over the raw Arrow byte buffer — no pandas object-array
    # round-trip per batch on the join hot path (kernels.hash_utf8_u64)
    return (hash_utf8_u64(joined) % np.uint64(num_buckets)).astype(np.int64)


def interval_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    keys: tuple[str, ...],
    left_span: tuple[str, str],
    right_span: tuple[str, str],
    tile_width: int,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Inner interval-overlap join.  ``left_span``/``right_span`` name
    (start, end) int64 columns (closed intervals, end >= start; cast
    timestamps to epoch integers first).  Output: all left columns
    verbatim plus right payload columns prefixed ``r_`` — one row per
    overlapping (left, right) pair of equal ``keys``.

    ``tile_width`` (same unit as the span columns) trades replication
    fan-out (``span/tile_width + 2`` copies per row) against per-cell
    density; pick it near the typical interval length."""
    import ray.data  # noqa: F401

    ls = left.schema()
    rs = right.schema()
    left_names = list(ls.names)
    if any(n.startswith("r_") for n in left_names):
        raise ValueError("left columns may not start with the r_ prefix")
    _reserved = {"_s", "_e", "_side", "cell"}
    for side_name, cols_ in (("left", left_names), ("right", list(rs.names))):
        clash = _reserved & set(cols_)
        if clash:
            raise ValueError(
                f"{side_name} columns {sorted(clash)} collide with "
                "interval_join's internal union-schema columns "
                "('_s', '_e', '_side', 'cell') — rename them first"
            )
    payload = [n for n in rs.names if n not in keys]

    fields = [pa.field(n, ty) for n, ty in zip(ls.names, ls.types)]
    fields += [
        pa.field(f"r_{n}", rs.types[rs.names.index(n)]) for n in payload
    ]
    fields += [
        pa.field("_s", pa.int64()),
        pa.field("_e", pa.int64()),
        pa.field("_side", pa.int8()),
    ]
    union_schema = pa.schema(fields)
    names = [f.name for f in union_schema]
    types = {f.name: f.type for f in union_schema}
    out_names = left_names + [f"r_{n}" for n in payload]
    r_names = set(out_names) - set(left_names)

    def conform(t: pa.Table, side: int, span: tuple[str, str]) -> pa.Table:
        start_col, end_col = span
        cols = []
        for n in names:
            if n == "_s":
                c = t[start_col].cast(pa.int64())
            elif n == "_e":
                c = t[end_col].cast(pa.int64())
            elif n == "_side":
                c = pa.array(np.full(t.num_rows, side, dtype=np.int8))
            elif side == 0 and n.startswith("r_"):
                c = t[n[2:]].cast(types[n])
            elif (
                (side == 1 or n in keys)
                and n in t.column_names
                and not n.startswith("r_")
            ):
                c = t[n].cast(types[n])
            else:
                c = pa.nulls(t.num_rows, types[n])
            cols.append(c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c)
        out = pa.Table.from_arrays(cols, names=names)
        # replicate each row into every tile its interval touches
        s = out["_s"].to_numpy(zero_copy_only=False)
        e = out["_e"].to_numpy(zero_copy_only=False)
        if np.any(e < s):
            raise ValueError("interval end < start")
        t_lo = s // tile_width
        t_hi = e // tile_width
        reps = (t_hi - t_lo + 1).astype(np.int64)
        idx = np.repeat(np.arange(out.num_rows, dtype=np.int64), reps)
        out = out.take(pa.array(idx))
        offsets = np.concatenate(([0], np.cumsum(reps)))[:-1]
        tile = np.arange(len(idx), dtype=np.int64) - np.repeat(
            offsets, reps
        ) + np.repeat(t_lo, reps)
        b = _bucket_of(_joined_keys(out, keys), num_buckets)
        return out.append_column(
            "cell", pa.array(tile * num_buckets + b)
        )

    lefts = left.map_batches(
        lambda t: conform(t, 1, left_span), batch_format="pyarrow"
    )
    rights = right.map_batches(
        lambda t: conform(t, 0, right_span), batch_format="pyarrow"
    )
    combined = lefts.union(rights)

    def per_cell(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        side = t["_side"].to_numpy()
        lmask = side == 1
        rmask = ~lmask
        if not lmask.any() or not rmask.any():
            return union_schema.empty_table().select(out_names)
        tile = int(t["cell"][0].as_py()) // num_buckets
        tile_lo = tile * tile_width
        joined = np.asarray(_joined_keys(t, keys).to_pandas(), dtype=object)
        kid = np.unique(joined, return_inverse=True)[1].astype(np.int64)
        s = t["_s"].to_numpy(zero_copy_only=False)
        e = t["_e"].to_numpy(zero_copy_only=False)
        # clip starts to the tile so offsets fit the composite sort key;
        # safe for the candidate bound: cs_r > l_e would need
        # tile_lo > l_e, impossible when the left interval touches the
        # tile.  The exact overlap test below uses the ORIGINAL bounds.
        cs = np.maximum(s, tile_lo) - tile_lo
        span = tile_width + 1
        ridx = np.flatnonzero(rmask)
        rkey = kid[ridx] * span + cs[ridx]
        order = np.argsort(rkey, kind="stable")
        ridx = ridx[order]
        rkey = rkey[order]
        lidx = np.flatnonzero(lmask)
        # candidates per left row: same kid, clipped right start <= l_e
        qoff = np.minimum(e[lidx] - tile_lo, span - 1)
        hi = np.searchsorted(rkey, kid[lidx] * span + qoff, side="right")
        lo = np.searchsorted(rkey, kid[lidx] * span, side="left")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return union_schema.empty_table().select(out_names)
        pl_ = np.repeat(np.arange(len(lidx)), counts)
        offs = np.concatenate(([0], np.cumsum(counts)))[:-1]
        pr = np.arange(total) - np.repeat(offs, counts) + np.repeat(lo, counts)
        li = lidx[pl_]
        ri = ridx[pr]
        # exact overlap on original bounds + single-tile attribution
        ov_start = np.maximum(s[li], s[ri])
        keep = (
            (e[ri] >= s[li])
            & (s[ri] <= e[li])
            & (ov_start // tile_width == tile)
        )
        li = pa.array(li[keep], type=pa.int64())
        ri = pa.array(ri[keep], type=pa.int64())
        cols = [
            t[c].take(ri if c in r_names else li) for c in out_names
        ]
        return pa.Table.from_arrays(cols, names=out_names)

    return combined.groupby("cell").map_groups(
        per_cell, batch_format="pyarrow"
    )
