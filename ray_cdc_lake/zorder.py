"""Z-order (Morton-curve) clustering for multi-column scan pruning —
the Delta ``OPTIMIZE ZORDER BY`` / Iceberg multi-dim sort-order analog
for this lake's bucketed layout.

``compact(sort=True)`` clusters each bucket by the key prefix, which
makes single-prefix range scans prune exactly but leaves any OTHER
column's per-file bounds as wide as the bucket.  Z-ordering interleaves
the bits of several columns' rank-space positions so files cover small
hyper-rectangles of the combined space: per-file min/max recorded at
commit (sink._write_txn_data) become tight on EVERY participating
column at once, and ``read_lake(ranges={a: .., b: ..})`` prunes files
on all of them from manifest metadata alone.

Rank normalization is sample-based (the Spark RangePartitioner /
Iceberg zorder approach): a bounded per-block sample (never the column
itself) flows to the driver, per-column boundaries are cut from it, and
every row's column value maps to its boundary rank via vectorized
``searchsorted`` — skew-proof (ranks are near-uniform by construction)
and type-agnostic (ints, floats and strings all rank the same way).
Driver state is O(2^bits) values per column; the data itself moves once
through the ONE range-partitioned sort the plain sort-compaction
already pays.  No extra shuffle, no per-row Python.

Reference analog: the browse-structure rewrite that re-clusters a
repo's files for downstream access patterns (CreateMetsBrowsing.kt
ordering + ReorderFiles.kt renumbering) — generalized from one sort key
to a multi-column locality curve.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa

if TYPE_CHECKING:
    import ray.data

# deterministic per-block sample cap: 64 blocks x 512 values already
# bounds boundary error to ~0.2% per column; the driver never sees more
SAMPLE_PER_BLOCK = 512
MAX_BITS = 16


def _as_numpy(col: pa.ChunkedArray) -> np.ndarray:
    arr = col.combine_chunks()
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        return np.asarray(arr.to_pylist(), dtype=object)
    return arr.to_numpy(zero_copy_only=False)


def _as_numpy_masked(col: pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray | None]:
    """(values, null_mask) with the DTYPE preserved for numeric columns:
    nulls are filled at the Arrow level with an arbitrary in-type value
    (their ranks are forced to 0 downstream, so the fill never shows),
    which keeps int64-with-nulls as int64 instead of degrading to
    float64 NaN — to_numpy's NaN both loses integer precision above
    2^53 and would rank at the END under searchsorted, contradicting
    the documented 'nulls rank lowest'."""
    arr = col.combine_chunks()
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        # object path: zorder_key detects None per element itself
        return np.asarray(arr.to_pylist(), dtype=object), None
    if not arr.null_count:
        return arr.to_numpy(zero_copy_only=False), None
    mask = np.asarray(arr.is_null())
    non_null = arr.drop_null()
    if len(non_null) == 0:  # all null: every rank is 0 anyway
        return np.zeros(len(arr), dtype=np.int64), mask
    arr = arr.fill_null(non_null[0])
    return arr.to_numpy(zero_copy_only=False), mask


def sample_bounds(
    ds: "ray.data.Dataset", cols: list[str], bits: int = 10
) -> dict[str, np.ndarray]:
    """ONE sampling pass: each block contributes an evenly-strided
    sample of at most SAMPLE_PER_BLOCK values per column (deterministic
    — no RNG, resumable); the driver cuts ``2^bits - 1`` rank
    boundaries per column from the combined sample.  Nulls rank lowest
    (they are excluded from the sample and searchsorted sends them to
    rank 0 via the type's minimum)."""
    if not 1 <= bits <= MAX_BITS:
        raise ValueError(f"bits must be in [1, {MAX_BITS}]")

    def block_sample(t: pa.Table) -> pa.Table:
        out_cols, out_names = [], []
        for c in cols:
            v = t[c].drop_null().combine_chunks()
            n = len(v)
            if n > SAMPLE_PER_BLOCK:
                idx = np.linspace(0, n - 1, SAMPLE_PER_BLOCK).astype(np.int64)
                v = v.take(pa.array(idx))
            out_cols.append(v)
            out_names.append(c)
        m = max((len(c) for c in out_cols), default=0)
        padded = [
            pa.concat_arrays([c, pa.nulls(m - len(c), c.type)])
            for c in out_cols
        ]
        return pa.Table.from_arrays(padded, names=out_names)

    sampled = ds.map_batches(block_sample, batch_format="pyarrow")
    tables = [
        b for b in sampled.iter_batches(batch_size=None, batch_format="pyarrow")
    ]
    if not tables:
        return {c: np.array([], dtype=object) for c in cols}
    combined = pa.concat_tables(tables, promote_options="permissive")
    n_bounds = (1 << bits) - 1
    bounds: dict[str, np.ndarray] = {}
    for c in cols:
        v = np.sort(_as_numpy(combined[c].drop_null()))
        if v.dtype.kind == "f":  # genuine NaN data values rank as nulls,
            v = v[~np.isnan(v)]  # never as boundaries
        if len(v) == 0:
            bounds[c] = v
            continue
        idx = np.linspace(0, len(v) - 1, min(n_bounds, len(v))).astype(np.int64)
        bounds[c] = np.unique(v[idx])
    return bounds


def zorder_key(
    columns: list[np.ndarray],
    bounds: list[np.ndarray],
    bits: int = 10,
    null_masks: "list[np.ndarray | None] | None" = None,
) -> np.ndarray:
    """Vectorized Morton key: rank each column against its boundaries,
    then interleave the rank bits round-robin (column 0 owns the most
    significant bit of each round).  ``len(columns) * bits`` must fit
    in 63 bits.  Nulls rank lowest on EVERY dtype: object columns
    detect None per element, numeric columns force rank 0 wherever the
    caller's ``null_masks`` entry (the Arrow null mask) or a NaN value
    marks a hole — without the explicit checks, to_numpy's NaN would
    searchsorted to the END, contradicting this contract."""
    k = len(columns)
    if k * bits > 63:
        raise ValueError("k * bits must be <= 63")
    z = np.zeros(len(columns[0]) if columns else 0, dtype=np.uint64)
    ranks = []
    for j, (vals, bnd) in enumerate(zip(columns, bounds)):
        nm = null_masks[j] if null_masks is not None else None
        if len(bnd) == 0:
            ranks.append(np.zeros(len(vals), dtype=np.uint64))
            continue
        if vals.dtype == object:
            mask = np.array([x is not None for x in vals], dtype=bool)
            if nm is not None:
                mask &= ~nm
            safe = np.where(mask, vals, bnd[0])
            r = np.searchsorted(bnd, safe, side="right").astype(np.uint64)
            r[~mask] = 0
        else:
            r = np.searchsorted(bnd, vals, side="right").astype(np.uint64)
            if vals.dtype.kind == "f":
                nan = np.isnan(vals)
                if nan.any():
                    r[nan] = 0
            if nm is not None:
                r[nm] = 0
        # normalize to the FULL bit range: a low-cardinality column's
        # raw ranks would occupy only the low (finest-grained) bit
        # lanes and contribute no file-level locality; scaling by a
        # positive constant preserves order and spreads its distinct
        # values across the high bits
        scale = np.uint64(max(1, ((1 << bits) - 1) // len(bnd)))
        r = np.minimum(r * scale, np.uint64((1 << bits) - 1))
        ranks.append(r)
    for i in range(bits):
        for c, r in enumerate(ranks):
            z |= ((r >> np.uint64(i)) & np.uint64(1)) << np.uint64(
                i * k + (k - 1 - c)
            )
    return z.astype(np.int64)


def apply_zorder(
    ds: "ray.data.Dataset",
    cols: list[str],
    bounds: dict[str, np.ndarray],
    bits: int = 10,
    out: str = "_z",
) -> "ray.data.Dataset":
    """Append the Morton key column (bounds are tiny — they ship inside
    the task closure once, not per batch)."""
    blist = [bounds[c] for c in cols]

    def add_z(t: pa.Table) -> pa.Table:
        pairs = [_as_numpy_masked(t[c]) for c in cols]
        z = zorder_key(
            [v for v, _ in pairs],
            blist,
            bits=bits,
            null_masks=[m for _, m in pairs],
        )
        return t.append_column(out, pa.array(z))

    return ds.map_batches(add_z, batch_format="pyarrow")
