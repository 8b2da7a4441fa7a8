"""Approximate aggregates (sketches) — mergeable, partial-aggregated.

The reference has no sketches (SURVEY.md §2.5), but a 10^10-event engine
needs distinct-count without a count-distinct shuffle: HyperLogLog
registers are computed per batch (vectorized numpy), merged by elementwise
max — an associative/commutative reduce, exactly the combiner shape of
merge.partial_lww. The full register file is 2^P bytes (16 KiB), so the
"shuffle" moves one small blob per block, never the values.

Estimator: standard HLL (Flajolet et al.) with the small-range linear
counting correction — within ~1.6% (P=14) on large cardinalities and
near-exact below ~2.5*m via linear counting.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .kernels import import_polars as _pl

P = 14
M = 1 << P  # 16384 registers
_ALPHA = 0.7213 / (1 + 1.079 / M)


def _hash64(x: np.ndarray) -> np.ndarray:
    """splitmix64 — deterministic, vectorized, well-mixed 64-bit hash."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def registers_for(values: np.ndarray) -> np.ndarray:
    """Register file (uint8[M]) for a vector of int64 values."""
    h = _hash64(values)
    idx = (h >> np.uint64(64 - P)).astype(np.int64)
    w = h << np.uint64(P)  # remaining 64-P bits, left aligned
    # rank = leading zeros of w in the (64-P)-bit window + 1; w==0 -> max
    lz = np.full(len(h), 64 - P, dtype=np.int64)
    nz = w != 0
    # leading zeros via float trick is unsafe at 64 bits; do it in halves
    hi = (w >> np.uint64(32)).astype(np.uint32)
    lo = (w & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    lz_hi = 31 - np.floor(np.log2(hi, where=hi != 0, out=np.zeros(len(h)))).astype(np.int64)
    lz_lo = 31 - np.floor(np.log2(lo, where=lo != 0, out=np.zeros(len(h)))).astype(np.int64)
    lz32 = np.where(hi != 0, lz_hi, 32 + lz_lo)
    lz[nz] = np.minimum(lz32[nz], 64 - P)
    rank = (lz + 1).clip(1, 64 - P + 1).astype(np.uint8)
    regs = np.zeros(M, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def merge_registers(blobs: list[bytes]) -> np.ndarray:
    regs = np.zeros(M, dtype=np.uint8)
    for b in blobs:
        regs = np.maximum(regs, np.frombuffer(b, dtype=np.uint8))
    return regs


def estimate(regs: np.ndarray) -> float:
    est = _ALPHA * M * M / np.sum(np.exp2(-regs.astype(np.float64)))
    if est <= 2.5 * M:
        zeros = int((regs == 0).sum())
        if zeros:
            return float(M * np.log(M / zeros))
    return float(est)


def make_hll_aggregate(column: str, alias_name: str = "n_distinct_est"):
    """The HLL as a proper ``ray.data.aggregate.AggregateFn`` so it
    composes with ``ds.aggregate(...)`` / ``groupby(...).aggregate(...)``
    like any built-in: accumulate = register-max over a block, merge =
    elementwise max of register files, finalize = estimator."""
    import numpy as np
    from ray.data.aggregate import AggregateFn
    from ray.data.block import BlockAccessor

    def accumulate_block(regs: bytes, block) -> bytes:
        t = BlockAccessor.for_block(block).to_arrow()
        v = t[column].to_numpy(zero_copy_only=False).astype(np.int64)
        merged = np.maximum(
            np.frombuffer(regs, dtype=np.uint8), registers_for(v)
        )
        return merged.tobytes()

    return AggregateFn(
        init=lambda k: bytes(M),
        accumulate_block=accumulate_block,
        merge=lambda a, b: np.maximum(
            np.frombuffer(a, dtype=np.uint8), np.frombuffer(b, dtype=np.uint8)
        ).tobytes(),
        finalize=lambda regs: int(
            round(estimate(np.frombuffer(regs, dtype=np.uint8).copy()))
        ),
        name=alias_name,
    )


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters: bounded-memory candidates + exact verify pass
# ---------------------------------------------------------------------------

MG_K = 256  # counter budget; frequency error of the sketch <= N/(K+1)


def mg_trim(counts: dict[int, int], k: int) -> dict[int, int]:
    """Trim a counter map to <= k entries, Misra-Gries style: subtract the
    (k+1)-th largest count from everyone and drop the non-positive. The
    invariant (true_freq - N/(k+1) <= kept_count <= true_freq) survives
    merges because MG sketches are mergeable under add-then-trim."""
    if len(counts) <= k:
        return counts
    cs = sorted(counts.values(), reverse=True)
    t = cs[k]  # the (k+1)-th largest
    return {v: c - t for v, c in counts.items() if c - t > 0}


def mg_partial(batch: pa.Table, column: str, k: int = MG_K) -> dict[int, int]:
    """Exact per-batch counts (vectorized) trimmed to the MG budget."""
    v = batch[column].to_numpy(zero_copy_only=False).astype(np.int64)
    vals, cnts = np.unique(v, return_counts=True)
    return mg_trim(dict(zip(vals.tolist(), cnts.tolist())), k)


def mg_merge(a: dict[int, int], b: dict[int, int], k: int = MG_K) -> dict[int, int]:
    out = dict(a)
    for v, c in b.items():
        out[v] = out.get(v, 0) + c
    return mg_trim(out, k)


def heavy_hitters(ds, column: str, top: int = 10, k: int = MG_K):
    """Scalable top-N heavy hitters WITHOUT a full-cardinality groupby:

    1. candidate generation — per-batch Misra-Gries sketches (<= k
       counters per block, however many distinct values the block holds)
       merged by a single tiny reduce; any value with true frequency
       > N/(k+1) is guaranteed to survive, so with k sized to
       N/(k+1) < f_top the candidate set covers the true top-N;
    2. exact verification — one more streaming pass counts ONLY the
       candidate set (broadcast is_in filter; the groupby input is <= k
       distinct values, so the shuffle is trivial), then exact top-N with
       a deterministic (count desc, value asc) tie-break;
    3. guarantee check — a value OUTSIDE the candidate set has true
       frequency <= N/(k+1), so the result is provably exact iff the
       verified N-th count exceeds that bound. When the data is too flat
       for the budget (no true heavy hitters), the operator FALLS BACK to
       the exact bucketed groupby instead of returning a silently wrong
       top-N.

    This is the candidates+verify shape that replaces a 10^10-row
    groupby over a high-cardinality key with two cheap passes.
    """
    import pickle

    import ray
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [pa.array([pickle.dumps(mg_partial(batch, column, k))], type=pa.binary())],
            names=["sketch"],
        )

    def reduce_all(batch: pa.Table) -> pa.Table:
        merged: dict[int, int] = {}
        for blob in batch["sketch"].to_pylist():
            merged = mg_merge(merged, pickle.loads(blob), k)
        return pa.Table.from_arrays(
            [pa.array([pickle.dumps(merged)], type=pa.binary())],
            names=["sketch"],
        )

    sketch_tbl = (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(reduce_all, batch_format="pyarrow", batch_size=None)
        .take_all()  # ONE row, <= k counters — tiny by construction
    )
    candidates = sorted(pickle.loads(sketch_tbl[0]["sketch"]))
    cand_arr = pa.array(candidates, type=pa.int64())
    ref = ray.put(cand_arr)

    from .sources import get_broadcast

    def count_candidates(batch: pa.Table) -> pa.Table:
        pl = _pl()
        import pyarrow.compute as pc

        cand = get_broadcast(ref)
        t = batch.filter(pc.is_in(batch[column], value_set=cand))
        return (
            pl.from_arrow(t.select([column]))
            .group_by(column)
            .agg(pl.len().cast(pl.Int64).alias("n_events"))
            .to_arrow()
        )

    exact = (
        ds.map_batches(count_candidates, batch_format="pyarrow")
        .groupby(column)
        .aggregate(Sum("n_events", alias_name="n_events"))
    )

    def topn(batch: pa.Table) -> pa.Table:
        pl = _pl()

        return (
            pl.from_arrow(batch)
            .sort(["n_events", column], descending=[True, False])
            .head(top)
            .to_arrow()
        )

    result = (
        exact.repartition(1)
        .map_batches(topn, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    # guarantee check: a non-candidate's true frequency is <= N/(k+1);
    # the sketch-based top-N is exact only if its N-th count clears that
    # bound. Flat data (no true heavy hitters at this budget) falls back
    # to the exact bucketed groupby — never a silently wrong answer.
    from ray.data.aggregate import Count

    n_total = int(ds.aggregate(Count(column, alias_name="n"))["n"])
    bound = n_total / (k + 1)
    counts = [int(r["n_events"]) for r in result]
    if len(counts) >= top and counts[top - 1] > bound:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    column: pa.array(
                        [r[column] for r in result], type=pa.int64()
                    ),
                    "n_events": pa.array(counts, type=pa.int64()),
                }
            )
        )
    return _exact_topn(ds, column, top)


def _exact_topn(ds, column: str, top: int):
    """Fallback exact top-N: per-batch partial counts -> grouped sum ->
    tiny final sort. One shuffle over (value, count) partials — the path
    heavy_hitters avoids when the sketch guarantee holds."""
    from ray.data.aggregate import Sum

    def partial_counts(batch: pa.Table) -> pa.Table:
        pl = _pl()

        return (
            pl.from_arrow(batch.select([column]))
            .group_by(column)
            .agg(pl.len().cast(pl.Int64).alias("n_events"))
            .to_arrow()
        )

    exact = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby(column)
        .aggregate(Sum("n_events", alias_name="n_events"))
    )

    def topn(batch: pa.Table) -> pa.Table:
        pl = _pl()

        return (
            pl.from_arrow(batch)
            .sort(["n_events", column], descending=[True, False])
            .head(top)
            .to_arrow()
        )

    return exact.repartition(1).map_batches(
        topn, batch_format="pyarrow", batch_size=None
    )


# ---------------------------------------------------------------------------
# distributed EXACT quantiles: histogram narrowing + tiny candidate collect
# ---------------------------------------------------------------------------

QUANTILE_BINS = 4096


def distributed_quantiles(
    ds, column: str, qs: list[float], bins: int = QUANTILE_BINS
):
    """Exact quantiles of a numeric column without a global sort:

    1. (min, max, count) — one streaming aggregate;
    2. fixed-width histogram — per-batch partial bincounts (a bins-long
       int64 vector per block) merged by vector SUM, locating the bin
       that contains each target rank;
    3. candidate collect — one filtered pass pulls ONLY the values inside
       target bins (expected n/bins per bin) to the driver, where the
       exact rank element is selected.

    Returns a pa.Table (q, value). Rank convention matches DuckDB's
    ``quantile_disc``: the ascending element at floor(q * (n-1)), with n
    counting NON-NaN rows only (NaN is ignored everywhere, like SQL
    aggregates ignore NULL). Skew caveat: a value concentration can make
    one bin large — the robust path recurses the narrowing on that bin;
    this implementation collects it directly (fine below ~10M rows per
    hot bin).
    """

    # NaN-aware (lo, hi): Arrow Min/Max PROPAGATE NaN on doubles, which
    # would poison every bin edge — nanmin/nanmax partials instead
    def minmax_partial(batch: pa.Table) -> pa.Table:
        v = batch[column].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return pa.table({"lo": pa.array([], type=pa.float64()),
                             "hi": pa.array([], type=pa.float64())})
        return pa.table({"lo": pa.array([float(v.min())]),
                         "hi": pa.array([float(v.max())])})

    mm = ds.map_batches(minmax_partial, batch_format="pyarrow").take_all()
    if not mm:
        return pa.table({"q": pa.array([], type=pa.float64()),
                         "value": pa.array([], type=pa.float64())})
    lo = min(r["lo"] for r in mm)
    hi = max(r["hi"] for r in mm)
    width = (hi - lo) / bins or 1.0

    def hist_partial(batch: pa.Table) -> pa.Table:
        v = batch[column].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        b = np.clip(((v - lo) / width).astype(np.int64), 0, bins - 1)
        counts = np.bincount(b, minlength=bins).astype(np.int64)
        return pa.Table.from_arrays(
            [pa.array([counts.tobytes()], type=pa.binary())], names=["h"]
        )

    def hist_reduce(batch: pa.Table) -> pa.Table:
        total = np.zeros(bins, dtype=np.int64)
        for blob in batch["h"].to_pylist():
            total += np.frombuffer(blob, dtype=np.int64)
        return pa.Table.from_arrays(
            [pa.array([total.tobytes()], type=pa.binary())], names=["h"]
        )

    hrow = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(hist_reduce, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    hist = np.frombuffer(hrow[0]["h"], dtype=np.int64)
    cum = np.cumsum(hist)
    n = int(cum[-1])  # non-NaN count — the histogram total, by definition
    if n == 0:
        return pa.table({"q": pa.array([], type=pa.float64()),
                         "value": pa.array([], type=pa.float64())})

    ranks = [int(np.floor(q * (n - 1))) for q in qs]  # 0-based ascending
    target_bins = sorted({int(np.searchsorted(cum, r, side="right")) for r in ranks})

    # candidate collect: ONLY the target bins' values leave the workers
    tb = np.array(target_bins, dtype=np.int64)

    def in_target_bins(batch: pa.Table) -> pa.Table:
        v = batch[column].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = ~np.isnan(v)
        v = v[keep]
        b = np.clip(((v - lo) / width).astype(np.int64), 0, bins - 1)
        m = np.isin(b, tb)
        return pa.Table.from_arrays([pa.array(v[m])], names=["v"])

    cand = np.sort(
        ds.map_batches(in_target_bins, batch_format="pyarrow")
        .to_pandas()["v"]
        .to_numpy()
    )
    out_q, out_v = [], []
    for q, r in zip(qs, ranks):
        b = int(np.searchsorted(cum, r, side="right"))
        below = int(cum[b - 1]) if b > 0 else 0  # ranks before this bin
        # candidates from lower target bins that precede bin b
        lower = int(
            sum(hist[x] for x in target_bins if x < b)
        )
        idx = lower + (r - below)
        out_q.append(q)
        out_v.append(float(cand[idx]))
    return pa.table(
        {"q": pa.array(out_q, type=pa.float64()),
         "value": pa.array(out_v, type=pa.float64())}
    )


def hll_distinct(ds, column: str):
    """Dataset -> single-row table {n_distinct_est: int64}. Per-batch
    register files (the combiner) -> one elementwise-max reduce of 16 KiB
    blobs -> estimator. No count-distinct shuffle of the values."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[column].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_arrays(
            [pa.array([registers_for(v).tobytes()], type=pa.binary())],
            names=["regs"],
        )

    def reduce_all(batch: pa.Table) -> pa.Table:
        regs = merge_registers(batch["regs"].to_pylist())
        return pa.Table.from_arrays(
            [pa.array([int(round(estimate(regs)))], type=pa.int64())],
            names=["n_distinct_est"],
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        # batch_size=None: the single block must reach reduce_all whole,
        # or >1024 partials would yield one estimate PER BATCH
        .map_batches(reduce_all, batch_format="pyarrow", batch_size=None)
    )
