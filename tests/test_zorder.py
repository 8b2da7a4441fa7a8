"""Z-order clustering compaction (ray_cdc_lake/zorder.py +
checkpoint.compact(zorder=...)).

Bar: (1) the Morton kernel interleaves rank bits correctly and
preserves per-column monotonicity; (2) zorder compaction preserves
lake state byte-for-byte; (3) the point of the exercise — per-file
manifest bounds become tight on EVERY z column, so a single-column
range scan on either column prunes files that the unclustered layout
cannot, from metadata alone, while returning the identical rows."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from ray_cdc_lake.checkpoint import apply_incremental, compact
from ray_cdc_lake.sink import _plan_scan, read_lake, read_manifest
from ray_cdc_lake.zorder import sample_bounds, zorder_key
from tests.test_sink_resume import ev_ds, lake_state

N = 400


def _rows():
    # path rank and lsn rank deliberately decorrelated (stride-7 walk)
    # so neither natural ingest order nor a single-column sort gives
    # locality on both columns at once
    return [
        (
            i + 1,
            "insert",
            f"r{i % 4}",
            f"f{(i * 7) % N:04d}.py",
            f"body-{i:04d} " * 40,
        )
        for i in range(N)
    ]


def test_zorder_key_interleaves_and_is_monotone():
    # two columns, explicit boundaries: ranks are the values themselves
    bounds = [np.array([1, 2, 3]), np.array([1, 2, 3])]
    a = np.array([0, 1, 2, 3])
    zero = np.array([0, 0, 0, 0])
    # column 0 owns the HIGH bit of each round: z(a, 0) = spread(a) << 1
    z_a = zorder_key([a, zero], bounds, bits=2)
    z_b = zorder_key([zero, a], bounds, bits=2)
    assert list(z_b) == [0, 1, 4, 5]  # spread bits of 0..3
    assert list(z_a) == [0, 2, 8, 10]  # same, shifted into odd lanes
    # fixing one column, z is monotone in the other's rank
    rng = np.random.default_rng(3)
    v = np.sort(rng.integers(0, 1000, 50))
    b2 = [np.sort(rng.integers(0, 1000, 31)), np.array([500])]
    z = zorder_key([v, np.full(50, 7)], b2, bits=5)
    assert (np.diff(z) >= 0).all()


def test_zorder_key_handles_strings_and_nulls():
    bounds = [np.array(["b", "d", "f"], dtype=object)]
    vals = np.array(["a", "b", "c", "e", "z", None], dtype=object)
    z = zorder_key([vals], bounds, bits=2)
    assert list(z) == [0, 1, 1, 2, 3, 0]  # nulls rank lowest


def test_zorder_numeric_nulls_rank_lowest_and_keep_int_precision():
    """Numeric nulls must rank 0 like the string path (searchsorted
    would otherwise send to_numpy's NaN to the TOP rank), and an int64
    column with nulls must not round-trip through float64 — values
    above 2^53 keep exact ranks."""
    from ray_cdc_lake.zorder import _as_numpy_masked, apply_zorder

    # NaN values in a float column rank 0, not top
    bounds = [np.array([10.0, 20.0, 30.0])]
    vals = np.array([5.0, 15.0, np.nan, 35.0])
    z = zorder_key([vals], bounds, bits=2)
    assert list(z) == [0, 1, 0, 3]

    # Arrow null mask forces rank 0 regardless of the filled value
    z2 = zorder_key(
        [np.array([35.0, 35.0])], bounds, bits=2,
        null_masks=[np.array([False, True])],
    )
    assert list(z2) == [3, 0]

    # int64 with nulls: dtype preserved, >2^53 neighbors stay distinct
    big = 1 << 60
    col = pa.chunked_array([pa.array([big, big + 1, None], type=pa.int64())])
    v, m = _as_numpy_masked(col)
    assert v.dtype == np.int64 and list(m) == [False, False, True]
    ib = [np.array([big, big + 1], dtype=np.int64)]
    z3 = zorder_key([v], ib, bits=2, null_masks=[m])
    assert list(z3) == [1, 2, 0]  # exact ranks; null lowest

    # end-to-end through apply_zorder on a table with numeric nulls
    import ray.data

    t = pa.table({"a": pa.array([1, None, 100], type=pa.int64())})
    out = apply_zorder(
        ray.data.from_arrow(t), ["a"], {"a": np.array([50], dtype=np.int64)},
        bits=2,
    ).to_pandas()
    za = dict(zip(out["a"].astype("Int64").tolist(), out["_z"].tolist()))
    assert za[1] == 0 and za[100] > 0
    null_z = out.loc[out["a"].isna(), "_z"].tolist()
    assert null_z == [0]


def test_zorder_compaction_preserves_state_and_prunes_both_columns(tmp_path):
    import ray.data

    plain = str(tmp_path / "plain")
    zlake = str(tmp_path / "zlake")
    rows = _rows()
    # two txns each so compaction has something to fold
    for lake in (plain, zlake):
        apply_incremental(lake, "txn-a", ev_ds(rows[: N // 2]), num_buckets=2)
        apply_incremental(lake, "txn-b", ev_ds(rows[N // 2 :]), num_buckets=2)
    before = lake_state(plain)
    assert lake_state(zlake) == before

    ctx = ray.data.DataContext.get_current()
    prev = ctx.target_max_block_size
    ctx.target_max_block_size = 16 * 1024  # force several files per bucket
    try:
        compact(plain)
        compact(zlake, zorder=("path", "lsn"))
    finally:
        ctx.target_max_block_size = prev

    assert lake_state(plain) == before
    assert lake_state(zlake) == before

    m_plain = read_manifest(plain)
    m_z = read_manifest(zlake)
    n_files = sum(len(b["files"]) for b in m_z.buckets.values())
    assert n_files >= 6, "fixture must yield several files per bucket"

    # single-column range scans: the z layout must prune files on BOTH
    # columns; the unclustered layout is lsn-ordered by ingest, so the
    # path predicate prunes (almost) nothing there
    path_rng = {"path": (f"f{N // 4:04d}", f"f{N // 2:04d}")}
    lsn_rng = {"lsn": (N // 4, N // 2)}
    _, acct_plain_path = _plan_scan(m_plain, plain, path_rng)
    _, acct_z_path = _plan_scan(m_z, zlake, path_rng)
    _, acct_z_lsn = _plan_scan(m_z, zlake, lsn_rng)
    assert acct_z_path["files_pruned"] > acct_plain_path["files_pruned"]
    assert acct_z_lsn["files_pruned"] > 0

    # pruned scans still return exactly the predicate rows
    got = read_lake(zlake, ranges=path_rng).to_pandas()
    want = {
        k for k in before if path_rng["path"][0] <= k[1] <= path_rng["path"][1]
    }
    assert set(zip(got.repo, got.path)) == want
    got_lsn = read_lake(zlake, ranges=lsn_rng).to_pandas()
    assert set(got_lsn.lsn) == {
        v[0] for v in before.values() if N // 4 <= v[0] <= N // 2
    }


def test_zorder_rejects_sort_combo(tmp_path):
    lake = str(tmp_path / "lake")
    apply_incremental(lake, "txn-a", ev_ds(_rows()[:8]), num_buckets=2)
    with pytest.raises(ValueError):
        compact(lake, sort=True, zorder=("path", "lsn"))


def test_sample_bounds_are_bounded_and_sorted(tmp_path):
    import ray.data as rd

    t = pa.Table.from_arrays(
        [
            pa.array(np.arange(10_000, dtype=np.int64)),
            pa.array([f"k{i:05d}" for i in range(10_000)]),
        ],
        names=["a", "b"],
    )
    ds = rd.from_arrow(t)
    bounds = sample_bounds(ds, ["a", "b"], bits=6)
    for c in ("a", "b"):
        assert 1 <= len(bounds[c]) <= 63
        assert (np.sort(bounds[c]) == bounds[c]).all()


def test_maybe_compact_zorder_passthrough(tmp_path):
    from ray_cdc_lake.checkpoint import maybe_compact

    lake = str(tmp_path / "lake")
    rows = _rows()[:40]
    for i in range(3):
        from ray_cdc_lake.checkpoint import apply_incremental as ai

        seg = [
            (r[0] + 1000 * i, r[1], r[2], r[3], r[4]) for r in rows[i * 10 : i * 10 + 10]
        ]
        ai(lake, f"txn-{i}", ev_ds(seg), num_buckets=2)
    before = lake_state(lake)
    m = maybe_compact(lake, max_txns=2, zorder=("path", "lsn"))
    assert m is not None and m.txns[0].startswith("compact-")
    assert lake_state(lake) == before


def test_zorder_three_columns(tmp_path):
    """k=3 interleave: state preserved and every z column's file bounds
    participate in pruning. The LOWEST-priority column only localizes
    one bit per log2(files)/k of partition depth, so the fixture forces
    enough files (~4 KiB blocks -> ~40) that even lsn's top bit maps to
    whole files."""
    lake = str(tmp_path / "lake")
    rows = _rows()
    apply_incremental(lake, "txn-a", ev_ds(rows), num_buckets=1)
    before = lake_state(lake)
    import ray.data

    ctx = ray.data.DataContext.get_current()
    prev = ctx.target_max_block_size
    ctx.target_max_block_size = 4 * 1024
    try:
        compact(lake, zorder=("repo", "path", "lsn"))
    finally:
        ctx.target_max_block_size = prev
    assert lake_state(lake) == before
    m = read_manifest(lake)
    n_files = sum(len(b["files"]) for b in m.buckets.values())
    assert n_files >= 24, n_files
    for rng_ in (
        {"repo": ("r1", "r2")},
        {"path": ("f0050", "f0150")},
        {"lsn": (50, 150)},
    ):
        _, acct = _plan_scan(m, lake, rng_)
        assert acct["files_pruned"] > 0, rng_
