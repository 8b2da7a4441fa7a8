"""SortedRunIndex: spilling LWW merge must equal the one-shot reduce.

Reference analog for the invariant: applying a batch through the staged
temp area (RenameDiskUtils.kt:32-105) yields the same final folder state
as applying it directly — staging is a memory/atomicity mechanism, not a
semantic one.
"""

import numpy as np
import pyarrow as pa
import pytest

from ray_cdc_lake.merge import _winner_per_key
from ray_cdc_lake.state import SortedRunIndex, merge_group_spilling


def _random_events(n: int, n_keys: int, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    key = rng.integers(0, n_keys, n)
    lsn = rng.integers(0, 10 * n, n)
    op = np.where(rng.random(n) < 0.1, "delete", "update")
    return pa.table(
        {
            "repo": pa.array([f"r{k % 7}" for k in key]),
            "path": pa.array([f"p{k}" for k in key]),
            "lsn": pa.array(lsn, type=pa.int64()),
            "commit": pa.array([f"c{x:08d}" for x in rng.integers(0, 1 << 30, n)]),
            "op": pa.array(op.tolist()),
            "content": pa.array([f"v{x}" for x in lsn], type=pa.large_string()),
        }
    )


def _canon(t: pa.Table) -> list:
    return sorted(map(tuple, t.to_pandas().astype(str).values.tolist()))


@pytest.mark.parametrize("max_rows", [50, 200, 10_000])
def test_index_equals_oneshot(max_rows, tmp_path):
    ev = _random_events(5_000, 300, seed=7)
    want = _winner_per_key(ev, ["repo", "path"])
    idx = SortedRunIndex(max_rows_in_mem=max_rows, spill_dir=str(tmp_path))
    for off in range(0, ev.num_rows, 333):  # odd chunking on purpose
        idx.add(ev.slice(off, 333))
    got = idx.finish()
    assert _canon(got) == _canon(want)


def test_compaction_bounds_runs(tmp_path):
    # 40 chunks of 250 rows with budget 300 -> must compact, not accumulate
    ev = _random_events(10_000, 2_000, seed=11)
    idx = SortedRunIndex(max_rows_in_mem=300, spill_dir=str(tmp_path))
    for off in range(0, ev.num_rows, 250):
        idx.add(ev.slice(off, 250))
        assert len(idx._runs) <= 40
    got = idx.finish()
    want = _winner_per_key(ev, ["repo", "path"])
    assert _canon(got) == _canon(want)
    # spill files cleaned up
    assert list(tmp_path.iterdir()) == []


def test_tiered_compaction_skips_large_run(tmp_path):
    """Size-tiered policy: a compaction cycle merges only the MAX_RUNS
    smallest runs — the accumulated large run is NOT rewritten (the old
    all-runs policy re-read it every cycle: quadratic amplification)."""
    ev = _random_events(30_000, 28_000, seed=13)  # mostly-distinct keys
    idx = SortedRunIndex(max_rows_in_mem=1_000, spill_dir=str(tmp_path))
    # build one big run + exactly MAX_RUNS small runs, then trigger
    idx.add(ev.slice(0, 15_000))
    idx._spill()  # big run ~15k rows
    assert len(idx._runs) == 1
    big_path = idx._runs[0]
    for off in range(15_000, 15_000 + 1_000 * idx.MAX_RUNS, 1_000):
        idx.add(ev.slice(off, 1_000))
        idx._spill()
    # compaction ran (count exceeded MAX_RUNS) and merged ONLY small runs
    assert len(idx._runs) == 2
    assert big_path in idx._runs
    got = idx.finish()
    want = _winner_per_key(
        ev.slice(0, 15_000 + 1_000 * idx.MAX_RUNS), ["repo", "path"]
    )
    assert _canon(got) == _canon(want)


def test_merge_group_spilling_wrapper():
    ev = _random_events(3_000, 100, seed=3)
    got = merge_group_spilling(ev, ["repo", "path"], chunk_rows=170, max_rows_in_mem=120)
    want = _winner_per_key(ev, ["repo", "path"])
    assert _canon(got) == _canon(want)


def test_spill_with_schema_evolution(tmp_path):
    """Later chunks carry an extra column; promotion/null-backfill must
    survive the spill path (pa.concat_tables promote)."""
    a = _random_events(1_000, 50, seed=1)
    b = _random_events(1_000, 50, seed=2)
    b = b.append_column("license", pa.array(["MIT"] * b.num_rows))
    idx = SortedRunIndex(max_rows_in_mem=80, spill_dir=str(tmp_path))
    idx.add(a)
    idx.add(b)
    got = idx.finish()
    both = pa.concat_tables([a, b], promote_options="permissive")
    want = _winner_per_key(both, ["repo", "path"])
    assert _canon(got) == _canon(want)
    assert "license" in got.column_names


def test_spill_path_through_ray_merge(monkeypatch):
    """Force the sorted-run spill inside the real Ray reduce (tiny
    threshold) — result must equal the in-memory path."""
    import ray.data as rd

    import ray_cdc_lake.merge as merge_mod
    from ray_cdc_lake.merge import lww_merge

    ev = _random_events(30_000, 500, seed=21)
    want = _canon_ds(lww_merge(rd.from_arrow(ev), num_buckets=4))
    monkeypatch.setattr(merge_mod, "SPILL_THRESHOLD_ROWS", 200)
    got = _canon_ds(lww_merge(rd.from_arrow(ev), num_buckets=4))
    assert len(want) > 0
    assert got == want


def _canon_ds(ds) -> list:
    return sorted(map(tuple, ds.to_pandas().astype(str).values.tolist()))


def test_finish_iter_streams_bounded_working_set(tmp_path):
    """The k-way finish must hold O(runs x chunk) Arrow memory between
    yielded chunks, never O(live keys): with mostly-distinct keys and a
    tiny budget, the retained pool delta while iterating stays far below
    the full winner set's footprint. (Transient merge allocations are
    bounded by the same chunk math; this asserts the RETAINED state.)"""
    rng = np.random.default_rng(42)
    n = 100_000
    pad = "x" * 200
    ev = pa.table(
        {
            "repo": pa.array([f"r{i % 13}" for i in range(n)]),
            "path": pa.array([f"p{i}" for i in rng.permutation(n)]),
            "lsn": pa.array(rng.integers(0, 10 * n, n), type=pa.int64()),
            "commit": pa.array([f"c{i:08d}" for i in range(n)]),
            "op": pa.array(["update"] * n),
            "content": pa.array([f"{pad}{i}" for i in range(n)], type=pa.large_string()),
        }
    )
    want = _winner_per_key(ev, ["repo", "path"])
    full_bytes = want.nbytes
    idx = SortedRunIndex(max_rows_in_mem=2_000, spill_dir=str(tmp_path))
    for off in range(0, n, 1_000):
        idx.add(ev.slice(off, 1_000))

    base = pa.total_allocated_bytes()
    rows = 0
    chunks = 0
    peak_retained = 0
    prev_last = None
    for chunk in idx.finish_iter(chunk_rows=1_000):
        rows += chunk.num_rows
        chunks += 1
        # chunks arrive in disjoint ascending key ranges
        first = (chunk["repo"][0].as_py(), chunk["path"][0].as_py())
        m = chunk.num_rows - 1
        last = (chunk["repo"][m].as_py(), chunk["path"][m].as_py())
        if prev_last is not None:
            assert first > prev_last
        prev_last = last
        del chunk
        peak_retained = max(peak_retained, pa.total_allocated_bytes() - base)
    assert chunks > 5
    assert rows == want.num_rows
    assert peak_retained < full_bytes / 3, (peak_retained, full_bytes)
