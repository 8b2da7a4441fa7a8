"""Exactly-once sink, checkpoint/resume, idempotence, schema evolution.

Mirrors the reference's failure-injection tests (ReorderFilesTest.kt:325-352:
mock S3 failing mid-commit, assert full rollback) — here: crash between the
data move and the manifest publish, assert the half-written txn is invisible
and a re-run converges to the byte-identical state.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from ray_cdc_lake.checkpoint import apply_incremental
from ray_cdc_lake.schemas import COMPILED_SCHEMA
from ray_cdc_lake.sink import read_lake, read_manifest, vacuum


def ev_table(rows: list[tuple]) -> pa.Table:
    """rows: (lsn, op, repo, path, content)"""
    return pa.Table.from_arrays(
        [
            pa.array([r[0] for r in rows], type=pa.int64()),
            pa.array([r[1] for r in rows], type=pa.string()),
            pa.array([r[2] for r in rows], type=pa.string()),
            pa.array([r[3] for r in rows], type=pa.string()),
            pa.array([f"c{r[0]:08d}" for r in rows], type=pa.string()),
            pa.array(["py"] * len(rows), type=pa.string()),
            pa.array([r[4] for r in rows], type=pa.large_string()),
        ],
        schema=COMPILED_SCHEMA,
    )


def ev_ds(rows):
    import ray.data as rd

    return rd.from_arrow(ev_table(rows))


def lake_state(lake_dir) -> dict[tuple, tuple]:
    """(repo,path) -> (lsn, content) for live rows."""
    df = read_lake(lake_dir).to_pandas()
    return {
        (r.repo, r.path): (r.lsn, r.content) for r in df.itertuples()
    }


SEG_A = [
    (1, "insert", "r1", "a.py", "A1"),
    (2, "insert", "r1", "b.py", "B1"),
    (3, "insert", "r2", "c.py", "C1"),
    (4, "update", "r1", "a.py", "A2"),
]
SEG_B = [
    (5, "delete", "r1", "b.py", None),
    (6, "update", "r2", "c.py", "C2"),
    (7, "insert", "r1", "d.py", "D1"),
]

EXPECT_A = {("r1", "a.py"): (4, "A2"), ("r1", "b.py"): (2, "B1"), ("r2", "c.py"): (3, "C1")}
EXPECT_AB = {("r1", "a.py"): (4, "A2"), ("r2", "c.py"): (6, "C2"), ("r1", "d.py"): (7, "D1")}


def test_commit_and_read(tmp_path):
    lake = str(tmp_path / "lake")
    m = apply_incremental(lake, "txn-a", ev_ds(SEG_A), num_buckets=4)
    assert m.version == 1 and m.txns == ["txn-a"]
    assert lake_state(lake) == EXPECT_A


def test_incremental_and_idempotent(tmp_path):
    lake = str(tmp_path / "lake")
    apply_incremental(lake, "txn-a", ev_ds(SEG_A), num_buckets=4)
    m2 = apply_incremental(lake, "txn-b", ev_ds(SEG_B), num_buckets=4)
    assert lake_state(lake) == EXPECT_AB
    # committed txn re-run = no-op
    m3 = apply_incremental(lake, "txn-b", ev_ds(SEG_B), num_buckets=4)
    assert m3.version == m2.version
    assert lake_state(lake) == EXPECT_AB


def test_hwm_drops_replayed_events(tmp_path):
    """At-least-once redelivery of already-applied events under a NEW txn id
    must not change state (lsn <= hwm filtered per bucket)."""
    lake = str(tmp_path / "lake")
    apply_incremental(lake, "txn-a", ev_ds(SEG_A), num_buckets=4)
    apply_incremental(lake, "txn-b", ev_ds(SEG_B), num_buckets=4)
    apply_incremental(lake, "txn-c", ev_ds(SEG_A + SEG_B), num_buckets=4)
    assert lake_state(lake) == EXPECT_AB


def test_tombstone_blocks_stale_event(tmp_path):
    """A stale lower-LSN event for a deleted key (late/out-of-order
    delivery in a later segment) must NOT resurrect it — the persisted
    tombstone wins."""
    lake = str(tmp_path / "lake")
    apply_incremental(lake, "txn-a", ev_ds(SEG_A), num_buckets=4)
    apply_incremental(lake, "txn-b", ev_ds(SEG_B), num_buckets=4)
    # lsn=1 stale insert for deleted b.py — but hwm filtering is per
    # bucket, so craft a fresh key bucketed elsewhere to force processing:
    # replay a stale event with lsn *above* no watermark? Instead: send a
    # late event with lsn between delete(5) and hwm — dropped by hwm; and
    # one with lsn above hwm but below the delete cannot exist (lsn is
    # monotone). The realistic late case: duplicate of lsn=2 insert.
    apply_incremental(lake, "txn-d", ev_ds([(2, "insert", "r1", "b.py", "B1")]), num_buckets=4)
    assert lake_state(lake) == EXPECT_AB


def test_crash_before_publish_then_resume(tmp_path):
    lake = str(tmp_path / "lake")
    apply_incremental(lake, "txn-a", ev_ds(SEG_A), num_buckets=4)
    with pytest.raises(RuntimeError, match="injected failure"):
        apply_incremental(
            lake, "txn-b", ev_ds(SEG_B), num_buckets=4, fail_before_publish=True
        )
    # half-written txn invisible
    assert read_manifest(lake).txns == ["txn-a"]
    assert lake_state(lake) == EXPECT_A
    # resume: same txn id, full re-run
    m = apply_incremental(lake, "txn-b", ev_ds(SEG_B), num_buckets=4)
    assert m.txns == ["txn-a", "txn-b"]
    assert lake_state(lake) == EXPECT_AB


def test_vacuum_removes_unreferenced(tmp_path):
    lake = str(tmp_path / "lake")
    apply_incremental(lake, "txn-a", ev_ds(SEG_A), num_buckets=4)
    try:
        apply_incremental(
            lake, "txn-x", ev_ds(SEG_B), num_buckets=4, fail_before_publish=True
        )
    except RuntimeError:
        pass
    # the fresh orphan sits inside the grace window: default vacuum keeps
    # it (it is indistinguishable from a commit between data move and
    # manifest publish); grace_s=0 — the single-writer maintenance
    # window — reclaims it
    assert vacuum(lake) == []
    removed = vacuum(lake, grace_s=0)
    assert any("txn-x" in r for r in removed)
    assert lake_state(lake) == EXPECT_A


def test_schema_evolution_column_add(tmp_path):
    """Segment B adds a 'license' column; prior rows get null backfill
    (pa.unify_schemas analog; reference analog: one model serialized to two
    schema versions, MetsBrowsingModel.kt:10-21)."""
    import ray.data as rd

    lake = str(tmp_path / "lake")
    apply_incremental(lake, "txn-a", ev_ds(SEG_A), num_buckets=4)

    seg_b = ev_table(SEG_B).append_column(
        "license", pa.array(["MIT", "MIT", "Apache-2.0"], type=pa.large_string())
    )
    apply_incremental(lake, "txn-b", rd.from_arrow(seg_b), num_buckets=4)

    df = read_lake(lake).to_pandas().set_index(["repo", "path"])
    assert df.loc[("r2", "c.py"), "license"] == "MIT"
    assert df.loc[("r1", "d.py"), "license"] == "Apache-2.0"
    import pandas as pd

    assert pd.isna(df.loc[("r1", "a.py"), "license"])


def test_sort_order_compaction(tmp_path):
    """compact(sort=True): identical live state, and every output file is
    internally sorted by (repo, path) with DISJOINT per-file key ranges
    inside each bucket — the manifest min/max become exact intervals, so
    point/range pruning needs no bloom fallback."""
    import os

    import pyarrow.parquet as pq

    from ray_cdc_lake.checkpoint import compact

    lake = str(tmp_path / "lake")
    # many keys across several txns so buckets hold interleaved runs
    rows1 = [(i + 1, "insert", f"r{i % 5}", f"f{i:03d}.py", f"v{i}") for i in range(60)]
    rows2 = [(100 + i, "update", f"r{i % 5}", f"f{i:03d}.py", f"w{i}") for i in range(0, 60, 3)]
    apply_incremental(lake, "txn-a", ev_ds(rows1), num_buckets=4)
    apply_incremental(lake, "txn-b", ev_ds(rows2), num_buckets=4)
    before = lake_state(lake)

    m = compact(lake, sort=True)
    assert lake_state(lake) == before
    for b, info in read_manifest(lake).buckets.items():
        spans = []
        for fstat in info["files"]:
            fpath = os.path.join(lake, "data", info["txn_id"], f"bucket={b}", fstat["name"])
            t = pq.read_table(fpath, columns=["repo", "path"])
            keys = list(zip(t["repo"].to_pylist(), t["path"].to_pylist()))
            assert keys == sorted(keys), f"bucket {b} file {fstat['name']} unsorted"
            spans.append((keys[0], keys[-1]))
        spans.sort()
        for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
            assert hi1 <= lo2, f"bucket {b}: overlapping file key ranges"
    # point lookups on the sorted layout
    assert read_lake(lake).count() == len(before)


def test_compaction_preserves_state(tmp_path):
    """compact() rewrites the lake as one txn: identical live state,
    identical watermarks, old txn dirs gone, stale events still rejected
    afterwards (tombstones survive compaction)."""
    import os

    from ray_cdc_lake.checkpoint import compact

    lake = str(tmp_path / "lake")
    apply_incremental(lake, "txn-a", ev_ds(SEG_A), num_buckets=4)
    apply_incremental(lake, "txn-b", ev_ds(SEG_B), num_buckets=4)
    before = lake_state(lake)
    hwm_before = read_manifest(lake).hwm()

    m = compact(lake, num_buckets=4)
    assert len(m.txns) == 1 and m.txns[0].startswith("compact-")
    assert lake_state(lake) == before == EXPECT_AB
    assert read_manifest(lake).hwm() == hwm_before
    data_dirs = os.listdir(os.path.join(lake, "data"))
    assert data_dirs == m.txns

    # a stale event (lsn below the watermark) must still be a no-op:
    # the tombstone for b.py survived compaction
    stale = [(4, "insert", "r1", "b.py", "B-stale")]
    apply_incremental(lake, "txn-c", ev_ds(stale), num_buckets=4)
    assert lake_state(lake) == EXPECT_AB


def test_schema_evolution_retype_promotion(tmp_path):
    """Segment B re-delivers an int column as float (type widening); the
    conform step promotes prior int rows to the NEW type (new wins on
    retype, checkpoint.apply_incremental)."""
    import ray.data as rd

    lake = str(tmp_path / "lake")
    seg_a = ev_table(SEG_A).append_column(
        "size_bytes", pa.array([10, 20, 30, 40], type=pa.int64())
    )
    apply_incremental(lake, "txn-a", rd.from_arrow(seg_a), num_buckets=4)

    seg_b = ev_table(SEG_B).append_column(
        "size_bytes", pa.array([5.5, 6.5, 7.5], type=pa.float64())
    )
    apply_incremental(lake, "txn-b", rd.from_arrow(seg_b), num_buckets=4)

    t = read_lake(lake).to_pandas().set_index(["repo", "path"])
    assert str(t["size_bytes"].dtype) == "float64"
    assert t.loc[("r1", "a.py"), "size_bytes"] == 40.0  # promoted int row
    assert t.loc[("r2", "c.py"), "size_bytes"] == 6.5


def test_empty_bootstrap_txn_reads_as_empty_lake(tmp_path):
    """A first micro-batch with ZERO events still publishes its txn (the
    tail's offset bookkeeping needs the manifest) and the lake then reads
    as an EMPTY dataset with the lake row schema — not FileNotFoundError.
    A lake with no manifest at all still raises."""
    lake = str(tmp_path / "lake")
    with pytest.raises(FileNotFoundError):
        read_lake(lake)

    m = apply_incremental(lake, "txn-empty", ev_ds([]), num_buckets=4)
    assert m.txns == ["txn-empty"]
    assert m.metrics["txn-empty"]["applied_rows"] == 0

    ds = read_lake(lake)
    assert ds.count() == 0
    assert set(read_lake(lake, columns=["repo", "path"]).schema().names) == {
        "repo",
        "path",
    }

    # a later real apply proceeds normally on top of the empty bootstrap
    apply_incremental(lake, "txn-a", ev_ds(SEG_A), num_buckets=4)
    assert lake_state(lake) == EXPECT_A


def test_schema_evolution_incompatible_retype_fails_loudly(tmp_path):
    """An UNCASTABLE retype (string values like 'abc' re-delivered as int)
    must fail the apply with an Arrow cast error — never commit silently
    corrupted data. The committed lake stays at its pre-apply state."""
    import pytest
    import ray.data as rd

    lake = str(tmp_path / "lake")
    seg_a = ev_table(SEG_A).append_column(
        "tag", pa.array(["abc", "def", "ghi", "jkl"], type=pa.large_string())
    )
    apply_incremental(lake, "txn-a", rd.from_arrow(seg_a), num_buckets=4)
    before = lake_state(lake)

    seg_b = ev_table(SEG_B).append_column(
        "tag", pa.array([1, 2, 3], type=pa.int64())  # new wins -> cast 'abc' to int
    )
    with pytest.raises(Exception) as ei:
        apply_incremental(lake, "txn-b", rd.from_arrow(seg_b), num_buckets=4)
    assert "convert" in str(ei.value).lower() or "cast" in str(ei.value).lower()
    # exactly-once: the failed txn published nothing
    assert lake_state(lake) == before


def test_commit_conflict_detected(tmp_path):
    """Optimistic concurrency: a second writer claiming the same manifest
    version with DIFFERENT content must get CommitConflict; its staged
    data stays unreferenced."""
    import json
    import os

    import pytest

    from ray_cdc_lake.sink import CommitConflict, Manifest, _publish

    lake = str(tmp_path / "lake")
    apply_incremental(lake, "txn-a", ev_ds(SEG_A), num_buckets=4)

    # another writer publishes version 2 behind our back
    rogue = Manifest(version=2, buckets={}, txns=["rogue-txn"])
    _publish(lake, rogue)
    # our own CURRENT view is stale at version 1; applying computes v2 too
    cur = os.path.join(lake, "_manifests", "CURRENT")
    with open(cur + ".t", "w") as f:
        f.write("1")
    os.replace(cur + ".t", cur)

    with pytest.raises(CommitConflict):
        apply_incremental(lake, "txn-b", ev_ds(SEG_B), num_buckets=4)


def test_crashed_publish_retry_finishes_pointer(tmp_path):
    """Crash AFTER the manifest version is claimed but BEFORE the CURRENT
    pointer moves: retrying the identical publish must finish cleanly
    (identical content = our own earlier attempt)."""
    import os

    from ray_cdc_lake.sink import read_manifest

    lake = str(tmp_path / "lake")
    apply_incremental(lake, "txn-a", ev_ds(SEG_A), num_buckets=4)
    m1 = apply_incremental(lake, "txn-b", ev_ds(SEG_B), num_buckets=4)
    assert m1.version == 2

    # simulate the crash window: roll CURRENT back while manifest-2 stays
    cur = os.path.join(lake, "_manifests", "CURRENT")
    with open(cur + ".t", "w") as f:
        f.write("1")
    os.replace(cur + ".t", cur)
    assert read_manifest(lake).version == 1

    # idempotent re-run of txn-b re-derives the identical manifest v2
    m2 = apply_incremental(lake, "txn-b", ev_ds(SEG_B), num_buckets=4)
    assert m2.version == 2
    assert read_manifest(lake).version == 2
    assert lake_state(lake) == EXPECT_AB


def test_compaction_to_fewer_buckets(tmp_path):
    """Re-bucketing to fewer buckets during compaction must not leave
    manifest entries pointing at vacuumed txn dirs (regression: stale
    buckets crashed the next read with FileNotFoundError)."""
    from ray_cdc_lake.checkpoint import compact

    lake = str(tmp_path / "lake")
    apply_incremental(lake, "txn-a", ev_ds(SEG_A), num_buckets=8)
    apply_incremental(lake, "txn-b", ev_ds(SEG_B), num_buckets=8)
    before = lake_state(lake)

    m = compact(lake, num_buckets=2)
    assert all(info["txn_id"] == m.txns[0] for info in m.buckets.values())
    assert lake_state(lake) == before == EXPECT_AB
    # and the lake still accepts increments at the new bucketing
    apply_incremental(lake, "txn-c", ev_ds([(8, "insert", "r3", "e.py", "E1")]),
                      num_buckets=2)
    assert lake_state(lake)[("r3", "e.py")] == (8, "E1")


def test_tail_replay_resumes_from_persisted_binlog(tmp_path):
    """Crash after the binlog is committed but before (all) txns applied:
    a re-run must READ the persisted segments (no re-derive) and converge
    to the byte-identical state; leftover binlog STAGING from a crash
    mid-write must be discarded, not trusted."""
    import os
    import shutil

    from ray_cdc_lake.pipeline import tail_replay

    sf = "/root/testdata/sf0.001"
    lake_full = str(tmp_path / "full")
    txns = tail_replay(lake_full, sf, micro_batches=4)
    assert len(txns) >= 2
    want = lake_state(lake_full)

    # scenario 1: crash mid-binlog-write left only the staging dir
    lake1 = str(tmp_path / "staging-crash")
    os.makedirs(os.path.join(lake1, "_binlog.staging", "segment=0"))
    tail_replay(lake1, sf, micro_batches=4)
    assert not os.path.exists(os.path.join(lake1, "_binlog.staging"))
    assert lake_state(lake1) == want

    # scenario 2: binlog committed, then crash before any txn applied —
    # wipe the lake's manifests/data but keep the binlog; the resume path
    # must apply every window from the SEGMENTS on disk
    lake2 = str(tmp_path / "apply-crash")
    tail_replay(lake2, sf, micro_batches=4)
    shutil.rmtree(os.path.join(lake2, "_manifests"))
    shutil.rmtree(os.path.join(lake2, "data"))
    derive_sentinel = os.path.join(lake2, "_binlog", "SENTINEL")
    with open(derive_sentinel, "w") as f:
        f.write("re-derive would wipe this file's directory")
    tail_replay(lake2, sf, micro_batches=4)
    assert os.path.exists(derive_sentinel)  # segments were REUSED
    assert lake_state(lake2) == want


def test_tail_replay_rerun_is_noop(tmp_path):
    """Re-running a completed tail is pure idempotence: same txn ids, no
    state change (at-least-once delivery of the whole tail)."""
    from ray_cdc_lake.pipeline import tail_replay

    sf = "/root/testdata/sf0.001"
    lake = str(tmp_path / "lake")
    t1 = tail_replay(lake, sf, micro_batches=3)
    s1 = lake_state(lake)
    v1 = read_manifest(lake).version
    t2 = tail_replay(lake, sf, micro_batches=3)
    assert t1 == t2
    assert lake_state(lake) == s1
    assert read_manifest(lake).version == v1


def test_delete_by_prefix_sibling_guard(tmp_path):
    """The trailing-slash guard (DeleteAllS3ObjectsByPrefix.kt:116-117):
    deleting prefix 'r/a' must remove r/a/* but never the sibling
    r/ab/*; re-running the same delete txn is a no-op."""
    from ray_cdc_lake.checkpoint import delete_by_prefix

    lake = str(tmp_path / "lake")
    rows = [
        (1, "insert", "r1", "r/a/one.py", "A"),
        (2, "insert", "r1", "r/a/two.py", "B"),
        (3, "insert", "r1", "r/ab/three.py", "C"),
        (4, "insert", "r1", "other.py", "D"),
    ]
    apply_incremental(lake, "txn-seed", ev_ds(rows), num_buckets=4)
    delete_by_prefix(lake, "r/a", "txn-del", num_buckets=4)
    got = set(lake_state(lake))
    assert got == {("r1", "r/ab/three.py"), ("r1", "other.py")}
    # idempotent re-delivery of the same delete txn
    m = delete_by_prefix(lake, "r/a", "txn-del", num_buckets=4)
    assert set(lake_state(lake)) == got
    assert m.txns.count("txn-del") == 1


def test_point_lookup_read_key(tmp_path):
    """read_key: one-bucket, predicate-pushdown point read — live rows
    found, deleted rows None, absent keys None; agrees with the full
    lake state for every key."""
    from ray_cdc_lake.sink import read_key

    lake = str(tmp_path / "lake")
    apply_incremental(lake, "txn-a", ev_ds(SEG_A), num_buckets=4)
    apply_incremental(lake, "txn-b", ev_ds(SEG_B), num_buckets=4)
    state = lake_state(lake)
    for (repo, path), (lsn, content) in state.items():
        row = read_key(lake, repo, path, num_buckets=4)
        assert row is not None
        assert (row["lsn"], row["content"]) == (lsn, content)
    # deleted key (tombstoned in SEG_B)
    assert read_key(lake, "r1", "b.py", num_buckets=4) is None
    # never-existing key
    assert read_key(lake, "r9", "nope.py", num_buckets=4) is None


def test_maybe_compact_threshold(tmp_path):
    from ray_cdc_lake.checkpoint import maybe_compact

    lake = str(tmp_path / "lake")
    apply_incremental(lake, "txn-a", ev_ds(SEG_A), num_buckets=4)
    apply_incremental(lake, "txn-b", ev_ds(SEG_B), num_buckets=4)
    before = lake_state(lake)
    assert maybe_compact(lake, max_txns=5, num_buckets=4) is None  # under
    m = maybe_compact(lake, max_txns=1, num_buckets=4)  # over threshold
    assert m is not None and len(m.txns) == 1
    assert lake_state(lake) == before


def test_read_key_with_sparse_top_bucket(tmp_path):
    """Few keys + many buckets: the highest-index bucket is almost surely
    empty, so modulus inference from occupied buckets would be wrong —
    the manifest now records num_buckets and every live key must resolve."""
    from ray_cdc_lake.sink import read_key

    lake = str(tmp_path / "lake")
    apply_incremental(lake, "txn-a", ev_ds(SEG_A), num_buckets=64)
    m = read_manifest(lake)
    assert m.num_buckets == 64
    assert len(m.buckets) < 64  # the sparse case that broke inference
    for (repo, path), (lsn, content) in lake_state(lake).items():
        row = read_key(lake, repo, path)  # NO explicit num_buckets
        assert row is not None and row["lsn"] == lsn


def test_apply_rejects_mismatched_bucket_modulus(tmp_path):
    """Applying with a different num_buckets than the lake was committed
    with would re-bucket keys into new ids while the manifest keeps the
    old entries — every key would read back twice. The apply must refuse
    loudly and point at compact() for re-bucketing."""
    lake = str(tmp_path / "lake")
    apply_incremental(lake, "txn-1", ev_ds(SEG_A), num_buckets=4)
    with pytest.raises(ValueError, match="num_buckets"):
        apply_incremental(lake, "txn-2", ev_ds(SEG_B), num_buckets=8)
    # same modulus still applies fine
    apply_incremental(lake, "txn-2", ev_ds(SEG_B), num_buckets=4)
    assert lake_state(lake) == EXPECT_AB


def test_change_feed_images_and_versions(tmp_path):
    """change_feed emits the Delta-CDF row set: insert/delete rows carry
    the row image, updates emit pre+post images, and every row is stamped
    with the manifest version whose commit produced it. Keys untouched by
    a version step never appear in that step's slice."""
    from ray_cdc_lake.checkpoint import change_feed

    lake = str(tmp_path / "lake")
    apply_incremental(lake, "t1", ev_ds(SEG_A))  # -> version 1
    apply_incremental(lake, "t2", ev_ds(SEG_B))  # -> version 2
    seg_c = [(8, "update", "r1", "d.py", "D2")]
    apply_incremental(lake, "t3", ev_ds(seg_c))  # -> version 3

    feed = change_feed(lake, 1, 3).to_pandas().to_dict("records")
    rows = {
        (r["repo"], r["path"], r["_change_type"], r["_commit_version"]): r
        for r in feed
    }
    assert len(rows) == len(feed)  # no duplicate change rows

    # v1 -> v2: delete carries the LAST LIVE image
    d = rows[("r1", "b.py", "delete", 2)]
    assert d["content"] == "B1" and d["lsn"] == 2
    # update: pre-image = old winner, post-image = new winner
    assert rows[("r2", "c.py", "update_preimage", 2)]["content"] == "C1"
    assert rows[("r2", "c.py", "update_postimage", 2)]["content"] == "C2"
    assert rows[("r1", "d.py", "insert", 2)]["content"] == "D1"
    # v2 -> v3: only d.py changed
    assert rows[("r1", "d.py", "update_preimage", 3)]["content"] == "D1"
    assert rows[("r1", "d.py", "update_postimage", 3)]["content"] == "D2"
    assert sum(1 for k in rows if k[3] == 2) == 4
    assert sum(1 for k in rows if k[3] == 3) == 2
    # a.py never changed after v1 -> absent from the feed entirely
    assert not any(k[1] == "a.py" for k in rows)

    with pytest.raises(ValueError, match="from_version"):
        change_feed(lake, 2, 2)


def test_delete_where_metadata_only_and_point_lookup(tmp_path):
    """delete_where commits a predicate-delete FILE: no data rewrite (all
    bucket owners unchanged), matching rows gone from scans and point
    lookups immediately, idempotent under the same txn id, and pinned
    pre-delete snapshots unaffected."""
    from ray_cdc_lake.sink import delete_where, read_key

    lake = str(tmp_path / "lake")
    apply_incremental(lake, "t1", ev_ds(SEG_A))
    m1 = read_manifest(lake)

    m2 = delete_where(lake, "del-r1", "repo", "==", "r1")
    owners = lambda m: {b: i["txn_id"] for b, i in m.buckets.items()}  # noqa: E731
    assert owners(m2) == owners(m1)  # metadata-only: zero data files touched
    st = lake_state(lake)
    assert all(repo != "r1" for repo, _ in st) and ("r2", "c.py") in st
    assert read_key(lake, "r1", "a.py") is None
    assert read_key(lake, "r2", "c.py") is not None
    # column-pruned reads still apply the delete
    repos = set(
        read_lake(lake, columns=["content"]).to_pandas()["content"]
    )
    assert repos == {"C1"}
    # idempotent re-delivery
    assert delete_where(lake, "del-r1", "repo", "==", "r1").version == m2.version
    # the pinned pre-delete snapshot still shows r1 (immutable manifests)
    v1 = read_lake(lake, version=1).to_pandas()
    assert "r1" in set(v1["repo"])
    with pytest.raises(ValueError, match="op"):
        delete_where(lake, "del-x", "repo", "<", "r1")
    with pytest.raises(ValueError, match="separator"):
        delete_where(lake, "a--b", "repo", "==", "r1")


def test_delete_where_later_upsert_survives(tmp_path):
    """Iceberg-v2 sequencing: a delete file applies only to data older
    than itself. A later apply rewrites its buckets with the delete
    materialized, deactivating the entry there — so a fresh upsert of a
    matching key survives while untouched matching rows stay deleted."""
    from ray_cdc_lake.sink import delete_where

    lake = str(tmp_path / "lake")
    apply_incremental(lake, "t1", ev_ds(SEG_A), num_buckets=1)
    delete_where(lake, "del-r1", "repo", "==", "r1")
    apply_incremental(
        lake, "t2", ev_ds([(10, "insert", "r1", "a.py", "A3")]), num_buckets=1
    )
    st = lake_state(lake)
    assert st[("r1", "a.py")] == (10, "A3")  # re-insert wins over old delete
    assert ("r1", "b.py") not in st  # deleted before the rewrite, stays gone
    assert st[("r2", "c.py")] == (3, "C1")
    # the single bucket was rewritten -> the entry is fully inactive & pruned
    assert read_manifest(lake).deletes == []


def test_delete_where_prefix_and_compact_materializes(tmp_path):
    """prefix predicates; compact() rewrites every bucket with deletes
    applied and clears the manifest's delete list; state is preserved."""
    from ray_cdc_lake.checkpoint import compact
    from ray_cdc_lake.sink import delete_where

    lake = str(tmp_path / "lake")
    apply_incremental(lake, "t1", ev_ds(SEG_A))
    apply_incremental(lake, "t2", ev_ds(SEG_B))
    delete_where(lake, "del-a-prefix", "path", "prefix", "a.")
    before = lake_state(lake)
    assert ("r1", "a.py") not in before and ("r1", "d.py") in before
    assert read_manifest(lake).deletes  # still merge-on-read
    compact(lake)
    assert read_manifest(lake).deletes == []  # materialized
    assert lake_state(lake) == before


def test_write_audit_publish_pass_and_fail(tmp_path):
    """WAP: a passing audit publishes exactly the direct-apply state and
    leaves no branch behind; a failing audit leaves main byte-identical,
    drops the staging branch, and the staged files are vacuumable."""
    from ray_cdc_lake.checkpoint import AuditFailed, write_audit_publish
    from ray_cdc_lake.sink import list_branches, vacuum

    lake = str(tmp_path / "lake")
    apply_incremental(lake, "t1", ev_ds(SEG_A))

    # audit pass -> published, equals the direct-apply expectation
    write_audit_publish(lake, "t2", ev_ds(SEG_B), audit=lambda ds: True)
    assert lake_state(lake) == EXPECT_AB
    assert list(list_branches(lake)) == ["main"]
    published = read_manifest(lake)

    # idempotent re-run of a published txn: no-op
    write_audit_publish(lake, "t2", ev_ds(SEG_B), audit=lambda ds: False)
    assert read_manifest(lake).version == published.version

    # audit fail -> main untouched, branch gone, staged data unreferenced
    bad = [(20, "update", "r1", "a.py", "BAD")]
    with pytest.raises(AuditFailed):
        write_audit_publish(lake, "t3", ev_ds(bad), audit=lambda ds: False)
    assert lake_state(lake) == EXPECT_AB
    assert read_manifest(lake).version == published.version
    assert list(list_branches(lake)) == ["main"]
    # default vacuum KEEPS the fresh leftovers (orphan grace window —
    # they could be a concurrent writer mid-stage); grace_s=0 reclaims
    assert vacuum(lake) == []
    assert any("t3" in d for d in vacuum(lake, grace_s=0))  # staged files dropped

    # audit that RAISES is a fail too, with the same guarantees
    def exploding(ds):
        raise RuntimeError("bad batch")

    with pytest.raises(AuditFailed, match="bad batch"):
        write_audit_publish(lake, "t4", ev_ds(bad), audit=exploding)
    assert lake_state(lake) == EXPECT_AB

    # a leftover staging branch from a crashed attempt is discarded
    from ray_cdc_lake.sink import create_branch

    create_branch(lake, "wap-audit")
    write_audit_publish(
        lake, "t5", ev_ds([(21, "update", "r1", "a.py", "A9")]), audit=lambda ds: True
    )
    st = lake_state(lake)
    assert st[("r1", "a.py")] == (21, "A9")
    assert list(list_branches(lake)) == ["main"]


def test_manifest_file_stats_prune_point_lookup(tmp_path):
    """Commits record per-file (repo, path, lsn) ranges in the manifest;
    read_key plans from the manifest alone (no dir listing) and prunes
    files whose recorded key range cannot contain the key; read_lake
    enumerates files without LIST calls. Legacy manifests (stats stripped)
    still work via the listdir fallback."""
    import json as _json

    from ray_cdc_lake.sink import LakeStore, read_key

    class CountingStore(LakeStore):
        def __init__(self):
            super().__init__()
            self.listdir_calls = 0

        def listdir(self, path):
            self.listdir_calls += 1
            return super().listdir(path)

    lake = str(tmp_path / "lake")
    apply_incremental(lake, "t1", ev_ds(SEG_A))
    m = read_manifest(lake)
    for info in m.buckets.values():
        assert info["files"], "per-file stats missing from manifest"
        f = info["files"][0]
        assert f["repo_min"] <= f["repo_max"] and f["lsn_min"] >= 0

    store = CountingStore()
    row = read_key(lake, "r1", "a.py", store=store)
    assert row is not None and row["lsn"] == 4
    assert store.listdir_calls == 0  # planned purely from the manifest
    assert read_key(lake, "zz", "nope.py", store=store) is None

    # strip the stats (legacy manifest) -> fallback still answers
    mpath = None
    for fn in sorted((tmp_path / "lake" / "_manifests").iterdir()):
        if fn.name.startswith("manifest-"):
            mpath = fn
    d = _json.loads(mpath.read_text())
    for info in d["buckets"].values():
        info.pop("files")
    mpath.write_text(_json.dumps(d))
    store2 = CountingStore()
    row = read_key(lake, "r1", "a.py", store=store2)
    assert row is not None and row["lsn"] == 4
    assert store2.listdir_calls > 0
    assert lake_state(lake) == {
        ("r1", "a.py"): (4, "A2"),
        ("r1", "b.py"): (2, "B1"),
        ("r2", "c.py"): (3, "C1"),
    }


def test_version_at_lsn_binary_search(tmp_path):
    """Log-position time travel: version_at_lsn resolves an lsn to the
    largest version whose watermark is at or below it; read_lake
    asof_lsn= returns that snapshot."""
    import pytest
    import ray.data as rd

    from ray_cdc_lake.sink import version_at_lsn

    lake = str(tmp_path / "lake")
    apply_incremental(lake, "t1", ev_ds(SEG_A), num_buckets=4)  # hwm 4
    apply_incremental(lake, "t2", ev_ds(SEG_B), num_buckets=4)  # hwm 7
    apply_incremental(
        lake,
        "t3",
        ev_ds([(9, "insert", "r3", "z.py", "Z")]),
        num_buckets=4,
    )  # hwm 9

    assert version_at_lsn(lake, 4) == 1
    assert version_at_lsn(lake, 6) == 1  # mid-window: t2 is already past
    assert version_at_lsn(lake, 7) == 2
    assert version_at_lsn(lake, 8) == 2
    assert version_at_lsn(lake, 10**9) == 3
    with pytest.raises(ValueError, match="at or below"):
        version_at_lsn(lake, 3)

    df = read_lake(lake, asof_lsn=7).to_pandas()
    assert set(zip(df["repo"], df["path"])) == {
        ("r1", "a.py"), ("r2", "c.py"), ("r1", "d.py"),
    }
    with pytest.raises(ValueError, match="not both"):
        read_lake(lake, version=1, asof_lsn=7)

    # a TRIMMED chain (expire_snapshots) resolves within the retained
    # window and refuses expired offsets explicitly
    from ray_cdc_lake.sink import expire_snapshots

    expire_snapshots(lake, keep_last=2)  # versions 2..3 retained
    assert version_at_lsn(lake, 8) == 2
    with pytest.raises(ValueError, match="expired"):
        version_at_lsn(lake, 5)


def test_on_invalid_gate_drop_and_raise(tmp_path):
    """The ingest validation gate: malformed events (null key/lsn,
    unknown op) either fail the apply loudly or are dropped and counted
    in the txn's ingest metrics; valid rows apply unchanged."""
    import ray.data as rd

    poison = pa.Table.from_arrays(
        [
            pa.array([100, None, 102, 103], type=pa.int64()),
            pa.array(["insert", "insert", "frobnicate", "insert"], type=pa.string()),
            pa.array(["rp", "rp", "rp", None], type=pa.string()),
            pa.array(["p0", "p1", "p2", "p3"], type=pa.string()),
            pa.array(["cA", "cB", "cC", "cD"], type=pa.string()),
            pa.array(["py"] * 4, type=pa.string()),
            pa.array(["P0", "P1", "P2", "P3"], type=pa.large_string()),
        ],
        schema=COMPILED_SCHEMA,
    )
    mixed = pa.concat_tables([ev_table(SEG_A), poison])

    lake = str(tmp_path / "strict")
    with pytest.raises(Exception, match="invalid event rows"):
        apply_incremental(
            lake, "t1", rd.from_arrow(mixed), num_buckets=4, on_invalid="raise"
        )

    lake = str(tmp_path / "dlq")
    apply_incremental(
        lake, "t1", rd.from_arrow(mixed), num_buckets=4, on_invalid="drop"
    )
    state = lake_state(lake)
    assert state == {**EXPECT_A, ("rp", "p0"): (100, "P0")}  # valid rows in
    m = read_manifest(lake)
    assert m.metrics["t1"]["applied_invalid_dropped"] == 3
    assert m.metrics["t1"]["applied_rows"] == len(state)

    # default (None): trusts the input, records no gate metric
    lake2 = str(tmp_path / "trusting")
    apply_incremental(lake2, "t1", ev_ds(SEG_A), num_buckets=4)
    assert "applied_invalid_dropped" not in read_manifest(lake2).metrics["t1"]


def test_payload_column_bounds_truncated_and_prune(tmp_path):
    """Commits record Iceberg-style truncated min/max for PAYLOAD columns
    (commit, lang, content, evolved adds) — lower bound a prefix, upper
    bound rounded up past the truncation point — so scan ``ranges=`` on
    any column can file-prune, while key columns keep exact bounds."""
    from ray_cdc_lake.sink import (
        _bound_upper,
        _plan_scan,
        read_manifest as _rm,
    )

    # pure-function bound semantics first
    assert _bound_upper("short") == "short"
    assert _bound_upper("a" * 40) == "a" * 15 + "b"  # rounded UP at the cap
    assert _bound_upper(chr(0x10FFFF) * 40) is None  # nothing to round to
    assert _bound_upper(7) == 7

    rows = [(i + 1, "insert", f"r{i}", f"f{i}.py", "x" * 40) for i in range(8)]
    rows.append((100, "insert", "rHI", "hi.py", "HI"))
    lake = str(tmp_path / "lake")
    apply_incremental(lake, "t1", ev_ds(rows), num_buckets=4)

    m = read_manifest(lake)
    low_only = 0
    for info in m.buckets.values():
        for f in info["files"]:
            # payload bounds present and truncated; key bounds exact
            assert f["lang_min"] == "py" and f["lang_max"] == "py"
            assert len(f["content_min"]) <= 16 and f["content_min"] == f[
                "content_min"
            ][:16]
            if f["content_max"].startswith("x"):
                assert f["content_max"] == "x" * 15 + "y"  # rounded up
            assert f["commit_min"].startswith("c")
            if f["commit_max"] < "c00000100":
                low_only += 1
    assert low_only >= 1, "expected at least one bucket without the hi row"

    # file pruning on a payload column: the commit range selecting only
    # the high row skips every low-only file with zero storage reads
    _, acct = _plan_scan(m, lake, {"commit": ("c00000100", None)})
    assert acct["files_pruned"] == low_only

    df = read_lake(lake, ranges={"commit": ("c00000100", None)}).to_pandas()
    assert set(df["repo"]) == {"rHI"}
    # conservative despite truncation: an exact long-content probe still
    # finds its row (the rounded-up upper bound keeps the file)
    df = read_lake(lake, ranges={"content": ("x" * 40, "x" * 40)}).to_pandas()
    assert len(df) == 8 and set(df["content"]) == {"x" * 40}


def test_touched_bucket_pruning_skips_untouched(tmp_path):
    """An incremental apply rewrites ONLY the buckets its micro-batch
    lands in: untouched buckets keep their previous manifest entry
    (txn_id unchanged — zero copy-on-write I/O for them), and the final
    state is identical to what a full-merge apply produces."""
    lake = str(tmp_path / "lake")
    # seed: spread keys over many buckets so a one-key delta can't touch all
    seed = [(i, "insert", f"r{i}", f"f{i}.py", f"S{i}") for i in range(1, 33)]
    apply_incremental(lake, "txn-0001", ev_ds(seed), num_buckets=16)
    m1 = read_manifest(lake)
    assert len(m1.buckets) > 1

    # delta: one key update -> exactly one touched bucket
    apply_incremental(lake, "txn-0002", ev_ds([(100, "update", "r1", "f1.py", "S1b")]))
    m2 = read_manifest(lake)
    rewritten = [b for b, info in m2.buckets.items() if info["txn_id"] == "txn-0002"]
    untouched = [b for b, info in m2.buckets.items() if info["txn_id"] == "txn-0001"]
    assert len(rewritten) == 1
    assert len(untouched) == len(m1.buckets) - len(rewritten) + (
        0 if set(rewritten) <= set(m1.buckets) else 1
    )
    # untouched buckets keep their entries verbatim (same files, same hwm)
    for b in untouched:
        assert m2.buckets[b] == m1.buckets[b]

    st = lake_state(lake)
    assert st[("r1", "f1.py")] == (100, "S1b")
    assert len(st) == 32

    # empty post-watermark delta (pure re-delivery): metadata-only commit
    apply_incremental(lake, "txn-0003", ev_ds([(100, "update", "r1", "f1.py", "S1b")]))
    m3 = read_manifest(lake)
    assert "txn-0003" in m3.txns
    assert all(info["txn_id"] != "txn-0003" for info in m3.buckets.values())
    assert lake_state(lake) == st


def test_touched_bucket_pruning_matches_full_merge_with_tombstones(tmp_path):
    """Pruned applies and full-lake merges converge to byte-identical
    state across a mixed insert/update/delete tail (tombstone in one
    bucket must not disturb other buckets' entries)."""
    lake_a = str(tmp_path / "pruned")
    lake_b = str(tmp_path / "onetxn")
    segs = [SEG_A, SEG_B, [(8, "update", "r1", "d.py", "D2"), (9, "insert", "r3", "e.py", "E1")]]
    for i, seg in enumerate(segs):
        apply_incremental(lake_a, f"txn-{i:04d}", ev_ds(seg), num_buckets=8)
    apply_incremental(
        lake_b, "txn-all", ev_ds([r for s in segs for r in s]), num_buckets=8
    )
    assert lake_state(lake_a) == lake_state(lake_b)
