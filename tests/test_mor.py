"""Merge-on-read delta applies (apply_incremental(mode="mor")).

The write path commits a micro-batch's OWN winners as manifest delta
entries — O(delta) bytes, never the touched buckets' bases — and readers
merge base + deltas LWW at scan time. Reference analog: the same
"latest batch wins" rename semantics as the COW path
(RenameDiskUtils.kt:32-105), re-sequenced Iceberg-v2-style so commit
cost is independent of bucket size. Every test here asserts the merged
read state is IDENTICAL to what the copy-on-write path produces.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from ray_cdc_lake.checkpoint import apply_incremental, compact_deltas, maybe_compact
from ray_cdc_lake.schemas import COMPILED_SCHEMA
from ray_cdc_lake.sink import (
    delete_where,
    expire_snapshots,
    read_key,
    read_lake,
    read_manifest,
)


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


def apply_seg(lake, txn, rows, mode, **kw):
    return apply_incremental(
        lake, txn, ev_ds(rows), events_schema=COMPILED_SCHEMA, mode=mode, **kw
    )


def state(lake, **kw) -> list[tuple]:
    df = read_lake(lake, **kw).to_pandas()
    return sorted(
        (r.repo, r.path, int(r.lsn), r.content) for r in df.itertuples()
    )


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
SEG_C = [
    (8, "update", "r1", "d.py", "D2"),
    (9, "insert", "r3", "e.py", "E1"),
]


def build(tmp_path, mode: str, name: str) -> str:
    lake = str(tmp_path / name)
    apply_seg(lake, "t1", SEG_A, mode, num_buckets=4)
    apply_seg(lake, "t2", SEG_B, mode)
    apply_seg(lake, "t3", SEG_C, mode)
    return lake


def test_mor_state_equals_cow(tmp_path):
    cow = build(tmp_path, "cow", "cow")
    mor = build(tmp_path, "mor", "mor")
    assert state(mor) == state(cow)
    # tombstones visible with live_only=False in both
    assert state(mor, live_only=False) == state(cow, live_only=False)


def test_mor_manifest_shape(tmp_path):
    mor = build(tmp_path, "mor", "mor")
    m = read_manifest(mor)
    assert any(m.deltas.values())
    # first commit is the base everywhere; deltas only on existing buckets
    assert set(m.deltas) <= set(m.buckets)
    for b, es in m.deltas.items():
        # the base is whichever txn FIRST wrote the bucket; the chain
        # holds strictly later txns, in commit order
        base = m.buckets[b]["txn_id"]
        chain = [e["txn_id"] for e in es]
        assert base not in chain
        assert chain == sorted(chain)  # t1 < t2 < t3 commit order
    # watermark covers the delta chain, not just the base
    assert max(m.hwm().values()) == 9


def test_mor_idempotent_and_hwm_dedup(tmp_path):
    mor = build(tmp_path, "mor", "mor")
    before = state(mor)
    v = read_manifest(mor).version
    # same txn id: no-op
    apply_seg(mor, "t3", SEG_C, "mor")
    assert read_manifest(mor).version == v
    # redelivery under a NEW txn id: hwm dedup drops every row (an empty
    # delta txn still publishes — exactly-once ledger records it)
    apply_seg(mor, "t3-redeliver", SEG_B + SEG_C, "mor")
    assert state(mor) == before


def test_mor_point_lookup_through_chain(tmp_path):
    mor = build(tmp_path, "mor", "mor")
    assert read_key(mor, "r1", "d.py")["content"] == "D2"  # delta of t3
    assert read_key(mor, "r1", "a.py")["content"] == "A2"  # base only
    assert read_key(mor, "r1", "b.py") is None  # tombstone in delta
    assert read_key(mor, "nope", "zz.py") is None


def test_mor_time_travel(tmp_path):
    mor = build(tmp_path, "mor", "mor")
    v2 = read_manifest(mor).version - 1  # before t3's delta
    s = state(mor, version=v2)
    assert ("r1", "d.py", 7, "D1") in s
    assert all(r[2] < 8 for r in s)


def test_mor_columns_ranges_buckets(tmp_path):
    cow = build(tmp_path, "cow", "cow")
    mor = build(tmp_path, "mor", "mor")
    for kw in (
        {"columns": ["repo", "path"]},
        {"columns": ["repo", "lsn"]},
        {"ranges": {"lsn": (6, None)}},
        {"ranges": {"repo": ("r1", "r1")}},
        {"buckets": {0, 1}},
        {"buckets": {2}},
    ):
        got = read_lake(mor, **kw).to_pandas()
        want = read_lake(cow, **kw).to_pandas()
        key = sorted(got.columns)
        assert sorted(map(tuple, got[key].astype(str).values.tolist())) == sorted(
            map(tuple, want[key].astype(str).values.tolist())
        ), kw
    # a ranges upper bound must NOT resurrect a superseded base version:
    # d.py was updated at lsn 8; lsn <= 7 excludes the winner entirely
    s = state(mor, ranges={"lsn": (None, 7)})
    assert not any(r[1] == "d.py" for r in s)


def test_mor_delete_where_lsn_scoped(tmp_path):
    mor = build(tmp_path, "mor", "mor")
    delete_where(mor, "del1", "repo", "==", "r1")
    assert read_key(mor, "r1", "a.py") is None
    assert not any(r[0] == "r1" for r in state(mor))
    # a LATER mor upsert of a matching key survives the active entry
    apply_seg(mor, "t4", [(10, "insert", "r1", "a.py", "A3")], "mor")
    assert read_key(mor, "r1", "a.py")["content"] == "A3"
    s = state(mor)
    assert ("r1", "a.py", 10, "A3") in s
    assert not any(r[0] == "r1" and r[1] != "a.py" for r in s)


def test_mor_fold_clears_chain_and_preserves_state(tmp_path):
    mor = build(tmp_path, "mor", "mor")
    delete_where(mor, "del1", "repo", "==", "r1")
    apply_seg(mor, "t4", [(10, "insert", "r1", "a.py", "A3")], "mor")
    before = state(mor)
    m = compact_deltas(mor)
    assert m is not None
    assert not any(m.deltas.values())
    # every folded bucket (fold owner) deactivated its delete entries —
    # the rewrite materialized them; fully-inactive entries are pruned
    for e in m.deletes:
        active = [
            b
            for b, o in e.get("owners", {}).items()
            if m.buckets.get(b, {}).get("txn_id") == o
        ]
        assert not any(
            m.buckets[b]["txn_id"].startswith("fold-") for b in active
        )
    assert state(mor) == before
    assert read_key(mor, "r1", "a.py")["content"] == "A3"
    assert compact_deltas(mor) is None  # nothing left to fold
    # watermarks survive the fold — a redelivery is still deduped
    apply_seg(mor, "t5", SEG_B + SEG_C, "mor")
    assert state(mor) == before


def test_mor_maybe_compact_max_deltas(tmp_path):
    mor = build(tmp_path, "mor", "mor")
    m = read_manifest(mor)
    longest = max(len(es) for es in m.deltas.values())
    assert maybe_compact(mor, max_txns=999, max_deltas=longest + 1) is None
    assert any(read_manifest(mor).deltas.values())
    maybe_compact(mor, max_txns=999, max_deltas=longest)
    m = read_manifest(mor)
    assert all(len(es) < longest for es in m.deltas.values() if es)


def test_mor_expire_keeps_delta_chain(tmp_path):
    mor = build(tmp_path, "mor", "mor")
    before = state(mor)
    expire_snapshots(mor, keep_last=1)
    assert state(mor) == before
    assert read_key(mor, "r1", "d.py")["content"] == "D2"


def test_mor_rescale_mutual_exclusion(tmp_path):
    from ray_cdc_lake.rescale import rescale_start

    mor = build(tmp_path, "mor", "mor")
    with pytest.raises(ValueError, match="uncompacted merge-on-read"):
        rescale_start(mor, factor=2)
    compact_deltas(mor)
    rescale_start(mor, factor=2)
    with pytest.raises(ValueError, match="rescale"):
        apply_seg(mor, "t9", [(20, "insert", "r1", "x.py", "X")], "mor")


def test_mor_schema_evolution_refused(tmp_path):
    import ray.data as rd

    mor = build(tmp_path, "mor", "mor")
    evolved = ev_table([(11, "insert", "r4", "f.py", "F1")]).append_column(
        "stars", pa.array([3], type=pa.int64())
    )
    with pytest.raises(ValueError, match="schema"):
        apply_incremental(
            mor,
            "t-evolve",
            rd.from_arrow(evolved),
            events_schema=evolved.schema,
            mode="mor",
        )


def test_mor_backfills_old_shape_events_after_column_add(tmp_path):
    """After a cow column add, old-shape events (the normal post-evolution
    CDC regime) apply in mor mode with the evolved column null-backfilled
    — while a RETYPE is still refused."""
    import pandas as pd
    import ray.data as rd

    lake = build(tmp_path, "cow", "mor-evolved")
    evolved = ev_table([(11, "insert", "r4", "f.py", "F1")]).append_column(
        "stars", pa.array([3], type=pa.int64())
    )
    apply_incremental(
        lake, "t-evolve", rd.from_arrow(evolved), events_schema=evolved.schema
    )
    # old-shape micro-batch in mor mode: accepted, stars backfilled null
    apply_seg(lake, "t-old-shape", [(12, "insert", "r5", "g.py", "G1")], "mor")
    df = read_lake(lake).to_pandas().set_index(["repo", "path"])
    assert df.loc[("r4", "f.py"), "stars"] == 3
    assert pd.isna(df.loc[("r5", "g.py"), "stars"])
    # retype of an existing column still goes through cow only
    retyped = ev_table([(13, "insert", "r6", "h.py", "H1")])
    idx = retyped.column_names.index("lsn")
    retyped = retyped.set_column(
        idx, "lsn", retyped["lsn"].cast(pa.int32())
    )
    with pytest.raises(ValueError, match="retyped"):
        apply_incremental(
            lake,
            "t-retype",
            rd.from_arrow(retyped),
            events_schema=retyped.schema,
            mode="mor",
        )


def test_mor_replicates_exactly(tmp_path):
    from ray_cdc_lake.replicate import replicate

    src = build(tmp_path, "mor", "mor-src")
    delete_where(src, "del1", "repo", "==", "r1")
    apply_seg(src, "t4", [(10, "insert", "r1", "a.py", "A3")], "mor")
    dst = str(tmp_path / "replica")
    out = replicate(src, dst, num_buckets=2)
    assert out["applied"] and not out["skipped"]
    assert state(dst) == state(src)
    assert state(dst, live_only=False) == state(src, live_only=False)
    # resumable: a second run applies nothing
    out2 = replicate(src, dst, num_buckets=2)
    assert not out2["applied"]
    # a fold on the source replicates as a structural (empty) step
    compact_deltas(src)
    replicate(src, dst, num_buckets=2)
    assert state(dst) == state(src)


def test_mor_retry_recomputes_split_after_conflict(tmp_path, monkeypatch):
    """A mor apply whose commit loses the manifest race must re-read and
    re-commit against the NEW manifest — including recomputing which
    buckets get base entries vs delta entries (the racing writer may have
    created buckets that were new when the loser first merged)."""
    import ray.data as rd

    import ray_cdc_lake.checkpoint as cp
    from ray_cdc_lake.sink import CommitConflict

    mor = build(tmp_path, "mor", "mor")
    real_commit = cp.commit_txn
    races = {"conflicts": 0}

    def racy_commit(lake_dir, txn_id, winners, **kw):
        if txn_id == "t-race" and races["conflicts"] == 0:
            races["conflicts"] += 1
            # concurrent writer lands between the loser's merge and commit
            apply_incremental(
                lake_dir,
                "t-other",
                ev_ds([(30, "insert", "rX", "other.py", "O1")]),
                events_schema=COMPILED_SCHEMA,
                mode="mor",
            )
            raise CommitConflict("injected")
        return real_commit(lake_dir, txn_id, winners, **kw)

    monkeypatch.setattr(cp, "commit_txn", racy_commit)
    # _apply_mor_once imports commit_txn lazily from sink — patch there too
    import ray_cdc_lake.sink as sk

    monkeypatch.setattr(sk, "commit_txn", racy_commit)
    apply_incremental(
        mor,
        "t-race",
        ev_ds([(31, "insert", "rY", "race.py", "R1")]),
        events_schema=COMPILED_SCHEMA,
        mode="mor",
    )
    assert races["conflicts"] == 1
    rows = state(mor)
    assert ("rX", "other.py", 30, "O1") in rows
    assert ("rY", "race.py", 31, "R1") in rows
    m = read_manifest(mor)
    assert set(m.deltas) <= set(m.buckets)


def test_mor_first_commit_is_base(tmp_path):
    lake = str(tmp_path / "fresh")
    apply_seg(lake, "t1", SEG_A, "mor", num_buckets=4)
    m = read_manifest(lake)
    assert not any(m.deltas.values())  # first commit = base everywhere
    # a later mor apply commits base entries for brand-new buckets and
    # delta entries for existing ones — the invariant holds throughout
    apply_seg(lake, "t2", SEG_B, "mor")
    m = read_manifest(lake)
    assert set(m.deltas) <= set(m.buckets)


def test_mor_on_branch_and_merge(tmp_path):
    from ray_cdc_lake.sink import create_branch, merge_branch

    mor = str(tmp_path / "branched")
    apply_seg(mor, "t1", SEG_A, "cow", num_buckets=4)
    main_before = state(mor)
    create_branch(mor, "dev")
    apply_seg(mor, "t2", SEG_B, "mor", branch="dev")
    # branch commit invisible on main; visible (merged) on the branch
    assert state(mor) == main_before
    dev = state(mor, branch="dev")
    assert ("r1", "d.py", 7, "D1") in dev
    m = read_manifest(mor, branch="dev")
    assert any(m.deltas.values())
    # fast-forward merge carries the delta chain to main intact
    merge_branch(mor, "dev")
    assert state(mor) == dev
    assert any(read_manifest(mor).deltas.values())
    assert read_key(mor, "r1", "d.py")["content"] == "D1"


def test_cow_apply_after_full_metadata_wipe(tmp_path):
    """A metadata predicate delete that kills EVERY live row lets the
    manifest's column bounds prune every file from the next apply's
    prior read — schema() is None on the empty plan. The apply must
    commit the micro-batch's own winners (found by hypothesis in
    test_property_replicate; regression pinned here deterministically).
    Exercised both without and WITH an explicit events_schema, and with
    a follow-up apply to prove the lake keeps working."""
    lake = str(tmp_path / "lake")
    apply_seg(lake, "t0", [(1, "insert", "r1", "a.py", "A1"),
                           (2, "insert", "r1", "b.py", "B1")], "cow",
              num_buckets=4)
    delete_where(lake, "del-all", "repo", "==", "r1")
    assert state(lake) == []

    # events_schema=None forces the s_old/s_new unify path
    import ray.data as rd

    apply_incremental(lake, "t1",
                      rd.from_arrow(ev_table([(5, "insert", "r1", "a.py", "A2")])),
                      num_buckets=4)
    assert state(lake) == [("r1", "a.py", 5, "A2")]

    delete_where(lake, "del-all-2", "repo", "==", "r1")
    assert state(lake) == []
    apply_seg(lake, "t2", [(8, "insert", "r1", "b.py", "B2")], "cow",
              num_buckets=4)
    assert state(lake) == [("r1", "b.py", 8, "B2")]
    # normal merging resumes against the re-populated lake
    apply_seg(lake, "t3", [(9, "update", "r1", "b.py", "B3"),
                           (10, "insert", "r2", "c.py", "C1")], "cow",
              num_buckets=4)
    assert state(lake) == [("r1", "b.py", 9, "B3"), ("r2", "c.py", 10, "C1")]


def test_wipe_edge_states_mor_evolve_empty(tmp_path):
    """Companions to test_cow_apply_after_full_metadata_wipe: the
    merge-on-read tail, a schema-EVOLVING apply, and an empty window
    each behave after a full metadata wipe / against a live lake."""
    import ray.data as rd

    # mor tail lands above the wipe's lsn snapshot
    lake = str(tmp_path / "mor")
    apply_seg(lake, "t0", SEG_A, "cow", num_buckets=2)
    delete_where(lake, "wipe", "repo", "==", "r1")
    apply_seg(lake, "t1", [(10, "insert", "r1", "a.py", "A9")], "mor",
              num_buckets=2)
    got = state(lake)
    assert ("r1", "a.py", 10, "A9") in got
    assert not any(p == "b.py" for (_, p, _, _) in got)  # wiped, stays gone

    # schema evolution when the prior read plans zero files: the new
    # column commits and reads back
    lake2 = str(tmp_path / "evolve")
    apply_seg(lake2, "t0", SEG_A, "cow", num_buckets=2)
    delete_where(lake2, "wipe", "repo", "==", "r1")
    delete_where(lake2, "wipe2", "repo", "==", "r2")
    t = ev_table([(20, "insert", "r1", "n.py", "N1")]).append_column(
        "stars", pa.array([7], type=pa.int64())
    )
    apply_incremental(lake2, "t1", rd.from_arrow(t), num_buckets=2)
    df = read_lake(lake2).to_pandas()
    assert list(df["stars"]) == [7] and list(df["path"]) == ["n.py"]

    # an empty micro-batch window commits as an applied txn, both modes
    lake3 = str(tmp_path / "empty")
    apply_seg(lake3, "t0", SEG_A, "cow", num_buckets=2)
    empty = rd.from_arrow(ev_table([]))
    for mode, txn in (("cow", "t-e1"), ("mor", "t-e2")):
        m = apply_incremental(lake3, txn, empty, num_buckets=2, mode=mode,
                              events_schema=COMPILED_SCHEMA)
        assert txn in m.txns
    assert len(state(lake3)) == 3  # SEG_A's live keys, untouched
