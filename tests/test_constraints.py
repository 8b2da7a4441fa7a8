"""Declarative table CHECK constraints (sink.set_constraint +
checkpoint._gate_constraints).

Bar: metadata-only registration with optimistic concurrency and
idempotent re-register; enforcement on every apply — raise names the
constraints with a key sample, drop filters AND records the count in
the txn's ingest metrics; SQL three-valued semantics (NULL passes value
ops, not_null catches it); tombstones are exempt; entries survive
compaction and predicate deletes; every CONSTRAINT_OPS member works."""

from __future__ import annotations

import pyarrow as pa
import pytest

from ray_cdc_lake.checkpoint import apply_incremental, compact
from ray_cdc_lake.sink import (
    drop_constraint,
    read_manifest,
    set_constraint,
)
from tests.test_sink_resume import ev_table, lake_state


def ev_ds(rows):
    import ray.data as rd

    return rd.from_arrow(ev_table(rows))


ROWS = [
    (1, "insert", "r1", "a.py", "A1"),
    (2, "insert", "r1", "b.py", "B" * 50),  # long content
    (3, "insert", "r2", "c.py", "C1"),
]


def test_set_drop_roundtrip(tmp_path):
    lake = str(tmp_path / "lake")
    m = set_constraint(lake, "c1", "lang", "in", ["py", "md"])
    assert m.version == 1 and [c["name"] for c in m.constraints] == ["c1"]
    # identical spec: idempotent no-op
    m2 = set_constraint(lake, "c1", "lang", "in", ["py", "md"])
    assert m2.version == 1
    # same name, new spec: replaced
    m3 = set_constraint(lake, "c1", "lang", "in", ["py"])
    assert m3.version == 2 and m3.constraints[0]["value"] == ["py"]
    m4 = drop_constraint(lake, "c1")
    assert m4.version == 3 and m4.constraints == []
    assert drop_constraint(lake, "nope").version == 3  # unknown: no-op
    with pytest.raises(ValueError):
        set_constraint(lake, "bad", "lang", "like", "x")
    with pytest.raises(ValueError):
        set_constraint(lake, "bad", "lang", "in", "notalist")
    with pytest.raises(ValueError):
        set_constraint(lake, "bad", "lang", "not_null", 3)


def test_raise_names_constraints_with_sample(tmp_path):
    lake = str(tmp_path / "lake")
    set_constraint(lake, "short_content", "content", "max_len", 10)
    with pytest.raises(Exception, match="short_content"):
        apply_incremental(lake, "t1", ev_ds(ROWS), num_buckets=2)
    # nothing committed
    assert read_manifest(lake).buckets == {}


def test_drop_counts_and_commits_survivors(tmp_path):
    lake = str(tmp_path / "lake")
    set_constraint(lake, "short_content", "content", "max_len", 10)
    m = apply_incremental(
        lake, "t1", ev_ds(ROWS), num_buckets=2, on_violation="drop"
    )
    assert m.metrics["t1"]["applied_constraint_dropped"] == 1
    st = lake_state(lake)
    assert set(k[1] for k in st) == {"a.py", "c.py"}


def test_tombstones_exempt_and_null_passes(tmp_path):
    lake = str(tmp_path / "lake")
    set_constraint(lake, "vals", "lang", "in", ["py"])
    rows = [
        (1, "insert", "r1", "a.py", "A1"),
        (2, "delete", "r1", "a.py", None),  # tombstone: lang irrelevant
    ]
    t = ev_table(rows)
    # null out lang on BOTH rows: value constraint passes on null
    import ray.data as rd

    t = t.set_column(
        t.schema.get_field_index("lang"),
        "lang",
        pa.array([None, None], type=pa.string()),
    )
    m = apply_incremental(lake, "t1", rd.from_arrow(t), num_buckets=2)
    assert m.metrics["t1"].get("applied_constraint_dropped") is None
    assert lake_state(lake) == {}  # delete won

    # not_null DOES catch the null (non-delete rows only). The gate runs
    # on the post-watermark stream, so the probe row must carry an lsn
    # ABOVE the committed hwm (a below-hwm redelivery never enters the
    # merge and is not the gate's business).
    set_constraint(lake, "lang_required", "lang", "not_null")
    t3 = t.slice(0, 1).set_column(
        t.schema.get_field_index("lsn"),
        "lsn",
        pa.array([9], type=t.schema.field("lsn").type),
    )
    with pytest.raises(Exception, match="lang_required"):
        apply_incremental(lake, "t2", rd.from_arrow(t3), num_buckets=2)


def test_bound_ops(tmp_path):
    lake = str(tmp_path / "lake")
    set_constraint(lake, "lsn_cap", "lsn", "<=", 2)
    set_constraint(lake, "lsn_floor", "lsn", ">=", 1)
    ok = [(1, "insert", "r1", "a.py", "A"), (2, "insert", "r1", "b.py", "B")]
    apply_incremental(lake, "t1", ev_ds(ok), num_buckets=2)
    bad = [(3, "insert", "r1", "c.py", "C")]
    with pytest.raises(Exception, match="lsn_cap"):
        apply_incremental(lake, "t2", ev_ds(bad), num_buckets=2)


def test_constraints_survive_compact_and_delete(tmp_path):
    from ray_cdc_lake.checkpoint import delete_by_prefix

    lake = str(tmp_path / "lake")
    set_constraint(lake, "short", "content", "max_len", 100)
    apply_incremental(lake, "t1", ev_ds(ROWS), num_buckets=2)
    compact(lake)
    assert [c["name"] for c in read_manifest(lake).constraints] == ["short"]
    delete_by_prefix(lake, "r1", "t-del")
    assert [c["name"] for c in read_manifest(lake).constraints] == ["short"]
    # still enforced after maintenance
    with pytest.raises(Exception, match="short"):
        apply_incremental(
            lake,
            "t2",
            ev_ds([(9, "insert", "r3", "x.py", "Z" * 200)]),
            num_buckets=2,
        )


def test_constraint_registered_mid_apply_gates_the_retry(tmp_path, monkeypatch):
    """A set_constraint landing between an apply's merge and its publish
    advances the manifest -> CommitConflict -> the retry must re-gate
    with the FRESH constraint set (a stale pre-loop snapshot would let
    the violating row land even though the constraint's manifest version
    precedes the apply's commit)."""
    import ray.data as rd

    import ray_cdc_lake.checkpoint as cp
    from ray_cdc_lake.sink import CommitConflict

    lake = str(tmp_path / "lake")
    apply_incremental(lake, "t0", ev_ds([(1, "insert", "r1", "a.py", "A1")]),
                      num_buckets=2)

    real_commit = cp.commit_txn
    state = {"raced": 0}

    def racy_commit(lake_dir, txn_id, winners, **kw):
        if txn_id == "t1" and state["raced"] == 0:
            state["raced"] += 1
            set_constraint(lake, "short", "content", "max_len", 10)
            raise CommitConflict("simulated race with set_constraint")
        return real_commit(lake_dir, txn_id, winners, **kw)

    monkeypatch.setattr(cp, "commit_txn", racy_commit)
    bad = [(2, "insert", "r1", "b.py", "B" * 50),
           (3, "insert", "r2", "c.py", "C1")]
    m = apply_incremental(lake, "t1", ev_ds(bad), num_buckets=2,
                          on_violation="drop")
    assert state["raced"] == 1
    assert m.metrics["t1"]["applied_constraint_dropped"] == 1
    st = lake_state(lake)
    assert set(k[1] for k in st) == {"a.py", "c.py"}  # b.py gated on retry

    # 'raise' mode: the retry fails loudly instead of committing the row
    monkeypatch.setattr(cp, "commit_txn", real_commit)
    set_constraint(lake, "tiny", "content", "max_len", 1)
    with pytest.raises(Exception, match="tiny"):
        apply_incremental(lake, "t2",
                          ev_ds([(4, "insert", "r3", "d.py", "DD")]),
                          num_buckets=2)


def test_drop_count_excludes_below_hwm_redeliveries(tmp_path):
    """applied_constraint_dropped counts rows the gate actually kept out
    of the merge: a redelivered below-watermark event that also violates
    a constraint is discarded by hwm dedup first and must NOT inflate
    the count."""
    lake = str(tmp_path / "lake")
    apply_incremental(lake, "t0",
                      ev_ds([(5, "insert", "r1", "a.py", "A1")]),
                      num_buckets=2)
    set_constraint(lake, "short", "content", "max_len", 10)
    rows = [
        # same key as the committed row so it lands in a bucket with a
        # watermark (hwm is per-bucket): below hwm AND violating
        (3, "insert", "r1", "a.py", "X" * 50),
        (6, "insert", "r1", "b.py", "B" * 50),    # above hwm, violating
        (7, "insert", "r2", "c.py", "C1"),        # above hwm, clean
    ]
    m = apply_incremental(lake, "t1", ev_ds(rows), num_buckets=2,
                          on_violation="drop")
    assert m.metrics["t1"]["applied_constraint_dropped"] == 1
    st = lake_state(lake)
    assert set(k[1] for k in st) == {"a.py", "c.py"}


def test_constraints_gate_mor_applies(tmp_path):
    """The gate sits above the commit mode: a merge-on-read delta apply
    is constrained exactly like copy-on-write."""
    lake = str(tmp_path / "lake")
    set_constraint(lake, "short", "content", "max_len", 10)
    base = [(1, "insert", "r1", "a.py", "A1")]
    apply_incremental(lake, "t1", ev_ds(base), num_buckets=2)
    bad = [(2, "update", "r1", "a.py", "B" * 50)]
    with pytest.raises(Exception, match="short"):
        apply_incremental(lake, "t2", ev_ds(bad), num_buckets=2, mode="mor")
    m = apply_incremental(
        lake, "t2", ev_ds(bad), num_buckets=2, mode="mor", on_violation="drop"
    )
    assert m.metrics["t2"]["applied_constraint_dropped"] == 1
    assert lake_state(lake)[("r1", "a.py")][1] == "A1"  # update was dropped
