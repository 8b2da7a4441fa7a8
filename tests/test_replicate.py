"""Cross-lake incremental replication (ray_cdc_lake/replicate.py).

Bar: after replicate(), the replica's state (live rows AND tombstones)
equals the source's, whatever mixture of applies, predicate deletes,
compactions and online rescales produced the source — and each step
moves only that step's delta (asserted via the replica's own per-txn
ingest metrics).
"""

from __future__ import annotations

import pyarrow as pa

from ray_cdc_lake.checkpoint import apply_incremental, compact
from ray_cdc_lake.replicate import replicate
from ray_cdc_lake.schemas import COMPILED_SCHEMA
from ray_cdc_lake.sink import read_lake, read_manifest


def ev_table(rows: list[tuple]) -> pa.Table:
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


def live_state(lake) -> dict[tuple, tuple]:
    df = read_lake(lake).to_pandas()
    return {(r.repo, r.path): (r.lsn, r.content) for r in df.itertuples()}


SEG1 = [(i + 1, "insert", f"r{i % 3}", f"f{i:02d}.py", f"v1-{i}") for i in range(18)]
SEG2 = [(50 + i, "update", f"r{i % 3}", f"f{i:02d}.py", f"v2-{i}") for i in range(0, 18, 2)] + [
    (80, "delete", "r1", "f01.py", None),
    (81, "insert", "r9", "new.py", "N"),
]


def test_replicate_converges_and_moves_only_deltas(tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    apply_incremental(src, "txn-1", ev_ds(SEG1), num_buckets=8)
    apply_incremental(src, "txn-2", ev_ds(SEG2), num_buckets=8)

    out = replicate(src, dst, num_buckets=4)  # replica: its own modulus
    assert out == {"applied": [1, 2], "skipped": 0}
    assert live_state(dst) == live_state(src)
    m = read_manifest(dst)
    assert m.num_buckets == 4 and m.txns == ["repl-000001", "repl-000002"]
    # delta accounting: step 2 applied exactly SEG2's events, not a
    # re-copy of SEG1's carry-over rows
    assert m.metrics["repl-000002"]["applied_rows"] == len(SEG2)

    # convergence: a second run is a pure no-op
    assert replicate(src, dst, num_buckets=4) == {"applied": [], "skipped": 2}

    # the source advances; only the new version ships
    apply_incremental(src, "txn-3", ev_ds([(90, "insert", "r0", "late.py", "L")]), num_buckets=8)
    out = replicate(src, dst, num_buckets=4)
    assert out == {"applied": [3], "skipped": 2}
    assert live_state(dst) == live_state(src)
    assert read_manifest(dst).metrics["repl-000003"]["applied_rows"] == 1


def test_replicate_tombstones_win_on_replica(tmp_path):
    """Deletes replicate as tombstones with their TRUE source lsns: a
    stale upsert applied directly to the replica afterwards still loses."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    apply_incremental(src, "txn-1", ev_ds(SEG1), num_buckets=8)
    apply_incremental(src, "txn-2", ev_ds(SEG2), num_buckets=8)
    replicate(src, dst)
    assert ("r1", "f01.py") not in live_state(dst)
    stale = [(60, "insert", "r1", "f01.py", "stale")]  # lsn 60 < tombstone's 80
    apply_incremental(dst, "txn-stale", ev_ds(stale), dedup_below_hwm=False)
    assert ("r1", "f01.py") not in live_state(dst)


def test_replicate_predicate_delete_as_metadata(tmp_path):
    from ray_cdc_lake.sink import delete_where

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    apply_incremental(src, "txn-1", ev_ds(SEG1), num_buckets=8)
    delete_where(src, "gdpr-1", "repo", "==", "r1")
    out = replicate(src, dst)
    assert out["applied"] == [1, 2]
    assert live_state(dst) == live_state(src)
    assert all(repo != "r1" for (repo, _p) in live_state(dst))
    # the replica's delete is metadata too (no data txn for version 2)
    assert read_manifest(dst).deletes and read_manifest(dst).txns[-1] == "repl-000002"


def test_structural_source_steps_replicate_empty(tmp_path):
    """compact and online-rescale steps on the source move no rows to the
    replica: every row they touch is COW carry-over below the watermark."""
    from ray_cdc_lake.rescale import rescale_start, rescale_step

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    apply_incremental(src, "txn-1", ev_ds(SEG1), num_buckets=8)
    replicate(src, dst)

    compact(src)  # version 2: full rewrite, no new lsn
    rescale_start(src, factor=2)  # version 3: metadata only
    rescale_step(src, max_buckets=4)  # version 4: split half
    apply_incremental(src, "txn-2", ev_ds(SEG2), num_buckets=8)  # v5: mid-rescale
    rescale_step(src)  # version 6: finish

    out = replicate(src, dst)
    assert out["applied"] == [2, 3, 4, 5, 6]
    assert live_state(dst) == live_state(src)
    met = read_manifest(dst).metrics
    assert met["repl-000002"]["applied_rows"] == 0  # compact: empty
    assert met["repl-000003"]["applied_rows"] == 0  # rescale_start: empty
    assert met["repl-000004"]["applied_rows"] == 0  # split: pure move
    assert met["repl-000005"]["applied_rows"] == len(SEG2)  # the real delta
    assert met["repl-000006"]["applied_rows"] == 0  # finalize: empty


def test_replicate_unordered_source_full_bucket_mode(tmp_path):
    """A source fed by independent writers can commit LIVE rows BELOW a
    bucket's watermark (unrelated LSN ranges); assume_ordered_log=False
    re-ships changed buckets whole and still converges."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    apply_incremental(src, "txn-1", ev_ds(SEG1), num_buckets=8)
    # writer 2 with a LOW lsn range: live rows below most buckets' hwm
    low = [(2, "insert", "rw2", f"w{i}.py", f"W{i}") for i in range(6)]
    apply_incremental(src, "txn-2", ev_ds(low), num_buckets=8, dedup_below_hwm=False)
    out = replicate(src, dst, assume_ordered_log=False)
    assert out["applied"] == [1, 2]
    assert live_state(dst) == live_state(src)
    assert ("rw2", "w0.py") in live_state(dst)


def test_expire_refuses_to_break_lagged_registered_replica(tmp_path):
    """A registered replica's applied watermark pins source retention:
    an expiry that would drop a manifest the replica still needs raises
    (force=True overrides); after the replica catches up, the same
    expiry succeeds — and the caught-up replica still converges."""
    import pytest

    from ray_cdc_lake.sink import (
        deregister_consumer,
        expire_snapshots,
        list_consumers,
        register_consumer,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    apply_incremental(src, "txn-1", ev_ds(SEG1), num_buckets=8)
    replicate(src, dst, consumer="replica-dst")
    assert list_consumers(src) == {"replica-dst": 1}

    # source advances 3 more versions while the replica lags at 1
    for i, lsn0 in enumerate((100, 200, 300), start=2):
        apply_incremental(
            src, f"txn-{i}",
            ev_ds([(lsn0, "insert", "r0", f"late{i}.py", f"L{i}")]),
            num_buckets=8,
        )

    with pytest.raises(ValueError, match="replica-dst"):
        expire_snapshots(src, keep_last=2)  # would drop v1 (and v2)
    # nothing was removed: the lagged replica still catches up cleanly
    out = replicate(src, dst, consumer="replica-dst")
    assert out["applied"] == [2, 3, 4]
    assert live_state(dst) == live_state(src)
    assert list_consumers(src) == {"replica-dst": 4}

    # caught up: the same expiry now passes
    removed = expire_snapshots(src, keep_last=2)
    assert removed["manifests_removed"]

    # watermark is monotonic: a stale writer cannot regress it
    assert register_consumer(src, "replica-dst", 2) == 4

    # force=True (or deregistering) removes the pin
    apply_incremental(
        src, "txn-9", ev_ds([(900, "insert", "r0", "l9.py", "X")]), num_buckets=8
    )
    apply_incremental(
        src, "txn-10", ev_ds([(901, "insert", "r0", "la.py", "Y")]), num_buckets=8
    )
    with pytest.raises(ValueError, match="replica-dst"):
        expire_snapshots(src, keep_last=1)
    assert expire_snapshots(src, keep_last=1, force=True)["manifests_removed"]
    deregister_consumer(src, "replica-dst")
    assert list_consumers(src) == {}


def test_replicate_reissued_identical_predicate_delete(tmp_path):
    """The GDPR re-erase flow: delete_where(X), re-upsert a matching key,
    delete_where(X) AGAIN with the identical predicate. The second delete
    is a NEW entry (new txn_id) even though its (column, op, value)
    triple matches a still-active earlier entry — matching on the triple
    would classify it as already-seen, replicate version 4 as an empty
    txn, and leave the re-upserted row alive on the replica forever."""
    from ray_cdc_lake.sink import delete_where

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    apply_incremental(src, "txn-1", ev_ds(SEG1), num_buckets=8)
    delete_where(src, "gdpr-1", "repo", "==", "r1")  # v2
    # v3: a row matching the erased predicate comes back
    back = [(200, "insert", "r1", "back.py", "resurrected")]
    apply_incremental(src, "txn-back", ev_ds(back), num_buckets=8)
    assert ("r1", "back.py") in live_state(src)
    # v4: identical predicate re-issued while gdpr-1 may still be active
    delete_where(src, "gdpr-2", "repo", "==", "r1")
    assert all(repo != "r1" for (repo, _p) in live_state(src))

    out = replicate(src, dst)
    assert out["applied"] == [1, 2, 3, 4]
    assert live_state(dst) == live_state(src)
    assert ("r1", "back.py") not in live_state(dst)
    assert all(repo != "r1" for (repo, _p) in live_state(dst))

    # and the replica stays converged on a later catch-up run too
    assert replicate(src, dst) == {"applied": [], "skipped": 4}


def test_replicate_carries_evolved_columns(tmp_path):
    """A schema-evolved source column (checkpoint conform / column add)
    must replicate — both in exact-delta mode and in unordered full-bucket
    mode — not be silently dropped by a COMPILED_SCHEMA whitelist."""
    import pandas as pd
    import ray.data as rd

    src = str(tmp_path / "src")
    apply_incremental(src, "txn-1", ev_ds(SEG1), num_buckets=8)
    seg2 = ev_table(SEG2).append_column(
        "license", pa.array(["MIT"] * len(SEG2), type=pa.large_string())
    )
    apply_incremental(src, "txn-2", rd.from_arrow(seg2), num_buckets=8)

    for mode, dst_name in ((True, "dst-ordered"), (False, "dst-unordered")):
        dst = str(tmp_path / dst_name)
        replicate(src, dst, num_buckets=4, assume_ordered_log=mode)
        assert live_state(dst) == live_state(src)
        df = read_lake(dst).to_pandas().set_index(["repo", "path"])
        assert "license" in df.columns
        assert df.loc[("r9", "new.py"), "license"] == "MIT"
        # pre-evolution rows read back null-backfilled, like on the source
        assert pd.isna(df.loc[("r0", "f03.py"), "license"])


def test_replicate_lagged_catchup_after_kill(tmp_path, monkeypatch):
    """A replication killed mid-chain resumes at the first unapplied
    version (txn-id idempotence) and still converges."""
    import ray_cdc_lake.replicate as rmod

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    apply_incremental(src, "txn-1", ev_ds(SEG1), num_buckets=8)
    apply_incremental(src, "txn-2", ev_ds(SEG2), num_buckets=8)

    real_step = rmod._replicate_step
    calls = {"n": 0}

    def dying_step(*a, **kw):
        if calls["n"] == 1:
            raise RuntimeError("killed mid-replication")
        calls["n"] += 1
        return real_step(*a, **kw)

    monkeypatch.setattr(rmod, "_replicate_step", dying_step)
    try:
        replicate(src, dst)
    except RuntimeError:
        pass
    assert read_manifest(dst).txns == ["repl-000001"]  # v1 landed, v2 did not
    monkeypatch.setattr(rmod, "_replicate_step", real_step)
    out = replicate(src, dst)
    assert out == {"applied": [2], "skipped": 1}
    assert live_state(dst) == live_state(src)
