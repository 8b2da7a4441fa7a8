"""Online bucket rescale (ray_cdc_lake/rescale.py): mixed-modulus reads
and writes while the split is in flight, bucket-local steps, crash
recovery, finalize, and interaction with compaction / predicate deletes.

The correctness bar everywhere: the rescaled lake's live state must be
IDENTICAL to a one-shot apply of the same events — the mixed-modulus
window can neither lose, duplicate, nor mis-bucket a key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from ray_cdc_lake.checkpoint import apply_incremental, compact
from ray_cdc_lake.rescale import rescale_start, rescale_status, rescale_step
from ray_cdc_lake.schemas import COMPILED_SCHEMA
from ray_cdc_lake.sink import read_key, read_lake, read_manifest
from ray_cdc_lake.transforms import key_hash_u64

NB = 4  # base modulus, small so every bucket is populated


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


def live_state(lake_dir) -> dict[tuple, tuple]:
    df = read_lake(lake_dir).to_pandas()
    return {(r.repo, r.path): (r.lsn, r.content) for r in df.itertuples()}


def old_bucket(repo: str, path: str) -> int:
    h = key_hash_u64(pa.array([repo]), pa.array([path]))
    return int(h[0] % np.uint64(NB))


# 24 keys spread over all 4 base buckets, then updates/deletes
SEG1 = [(i + 1, "insert", f"r{i % 3}", f"f{i:02d}.py", f"v1-{i}") for i in range(24)]
SEG2 = (
    [(100 + i, "update", f"r{i % 3}", f"f{i:02d}.py", f"v2-{i}") for i in range(0, 24, 2)]
    + [(200 + i, "delete", f"r{i % 3}", f"f{i:02d}.py", None) for i in range(1, 24, 5)]
    + [(300 + i, "insert", f"r{i % 3}", f"g{i:02d}.py", f"new-{i}") for i in range(6)]
)


def oneshot_state(tmp_path, nb: int) -> dict[tuple, tuple]:
    ref = str(tmp_path / f"ref{nb}")
    apply_incremental(ref, "txn-all", ev_ds(SEG1 + SEG2), num_buckets=nb)
    return live_state(ref)


def test_rescale_under_live_ingest_equals_oneshot(tmp_path):
    lake = str(tmp_path / "lake")
    apply_incremental(lake, "txn-1", ev_ds(SEG1), num_buckets=NB)
    rescale_start(lake, factor=2)
    st = rescale_status(lake)
    assert st == {"active": True, "from": NB, "to": 2 * NB, "split": 0, "pending": NB}

    m = rescale_step(lake, max_buckets=NB // 2)  # split buckets 0, 1
    assert m.rescale == {"to": 2 * NB, "split": [0, 1]}
    assert m.num_buckets == NB  # not finalized yet

    # apply MID-RESCALE: keys route by the mixed rule
    apply_incremental(lake, "txn-2", ev_ds(SEG2), num_buckets=NB)

    # mid-rescale point lookups: one key per (split, unsplit) old bucket
    seen_split = seen_unsplit = False
    for (repo, path), (lsn, content) in live_state(lake).items():
        b = old_bucket(repo, path)
        row = read_key(lake, repo, path)
        assert row is not None and row["lsn"] == lsn and row["content"] == content
        if b in (0, 1):
            seen_split = True
        else:
            seen_unsplit = True
    assert seen_split and seen_unsplit  # the fixture covers both regimes
    assert read_key(lake, "nope", "missing.py") is None

    # mid-rescale scan equals the one-shot oracle
    assert live_state(lake) == oneshot_state(tmp_path, NB)

    m = rescale_step(lake)  # split the rest; finalizes
    assert m.rescale is None and m.num_buckets == 2 * NB
    assert rescale_status(lake) == {"active": False, "num_buckets": 2 * NB}
    assert live_state(lake) == oneshot_state(tmp_path, 2 * NB)
    # every committed bucket id is a valid new-modulus id and no old
    # entry survived at a stale interpretation
    m = read_manifest(lake)
    assert all(0 <= int(b) < 2 * NB for b in m.buckets)

    # post-finalize applies work at the new modulus (and refuse the old)
    apply_incremental(lake, "txn-3", ev_ds([(900, "insert", "rz", "z.py", "Z")]))
    assert read_key(lake, "rz", "z.py")["content"] == "Z"
    with pytest.raises(ValueError, match="rescale"):
        apply_incremental(
            lake, "txn-4", ev_ds([(901, "insert", "rz", "z2.py", "Z")]), num_buckets=NB
        )


def test_rescale_guards(tmp_path):
    lake = str(tmp_path / "lake")
    with pytest.raises(FileNotFoundError):
        rescale_start(lake)  # nothing committed
    apply_incremental(lake, "txn-1", ev_ds(SEG1), num_buckets=NB)
    with pytest.raises(ValueError, match="factor"):
        rescale_start(lake, factor=1)
    with pytest.raises(ValueError, match="no rescale in flight"):
        rescale_step(lake)
    rescale_start(lake, factor=3)  # non-power-of-two factors are fine
    with pytest.raises(ValueError, match="already in flight"):
        rescale_start(lake, factor=2)
    rescale_step(lake)
    assert read_manifest(lake).num_buckets == 3 * NB
    assert live_state(lake) == {
        (r, p): (lsn, c) for (lsn, _, r, p, c) in SEG1
    }


def test_rescale_step_crash_recovery(tmp_path, monkeypatch):
    """Crash AFTER the manifest claim but BEFORE the pointer move: the
    retry must finish the pointer, never rewrite the claimed data."""
    import ray_cdc_lake.rescale as rmod

    lake = str(tmp_path / "lake")
    apply_incremental(lake, "txn-1", ev_ds(SEG1), num_buckets=NB)
    rescale_start(lake, factor=2)

    real_publish = rmod._publish
    calls = {"n": 0}

    def crashing_publish(lake_dir, m, store=None, **kw):
        calls["n"] += 1
        # let the claim land, then die before the pointer moves — emulated
        # by publishing fully and then rolling the pointer back
        import ray_cdc_lake.sink as smod

        st = store or smod._DEFAULT_STORE
        cur = f"{lake_dir}/{smod.MANIFEST_DIR}/CURRENT"
        before = st.read_text(cur)
        real_publish(lake_dir, m, store=store, **kw)
        st.write_text(cur + ".roll", before)
        st.replace_file(cur + ".roll", cur)
        raise RuntimeError("injected crash after claim")

    monkeypatch.setattr(rmod, "_publish", crashing_publish)
    with pytest.raises(RuntimeError, match="injected"):
        rescale_step(lake)
    monkeypatch.setattr(rmod, "_publish", real_publish)
    assert read_manifest(lake).rescale == {"to": 2 * NB, "split": []}  # stale pointer

    m = rescale_step(lake)  # retry: detects the claimed manifest, finishes
    assert m.rescale is None and m.num_buckets == 2 * NB
    assert live_state(lake) == {
        (r, p): (lsn, c) for (lsn, _, r, p, c) in SEG1
    }


def test_rescale_crash_recovery_with_different_max_buckets(tmp_path, monkeypatch):
    """Retrying a crashed step with a DIFFERENT max_buckets computes a
    different split set than the claimed manifest's — the recovery match
    must recognize the claim by its rescale marker (same target, split
    grew, modulus unchanged), not by the retry's own chosen set, or the
    lake wedges behind the orphaned claim with CommitConflict forever."""
    import ray_cdc_lake.rescale as rmod

    lake = str(tmp_path / "lake")
    apply_incremental(lake, "txn-1", ev_ds(SEG1), num_buckets=NB)
    rescale_start(lake, factor=2)

    real_publish = rmod._publish

    def crashing_publish(lake_dir, m, store=None, **kw):
        import ray_cdc_lake.sink as smod

        st = store or smod._DEFAULT_STORE
        cur = f"{lake_dir}/{smod.MANIFEST_DIR}/CURRENT"
        before = st.read_text(cur)
        real_publish(lake_dir, m, store=store, **kw)
        st.write_text(cur + ".roll", before)
        st.replace_file(cur + ".roll", cur)
        raise RuntimeError("injected crash after claim")

    monkeypatch.setattr(rmod, "_publish", crashing_publish)
    with pytest.raises(RuntimeError, match="injected"):
        rescale_step(lake, max_buckets=2)  # claim carries split=[0, 1]
    monkeypatch.setattr(rmod, "_publish", real_publish)

    m = rescale_step(lake, max_buckets=1)  # retry computes split=[0] only
    assert m.rescale == {"to": 2 * NB, "split": [0, 1]}  # the CLAIM won
    m = rescale_step(lake)  # finish the remainder
    assert m.rescale is None and m.num_buckets == 2 * NB
    assert live_state(lake) == {(r, p): (lsn, c) for (lsn, _, r, p, c) in SEG1}

    # crash a FINAL step too, then retry with a partial max_buckets: the
    # finalized claim (marker cleared, modulus flipped) must be accepted
    lake2 = str(tmp_path / "lake2")
    apply_incremental(lake2, "txn-1", ev_ds(SEG1), num_buckets=NB)
    rescale_start(lake2, factor=2)
    monkeypatch.setattr(rmod, "_publish", crashing_publish)
    with pytest.raises(RuntimeError, match="injected"):
        rescale_step(lake2)  # full split: the claim finalizes
    monkeypatch.setattr(rmod, "_publish", real_publish)
    m = rescale_step(lake2, max_buckets=1)
    assert m.rescale is None and m.num_buckets == 2 * NB
    assert live_state(lake2) == {(r, p): (lsn, c) for (lsn, _, r, p, c) in SEG1}


def test_concurrent_rescale_steps_do_not_clobber_data(tmp_path, monkeypatch):
    """Two rescale_step drivers racing the same version: the loser's
    attempt must not delete the winner's already-published data files
    (per-attempt txn-dir nonce), and its retry must converge on the
    winner's claim instead of corrupting the lake."""
    import ray_cdc_lake.rescale as rmod

    lake = str(tmp_path / "lake")
    apply_incremental(lake, "txn-1", ev_ds(SEG1), num_buckets=NB)
    rescale_start(lake, factor=2)

    real_read = rmod.read_lake
    state = {"raced": 0}

    def racing_read(*a, **kw):
        ds = real_read(*a, **kw)
        if state["raced"] == 0:
            state["raced"] += 1
            # a second driver runs (and PUBLISHES) its own step between
            # this attempt's claim check and its data write — with a
            # version-derived txn dir, this attempt's _write_txn_data
            # would now rmtree the winner's already-published files
            rmod._rescale_step_once(a[0], 2, kw.get("store"))
        return ds

    monkeypatch.setattr(rmod, "read_lake", racing_read)
    m = rescale_step(lake)  # loses the race once, retries, finishes
    monkeypatch.setattr(rmod, "read_lake", real_read)
    assert state["raced"] == 1
    assert m.rescale is None and m.num_buckets == 2 * NB
    # every file the winner's txn published must still exist: the final
    # state reads back complete through the manifest chain
    assert live_state(lake) == {(r, p): (lsn, c) for (lsn, _, r, p, c) in SEG1}


def test_rescale_step_retries_on_concurrent_apply(tmp_path, monkeypatch):
    """A live apply winning the next manifest version conflicts the step
    (its split read is stale); the step re-reads and retries — rescale
    and ingest interleave with no coordination, and neither loses rows."""
    import ray_cdc_lake.rescale as rmod

    lake = str(tmp_path / "lake")
    apply_incremental(lake, "txn-1", ev_ds(SEG1), num_buckets=NB)
    rescale_start(lake, factor=2)

    real_publish = rmod._publish
    state = {"raced": 0}

    def racing_publish(lake_dir, m, store=None, **kw):
        if state["raced"] == 0:
            state["raced"] += 1
            # a concurrent writer lands between the step's read and its
            # publish; the step's claim of this version must now conflict
            apply_incremental(
                lake_dir, "txn-race", ev_ds(SEG2), dedup_below_hwm=False
            )
        return real_publish(lake_dir, m, store=store, **kw)

    monkeypatch.setattr(rmod, "_publish", racing_publish)
    m = rescale_step(lake)  # conflicts once, retries, finalizes
    assert state["raced"] == 1
    assert m.rescale is None and m.num_buckets == 2 * NB
    assert live_state(lake) == oneshot_state(tmp_path, 2 * NB)


def test_point_lookup_and_range_scan_frozen_mid_rescale(tmp_path):
    """A lake FROZEN mid-rescale (manifest carries the split marker, some
    buckets at the old modulus, some at the new) must serve both point
    lookups (read_key's mixed-modulus bucket math + manifest pruning) and
    manifest-range scans (read_lake(ranges=)) exactly."""
    from ray_cdc_lake.sink import read_lake

    lake = str(tmp_path / "lake")
    apply_incremental(lake, "txn-1", ev_ds(SEG1), num_buckets=NB)
    rescale_start(lake, factor=2)
    rescale_step(lake, max_buckets=2)  # split buckets 0, 1 — then STOP
    apply_incremental(lake, "txn-2", ev_ds(SEG2), num_buckets=NB)  # mixed
    m = read_manifest(lake)
    assert m.rescale == {"to": 2 * NB, "split": [0, 1]}  # still in flight

    want = oneshot_state(tmp_path, NB)
    assert live_state(lake) == want

    # point lookups across BOTH regimes (split and unsplit old buckets)
    hit_split = hit_unsplit = False
    for (repo, path), (lsn, content) in want.items():
        row = read_key(lake, repo, path)
        assert row is not None and (row["lsn"], row["content"]) == (lsn, content)
        if old_bucket(repo, path) in (0, 1):
            hit_split = True
        else:
            hit_unsplit = True
    assert hit_split and hit_unsplit
    assert read_key(lake, "ghost", "nothing.py") is None

    # manifest-range scan: the lsn window selects exactly SEG2's winners
    got = read_lake(lake, ranges={"lsn": (100, None)}).to_pandas()
    got_set = {(r.repo, r.path): (r.lsn, r.content) for r in got.itertuples()}
    assert got_set == {k: v for k, v in want.items() if v[0] >= 100}

    # key-range scan prunes by the recorded path stats mid-rescale too
    got = read_lake(lake, ranges={"path": ("f00.py", "f09.py")}).to_pandas()
    got_set = {(r.repo, r.path) for r in got.itertuples()}
    assert got_set == {k for k in want if "f00.py" <= k[1] <= "f09.py"}

    # a window above every watermark reads back empty, not an error
    assert read_lake(lake, ranges={"lsn": (10_000, None)}).count() == 0


def test_compact_finalizes_inflight_rescale(tmp_path):
    lake = str(tmp_path / "lake")
    apply_incremental(lake, "txn-1", ev_ds(SEG1), num_buckets=NB)
    apply_incremental(lake, "txn-2", ev_ds(SEG2), num_buckets=NB)
    want = live_state(lake)
    rescale_start(lake, factor=2)
    rescale_step(lake, max_buckets=1)
    m = compact(lake)  # defaults to the rescale target and clears the marker
    assert m.rescale is None and m.num_buckets == 2 * NB
    assert live_state(lake) == want


def test_predicate_delete_deactivates_on_split(tmp_path):
    from ray_cdc_lake.sink import delete_where

    lake = str(tmp_path / "lake")
    apply_incremental(lake, "txn-1", ev_ds(SEG1), num_buckets=NB)
    delete_where(lake, "del-r1", "repo", "==", "r1")
    assert all(repo != "r1" for (repo, _p) in live_state(lake))
    rescale_start(lake, factor=2)
    rescale_step(lake)  # rewrites every bucket from a deletes-applied read
    m = read_manifest(lake)
    assert m.deletes == []  # materialized during the split
    assert m.num_buckets == 2 * NB
    assert all(repo != "r1" for (repo, _p) in live_state(lake))
    # a fresh upsert of a matching key SURVIVES (the delete was a snapshot)
    apply_incremental(lake, "txn-2", ev_ds([(999, "insert", "r1", "f00.py", "back")]))
    assert read_key(lake, "r1", "f00.py")["content"] == "back"
