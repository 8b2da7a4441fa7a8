"""Multi-writer optimistic concurrency on the lake.

Reference analog: the reference serializes everything on one NiFi
processor thread and relies on staged renames; a distributed lake gets
concurrent writers, so the manifest claim is Delta-style optimistic
concurrency — losers RETRY (re-read, re-merge), never overwrite.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _events(prefix: str, n: int, lsn0: int) -> pa.Table:
    return pa.table(
        {
            "lsn": pa.array(np.arange(lsn0, lsn0 + n), type=pa.int64()),
            "op": pa.array(["insert"] * n),
            "repo": pa.array(["r"] * n),
            "path": pa.array([f"{prefix}{i}" for i in range(n)]),
            "commit": pa.array([f"c-{prefix}{i}" for i in range(n)]),
            "lang": pa.array(["en"] * n),
            "content": pa.array([f"v-{prefix}{i}" for i in range(n)], type=pa.large_string()),
        }
    )


def test_stale_expected_version_raises(tmp_path):
    """commit_txn pinned to the manifest version the merge read must
    refuse to publish once another writer advanced it — the lost-update
    window (merge against stale prior state) is closed."""
    import ray.data as rd

    from ray_cdc_lake.sink import CommitConflict, commit_txn
    from ray_cdc_lake.transforms import add_bucket

    lake = str(tmp_path / "lake")
    w1 = add_bucket(_events("a", 20, 0), 4)
    w2 = add_bucket(_events("b", 20, 100), 4)
    commit_txn(lake, "txn-a", rd.from_arrow(w1))  # -> version 1
    with pytest.raises(CommitConflict, match="moved"):
        commit_txn(lake, "txn-b", rd.from_arrow(w2), expected_version=0)
    # with the CURRENT version pinned it commits fine
    m = commit_txn(lake, "txn-b", rd.from_arrow(w2), expected_version=1)
    assert m.version == 2 and m.txns == ["txn-a", "txn-b"]


def test_apply_incremental_retries_on_conflict(tmp_path, monkeypatch):
    """A CommitConflict makes apply_incremental re-read and re-merge; the
    retried apply must include the OTHER writer's rows."""
    import ray.data as rd

    import ray_cdc_lake.checkpoint as cp
    from ray_cdc_lake.schemas import COMPILED_SCHEMA
    from ray_cdc_lake.sink import CommitConflict, read_lake

    lake = str(tmp_path / "lake")
    cp.apply_incremental(
        lake, "txn-a", rd.from_arrow(_events("a", 20, 0)),
        events_schema=COMPILED_SCHEMA, dedup_below_hwm=False,
    )

    real_commit = cp.commit_txn
    state = {"conflicts": 0}

    def racy_commit(lake_dir, txn_id, winners, **kw):
        if state["conflicts"] == 0:
            # simulate a concurrent writer landing between merge and
            # publish: a full incremental apply of txn-x (the counter is
            # bumped FIRST so its own commit passes through), then the
            # conflict is reported to the original writer
            state["conflicts"] += 1
            cp.apply_incremental(
                lake_dir, "txn-x", rd.from_arrow(_events("x", 10, 500)),
                events_schema=COMPILED_SCHEMA, dedup_below_hwm=False,
            )
            raise CommitConflict("simulated race")
        return real_commit(lake_dir, txn_id, winners, **kw)

    monkeypatch.setattr(cp, "commit_txn", racy_commit)
    cp.apply_incremental(
        lake, "txn-b", rd.from_arrow(_events("b", 20, 100)),
        events_schema=COMPILED_SCHEMA, dedup_below_hwm=False,
    )
    got = read_lake(lake).to_pandas()
    paths = set(got["path"])
    assert {f"a{i}" for i in range(20)} <= paths
    assert {f"b{i}" for i in range(20)} <= paths
    assert {f"x{i}" for i in range(10)} <= paths  # the racing writer's rows
    assert state["conflicts"] == 1


CHILD = r"""
import sys, time, os
import ray
import ray.data as rd

lake, seg, txn, go = sys.argv[1:5]
mode = sys.argv[5] if len(sys.argv) > 5 else "cow"
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, %(repo)r)
from ray_cdc_lake.checkpoint import apply_incremental
from ray_cdc_lake.schemas import COMPILED_SCHEMA

ds = rd.read_parquet(seg)
while not os.path.exists(go):  # start barrier: maximize overlap
    time.sleep(0.01)
# independent writers with unrelated LSN ranges: hwm dedup is a
# single-ordered-log contract, so it is OFF here (txn idempotence + LWW
# provide the multi-writer guarantees)
apply_incremental(lake, txn, ds, events_schema=COMPILED_SCHEMA, dedup_below_hwm=False, mode=mode)
ray.shutdown()
"""


@pytest.mark.slow
def test_two_processes_commit_concurrently(tmp_path):
    """Two OS processes apply disjoint event segments to the SAME lake at
    the same time; with conflict-retry both must land and the final state
    is the union — no lost update, no duplicate, regardless of which
    writer wins each manifest version."""
    from ray_cdc_lake.sink import read_lake, read_manifest

    lake = str(tmp_path / "lake")
    seg_a = str(tmp_path / "a.parquet")
    seg_b = str(tmp_path / "b.parquet")
    pq.write_table(_events("a", 50, 0), seg_a)
    pq.write_table(_events("b", 50, 1000), seg_b)
    go = str(tmp_path / "go")
    script = str(tmp_path / "child.py")
    with open(script, "w") as f:
        f.write(CHILD % {"repo": REPO})

    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, script, lake, seg, txn, go],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        for seg, txn in ((seg_a, "txn-a"), (seg_b, "txn-b"))
    ]
    time.sleep(1)
    with open(go, "w") as f:
        f.write("go")
    errs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        if p.returncode != 0:
            errs.append(err.decode()[-2000:])
    assert not errs, errs

    m = read_manifest(lake)
    assert sorted(m.txns) == ["txn-a", "txn-b"]
    got = read_lake(lake).to_pandas()
    assert len(got) == 100
    assert set(got["path"]) == {f"a{i}" for i in range(50)} | {
        f"b{i}" for i in range(50)
    }


@pytest.mark.slow
def test_two_processes_commit_mor_deltas_concurrently(tmp_path):
    """Two OS processes commit MERGE-ON-READ deltas against the same
    committed base at the same time: optimistic retry must land both as
    delta entries (no lost update, no duplicated carry-over), and the
    merged read is base + both deltas."""
    import ray.data as rd

    from ray_cdc_lake.checkpoint import apply_incremental
    from ray_cdc_lake.schemas import COMPILED_SCHEMA
    from ray_cdc_lake.sink import read_lake, read_manifest

    lake = str(tmp_path / "lake")
    apply_incremental(
        lake,
        "txn-base",
        rd.from_arrow(_events("base", 20, 0)),
        events_schema=COMPILED_SCHEMA,
        num_buckets=4,
    )

    seg_a = str(tmp_path / "a.parquet")
    seg_b = str(tmp_path / "b.parquet")
    pq.write_table(_events("a", 30, 2000), seg_a)
    pq.write_table(_events("b", 30, 3000), seg_b)
    go = str(tmp_path / "go")
    script = str(tmp_path / "child.py")
    with open(script, "w") as f:
        f.write(CHILD % {"repo": REPO})

    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, script, lake, seg, txn, go, "mor"],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        for seg, txn in ((seg_a, "txn-a"), (seg_b, "txn-b"))
    ]
    time.sleep(1)
    with open(go, "w") as f:
        f.write("go")
    errs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        if p.returncode != 0:
            errs.append(err.decode()[-2000:])
    assert not errs, errs

    m = read_manifest(lake)
    assert sorted(m.txns) == ["txn-a", "txn-b", "txn-base"]
    delta_txns = {e["txn_id"] for es in m.deltas.values() for e in es}
    assert delta_txns == {"txn-a", "txn-b"}  # both landed as deltas
    got = read_lake(lake).to_pandas()
    assert len(got) == 80
    assert set(got["path"]) == (
        {f"base{i}" for i in range(20)}
        | {f"a{i}" for i in range(30)}
        | {f"b{i}" for i in range(30)}
    )
