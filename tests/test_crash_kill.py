"""SIGKILL crash-resume: the exactly-once sink under REAL process death.

The injected-failure suites (fail_before_publish, monkeypatched raises)
choose their crash points; this one doesn't — a writer process is
SIGKILLed at varying wall-clock offsets, landing the kill anywhere in
derive/stage/publish. The invariants must hold at EVERY offset:

* the surviving lake passes a full fsck (committed state is never
  half-visible; staged leftovers are invisible orphans),
* re-running the SAME txn converges to the exact expected final state,
* the txn ledger stays duplicate-free (idempotent re-publish).

This is the north rule's "resume mid-stream without duplicate or lost
upserts" as an OS-level fact rather than an injected one."""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_EVENTS = 40_000  # stretches the child apply to a few seconds

CHILD = r"""
import sys, os
import ray
import ray.data as rd
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, %(repo)r)
from ray_cdc_lake.checkpoint import apply_incremental
from ray_cdc_lake.schemas import COMPILED_SCHEMA

lake, seg, txn = sys.argv[1:4]
ds = rd.read_parquet(seg)
apply_incremental(lake, txn, ds, events_schema=COMPILED_SCHEMA, num_buckets=4)
print("COMMITTED", flush=True)
ray.shutdown()
"""


def _events(n: int, lsn0: int) -> pa.Table:
    rng = np.random.default_rng(4)
    return pa.table({
        "lsn": pa.array(np.arange(lsn0, lsn0 + n), type=pa.int64()),
        "op": pa.array(["insert"] * n),
        "repo": pa.array([f"r{i % 7}" for i in range(n)]),
        "path": pa.array([f"dir{i % 97}/f{i % 4001}.py" for i in range(n)]),
        "commit": pa.array([f"c{lsn0 + i:09d}" for i in range(n)]),
        "lang": pa.array(["py"] * n),
        "content": pa.array(
            ["x" * int(k) for k in rng.integers(40, 400, n)]
        ),
    })


@pytest.mark.slow
def test_sigkill_at_any_offset_resumes_exactly_once(tmp_path):
    import ray.data as rd

    from ray_cdc_lake.checkpoint import apply_incremental
    from ray_cdc_lake.fsck import fsck
    from ray_cdc_lake.schemas import COMPILED_SCHEMA
    from ray_cdc_lake.sink import read_lake, read_manifest

    seg = str(tmp_path / "seg.parquet")
    events = _events(N_EVENTS, 1000)
    pq.write_table(events, seg)
    script = str(tmp_path / "child.py")
    with open(script, "w") as f:
        f.write(CHILD % {"repo": REPO})
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)

    # expected final state: one row per key, max lsn wins
    import duckdb

    want = duckdb.connect().execute(
        f"""SELECT repo, path, max(lsn) AS lsn FROM '{seg}'
            GROUP BY repo, path ORDER BY repo, path"""
    ).df()

    for i, delay in enumerate([1.5, 3.0, 4.5, None]):
        lake = str(tmp_path / f"lake{i}")
        seed = _events(50, 0).set_column(
            2, "repo", pa.array(["seedrepo"] * 50)
        )  # keyspace DISJOINT from the crash batch
        apply_incremental(
            lake, "t-seed", rd.from_arrow(seed),
            events_schema=COMPILED_SCHEMA, num_buckets=4,
        )
        p = subprocess.Popen(
            [sys.executable, script, lake, seg, "t-crash"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        )
        committed_by_child = False
        if delay is None:
            out, _ = p.communicate(timeout=300)
            committed_by_child = b"COMMITTED" in out
        else:
            time.sleep(delay)
            if p.poll() is None:
                p.send_signal(signal.SIGKILL)
            else:
                committed_by_child = True  # finished before the kill
            p.wait(timeout=60)

        # invariant 1: whatever the kill hit, the lake audits clean
        rep = fsck(lake, data=True)
        df = rep.to_pandas() if hasattr(rep, "to_pandas") else rep
        fails = (
            df[df["status"] == "fail"].to_dict("records")
            if hasattr(df, "__getitem__") else []
        )
        assert not fails, (delay, fails)

        # invariant 2: the SAME txn re-runs to convergence, exactly once
        m = apply_incremental(
            lake, "t-crash", rd.read_parquet(seg),
            events_schema=COMPILED_SCHEMA, num_buckets=4,
        )
        assert m.txns.count("t-crash") == 1
        got = (
            read_lake(lake)
            .to_pandas()
            .query("lsn >= 1000")[["repo", "path", "lsn"]]
            .sort_values(["repo", "path"])
            .reset_index(drop=True)
        )
        assert len(got) == len(want), (delay, committed_by_child, len(got))
        assert got["lsn"].tolist() == want["lsn"].tolist()
        # seed rows untouched
        n_seed = read_lake(lake).to_pandas().query("lsn < 1000").shape[0]
        assert n_seed == 50
        assert sorted(read_manifest(lake).txns)[:1] != []  # ledger readable
