"""Maintenance racing live work, across OS processes.

The lake's multi-writer commit races are covered by test_concurrency;
this suite races the MAINTENANCE paths the same way:

* signature-index ``index_compact`` vs concurrent ``index_append``s —
  the compact claim loop must carry forward every append that commits
  after its fold snapshot, under any interleaving: no appended doc is
  ever lost, and a grace-0 vacuum afterwards reclaims only superseded
  dirs;
* ``expire_snapshots`` vs a live ``replicate(consumer=...)`` catch-up —
  the registered consumer watermark must pin the source's manifest
  chain (expiry REFUSES while the replica lags) so the replica always
  converges to the exact source state; once caught up, expiry succeeds
  and a re-run of replication is a clean no-op.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

import numpy as np
import pyarrow as pa
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_children(scripts_and_args, timeout=300):
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, *args],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        for args in scripts_and_args
    ]
    errs = []
    for p in procs:
        out, err = p.communicate(timeout=timeout)
        if p.returncode != 0:
            errs.append(err.decode()[-3000:])
    assert not errs, errs


APPENDER = r"""
import sys, time, os
import ray
import ray.data as rd
import pyarrow as pa

root, go = sys.argv[1], sys.argv[2]
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, %(repo)r)
from ray_cdc_lake.nearindex import index_append

def docs(base, n=8):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([base + i for i in range(n)], type=pa.int64()),
        "text": pa.array([f"doc body {base + i} unique words here" for i in range(n)]),
    }))

while not os.path.exists(go):
    time.sleep(0.01)
for k in range(4):
    index_append(root, f"race-{k}", docs(1000 + 100 * k))
ray.shutdown()
"""

COMPACTOR = r"""
import sys, time, os
import ray
root, go = sys.argv[1], sys.argv[2]
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, %(repo)r)
from ray_cdc_lake.nearindex import index_compact

while not os.path.exists(go):
    time.sleep(0.01)
for _ in range(3):
    index_compact(root)
    time.sleep(0.05)
ray.shutdown()
"""


@pytest.mark.slow
def test_index_compact_races_appends(tmp_path):
    import ray.data as rd

    from ray_cdc_lake.nearindex import (
        index_append,
        index_probe,
        index_vacuum,
        read_index_manifest,
    )

    root = str(tmp_path / "sigidx")

    def docs(base, n=8):
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([base + i for i in range(n)], type=pa.int64()),
            "text": pa.array(
                [f"doc body {base + i} unique words here" for i in range(n)]
            ),
        }))

    index_append(root, "t1", docs(0))
    index_append(root, "t2", docs(100))

    go = str(tmp_path / "go")
    app = str(tmp_path / "appender.py")
    cmp_ = str(tmp_path / "compactor.py")
    with open(app, "w") as f:
        f.write(APPENDER % {"repo": REPO})
    with open(cmp_, "w") as f:
        f.write(COMPACTOR % {"repo": REPO})

    # TWO compactors race each other AND the appender: nonce'd fold ids
    # + the stale-fold abort keep any interleaving duplicate- and
    # loss-free
    procs_args = [[app, root, go], [cmp_, root, go], [cmp_, root, go]]
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, *a], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for a in procs_args
    ]
    time.sleep(1)
    with open(go, "w") as f:
        f.write("go")
    errs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        if p.returncode != 0:
            errs.append(err.decode()[-3000:])
    assert not errs, errs

    # no appended batch lost, regardless of interleaving: a probe with
    # an exact copy of one doc from EVERY append finds it at est 1.0
    m = read_index_manifest(root)
    assert m is not None
    probes = {
        9000 + j: f"doc body {orig} unique words here"
        for j, orig in enumerate([0, 100, 1000, 1100, 1200, 1300])
    }
    got = index_probe(
        root,
        rd.from_arrow(pa.table({
            "doc_id": pa.array(list(probes), type=pa.int64()),
            "text": pa.array(list(probes.values())),
        })),
        threshold=0.9,
    ).to_pandas()
    assert len(got) == len(probes), got
    assert set(got["jaccard_est"]) == {1.0}

    # grace-0 vacuum reclaims only unreferenced dirs; probes still green
    index_vacuum(root, grace_s=0)
    got2 = index_probe(
        root,
        rd.from_arrow(pa.table({
            "doc_id": pa.array(list(probes), type=pa.int64()),
            "text": pa.array(list(probes.values())),
        })),
        threshold=0.9,
    ).to_pandas()
    assert len(got2) == len(probes)

    # closing integrity audit (the lake bench's fsck discipline): the
    # surviving index passes every structural AND data invariant
    from ray_cdc_lake.nearindex import index_fsck

    rep = index_fsck(root, data=True)
    assert rep["fails"] == [], rep


REPLICATOR = r"""
import sys, time, os
import ray
src, dst, go = sys.argv[1], sys.argv[2], sys.argv[3]
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, %(repo)r)
from ray_cdc_lake.replicate import replicate

while not os.path.exists(go):
    time.sleep(0.01)
replicate(src, dst, consumer="rep")
ray.shutdown()
"""

EXPIRER = r"""
import sys, time, os
src, go, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, %(repo)r)
from ray_cdc_lake.sink import expire_snapshots

while not os.path.exists(go):
    time.sleep(0.01)
refused = succeeded = 0
for _ in range(40):
    try:
        expire_snapshots(src, keep_last=1)
        succeeded += 1
    except ValueError:
        refused += 1
    time.sleep(0.05)
with open(out_path, "w") as f:
    f.write(f"{refused} {succeeded}")
"""


@pytest.mark.slow
def test_expiry_respects_live_replication(tmp_path):
    import ray.data as rd

    from ray_cdc_lake.checkpoint import apply_incremental
    from ray_cdc_lake.schemas import COMPILED_SCHEMA
    from ray_cdc_lake.replicate import replicate
    from ray_cdc_lake.sink import read_lake, register_consumer

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")

    def ev(prefix, n, lsn0):
        return rd.from_arrow(pa.table({
            "lsn": pa.array(np.arange(lsn0, lsn0 + n), type=pa.int64()),
            "op": pa.array(["insert"] * n),
            "repo": pa.array(["r"] * n),
            "path": pa.array([f"{prefix}{i}" for i in range(n)]),
            "commit": pa.array([f"c{lsn0 + i}" for i in range(n)]),
            "lang": pa.array(["py"] * n),
            "content": pa.array([f"body {prefix}{i}" for i in range(n)]),
        }).cast(COMPILED_SCHEMA))

    for v, (pfx, lsn0) in enumerate(
        [("a", 0), ("b", 100), ("c", 200), ("d", 300), ("e", 400)]
    ):
        apply_incremental(src, f"t{v}", ev(pfx, 10, lsn0), num_buckets=4)

    # the consumer is registered BEFORE any expiry can run, so the whole
    # chain is pinned: a keep_last=1 expiry against the lagging consumer
    # must refuse — deterministic, pre-race
    register_consumer(src, "rep", 0)
    from ray_cdc_lake.sink import expire_snapshots

    with pytest.raises(ValueError, match="rep"):
        expire_snapshots(src, keep_last=1)

    go = str(tmp_path / "go")
    rep = str(tmp_path / "replicator.py")
    exp = str(tmp_path / "expirer.py")
    exp_out = str(tmp_path / "expire_stats.txt")
    with open(rep, "w") as f:
        f.write(REPLICATOR % {"repo": REPO})
    with open(exp, "w") as f:
        f.write(EXPIRER % {"repo": REPO})

    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, rep, src, dst, go], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        ),
        subprocess.Popen(
            [sys.executable, exp, src, go, exp_out], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        ),
    ]
    time.sleep(1)
    with open(go, "w") as f:
        f.write("go")
    errs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        if p.returncode != 0:
            errs.append(err.decode()[-3000:])
    assert not errs, errs

    # the replica converged to the EXACT source state despite expiry
    # attempts throughout its catch-up
    src_rows = read_lake(src).to_pandas()
    dst_rows = read_lake(dst).to_pandas()
    key = ["repo", "path", "lsn", "content"]
    assert (
        src_rows[key].sort_values(key).reset_index(drop=True).equals(
            dst_rows[key].sort_values(key).reset_index(drop=True)
        )
    )
    assert len(src_rows) == 50

    # fully caught up: expiry now succeeds, and a replication re-run is
    # a clean no-op against the trimmed chain
    expire_snapshots(src, keep_last=1)
    res = replicate(src, dst, consumer="rep")
    assert res["applied"] == []
