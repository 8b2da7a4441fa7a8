"""Lake integrity audit (ray_cdc_lake/fsck.py + the fsck CLI).

Bar: a healthy multi-txn lake (cow applies + a merge-on-read delta)
passes every check including the distributed bucket-assignment scan; a
missing referenced file, a footer/manifest row drift, and rows moved
into the wrong bucket directory are each detected by exactly the check
that owns them; the CLI exits 1 on failure."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from ray_cdc_lake.checkpoint import apply_incremental
from ray_cdc_lake.fsck import fsck
from ray_cdc_lake.sink import read_manifest
from tests.test_sink_resume import SEG_A, SEG_B, ev_ds


def _lake(tmp_path, mor=False):
    lake = str(tmp_path / "lake")
    apply_incremental(lake, "txn-a", ev_ds(SEG_A), num_buckets=4)
    apply_incremental(
        lake, "txn-b", ev_ds(SEG_B), num_buckets=4, mode="mor" if mor else "cow"
    )
    return lake


def _report(lake, **kw):
    return {r["check"]: (r["status"], r["detail"]) for r in fsck(lake, **kw).to_pylist()}


def test_clean_lake_passes_all(tmp_path):
    lake = _lake(tmp_path, mor=True)
    rep = _report(lake, data=True)
    for check, (status, detail) in rep.items():
        assert status in ("ok", "info"), (check, detail)
    assert set(rep) == {
        "manifest_chain",
        "files_exist",
        "footer_rows",
        "watermarks",
        "delta_invariant",
        "orphans",
        "bucket_assignment",
    }


def test_missing_file_detected(tmp_path):
    lake = _lake(tmp_path)
    m = read_manifest(lake)
    b, info = next(iter(m.buckets.items()))
    victim = os.path.join(
        lake, "data", info["txn_id"], f"bucket={b}", info["files"][0]["name"]
    )
    os.remove(victim)
    rep = _report(lake)
    assert rep["files_exist"][0] == "fail"


def test_row_drift_detected(tmp_path):
    lake = _lake(tmp_path)
    m = read_manifest(lake)
    b, info = next(
        (b, i) for b, i in m.buckets.items() if i.get("rows", 0) >= 2
    )
    p = os.path.join(
        lake, "data", info["txn_id"], f"bucket={b}", info["files"][0]["name"]
    )
    t = pq.read_table(p)
    pq.write_table(t.slice(0, t.num_rows - 1), p)  # silently lose a row
    rep = _report(lake)
    assert rep["footer_rows"][0] == "fail"


def test_wrong_bucket_detected(tmp_path):
    lake = _lake(tmp_path)
    m = read_manifest(lake)
    buckets = list(m.buckets.items())
    (b1, i1), (b2, i2) = buckets[0], buckets[1]
    p1 = os.path.join(lake, "data", i1["txn_id"], f"bucket={b1}", i1["files"][0]["name"])
    p2 = os.path.join(lake, "data", i2["txn_id"], f"bucket={b2}", i2["files"][0]["name"])
    # swap the two files' CONTENT (names/row counts preserved): rows now
    # sit in directories their key hash does not map to
    t1, t2 = pq.read_table(p1), pq.read_table(p2)
    if t1.num_rows != t2.num_rows:
        # pad/truncate not needed — just require differing-bucket rows
        pass
    pq.write_table(t2, p1)
    pq.write_table(t1, p2)
    rep = _report(lake, data=True)
    assert rep["bucket_assignment"][0] == "fail"
    # metadata checks may also trip on rows; the point is the data check


def test_cli_fsck(tmp_path, capsys):
    from ray_cdc_lake.__main__ import main

    lake = _lake(tmp_path)
    assert main(["fsck", "--lake", lake, "--data"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert all(r["status"] != "fail" for r in out["report"])
    m = read_manifest(lake)
    b, info = next(iter(m.buckets.items()))
    os.remove(
        os.path.join(
            lake, "data", info["txn_id"], f"bucket={b}", info["files"][0]["name"]
        )
    )
    assert main(["fsck", "--lake", lake]) == 1


def test_constraints_audit(tmp_path):
    """Registered AFTER data exists: fsck --data retro-audits committed
    rows; pre-existing violations surface as a fail, a satisfied
    constraint as ok."""
    from ray_cdc_lake.sink import set_constraint

    lake = _lake(tmp_path)
    set_constraint(lake, "short", "content", "max_len", 1000)
    rep = _report(lake, data=True)
    assert rep["constraints"][0] == "ok"
    set_constraint(lake, "tiny", "content", "max_len", 1)
    rep = _report(lake, data=True)
    assert rep["constraints"][0] == "fail"
