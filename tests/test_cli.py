"""The `python -m ray_cdc_lake` job-submit surface: thin, idempotent
wrappers over the library. Run in-process (the session fixture owns Ray;
_ray_up's is_initialized guard must respect that)."""

from __future__ import annotations

import json

from ray_cdc_lake.__main__ import main

SF = "/root/testdata/sf0.001"


def test_cli_replay_metrics_roundtrip(tmp_path, capsys):
    lake = str(tmp_path / "lake")
    assert main(["replay", "--sf-dir", SF, "--lake", lake]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["version"] == 1 and out["metrics"]["applied_rows"] > 0

    # idempotent: same txn-id re-applies as a no-op, version unchanged
    assert main(["replay", "--sf-dir", SF, "--lake", lake]) == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["version"] == 1 and out2["txns"] == out["txns"]

    assert main(["metrics", "--lake", lake]) == 0
    m = json.loads(capsys.readouterr().out)
    assert m["txn_metrics"]["replay-0001"] == out["metrics"]
    assert len(m["lineage"]) > 0


def test_cli_query_unknown_name(tmp_path, capsys):
    assert main(["query", "--name", "nope", "--sf-dir", SF]) == 2


def test_cli_branch_roundtrip(tmp_path, capsys):
    import json as _json

    from ray_cdc_lake.__main__ import main
    from ray_cdc_lake.checkpoint import apply_incremental
    from tests.test_lakestore import SEG1, _seg

    lake = str(tmp_path / "lake")
    apply_incremental(lake, "txn-1", _seg(SEG1), num_buckets=4)
    assert main(["branch", "--lake", lake, "--create", "dev"]) == 0
    capsys.readouterr()
    assert main(["branch", "--lake", lake]) == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["dev"] == out["main"]
    assert main(["branch", "--lake", lake, "--merge", "dev"]) == 0
    assert main(["branch", "--lake", lake, "--delete", "dev"]) == 0


def test_cli_delete_where(tmp_path, capsys):
    from ray_cdc_lake.checkpoint import apply_incremental
    from ray_cdc_lake.sink import read_lake
    from tests.test_sink_resume import SEG_A, ev_ds

    lake = str(tmp_path / "lake")
    apply_incremental(lake, "t1", ev_ds(SEG_A))
    assert main(["delete-where", lake, "del-r1", "repo", "==", "r1"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["version"] == 2 and out["active_deletes"] == 1
    assert set(read_lake(lake).to_pandas()["repo"]) == {"r2"}


def test_cli_expire(tmp_path, capsys):
    from ray_cdc_lake.checkpoint import apply_incremental
    from ray_cdc_lake.sink import read_lake, read_manifest
    from tests.test_sink_resume import SEG_A, SEG_B, ev_ds

    lake = str(tmp_path / "lake")
    apply_incremental(lake, "t1", ev_ds(SEG_A), num_buckets=4)
    apply_incremental(lake, "t2", ev_ds(SEG_B), num_buckets=4)
    before = read_lake(lake).count()
    assert main(["expire", "--lake", lake, "--keep-last", "1"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["manifests_removed"] == ["manifest-000001.json"]
    assert read_manifest(lake).version == 2
    assert read_lake(lake).count() == before


def test_cli_tail_mor_and_fold(tmp_path, capsys):
    lake = str(tmp_path / "morlake")
    assert (
        main(
            [
                "tail", "--sf-dir", SF, "--lake", lake,
                "--micro-batches", "3", "--mode", "mor",
            ]
        )
        == 0
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "mor" and len(out["committed"]) == 3

    from ray_cdc_lake.sink import read_manifest

    assert any(read_manifest(lake).deltas.values())

    assert main(["fold", "--lake", lake]) == 0
    f = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert f["folded"] is True and f["buckets_with_deltas"] == 0

    # idempotent: nothing left to fold
    assert main(["fold", "--lake", lake]) == 0
    f2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert f2["folded"] is False

    # the mor tail + fold converges to the same state as a cow tail
    cow = str(tmp_path / "cowlake")
    assert main(["tail", "--sf-dir", SF, "--lake", cow, "--micro-batches", "3"]) == 0
    capsys.readouterr()
    from ray_cdc_lake.sink import read_lake

    key = ["repo", "path", "lsn"]
    a = sorted(map(tuple, read_lake(lake).to_pandas()[key].values.tolist()))
    b = sorted(map(tuple, read_lake(cow).to_pandas()[key].values.tolist()))
    assert a == b


def test_cli_compact_zorder(tmp_path, capsys):
    from ray_cdc_lake.sink import read_lake

    lake = str(tmp_path / "lake")
    assert main(["replay", "--sf-dir", SF, "--lake", lake]) == 0
    before = read_lake(lake).count()
    assert main(["compact", "--lake", lake, "--zorder", "path,lsn"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["txns"] == [f"compact-{out['version']:06d}"]
    assert read_lake(lake).count() == before


def test_cli_constraint_roundtrip(tmp_path, capsys):
    lake = str(tmp_path / "lake")
    assert (
        main(
            [
                "constraint", "--lake", lake,
                "--set", "langs", "lang", "in", "--value", '["py", "md"]',
            ]
        )
        == 0
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["constraints"][0]["value"] == ["py", "md"]
    assert main(["constraint", "--lake", lake, "--drop", "langs"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["constraints"] == []


def test_cli_sigindex_lifecycle(tmp_path, capsys):
    root = str(tmp_path / "sigidx")
    assert main(["sigindex", "--root", root, "--sf-dir", SF, "--append", "base"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["txns"] == ["base"]
    assert main(["sigindex", "--root", root, "--sf-dir", SF, "--append", "b2"]) == 0
    capsys.readouterr()
    # probing the SAME docs against the index finds every doc duplicated
    assert main(["sigindex", "--root", root, "--sf-dir", SF, "--probe"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["duplicates"] > 0
    assert main(["sigindex", "--root", root, "--compact"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["txns"]) == 1 and out["txns"][0].startswith("compact-")
    assert main(["sigindex", "--root", root, "--vacuum"]) == 0
    capsys.readouterr()
    # integrity audit (structural + data invariants) is green post-cycle
    assert main(["sigindex", "--root", root, "--fsck", "--data"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["fails"] == [] and out["files_checked"] > 0
