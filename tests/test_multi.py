"""Multi-lake atomic transactions (2PC coordinator): all-or-nothing
visibility across N lakes, roll-forward after a decided crash, presumed
abort before the decision. Mirrors the reference's all-or-nothing batch
apply (RenameDiskUtils.kt:32-105) lifted to N independent stores."""

from __future__ import annotations

import json

import pytest

from ray_cdc_lake.checkpoint import apply_incremental
from ray_cdc_lake.multi import (
    GroupCommitError,
    _branch_name,
    _claim_record,
    commit_group,
    read_group,
    recover,
)
from ray_cdc_lake.sink import create_branch, list_branches, read_manifest
from tests.test_sink_resume import ev_ds, lake_state

A1 = [(1, "insert", "ra", "a.py", "A1")]
B1 = [(1, "insert", "rb", "b.py", "B1")]
A2 = [(2, "update", "ra", "a.py", "A2")]
B2 = [(2, "update", "rb", "b.py", "B2")]


def _bootstrap(tmp_path):
    la, lb = str(tmp_path / "lake_a"), str(tmp_path / "lake_b")
    apply_incremental(la, "boot", ev_ds(A1))
    apply_incremental(lb, "boot", ev_ds(B1))
    return la, lb, str(tmp_path / "coord")


def test_commit_group_atomic_and_idempotent(tmp_path):
    la, lb, coord = _bootstrap(tmp_path)
    rec = commit_group(coord, "g1", [(la, "t2", ev_ds(A2)), (lb, "t2", ev_ds(B2))])
    assert rec["state"] == "committed"
    assert lake_state(la)[("ra", "a.py")] == (2, "A2")
    assert lake_state(lb)[("rb", "b.py")] == (2, "B2")
    # staging branches cleaned up on both lakes
    assert list(list_branches(la)) == ["main"] == list(list_branches(lb))
    va, vb = read_manifest(la).version, read_manifest(lb).version

    # idempotent re-run: no new versions, same outcome
    rec2 = commit_group(coord, "g1", [(la, "t2", ev_ds(A2)), (lb, "t2", ev_ds(B2))])
    assert rec2["state"] == "committed"
    assert read_manifest(la).version == va and read_manifest(lb).version == vb


def test_commit_group_staging_failure_rolls_back_all(tmp_path):
    la, lb, coord = _bootstrap(tmp_path)
    va, vb = read_manifest(la).version, read_manifest(lb).version

    class Boom:
        """A dataset stand-in whose apply explodes mid-staging."""

        def map_batches(self, *a, **k):
            raise RuntimeError("boom")

    with pytest.raises(GroupCommitError, match="staging failed"):
        commit_group(coord, "g2", [(la, "t3", ev_ds(A2)), (lb, "t3", Boom())])
    # NEITHER lake advanced; no branches; no decision record in committed state
    assert read_manifest(la).version == va and read_manifest(lb).version == vb
    assert list(list_branches(la)) == ["main"] == list(list_branches(lb))
    assert recover(coord) == {}  # nothing decided, nothing to do


def test_recover_rolls_forward_decided_group(tmp_path):
    """Crash window: both lakes staged + decision record claimed, but no
    merge happened. recover() must publish BOTH lakes."""
    from ray_cdc_lake.sink import _DEFAULT_STORE

    la, lb, coord = _bootstrap(tmp_path)
    branch = _branch_name("g3")
    for lake, txn, ev in ((la, "t4", A2), (lb, "t4", B2)):
        create_branch(lake, branch)
        apply_incremental(lake, "t4", ev_ds(ev), branch=branch)
    _claim_record(
        _DEFAULT_STORE,
        coord,
        "g3",
        {
            "group_id": "g3",
            "state": "committing",
            "branch": branch,
            "parts": [{"lake": la, "txn_id": "t4"}, {"lake": lb, "txn_id": "t4"}],
        },
    )
    # neither main sees the group yet
    assert lake_state(la)[("ra", "a.py")] == (1, "A1")

    assert recover(coord) == {"g3": "rolled_forward"}
    assert lake_state(la)[("ra", "a.py")] == (2, "A2")
    assert lake_state(lb)[("rb", "b.py")] == (2, "B2")
    assert list(list_branches(la)) == ["main"] == list(list_branches(lb))
    assert recover(coord) == {"g3": "committed"}  # settled


def test_read_group_settles_in_flight_commits(tmp_path):
    from ray_cdc_lake.sink import _DEFAULT_STORE

    la, lb, coord = _bootstrap(tmp_path)
    branch = _branch_name("g4")
    create_branch(la, branch)
    apply_incremental(la, "t5", ev_ds(A2), branch=branch)
    create_branch(lb, branch)
    apply_incremental(lb, "t5", ev_ds(B2), branch=branch)
    _claim_record(
        _DEFAULT_STORE,
        coord,
        "g4",
        {
            "group_id": "g4",
            "state": "committing",
            "branch": branch,
            "parts": [{"lake": la, "txn_id": "t5"}, {"lake": lb, "txn_id": "t5"}],
        },
    )
    out = read_group(coord, [la, lb])
    got = {
        (r["repo"], r["path"]): r["lsn"]
        for d in out.values()
        for r in d.to_pandas().to_dict("records")
    }
    assert got == {("ra", "a.py"): 2, ("rb", "b.py"): 2}


def test_leftover_undecided_branch_is_restaged(tmp_path):
    """A crash BEFORE the decision leaves staging branches but no record;
    the next attempt discards and restages them."""
    la, lb, coord = _bootstrap(tmp_path)
    branch = _branch_name("g5")
    create_branch(la, branch)  # leftover with no staged txn at all
    rec = commit_group(coord, "g5", [(la, "t6", ev_ds(A2)), (lb, "t6", ev_ds(B2))])
    assert rec["state"] == "committed"
    assert lake_state(la)[("ra", "a.py")] == (2, "A2")
