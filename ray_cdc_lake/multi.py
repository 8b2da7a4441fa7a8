"""Multi-lake atomic transactions: one logical commit spanning N lakes.

The engine's manifests give each lake single-table snapshot isolation;
this module adds the cross-table half — a fact table and its dimension
(or a documents lake and its embeddings lake) advancing in ONE logical
transaction, so no reader who follows the protocol ever sees lake A's
half without lake B's.

Design (classic presumed-abort two-phase commit, shaped like Iceberg's
catalog-level multi-table transactions — the COORDINATOR RECORD is the
atomic commit point, not the N pointer flips):

1. **Stage** — each lake's events are applied on an isolated staging
   branch ``txg-<group id>`` (the exactly-once apply; main untouched).
2. **Decide** — a coordinator record ``<coord>/txg-<id>.json`` is
   atomically claimed with state ``committing`` and the full lake →
   branch map. THIS claim is the commit point: before it, a crash means
   presumed abort (recovery rolls staging branches back); after it, the
   group is durably decided and recovery ROLLS FORWARD.
3. **Publish** — each staging branch is fast-forward-merged into its
   lake's main (idempotent: a re-merge of an already-merged branch is a
   no-op), then the record moves to ``committed`` and branches are
   dropped.

``recover()`` finishes the protocol after any crash: ``committing``
records re-drive the merges (roll forward), stale ``staging`` records
roll back. A reader needing CROSS-lake consistency calls ``recover()``
first (or reads through ``read_group``); per-lake readers keep plain
snapshot isolation either way — staged branches are invisible on main
by construction.

Reference analog: the reference's two-phase batch apply stages every
file rename in a temp area and promotes all-or-nothing per batch
(``RenameDiskUtils.kt:32-105``, rollback :94-104); this lifts that
protocol from one directory's file set to N independent lakes.
"""

from __future__ import annotations

import json
import os
import time
from typing import TYPE_CHECKING

from .sink import (
    CommitConflict,
    LakeStore,
    _DEFAULT_STORE,
    create_branch,
    delete_branch,
    list_branches,
    merge_branch,
    read_manifest,
)

if TYPE_CHECKING:
    import ray.data


class GroupCommitError(RuntimeError):
    """A multi-lake commit could not be staged; all lakes rolled back."""


def _record_path(coord_dir: str, group_id: str) -> str:
    return os.path.join(coord_dir, f"txg-{group_id}.json")


def _branch_name(group_id: str) -> str:
    return f"txg-{group_id}"


def _write_record(
    store: LakeStore, coord_dir: str, group_id: str, payload: dict
) -> None:
    """Atomically replace the coordinator record (state transitions)."""
    store.makedirs(coord_dir)
    path = _record_path(coord_dir, group_id)
    tmp = path + f".tmp-{os.getpid()}"
    store.write_text(tmp, json.dumps(payload, indent=1, sort_keys=True))
    store.replace_file(tmp, path)


def _claim_record(
    store: LakeStore, coord_dir: str, group_id: str, payload: dict
) -> None:
    """Atomically CREATE the decision record — the 2PC commit point.
    Exactly one writer wins a group id (same primitive as a manifest
    version claim)."""
    store.makedirs(coord_dir)
    path = _record_path(coord_dir, group_id)
    tmp = path + f".tmp-{os.getpid()}"
    store.write_text(tmp, json.dumps(payload, indent=1, sort_keys=True))
    try:
        store.claim_with_content(tmp, path)
    finally:
        if store.exists(tmp):
            store.delete_file(tmp)


def commit_group(
    coord_dir: str,
    group_id: str,
    parts: "list[tuple[str, str, ray.data.Dataset]]",
    events_schema=None,
    num_buckets: int | None = None,
    store: LakeStore | None = None,
) -> dict:
    """Atomically commit one transaction group across N lakes.

    ``parts`` is ``[(lake_dir, txn_id, compiled_events), ...]`` — each
    lake gets its own exactly-once txn, but visibility is all-or-nothing
    for readers that follow the coordinator protocol.

    Idempotent by ``group_id``: re-running a committed group is a no-op;
    re-running after a crash resumes from wherever the protocol stopped
    (roll forward after the decision claim, restage before it).

    Every lake must already have at least one committed txn (branches
    need a base manifest) — bootstrap each lake's first txn directly.
    """
    from .checkpoint import apply_incremental

    store = store or _DEFAULT_STORE
    path = _record_path(coord_dir, group_id)
    branch = _branch_name(group_id)
    if store.exists(path):
        rec = json.loads(store.read_text(path))
        if rec["state"] == "committed":
            return rec
        if rec["state"] == "committing":  # crashed mid-publish: roll forward
            return _roll_forward(store, coord_dir, group_id, rec)
        raise GroupCommitError(
            f"group {group_id!r} has a concurrent/stale record in state "
            f"{rec['state']!r} — recover() it first"
        )

    lakes = [p[0] for p in parts]
    if len(set(lakes)) != len(lakes):
        raise ValueError("one entry per lake — merge a lake's parts first")

    # phase 1: stage every lake on its isolated txg branch
    staged: list[str] = []
    try:
        for lake_dir, txn_id, events in parts:
            try:
                create_branch(lake_dir, branch, store=store)
            except CommitConflict:
                # leftover from OUR crashed earlier attempt (the decision
                # record does not exist, so it cannot be a decided group)
                delete_branch(lake_dir, branch, store=store)
                create_branch(lake_dir, branch, store=store)
            staged.append(lake_dir)
            apply_incremental(
                lake_dir,
                txn_id,
                events,
                num_buckets=num_buckets,
                events_schema=events_schema,
                branch=branch,
                store=store,
            )
    except Exception as exc:
        for lake_dir in staged:  # presumed abort: nothing was decided
            try:
                delete_branch(lake_dir, branch, store=store)
            except FileNotFoundError:
                pass
        if isinstance(exc, GroupCommitError):
            raise
        raise GroupCommitError(f"staging failed for group {group_id!r}: {exc}") from exc

    # phase 2: the atomic decision — claiming this record COMMITS the group
    rec = {
        "group_id": group_id,
        "state": "committing",
        "branch": branch,
        "parts": [
            {"lake": lake_dir, "txn_id": txn_id} for lake_dir, txn_id, _ in parts
        ],
        "decided_at": time.time(),
    }
    _claim_record(store, coord_dir, group_id, rec)

    # phase 3: publish (idempotent; recovery re-drives this on a crash)
    return _roll_forward(store, coord_dir, group_id, rec)


def _roll_forward(
    store: LakeStore, coord_dir: str, group_id: str, rec: dict
) -> dict:
    branch = rec["branch"]
    for part in rec["parts"]:
        lake_dir = part["lake"]
        if branch in list_branches(lake_dir, store=store):
            m = read_manifest(lake_dir, store=store)
            expect = f"{branch}--{part['txn_id']}"
            if expect not in m.txns:
                merge_branch(lake_dir, branch, store=store)
            delete_branch(lake_dir, branch, store=store)
    rec = {**rec, "state": "committed", "committed_at": time.time()}
    _write_record(store, coord_dir, group_id, rec)
    return rec


def recover(coord_dir: str, store: LakeStore | None = None) -> dict[str, str]:
    """Finish every in-flight group: ``committing`` records roll forward
    (publish the remaining lakes), anything undecided rolls back (drop
    staging branches). Returns {group_id: outcome}. Safe to call any
    time; cross-lake-consistent readers call this (or ``read_group``)
    before relying on multi-lake invariants."""
    store = store or _DEFAULT_STORE
    out: dict[str, str] = {}
    if not store.isdir(coord_dir):
        return out
    for fn in sorted(store.listdir(coord_dir)):
        if not fn.startswith("txg-") or not fn.endswith(".json"):
            continue
        rec = json.loads(store.read_text(os.path.join(coord_dir, fn)))
        gid = rec["group_id"]
        if rec["state"] == "committed":
            out[gid] = "committed"
            continue
        if rec["state"] == "committing":
            _roll_forward(store, coord_dir, gid, rec)
            out[gid] = "rolled_forward"
            continue
        out[gid] = rec["state"]
    return out


def read_group(
    coord_dir: str,
    lake_dirs: list[str],
    store: LakeStore | None = None,
    **read_kwargs,
) -> "dict[str, ray.data.Dataset]":
    """Cross-lake-consistent read: finish any in-flight group commits,
    then open every lake at its (now settled) main head. Returns
    {lake_dir: Dataset}."""
    from .sink import read_lake

    store = store or _DEFAULT_STORE
    recover(coord_dir, store=store)
    return {
        d: read_lake(d, store=store, **read_kwargs) for d in lake_dirs
    }
