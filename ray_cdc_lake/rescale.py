"""Online bucket rescale: grow the lake's key-hash modulus INCREMENTALLY,
a few buckets per committed transaction, while reads and incremental
applies keep working against the mixed-modulus state.

Why not just ``compact(num_buckets=N)``? Compaction re-buckets the whole
lake in ONE transaction — at 100 TB that is one monster rewrite that must
finish (or be fully retried) before any apply proceeds at the new modulus.
Online rescale exploits a number-theoretic locality: with target modulus
``to = f * M`` (an integer multiple of the current modulus ``M``), every
key in old bucket ``b`` (``hash % M == b``) lands in one of exactly
``{b + M*j, j < f}`` under the new modulus (``hash % to ≡ b (mod M)``).
Splitting is therefore BUCKET-LOCAL: each step reads only the buckets it
splits, partitions their rows by the new modulus, and commits — no
cross-bucket shuffle, no touching the rest of the lake, O(step) work per
transaction. Ingest continues between steps: the manifest's ``rescale``
marker records which old buckets are split, and every writer/reader
shares ONE mixed assignment rule (sink.bucket_ids_mixed) — a key whose
old bucket is split lives at its new-modulus id, the rest stay put.
The final step (all old ids split) flips ``num_buckets`` to the target
and clears the marker.

Reference analog: the reference's storage partitioning is the
``tekst_<itemId>/`` folder fan-out (RenameDiskUtils.kt:54,
RenameS3Utils.kt:137-139) — fixed at design time, with no way to widen it
under a growing corpus short of rewriting every prefix. This module is
the engine's answer at lake scale; the DynamoDB/Bigtable analog is
partition splitting under load.

Crash safety mirrors commit_txn: data is staged + moved before the
manifest claim, a crashed publish is detected by the already-claimed
next-version manifest (finish the pointer, never rewrite claimed data),
and the whole step is idempotent under retry.
"""

from __future__ import annotations

import json
import uuid
from typing import TYPE_CHECKING

from .sink import (
    CommitConflict,
    Manifest,
    _active_delete_buckets,
    _finish_pointer,
    _manifest_from_dict,
    _manifest_path,
    _publish,
    _retain_metrics,
    _write_txn_data,
    read_lake,
    read_manifest,
)
from .transforms import add_bucket

if TYPE_CHECKING:
    from .sink import LakeStore


def rescale_start(
    lake_dir: str, factor: int = 2, store: "LakeStore | None" = None
) -> Manifest:
    """Begin an online rescale to ``factor * num_buckets`` buckets.

    Metadata-only: publishes one manifest carrying the rescale marker
    with an empty split set — no data moves. Subsequent ``rescale_step``
    calls do the work; applies in between use the mixed rule
    automatically. Idempotent: retrying a crashed start re-claims the
    identical manifest and just finishes the pointer."""
    if int(factor) != factor or factor < 2:
        raise ValueError(f"factor must be an integer >= 2, got {factor!r}")
    m = read_manifest(lake_dir, store=store)
    if m.version == 0:
        raise FileNotFoundError(f"no committed state in {lake_dir}")
    if m.rescale:
        raise ValueError(
            f"rescale to {m.rescale['to']} already in flight "
            f"({len(m.rescale['split'])} of {m.num_buckets} buckets split) — "
            "finish it (rescale_step until done, or compact) before starting "
            "another"
        )
    if not m.num_buckets:
        raise ValueError(
            "lake has no recorded bucket modulus (legacy manifest) — "
            "compact(num_buckets=...) once to record it before rescaling"
        )
    if any(m.deltas.values()):
        # a split step rewrites buckets bucket-locally from their base
        # files; an unfolded delta chain would detach from its base when
        # the split moves the keys. Mutually exclusive by construction
        # (commit_txn refuses merge-on-read commits mid-rescale).
        raise ValueError(
            "lake carries uncompacted merge-on-read deltas — fold them "
            "first (checkpoint.compact_deltas) before starting a rescale"
        )
    new = Manifest(
        version=m.version + 1,
        buckets=m.buckets,
        txns=m.txns,
        constraints=m.constraints,
        schema_version=m.schema_version,
        schema_fields=m.schema_fields,
        num_buckets=m.num_buckets,
        metrics=m.metrics,
        deletes=m.deletes,
        rescale={"to": int(factor) * m.num_buckets, "split": []},
    )
    _publish(lake_dir, new, store=store)
    return new


def rescale_step(
    lake_dir: str,
    max_buckets: int | None = None,
    store: "LakeStore | None" = None,
    max_attempts: int = 5,
) -> Manifest:
    """Split up to ``max_buckets`` not-yet-split old buckets (lowest ids
    first; default: all remaining) as ONE committed transaction.

    Each chosen old bucket's rows are re-partitioned by the target
    modulus — bucket-local by construction, so the step's cost is the
    size of the chosen buckets only. The last step (every old id split)
    finalizes: ``num_buckets`` flips to the target and the marker clears.
    Returns the new manifest (or the current one when nothing is left).

    Concurrent writers: a live apply that wins the next manifest version
    first conflicts this step (its split read is stale); the step
    re-reads and retries, same optimistic-concurrency loop as
    apply_incremental — rescale and ingest interleave without
    coordination."""
    last: CommitConflict | None = None
    for _ in range(max_attempts):
        try:
            return _rescale_step_once(lake_dir, max_buckets, store)
        except CommitConflict as exc:
            last = exc
    raise last


def _rescale_step_once(
    lake_dir: str,
    max_buckets: int | None,
    store: "LakeStore | None",
) -> Manifest:
    from .sink import _DEFAULT_STORE

    store = store or _DEFAULT_STORE
    m = read_manifest(lake_dir, store=store)
    if not m.rescale:
        raise ValueError(f"no rescale in flight on {lake_dir} — rescale_start first")
    M = m.num_buckets
    to = m.rescale["to"]
    split = set(m.rescale["split"])
    pending = [b for b in range(M) if b not in split]
    if not pending:  # marker present but complete — finalize-only step
        chosen: list[int] = []
    else:
        chosen = pending if max_buckets is None else pending[: int(max_buckets)]
        if not chosen:
            return m
    new_split = sorted(split | set(chosen))
    done = len(new_split) == M
    # the txn id carries a per-attempt nonce: two concurrent rescale_step
    # drivers (or a retry racing a slow winner) must not share a data dir
    # — _write_txn_data begins by rmtree'ing the dir for its txn id, so a
    # shared id would let a losing attempt delete the winner's already
    # moved (possibly already published) files. With the nonce each
    # attempt stages/moves in its own dir; a losing attempt's dir stays
    # unreferenced (no manifest names it) and vacuum() reclaims it.
    txn = f"rescale-{m.version + 1:06d}-{uuid.uuid4().hex[:8]}"
    with_data = [b for b in chosen if str(b) in m.buckets]

    # crash-after-claim recovery (the commit_txn guard, same reasoning):
    # if the NEXT version's manifest is already claimed by a rescale step
    # of THIS rescale, its data files are in place — finish the pointer
    # instead of rewriting them (a rewrite would mint new file stats and
    # orphan the claim). The claim is recognized by the rescale marker,
    # NOT by the split set this attempt happened to compute: the crashed
    # step may have run with a different max_buckets, so ANY claim with
    # the same target whose split set strictly grew past the current one
    # (modulus unchanged) is a finishable step — and a claim with the
    # marker cleared and the modulus flipped to the target is a
    # finishable FINAL step. An apply's claim carries the marker with an
    # UNCHANGED split set, so it never matches and conflicts as before.
    nxt_path = _manifest_path(lake_dir, m.version + 1)
    if store.exists(nxt_path):
        d = json.loads(store.read_text(nxt_path))
        r = d.get("rescale")
        if r is not None:
            claimed_split = set(r.get("split", []))
            ours = (
                r.get("to") == to
                and d.get("num_buckets") == M
                and claimed_split > split
            )
        else:
            ours = d.get("num_buckets") == to
        if ours:
            nxt = _manifest_from_dict(d)
            _finish_pointer(lake_dir, nxt, store, None)
            return nxt
        raise CommitConflict(
            f"manifest version {m.version + 1} already published by another "
            "writer — re-read and retry the step"
        )

    bucket_stats: dict[str, dict] = {}
    if with_data:
        ds = read_lake(
            lake_dir, live_only=False, buckets=set(with_data), store=store
        )
        # re-partition at the TARGET modulus: rows of old bucket b can
        # only land in {b + M*j} — file-local split, no shuffle
        ds = ds.map_batches(lambda t: add_bucket(t, to), batch_format="pyarrow")
        bucket_stats = _write_txn_data(lake_dir, txn, ds, store=store)

    new_buckets = {k: v for k, v in m.buckets.items() if int(k) not in set(chosen)}
    new_buckets.update(bucket_stats)
    new = Manifest(
        version=m.version + 1,
        buckets=new_buckets,
        txns=[*m.txns, txn] if with_data else m.txns,
        constraints=m.constraints,
        schema_version=m.schema_version,
        schema_fields=m.schema_fields,
        num_buckets=to if done else M,
        metrics=_retain_metrics(m.metrics),
        # split buckets were rewritten from a deletes-applied read, so
        # entries owned there deactivate; fully-inactive entries drop out
        deletes=[e for e in m.deletes if _active_delete_buckets(e, new_buckets)],
        rescale=None if done else {"to": to, "split": new_split},
    )
    _publish(lake_dir, new, store=store)
    return new


def rescale_status(lake_dir: str, store: "LakeStore | None" = None) -> dict:
    """{'active': bool, 'from': M, 'to': N, 'split': k, 'pending': M-k}."""
    m = read_manifest(lake_dir, store=store)
    if not m.rescale:
        return {"active": False, "num_buckets": m.num_buckets}
    k = len(m.rescale["split"])
    return {
        "active": True,
        "from": m.num_buckets,
        "to": m.rescale["to"],
        "split": k,
        "pending": m.num_buckets - k,
    }
