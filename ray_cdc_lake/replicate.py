"""Cross-lake incremental replication: keep a REPLICA lake converged to a
source lake by consuming the source's committed manifest chain — one
idempotent replica txn per source version step, moving only each step's
delta.

Delta extraction is pure manifest planning (no snapshot cogroup, no
full-lake diff): copy-on-write rewrites whole buckets, so a version
step's changed buckets are exactly those whose owning txn id changed —
and within them, the rows the step actually introduced are those with
``lsn > the bucket's previous high watermark`` (everything below is the
COW carry-over of prior state; ``_txn_delta_metrics`` counts by the same
invariant). Tombstones are read too (``live_only=False``), so deletes
replicate with their true LSNs and win LWW on the replica exactly as
they did on the source. Metadata-only predicate deletes replicate as
metadata: a step that adds a delete entry re-issues the same predicate
against the replica via ``delete_where``. Structural source txns
(compact / rescale / sort) change bucket owners without advancing any
watermark — the extracted delta is empty and the step replicates as an
empty committed txn (the replica records the step as applied without
copying a byte).

Resume/exactly-once: replica txn ids are ``repl-<src_version>``; the
sink's txn-id idempotence makes a re-run of any step a no-op, so a
killed replication resumes at the first unapplied source version. The
replica keeps its OWN bucket modulus (LWW apply is modulus-independent)
— a small replica of a huge lake can run 16 buckets against the source's
4096.

Reference analog: the S3 mirror the reference maintains next to its disk
tree (RenameS3Utils.kt:35-135 applies every disk change to the mirror in
the same batch) — here reborn as an asynchronous, resumable consumer of
the committed manifest chain, at an arbitrary replication lag.

Scale shape at 10^10 events: per step the replica reads only touched
buckets, file-pruned by the manifest's recorded lsn ranges
(``ranges={"lsn": (min_prev_hwm+1, None)}``), and ships only above-
watermark rows; the step count is a manifest count, not a data count.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import pyarrow as pa

from .checkpoint import apply_incremental, filter_after_hwm
from .schemas import COMPILED_SCHEMA
# worker-side kernels imported at MODULE scope: UDF closures below run in
# Ray workers whose cwd may not resolve `ray_cdc_lake` by path — a lazy
# in-function relative import raises ModuleNotFoundError there, while
# module-scope references travel with the self-contained pickle.
import os

from .sink import (
    DATA_DIR as _DATA_DIR,
    _DEFAULT_STORE,
    bucket_ids_mixed,
    delete_where,
    read_lake,
    read_manifest,
    register_consumer,
)
from .transforms import key_hash_u64

if TYPE_CHECKING:
    from .sink import LakeStore, Manifest


# Columns the engine mints internally and must never ship as event
# payload (the replica's own apply re-derives them). Everything else —
# including schema-evolved source columns — replicates verbatim.
_INTERNAL_COLUMNS = ("bucket",)


def _strip_internal(t: pa.Table) -> pa.Table:
    return t.drop_columns([c for c in _INTERNAL_COLUMNS if c in t.column_names])


def _txn_for(version: int) -> str:
    return f"repl-{version:06d}"


def replicate(
    src_lake: str,
    dst_lake: str,
    store: "LakeStore | None" = None,
    dst_store: "LakeStore | None" = None,
    num_buckets: int | None = None,
    assume_ordered_log: bool = True,
    consumer: str | None = None,
) -> dict:
    """Advance ``dst_lake`` to the current committed state of ``src_lake``.
    Applies one replica txn per unapplied source version, in order.
    Returns {"applied": [versions], "skipped": n_already_applied}.

    ``assume_ordered_log`` (default): the watermark delta extraction is
    exact ONLY under the single-ordered-binlog contract (the same one
    ``dedup_below_hwm`` encodes): every row a source txn introduces
    carries an lsn above its bucket's previous watermark. A source fed
    by independent writers with unrelated LSN ranges can commit LIVE
    rows BELOW a bucket's watermark — pass ``assume_ordered_log=False``
    and each step re-ships its changed buckets in full instead
    (more bytes, never wrong: re-applied carry-over rows are LWW
    no-ops on the replica).

    Retention contract: replication reads historical source versions, so
    the source must retain manifests back to the replica's lag point.
    Pass ``consumer="<name>"`` to REGISTER this replica's applied
    watermark on the source after every applied step
    (``sink.register_consumer``) — ``expire_snapshots`` then refuses to
    expire the replica's lag window unless called with ``force=True``.
    An unregistered replica is unprotected (same contract as any
    incremental consumer of the chain)."""
    import pyarrow.compute as pc  # noqa: F401  (kernel import kept local to workers)

    src_m = read_manifest(src_lake, store=store)
    if src_m.version == 0:
        raise FileNotFoundError(f"no committed state in {src_lake}")
    try:
        dst_m = read_manifest(dst_lake, store=dst_store)
        applied_txns = set(dst_m.txns)
    except FileNotFoundError:
        applied_txns = set()

    applied: list[int] = []
    skipped = 0
    prev: "Manifest | None" = None
    for v in range(1, src_m.version + 1):
        if _txn_for(v) in applied_txns:
            skipped += 1
            prev = None  # lazily re-read when the next unapplied step needs it
            continue
        m_old = (
            prev
            if prev is not None and prev.version == v - 1
            else (
                read_manifest(src_lake, store=store, version=v - 1)
                if v > 1
                else None
            )
        )
        m_new = read_manifest(src_lake, store=store, version=v)
        _replicate_step(
            src_lake, dst_lake, v, m_old, m_new,
            store=store, dst_store=dst_store, num_buckets=num_buckets,
            assume_ordered_log=assume_ordered_log,
        )
        applied.append(v)
        if consumer is not None:
            # per-step: a killed run leaves the watermark at the last
            # fully-applied version, so retention stays pinned correctly
            register_consumer(src_lake, consumer, v, store=store)
        prev = m_new
    if consumer is not None:
        # fully caught up (possibly all steps skipped as already applied)
        register_consumer(src_lake, consumer, src_m.version, store=store)
    return {"applied": applied, "skipped": skipped}


def _replicate_step(
    src_lake: str,
    dst_lake: str,
    version: int,
    m_old: "Manifest | None",
    m_new: "Manifest",
    store: "LakeStore | None",
    dst_store: "LakeStore | None",
    num_buckets: int | None,
    assume_ordered_log: bool = True,
) -> None:
    import ray.data as rd

    txn_id = _txn_for(version)

    # metadata-only predicate deletes replicate as the SAME predicate.
    # New entries are detected by txn_id, NOT by (column, op, value):
    # re-issuing an identical predicate while an earlier identical entry
    # is still active (delete -> re-upsert matching key -> delete again,
    # the GDPR re-erase flow) is a NEW entry with a new txn_id — matching
    # on the triple would classify it as already-seen and silently skip
    # it, leaving the re-upserted row alive on the replica forever.
    old_delete_txns = {e["txn_id"] for e in (m_old.deletes if m_old else [])}
    new_entries = [e for e in m_new.deletes if e["txn_id"] not in old_delete_txns]
    if new_entries:
        # a source commit carries at most one new delete entry (each
        # delete_where is its own version); replicate it and be done —
        # the step had no data txn
        e = new_entries[0]
        delete_where(
            dst_lake, txn_id, e["column"], e["op"], e["value"], store=dst_store
        )
        return

    old_buckets = m_old.buckets if m_old else {}
    changed = {
        b
        for b, info in m_new.buckets.items()
        if old_buckets.get(b, {}).get("txn_id") != info["txn_id"]
    }
    # per changed bucket: the watermark below which rows are COW
    # carry-over (already replicated by earlier steps). A bucket minted
    # by an online-rescale split inherits its old-modulus PARENT's
    # watermark: the split is a pure move, so everything it carried was
    # in the parent before — that is what makes a source rescale step
    # replicate as an EMPTY txn. A genuinely brand-new bucket has no
    # bound (all its rows are new).
    M_old = m_old.num_buckets if m_old else 0
    # old watermark INCLUDING any merge-on-read delta chain: rows a fold
    # or cow rewrite merged in from deltas were already replicated when
    # their delta txns landed, so they are carry-over, not new
    old_hwms = m_old.hwm() if m_old else {}
    prev_hwm: dict[int, int] = {}
    for b in changed:
        ib = int(b)
        if b in old_buckets:
            prev_hwm[ib] = old_hwms[ib]
        elif M_old and str(ib % M_old) in old_buckets:
            prev_hwm[ib] = old_hwms[ib % M_old]

    # STRUCTURAL steps (compact / rescale split / sort rewrite) change
    # bucket owners without raising any watermark — under the ordered-log
    # contract that proves the step introduced zero rows, so nothing is
    # read at all. Decided from manifest math alone.
    structural = bool(changed) and all(
        int(b) in prev_hwm and m_new.buckets[b]["hwm_lsn"] <= prev_hwm[int(b)]
        for b in changed
    )
    if assume_ordered_log and structural:
        changed = set()

    # MERGE-ON-READ txns change ``deltas``, not bucket owners — and their
    # delta files contain EXACTLY the rows the step introduced (the
    # micro-batch's own winners, tombstones included), so the extraction
    # is a direct file read with no watermark math and no log-order
    # assumption. New entries are detected by txn_id per bucket, same
    # discipline as the delete entries above.
    old_deltas = m_old.deltas if m_old else {}
    new_delta_files: list[str] = []
    for b, es in m_new.deltas.items():
        seen = {e["txn_id"] for e in old_deltas.get(b, [])}
        for e in es:
            if e["txn_id"] in seen:
                continue
            d = os.path.join(src_lake, _DATA_DIR, e["txn_id"], f"bucket={b}")
            fstats = e.get("files")
            if fstats is None:  # defensive: entries always record stats
                s = store or _DEFAULT_STORE
                new_delta_files += [
                    os.path.join(d, fn)
                    for fn in s.listdir(d)
                    if fn.endswith(".parquet")
                ]
            else:
                new_delta_files += [os.path.join(d, f["name"]) for f in fstats]

    if changed and assume_ordered_log:
        # conservative global bound for manifest FILE pruning: min over
        # every changed bucket's bound, 0 when any bucket is unbounded
        bounds = [prev_hwm.get(int(b), -1) + 1 for b in changed]
        lo = min(bounds)
        delta = read_lake(
            src_lake,
            version=version,
            live_only=False,  # tombstones replicate with their true LSNs
            store=store,
            buckets={int(b) for b in changed},
            # files whose recorded lsn range sits wholly below every
            # changed bucket's previous watermark never leave storage
            ranges={"lsn": (lo, None)} if lo > 0 else None,
        )
        src_nb = m_new.num_buckets or (max(int(b) for b in m_new.buckets) + 1)
        src_rescale = m_new.rescale

        def exact_delta(t: pa.Table) -> pa.Table:
            # per-bucket watermark filter (the file pruning above is
            # column-range coarse; this is the exact predicate) — bucket
            # recomputed with the source's mixed rule when the source is
            # itself mid-rescale
            h = key_hash_u64(t["repo"], t["path"])
            ids = bucket_ids_mixed(h, src_nb, src_rescale)
            t = t.append_column("bucket", pa.array(ids))
            t = filter_after_hwm(prev_hwm)(t)
            # drop ONLY engine-internal columns (the bucket id just
            # appended for the watermark filter) — schema-evolved source
            # columns must replicate, so no COMPILED_SCHEMA whitelist here
            return t.drop_columns(
                [c for c in _INTERNAL_COLUMNS if c in t.column_names]
            )

        events = delta.map_batches(exact_delta, batch_format="pyarrow")
        # a non-structural step has >= 1 above-watermark row, so schema
        # inference on the mapped pipeline always has a block to look at
        events_schema = None  # evolved source columns flow through inference
    elif changed:  # unordered-log mode: re-ship the changed buckets whole
        delta = read_lake(
            src_lake,
            version=version,
            live_only=False,
            store=store,
            buckets={int(b) for b in changed},
        )

        def strip_extras(t: pa.Table) -> pa.Table:
            # evolved source columns replicate; only internals are dropped
            return t.drop_columns(
                [c for c in _INTERNAL_COLUMNS if c in t.column_names]
            )

        events = delta.map_batches(strip_extras, batch_format="pyarrow")
        events_schema = None
    else:  # no bucket changed (or a proven-structural step): empty txn
        events = None
        events_schema = COMPILED_SCHEMA  # empty datasets can't infer one

    if new_delta_files:
        s = store or _DEFAULT_STORE
        mor = rd.read_parquet(new_delta_files, filesystem=s.fs).map_batches(
            _strip_internal, batch_format="pyarrow"
        )
        events = mor if events is None else events.union(mor)
        events_schema = None
    if events is None:
        events = rd.from_arrow(COMPILED_SCHEMA.empty_table())

    # ordered-chain apply: the replica's watermark dedup is valid here
    # (source versions ARE a single ordered log), but COW carry-over rows
    # were already dropped above, so pass dedup_below_hwm=False to let
    # legitimately out-of-order source lsns through exactly as the source
    # committed them — txn-id idempotence + LWW give the guarantees.
    apply_incremental(
        dst_lake,
        txn_id,
        events,
        events_schema=events_schema,
        dedup_below_hwm=False,
        store=dst_store,
        num_buckets=num_buckets,
    )
