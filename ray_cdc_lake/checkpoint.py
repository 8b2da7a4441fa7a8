"""Checkpoint / resume: per-partition high-watermark lineage.

Reference analog: NiFi's FlowFile repository persists queue state so a
restarted flow re-processes only undelivered FlowFiles (SURVEY.md §4
"Checkpoint / resume" row). Here the manifest's per-bucket ``hwm_lsn`` IS
the checkpoint: an incremental apply filters incoming events to
``lsn > hwm[bucket]`` (events at or below the watermark were already
applied — duplicates from at-least-once delivery are dropped for free),
merges against the prior committed bucket state, and commits a new txn.
Kill-and-resume therefore converges to the byte-identical final state
(tested in tests/test_sink_resume.py).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .kernels import import_polars as _pl

from .merge import lww_winners_keep_bucket, partial_lww
from .schemas import DEFAULT_NUM_BUCKETS
from .sink import TARGET_BLOCK_BYTES, Manifest, commit_txn, read_lake, read_manifest
from .transforms import add_bucket

if TYPE_CHECKING:
    import ray.data

    from .sink import LakeStore

# Target block size when coalescing the post-combiner delta before the
# merge shuffle (see _apply_incremental_once): big enough that the sort
# fan tracks delta BYTES, small enough that one block never dominates a
# worker's heap. The SAME constant sizes read_lake's small-scan blocks —
# one notion, defined once in sink.
_DELTA_TARGET_BLOCK_BYTES = TARGET_BLOCK_BYTES


def filter_after_hwm(hwm: dict[int, int]):
    """Vectorized event filter: keep rows with lsn > hwm[bucket] (bucket
    column must exist). hwm is small (one entry per bucket) and shipped in
    the closure — broadcast once per task, not per batch."""
    if not hwm:
        return lambda batch: batch
    max_bucket = max(hwm) + 1
    table = np.full(max_bucket, -1, dtype=np.int64)
    for b, w in hwm.items():
        table[b] = w

    def fn(batch: pa.Table) -> pa.Table:
        bucket = batch["bucket"].to_numpy(zero_copy_only=False)
        lsn = batch["lsn"].to_numpy(zero_copy_only=False)
        wm = np.where(bucket < max_bucket, table[np.minimum(bucket, max_bucket - 1)], -1)
        return batch.filter(pa.array(lsn > wm))

    return fn


def _bucket_assigner(manifest: Manifest, num_buckets: int):
    """Batch fn appending the merge 'bucket' column. Plain modulus
    normally; the MIXED rule (sink.bucket_ids_mixed) while an online
    rescale is in flight, so mid-rescale applies land each key exactly
    where readers will look for it."""
    r = manifest.rescale
    if not r:
        return lambda b: add_bucket(b, num_buckets)
    from .sink import bucket_ids_mixed
    from .transforms import key_hash_u64

    def fn(batch: pa.Table) -> pa.Table:
        if "bucket" in batch.column_names:
            batch = batch.drop_columns(["bucket"])
        h = key_hash_u64(batch["repo"], batch["path"])
        ids = bucket_ids_mixed(h, num_buckets, r)
        return batch.append_column("bucket", pa.array(ids))

    return fn


VALID_OPS = ("insert", "update", "delete")


def _invalid_mask(t: "pa.Table"):
    """True where an event row cannot be applied: null key column, null
    lsn, or an op outside the compiled vocabulary."""
    import pyarrow.compute as pc

    ok = pc.is_valid(t["repo"])
    ok = pc.and_(ok, pc.is_valid(t["path"]))
    ok = pc.and_(ok, pc.is_valid(t["lsn"]))
    ok = pc.and_(ok, pc.is_in(t["op"], value_set=pa.array(list(VALID_OPS))))
    return pc.invert(pc.fill_null(ok, False))


def _gate_invalid(ds: "ray.data.Dataset", on_invalid: str):
    """The ingest validation gate (the reference's 'failure relationship'
    reborn at the sink: Jhove.kt routes unparseable inputs to a failure
    output instead of poisoning the batch). Returns (gated_ds,
    extra_metrics | None). 'raise' fails the apply loudly with a key
    sample; 'drop' filters invalid rows out and counts them — count and
    filter share one materialized pass over the micro-batch
    (deterministic across crash retries, so idempotent re-publishes
    still compare equal)."""
    import pyarrow.compute as pc

    if on_invalid == "raise":

        def check(t: pa.Table) -> pa.Table:
            bad = _invalid_mask(t)
            nbad = pc.sum(pc.cast(bad, pa.int64())).as_py() or 0
            if nbad:
                keycols = [c for c in ("lsn", "op", "repo", "path") if c in t.column_names]
                sample = t.filter(bad).select(keycols).slice(0, 3).to_pylist()
                raise ValueError(
                    f"{nbad} invalid event rows in batch (null key/lsn or "
                    f"op not in {VALID_OPS}); sample: {sample}"
                )
            return t

        return ds.map_batches(check, batch_format="pyarrow"), None
    if on_invalid == "drop":
        # single upstream execution for count + filter (same shape as
        # _gate_constraints): materialize the incoming micro-batch once
        # — bounded by the delta, never the lake — so the count pass
        # reads cached blocks instead of re-running the compile pipeline
        ds = ds.materialize()

        def count_bad(t: pa.Table) -> pa.Table:
            n = pc.sum(pc.cast(_invalid_mask(t), pa.int64())).as_py() or 0
            return pa.Table.from_pydict({"n": pa.array([n], type=pa.int64())})

        n_bad = int(
            ds.map_batches(count_bad, batch_format="pyarrow").sum("n") or 0
        )

        def keep(t: pa.Table) -> pa.Table:
            return t.filter(pc.invert(_invalid_mask(t)))

        gated = ds.map_batches(keep, batch_format="pyarrow")
        return gated, ({"applied_invalid_dropped": n_bad} if n_bad else None)
    raise ValueError(
        f"on_invalid must be None, 'raise' or 'drop', got {on_invalid!r}"
    )


def _constraint_mask(t: "pa.Table", constraints: list[dict]):
    """True where a non-delete event row violates some registered CHECK
    constraint. SQL three-valued logic for value ops (NULL passes);
    ``not_null`` is the null catcher; a column absent from the batch is
    all-null. Delete events are exempt (their payload is null by
    construction — a tombstone must never be blocked by a content
    constraint)."""
    import pyarrow.compute as pc

    viol = pa.array(np.zeros(t.num_rows, dtype=bool))
    for c in constraints:
        col = (
            t[c["column"]]
            if c["column"] in t.column_names
            else pa.nulls(t.num_rows)
        )
        op = c["op"]
        if op == "not_null":
            bad = pc.is_null(col)
        elif op == "in":
            if not c["value"]:
                # empty allow-list: every non-null value violates (an
                # empty pa.array is null-typed and is_in would raise)
                bad = pc.is_valid(col)
            else:
                vs = pa.array(c["value"])
                bad = pc.and_(
                    pc.invert(
                        pc.fill_null(pc.is_in(col, value_set=vs), False)
                    ),
                    pc.is_valid(col),
                )
        elif op == "<=":
            bad = pc.fill_null(pc.greater(col, c["value"]), False)
        elif op == ">=":
            bad = pc.fill_null(pc.less(col, c["value"]), False)
        elif op == "max_len":
            bad = pc.fill_null(
                pc.greater(pc.utf8_length(col), c["value"]), False
            )
        else:  # unknown op from a future writer: conservative pass
            continue
        viol = pc.or_(viol, bad)
    if "op" in t.column_names:
        viol = pc.and_(
            viol, pc.not_equal(t["op"].fill_null(""), "delete")
        )
    return viol


def _gate_constraints(
    ds: "ray.data.Dataset", constraints: list[dict], on_violation: str
):
    """Enforce the manifest's CHECK constraints on incoming events —
    the same gate shape as _gate_invalid: 'raise' fails the apply with
    a sample naming the violated constraints, 'drop' filters violating
    rows out and records ``applied_constraint_dropped``.

    Called INSIDE the apply's optimistic-commit attempt, on the
    post-watermark stream: the constraint set comes from the same
    manifest read that pins the commit's expected_version, so a
    concurrent ``set_constraint`` landing mid-apply forces a
    CommitConflict retry that re-gates with the fresh set — no window
    where rows violating an already-committed constraint slip in. The
    count in 'drop' mode therefore reflects rows that would actually
    have entered the merge (below-hwm redeliveries are already gone).
    """
    import pyarrow.compute as pc

    if on_violation == "raise":

        def check(t: pa.Table) -> pa.Table:
            bad = _constraint_mask(t, constraints)
            nbad = pc.sum(pc.cast(bad, pa.int64())).as_py() or 0
            if nbad:
                keycols = [
                    c
                    for c in ("lsn", "op", "repo", "path")
                    if c in t.column_names
                ]
                sample = t.filter(bad).select(keycols).slice(0, 3).to_pylist()
                names = [c["name"] for c in constraints]
                raise ValueError(
                    f"{nbad} event rows violate table constraints "
                    f"{names}; sample: {sample}"
                )
            return t

        return ds.map_batches(check, batch_format="pyarrow"), None
    if on_violation == "drop":
        # Single upstream execution for count + filter: materialize the
        # post-watermark micro-batch once (bounded by the incoming delta,
        # never the lake — same class as the apply's own combined-delta
        # materialize), then both passes read the cached blocks instead
        # of re-running the compile/normalize pipeline.
        ds = ds.materialize()

        def count_bad(t: pa.Table) -> pa.Table:
            n = (
                pc.sum(
                    pc.cast(_constraint_mask(t, constraints), pa.int64())
                ).as_py()
                or 0
            )
            return pa.Table.from_pydict({"n": pa.array([n], type=pa.int64())})

        n_bad = int(
            ds.map_batches(count_bad, batch_format="pyarrow").sum("n") or 0
        )

        def keep(t: pa.Table) -> pa.Table:
            return t.filter(pc.invert(_constraint_mask(t, constraints)))

        gated = ds.map_batches(keep, batch_format="pyarrow")
        return gated, (
            {"applied_constraint_dropped": n_bad} if n_bad else None
        )
    raise ValueError(
        f"on_violation must be 'raise' or 'drop', got {on_violation!r}"
    )


def apply_incremental(
    lake_dir: str,
    txn_id: str,
    compiled_events: "ray.data.Dataset",
    num_buckets: int | None = None,
    fail_before_publish: bool = False,
    events_schema: "pa.Schema | None" = None,
    max_attempts: int = 5,
    dedup_below_hwm: bool = True,
    branch: str | None = None,
    store: "LakeStore | None" = None,
    mode: str = "cow",
    on_invalid: str | None = None,
    on_violation: str = "raise",
) -> Manifest:
    """One exactly-once incremental CDC apply:

    1. bucket the incoming compiled events (stable hash),
    2. drop events at or below the committed per-bucket watermark
       (``dedup_below_hwm``) — valid ONLY for a single LSN-ordered log
       (the binlog-tail contract: re-deliveries of an ordered stream).
       Independent concurrent writers ingesting different sources carry
       unrelated LSN ranges, so they must pass ``dedup_below_hwm=False``
       and rely on txn-id idempotence + LWW instead,
    3. union with the prior committed state (tombstones included — they
       are inserts of 'delete' winners and keep winning against stale
       lower-LSN events),
    4. LWW-reduce per bucket, keep tombstones in the output,
    5. staged write + atomic manifest publish via sink.commit_txn,
       PINNED to the manifest version the merge read (expected_version)
       — a concurrent writer advancing the manifest raises
       CommitConflict and the whole apply re-reads and re-merges
       (Delta-style optimistic concurrency; losers retry, never
       overwrite).

    Re-running with the same txn_id after a crash is safe at every point.

    ``mode="mor"`` (merge-on-read) commits the micro-batch's OWN winners
    as delta entries against already-committed buckets instead of
    merging + rewriting them — write cost O(delta), independent of
    bucket size (the micro-batch-latency path a huge lake needs; the
    Iceberg-v2 data-sequencing analog). Readers merge base + deltas LWW
    at scan time; ``compact_deltas`` folds chains back into the base.
    Identical final read state to ``mode="cow"`` (tested); requires the
    events schema to match the committed lake schema (evolution goes
    through a cow apply) and no in-flight online rescale.

    ``on_invalid`` gates malformed events (null key/lsn, unknown op)
    BEFORE they can poison the merge: ``"raise"`` fails the apply with
    a sample, ``"drop"`` filters them out and records
    ``applied_invalid_dropped`` in the txn's ingest metrics (count and
    filter share one materialized micro-batch pass). Default ``None``
    adds zero cost and trusts the compiler's output — the right setting
    when events come from this engine's own ``compile_changes``.

    ``on_violation`` picks the enforcement mode for registered CHECK
    constraints (sink.set_constraint): ``"raise"`` (default) fails the
    apply with a key sample naming the violated constraints;
    ``"drop"`` filters violating rows and records
    ``applied_constraint_dropped`` in the txn metrics. Ignored when the
    manifest carries no constraints (zero cost).
    """
    from .sink import CommitConflict

    if mode not in ("cow", "mor"):
        raise ValueError(f"mode must be 'cow' or 'mor', got {mode!r}")
    if on_violation not in ("raise", "drop"):
        raise ValueError(
            f"on_violation must be 'raise' or 'drop', got {on_violation!r}"
        )
    extra_metrics = None
    if on_invalid is not None:
        compiled_events, extra_metrics = _gate_invalid(compiled_events, on_invalid)
    # CHECK constraints (set_constraint) are enforced INSIDE each commit
    # attempt from that attempt's own manifest read — a concurrent
    # set_constraint advancing the manifest triggers CommitConflict and
    # the retry re-gates with the fresh constraint set (a stale pre-loop
    # snapshot could let rows violate an already-committed constraint).
    # The pre-read below is only a perf HINT: when constraints will gate
    # and no schema was passed, pin the ARROW schema before any
    # map_batches wrapping hides it from the mor path's evolution check
    # (Ray's Schema wrapper is not a pa.Schema). Pinning from the data is
    # correctness-neutral, so a stale hint costs at most a schema fetch.
    _m0 = read_manifest(lake_dir, branch=branch, store=store)
    if _m0.constraints and events_schema is None:
        _s = compiled_events.schema(fetch_if_missing=True)
        events_schema = getattr(_s, "base_schema", None) or pa.schema(
            list(zip(_s.names, _s.types))
        )
    last: CommitConflict | None = None
    for _ in range(max_attempts):
        try:
            return _apply_incremental_once(
                lake_dir,
                txn_id,
                compiled_events,
                num_buckets=num_buckets,
                fail_before_publish=fail_before_publish,
                events_schema=events_schema,
                dedup_below_hwm=dedup_below_hwm,
                branch=branch,
                store=store,
                mode=mode,
                extra_metrics=extra_metrics,
                on_violation=on_violation,
            )
        except CommitConflict as exc:
            last = exc
    raise last


def _apply_incremental_once(
    lake_dir: str,
    txn_id: str,
    compiled_events: "ray.data.Dataset",
    num_buckets: int | None,
    fail_before_publish: bool,
    events_schema: "pa.Schema | None",
    dedup_below_hwm: bool = True,
    branch: str | None = None,
    store: "LakeStore | None" = None,
    mode: str = "cow",
    extra_metrics: dict | None = None,
    on_violation: str = "raise",
) -> Manifest:
    manifest = read_manifest(lake_dir, branch=branch, store=store)
    if num_buckets is None:  # follow the lake's committed modulus
        num_buckets = manifest.num_buckets or DEFAULT_NUM_BUCKETS
    elif manifest.num_buckets and num_buckets != manifest.num_buckets:
        # a different modulus re-buckets the same keys into NEW bucket ids
        # while the manifest keeps the old entries — every key would read
        # back twice (silent duplication). Re-bucketing is an explicit
        # whole-lake rewrite: compact(lake, num_buckets=N).
        raise ValueError(
            f"lake {lake_dir} is bucketed with num_buckets="
            f"{manifest.num_buckets}, apply requested {num_buckets} — "
            "re-bucket with compact(num_buckets=...) or, without a "
            "whole-lake rewrite txn, rescale.rescale_start/rescale_step"
        )
    elif manifest.buckets and not manifest.num_buckets and (
        max(int(b) for b in manifest.buckets) >= num_buckets
    ):
        # legacy manifest (modulus unrecorded): a committed bucket id >=
        # the requested modulus is impossible under that modulus — refuse
        # rather than silently duplicate (same heuristic as read_key)
        raise ValueError(
            f"lake {lake_dir} has committed bucket ids beyond the requested "
            f"num_buckets={num_buckets} — the lake was bucketed with a "
            "larger modulus; re-bucket with compact(num_buckets=...)"
        )
    assign = _bucket_assigner(manifest, num_buckets)
    ds = compiled_events.map_batches(assign, batch_format="pyarrow")
    if dedup_below_hwm:
        ds = ds.map_batches(filter_after_hwm(manifest.hwm()), batch_format="pyarrow")
    if manifest.constraints:
        # gate with THIS attempt's constraint set (same manifest read
        # that pins expected_version below) on the post-watermark stream
        ds, _cm = _gate_constraints(ds, manifest.constraints, on_violation)
        if _cm:
            extra_metrics = {**(extra_metrics or {}), **_cm}

    if mode == "mor" and manifest.buckets:
        return _apply_mor_once(
            lake_dir,
            txn_id,
            ds,
            manifest,
            num_buckets=num_buckets,
            fail_before_publish=fail_before_publish,
            events_schema=events_schema,
            branch=branch,
            store=store,
            extra_metrics=extra_metrics,
        )
    if manifest.buckets:
        prior = read_lake(lake_dir, live_only=False, branch=branch, store=store)
        prior = prior.map_batches(assign, batch_format="pyarrow")
        # conform both branches to one column order/schema before union
        # (schema evolution: missing columns null-backfilled — the
        # pa.unify_schemas analog of SURVEY.md §7 step 8). Pass
        # events_schema when statically known: ds.schema() on a lazy map
        # pipeline forces a partial execution just to learn the schema.
        if events_schema is not None:
            # caller passes the COMPILED schema; 'bucket' was added above
            s_new = events_schema.append(pa.field("bucket", pa.int64()))
        else:
            s_new = ds.schema()
        s_old = prior.schema()
        if s_old is None:
            # the prior read planned ZERO files — e.g. a metadata
            # predicate delete wiped every live row and the manifest's
            # column bounds pruned every file from the scan. No prior
            # state participates in the merge: commit the micro-batch's
            # own winners, still PINNED to the manifest version the
            # (empty) read observed, so a concurrent writer conflicts
            # normally. Untouched bucket entries keep their (all-dead)
            # files; touched ones are replaced by this txn's rewrite.
            combined = ds.map_batches(
                partial_lww, batch_format="pyarrow"
            ).materialize()
            nb = max(1, combined.size_bytes() // _DELTA_TARGET_BLOCK_BYTES)
            if combined.num_blocks() > 2 * nb:
                combined = combined.repartition(int(nb)).materialize()
            return commit_txn(
                lake_dir,
                txn_id,
                lww_winners_keep_bucket(combined, combined=True),
                fail_before_publish=fail_before_publish,
                expected_version=manifest.version,
                num_buckets=num_buckets,
                branch=branch,
                store=store,
                extra_metrics=extra_metrics,
            )
        types: dict[str, pa.DataType] = {}
        for s in (s_old, s_new):  # new wins on retype (promotion)
            for n, t in zip(s.names, s.types):
                types[n] = t
        names = sorted(types)
        # TOUCHED-BUCKET PRUNING: copy-on-write is per-bucket (commit_txn
        # merges {**manifest.buckets, **bucket_stats}), so a micro-batch
        # that lands in K of B committed buckets only needs the prior
        # state of those K buckets — merging the whole lake per apply
        # would make sustained tail cost O(lake), not O(delta + touched).
        # The evolved-schema case falls back to a full rewrite: the read
        # path (one read_parquet over all live files) relies on the
        # invariant that every live file shares one schema, and a partial
        # rewrite would commit mixed schemas.
        old_types = dict(zip(s_old.names, s_old.types))
        evolved = set(names) != set(old_types) or any(
            old_types[n] != types[n] for n in old_types
        )

        def conform(batch: pa.Table) -> pa.Table:
            # a batch column missing from the declared union means the
            # caller's events_schema understates the data — dropping it
            # here would be silent data loss in the durability path
            extra = set(batch.column_names) - set(names)
            if extra:
                raise ValueError(
                    f"batch carries columns {sorted(extra)} absent from the "
                    "declared schema union — pass a complete events_schema "
                    "(or None to infer) so no column is silently dropped"
                )
            cols = []
            for n in names:
                if n in batch.column_names:
                    cols.append(batch[n].cast(types[n]))
                else:
                    cols.append(pa.nulls(batch.num_rows, types[n]))
            return pa.Table.from_arrays(cols, names=names)

        # combiner PER BRANCH, before the union: a combiner placed after
        # the UnionOperator cannot fuse into either branch's map chain,
        # so every pre-combine event byte (the full fan-out) would cross
        # the object store just to be collapsed one operator later. LWW
        # is associative — per-branch partials reduce to the same winners.
        delta = ds.map_batches(conform, batch_format="pyarrow").map_batches(
            partial_lww, batch_format="pyarrow"
        )
        if not evolved:
            # one pass over the micro-batch: materialize the combined
            # delta (bounded by the micro-batch's distinct keys, NOT the
            # lake), then plan the prior read from its bucket set. The
            # take_all is <= blocks x num_buckets tiny bucket-id rows.
            delta = delta.materialize()
            # COALESCE the combined delta to its post-combine SIZE: the
            # combiner collapses rows but keeps the input's block fan
            # (a 2.5M-event window reads as ~256 blocks, so the combined
            # delta is ~256 blocks of a few rows each), and the groupby
            # sort downstream partitions BY BLOCK COUNT — without this,
            # every micro-batch apply schedules input-fan-in tiny sort
            # tasks (measured 9.3 s -> 0.7 s for the merge of a 2.56M-
            # event window at 32 CPUs). The repartition moves only
            # post-combine rows (distinct keys per micro-batch), never
            # the event fan-in, so it holds at any scale.
            nb = max(1, delta.size_bytes() // _DELTA_TARGET_BLOCK_BYTES)
            if delta.num_blocks() > 2 * nb:
                delta = delta.repartition(int(nb)).materialize()
            parts = delta.map_batches(
                lambda t: pa.table({"bucket": pc.unique(t["bucket"])}),
                batch_format="pyarrow",
            ).take_all()
            touched = {int(r["bucket"]) for r in parts}
            committed = {int(b) for b in manifest.buckets}
            hit = touched & committed
            if not hit:
                # all-new buckets (or an empty post-watermark delta):
                # nothing of the prior state participates in the merge
                return commit_txn(
                    lake_dir,
                    txn_id,
                    lww_winners_keep_bucket(delta, combined=True),
                    fail_before_publish=fail_before_publish,
                    expected_version=manifest.version,
                    num_buckets=num_buckets,
                    branch=branch,
                    store=store,
                    extra_metrics=extra_metrics,
                )
            if hit != committed:
                prior = read_lake(
                    lake_dir,
                    live_only=False,
                    branch=branch,
                    store=store,
                    buckets=hit,
                ).map_batches(assign, batch_format="pyarrow")
        ds = delta.union(
            prior.map_batches(conform, batch_format="pyarrow").map_batches(
                partial_lww, batch_format="pyarrow"
            )
        )
        winners = lww_winners_keep_bucket(ds, combined=True)
    else:
        # first commit into an empty lake: combine map-side, then the
        # same size-based coalesce as the incremental path above — the
        # merge sort otherwise inherits the binlog read's block fan
        combined = ds.map_batches(partial_lww, batch_format="pyarrow").materialize()
        nb = max(1, combined.size_bytes() // _DELTA_TARGET_BLOCK_BYTES)
        if combined.num_blocks() > 2 * nb:
            combined = combined.repartition(int(nb)).materialize()
        winners = lww_winners_keep_bucket(combined, combined=True)
    return commit_txn(
        lake_dir,
        txn_id,
        winners,
        fail_before_publish=fail_before_publish,
        expected_version=manifest.version,
        num_buckets=num_buckets,
        branch=branch,
        store=store,
        extra_metrics=extra_metrics,
    )


def _lake_file_schema(lake_dir: str, manifest: Manifest, store) -> "pa.Schema | None":
    """Arrow schema of the committed lake's data files, from ONE footer
    open (every live file shares one schema — the read-path invariant the
    evolved-schema cow rewrite preserves). None when no file has recorded
    stats (legacy manifest)."""
    import os

    from .sink import DATA_DIR, _DEFAULT_STORE

    store = store or _DEFAULT_STORE
    import pyarrow.parquet as pq

    for b, info in sorted(manifest.buckets.items(), key=lambda kv: int(kv[0])):
        fstats = info.get("files")
        if fstats:
            p = os.path.join(
                lake_dir, DATA_DIR, info["txn_id"], f"bucket={b}", fstats[0]["name"]
            )
            with store.fs.open_input_file(p) as f:
                return pq.ParquetFile(f).schema_arrow
    return None


def _apply_mor_once(
    lake_dir: str,
    txn_id: str,
    ds: "ray.data.Dataset",
    manifest: Manifest,
    num_buckets: int,
    fail_before_publish: bool,
    events_schema: "pa.Schema | None",
    branch: str | None,
    store: "LakeStore | None",
    extra_metrics: dict | None = None,
) -> Manifest:
    """Merge-on-read apply: combine the micro-batch LWW map-side, coalesce
    to its post-combine size, reduce to its OWN winners (tombstones kept —
    they must shadow base rows at read), and commit them as delta entries.
    The prior state is never read and never rewritten — per-commit cost is
    O(micro-batch distinct keys), independent of bucket size."""
    from .sink import commit_txn as _commit

    if manifest.rescale:
        raise ValueError(
            "merge-on-read apply refused while an online rescale is in "
            "flight — finish it (rescale_step / compact) or use mode='cow'"
        )
    lake_schema = _lake_file_schema(lake_dir, manifest, store)
    if lake_schema is not None:
        if events_schema is not None:
            new_fields = {
                (f.name, str(f.type)) for f in events_schema if f.name != "bucket"
            }
        else:  # same forced-partial-execution caveat as the cow path
            s = ds.schema()
            new_fields = {
                (n, str(t)) for n, t in zip(s.names, s.types) if n != "bucket"
            }
        old_fields = {(f.name, str(f.type)) for f in lake_schema}
        if new_fields < old_fields:
            # old-shape events arriving AFTER a column add (the normal CDC
            # regime post-evolution): null-backfill the evolved columns
            # map-side, exactly as the cow path's conform does, so delta
            # files keep the one committed lake schema
            names = [f.name for f in lake_schema if f.name != "bucket"]
            types = {f.name: f.type for f in lake_schema}

            def _backfill(batch: pa.Table) -> pa.Table:
                cols = [
                    batch[n].cast(types[n])
                    if n in batch.column_names
                    else pa.nulls(batch.num_rows, types[n])
                    for n in names
                ]
                out = pa.Table.from_arrays(cols, names=names)
                if "bucket" in batch.column_names:
                    out = out.append_column("bucket", batch["bucket"])
                return out

            ds = ds.map_batches(_backfill, batch_format="pyarrow")
        elif new_fields != old_fields:
            raise ValueError(
                "merge-on-read apply requires the events schema to match "
                "(or be a null-backfillable subset of) the committed lake "
                f"schema (lake {sorted(old_fields)}, events "
                f"{sorted(new_fields)}) — new or retyped columns go "
                "through mode='cow', which rewrites to one unified schema"
            )
    combined = ds.map_batches(partial_lww, batch_format="pyarrow").materialize()
    nb = max(1, combined.size_bytes() // _DELTA_TARGET_BLOCK_BYTES)
    if combined.num_blocks() > 2 * nb:
        combined = combined.repartition(int(nb)).materialize()
    winners = lww_winners_keep_bucket(combined, combined=True)
    return _commit(
        lake_dir,
        txn_id,
        winners,
        fail_before_publish=fail_before_publish,
        expected_version=manifest.version,
        num_buckets=num_buckets,
        branch=branch,
        extra_metrics=extra_metrics,
        store=store,
        merge_on_read=True,
    )


def compact_deltas(
    lake_dir: str,
    buckets: "set[int] | None" = None,
    min_deltas: int = 1,
    store: "LakeStore | None" = None,
    max_attempts: int = 5,
) -> "Manifest | None":
    """Fold merge-on-read delta chains back into their buckets' base files
    (the LSM minor compaction at the lake level — ``compact()`` remains
    the major one). Reads ONLY the targeted buckets through the merged
    view (base + deltas LWW, active predicate deletes applied, tombstones
    kept) and commits the result as one copy-on-write txn, which clears
    those buckets' delta lists and deactivates their delete entries —
    read amplification returns to one file chain per bucket.

    ``min_deltas`` selects buckets whose chain is at least that long;
    ``buckets`` restricts further. Returns the committed manifest, or
    None when nothing qualified. Bucket-local (no cross-bucket shuffle);
    optimistic-concurrency retries like apply_incremental. A bucket whose
    merged state is EMPTY (a predicate delete wiped every row and no
    tombstone remains) commits as an explicit empty entry — watermark
    preserved, chain cleared, delete entry materialized/deactivated."""
    from .sink import CommitConflict, commit_txn, read_lake, read_manifest

    last: "CommitConflict | None" = None
    for _ in range(max_attempts):
        m = read_manifest(lake_dir, store=store)
        targets = sorted(
            (
                int(b)
                for b, es in m.deltas.items()
                if len(es) >= min_deltas and (buckets is None or int(b) in buckets)
            ),
        )
        if not targets:
            return None
        if not m.num_buckets:
            raise ValueError(
                "lake has no recorded bucket modulus (legacy manifest) — "
                "compact(num_buckets=...) once to record it first"
            )
        nb = m.num_buckets
        ds = read_lake(
            lake_dir, live_only=False, store=store, buckets=set(targets)
        )
        ds = ds.map_batches(lambda t: add_bucket(t, nb), batch_format="pyarrow")
        hwms = m.hwm()
        try:
            return commit_txn(
                lake_dir,
                f"fold-{m.version + 1:06d}",
                ds,
                store=store,
                expected_version=m.version,
                empty_buckets={str(b): hwms[b] for b in targets},
            )
        except CommitConflict as exc:
            last = exc
    raise last


def delete_by_prefix(
    lake_dir: str,
    prefix: str,
    txn_id: str,
    num_buckets: int | None = None,
    branch: str | None = None,
    store: "LakeStore | None" = None,
) -> Manifest:
    """Maintenance delete: tombstone every LIVE key whose path starts with
    ``prefix``, as ONE exactly-once transaction (the
    DeleteAllS3ObjectsByPrefix analog, …/processors/
    DeleteAllS3ObjectsByPrefix.kt:25-129 — including its trailing-slash
    guard so a prefix never swallows a sibling like ``tekst_1`` vs
    ``tekst_10``, :116-117). Streaming: the live state is filtered on
    the workers; only matching keys become tombstone events (lsn =
    global hwm + 1, so they win LWW against every existing row)."""
    import pyarrow.compute as pc

    # driver-side import captured by the worker closure (an in-function
    # relative import inside the UDF would ModuleNotFound in workers)
    from .kernels import md5_hex
    from .sink import read_lake

    manifest = read_manifest(lake_dir, branch=branch, store=store)
    if not manifest.buckets:
        return manifest
    if num_buckets is None:  # follow the lake's committed modulus
        num_buckets = manifest.num_buckets or DEFAULT_NUM_BUCKETS
    new_lsn = max(manifest.hwm().values()) + 1
    if not prefix.endswith("/"):
        # sibling-prefix guard: delete 'docs/de' must not match
        # 'docs/dedup/...' — the reference appends the separator
        prefix = prefix + "/"

    def to_tombstones(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.starts_with(batch["path"], prefix))
        n = t.num_rows
        # commit id derived from the KEY, not the batch position: a
        # crashed-and-retried apply must regenerate identical events
        # whatever the block split (the determinism contract: the commit
        # identifies the event). String assembly is an Arrow kernel, the
        # digest the shared batched kernel (as events.py mints commits) —
        # no per-row Python on this maintenance path.
        keys = pc.binary_join_element_wise(
            "del:", t["repo"], "/", t["path"], f"@{new_lsn}", ""
        )
        return pa.Table.from_arrays(
            [
                pa.array([new_lsn] * n, type=pa.int64()),
                pa.array(["delete"] * n, type=pa.string()),
                t["repo"],
                t["path"],
                md5_hex(keys),
                pa.nulls(n, pa.string()),
                pa.nulls(n, pa.large_string()),
            ],
            names=["lsn", "op", "repo", "path", "commit", "lang", "content"],
        )

    tombs = read_lake(lake_dir, branch=branch, store=store).map_batches(
        to_tombstones, batch_format="pyarrow"
    )
    from .schemas import COMPILED_SCHEMA

    # dedup_below_hwm=False: this txn is NOT part of the ordered binlog —
    # under conflict-retry a concurrent writer may have advanced the
    # per-bucket hwm past new_lsn, and the watermark filter would then
    # silently drop every tombstone and commit the delete as a no-op.
    # Idempotence comes from the txn id; concurrent upserts racing the
    # delete snapshot legitimately win LWW if their lsn is higher.
    return apply_incremental(
        lake_dir, txn_id, tombs, num_buckets=num_buckets,
        events_schema=COMPILED_SCHEMA, dedup_below_hwm=False, branch=branch,
        store=store,
    )


def lake_diff(
    lake_dir: str,
    v_old: int,
    v_new: int,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> "ray.data.Dataset":
    """Snapshot diff between two committed manifest versions (time
    travel + change feed): one bucketed shuffle of both LIVE states,
    per-key compare inside the bucket group. Emits (repo, path, change,
    old_lsn, new_lsn) with change in {added, deleted, updated} —
    unchanged keys never leave the reduce.

    Reference analog: the batch-summary emit (ReorderFiles.kt:396-410)
    reports what one batch changed; this reports what any RANGE of
    transactions changed, derived from immutable snapshots rather than
    an application-side log."""
    import pyarrow.compute as pc  # noqa: F401  (kept for parity with callers)

    from .sink import read_lake

    def tag(src: str):
        def fn(batch: pa.Table) -> pa.Table:
            t = batch.select(["repo", "path", "lsn"])
            return t.append_column(
                "_src", pa.array([src] * t.num_rows, type=pa.string())
            )

        return fn

    old = read_lake(lake_dir, version=v_old).map_batches(
        tag("old"), batch_format="pyarrow"
    )
    new = read_lake(lake_dir, version=v_new).map_batches(
        tag("new"), batch_format="pyarrow"
    )
    both = old.union(new).map_batches(
        lambda b: add_bucket(b, num_buckets), batch_format="pyarrow"
    )

    def diff_bucket(g: pa.Table) -> pa.Table:
        pl = _pl()

        df = pl.from_arrow(g.drop_columns(["bucket"]))
        p = df.group_by(["repo", "path"]).agg(
            pl.col("lsn").filter(pl.col("_src") == "old").max().alias("old_lsn"),
            pl.col("lsn").filter(pl.col("_src") == "new").max().alias("new_lsn"),
        )
        p = p.with_columns(
            pl.when(pl.col("old_lsn").is_null())
            .then(pl.lit("added"))
            .when(pl.col("new_lsn").is_null())
            .then(pl.lit("deleted"))
            .when(pl.col("old_lsn") != pl.col("new_lsn"))
            .then(pl.lit("updated"))
            .otherwise(pl.lit("unchanged"))
            .alias("change")
        )
        return (
            p.filter(pl.col("change") != "unchanged")
            .select(["repo", "path", "change", "old_lsn", "new_lsn"])
            .sort(["repo", "path"])
            .to_arrow()
        )

    return both.groupby("bucket").map_groups(diff_bucket, batch_format="pyarrow")


#: payload columns a change-feed row carries (the image of the row at the
#: version boundary; keys first, then the content columns).
CHANGE_FEED_COLUMNS = ["repo", "path", "commit", "lang", "content", "lsn"]


def change_feed(
    lake_dir: str,
    from_version: int,
    to_version: int,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    store: "LakeStore | None" = None,
) -> "ray.data.Dataset":
    """Change-data-feed read with full pre/post images (the Delta-CDF
    shape): for every manifest version step in ``(from_version,
    to_version]`` emit one row per changed key carrying the row IMAGE and

    * ``_change_type`` in {insert, delete, update_preimage,
      update_postimage} — updates emit TWO rows (old image + new image),
      deletes carry the last live image, and
    * ``_commit_version`` — the manifest version whose commit produced
      the change.

    Where ``lake_diff`` answers "which keys changed between two
    snapshots", this is the CONSUMABLE feed a downstream incremental job
    replays (e.g. to maintain its own derived table) without re-scanning
    either snapshot.

    Scale shape: one bucketed cogroup per VERSION STEP — each step
    shuffles only the two live states' payload for that pair, unchanged
    keys never leave the reduce, and the number of steps is a manifest
    count (metadata-bounded), not a data count. Snapshots are immutable
    once claimed, so every pair read is consistent (see read_manifest).

    Reference analog: the per-batch change summary the reference emits
    after each applied batch (``ReorderFiles.kt:396-410``) — here
    reconstructed exactly, with images, from any committed version range.
    """
    import pyarrow.compute as pc  # noqa: F401

    from .sink import read_lake

    if not from_version < to_version:
        raise ValueError(
            f"need from_version < to_version, got {from_version} >= {to_version}"
        )

    def tag(src: str):
        def fn(batch: pa.Table) -> pa.Table:
            t = batch.select(CHANGE_FEED_COLUMNS)
            return t.append_column(
                "_src", pa.array([src] * t.num_rows, type=pa.string())
            )

        return fn

    def feed_bucket_for(version: int):
        def feed_bucket(g: pa.Table) -> pa.Table:
            pl = _pl()

            df = pl.from_arrow(g.drop_columns(["bucket"]))
            old = df.filter(pl.col("_src") == "old").drop("_src")
            new = df.filter(pl.col("_src") == "new").drop("_src")
            j = old.join(
                new, on=["repo", "path"], how="full", suffix="_n", coalesce=True
            )
            payload = [c for c in CHANGE_FEED_COLUMNS if c not in ("repo", "path")]

            def image(side: str, ctype: str) -> pl.DataFrame:
                cols = [pl.col("repo"), pl.col("path")] + [
                    (pl.col(c) if side == "old" else pl.col(f"{c}_n")).alias(c)
                    for c in payload
                ]
                return sel.select(cols).with_columns(
                    pl.lit(ctype).alias("_change_type")
                )

            frames = []
            sel = j.filter(pl.col("lsn").is_null())
            frames.append(image("new", "insert"))
            sel = j.filter(pl.col("lsn_n").is_null())
            frames.append(image("old", "delete"))
            sel = j.filter(
                pl.col("lsn").is_not_null()
                & pl.col("lsn_n").is_not_null()
                & (pl.col("lsn") != pl.col("lsn_n"))
            )
            frames.append(image("old", "update_preimage"))
            frames.append(image("new", "update_postimage"))
            out = pl.concat(frames).with_columns(
                pl.lit(version, dtype=pl.Int64).alias("_commit_version")
            )
            return out.sort(["repo", "path", "_change_type"]).to_arrow()

        return feed_bucket

    feeds = []
    for v in range(from_version, to_version):
        old = read_lake(lake_dir, version=v, store=store).map_batches(
            tag("old"), batch_format="pyarrow"
        )
        new = read_lake(lake_dir, version=v + 1, store=store).map_batches(
            tag("new"), batch_format="pyarrow"
        )
        both = old.union(new).map_batches(
            lambda b: add_bucket(b, num_buckets), batch_format="pyarrow"
        )
        feeds.append(
            both.groupby("bucket").map_groups(
                feed_bucket_for(v + 1), batch_format="pyarrow"
            )
        )
    return feeds[0] if len(feeds) == 1 else feeds[0].union(*feeds[1:])


class AuditFailed(RuntimeError):
    """write_audit_publish's audit rejected the staged transaction; main
    was never touched and the staging branch has been dropped."""


def write_audit_publish(
    lake_dir: str,
    txn_id: str,
    compiled_events: "ray.data.Dataset",
    audit,
    branch: str = "wap-audit",
    events_schema: "pa.Schema | None" = None,
    num_buckets: int | None = None,
    store: "LakeStore | None" = None,
    mode: str = "cow",
) -> Manifest:
    """Write-audit-publish: stage a transaction on an isolated branch,
    run ``audit`` against the branch's COMMITTED state, and fast-forward
    it into main only if the audit passes. A failing audit (return False
    or raise) leaves main byte-identical, drops the staging branch, and
    raises AuditFailed — the staged data files become unreferenced and
    vacuumable. The Iceberg/Nessie WAP pattern composed from this
    engine's own primitives (branch pointer + exactly-once apply +
    ff-merge), so the audit sees exactly what production readers would.

    ``audit`` is ``Callable[[ray.data.Dataset], bool | None]`` over the
    branch's live state; None counts as pass (assert-style audits).

    Exactly-once: if ``txn_id`` is already on main, returns immediately
    (a crashed-after-merge retry must not re-stage); a leftover staging
    branch from a crashed earlier attempt is discarded and re-staged
    (its txn is not on main, so nothing published is lost).

    Reference analog: the two-phase staged commit + rollback of
    ``RenameDiskUtils.kt:32-105`` (phase-1 temp dir, validate, phase-2
    atomic promote; failure = delete the temp dir), lifted from one
    batch's file set to a whole transaction against the lake."""
    from .sink import create_branch, delete_branch, merge_branch

    m = read_manifest(lake_dir, store=store)
    if txn_id in m.txns or f"{branch}--{txn_id}" in m.txns:
        return m  # already published (crash after merge, before cleanup)

    from .sink import CommitConflict

    try:
        create_branch(lake_dir, branch, store=store)
    except CommitConflict:
        # leftover from a crashed attempt whose txn never reached main —
        # discard and re-stage from the current main head
        delete_branch(lake_dir, branch, store=store)
        create_branch(lake_dir, branch, store=store)

    try:
        apply_incremental(
            lake_dir,
            txn_id,
            compiled_events,
            num_buckets=num_buckets,
            events_schema=events_schema,
            branch=branch,
            store=store,
            mode=mode,
        )
        try:
            verdict = audit(read_lake(lake_dir, branch=branch, store=store))
        except Exception as exc:
            raise AuditFailed(f"audit raised for {txn_id!r}: {exc}") from exc
        if verdict is False:
            raise AuditFailed(f"audit returned False for {txn_id!r}")
        merged = merge_branch(lake_dir, branch, store=store)
    finally:
        # cleanup on every path: published state lives on main now (or
        # never existed); the branch pointer must not outlive the WAP
        try:
            delete_branch(lake_dir, branch, store=store)
        except FileNotFoundError:
            pass
    return merged


def maybe_compact(
    lake_dir: str,
    max_txns: int = 16,
    num_buckets: int | None = None,
    store: "LakeStore | None" = None,
    max_deltas: int | None = None,
    zorder: "tuple[str, ...] | None" = None,
) -> "Manifest | None":
    """Auto-compaction trigger for a long-running tail: once the
    committed txn list exceeds ``max_txns`` (each incremental apply adds
    one txn directory per touched bucket), run a full compaction. Call
    after each apply; returns the new manifest when compaction ran, else
    None. The threshold bounds read fan-in (files per bucket) without
    rewriting the lake on every apply — the LSM minor/major split at the
    lake level, mirroring state.SortedRunIndex at the partition level.

    ``max_deltas`` (opt-in) additionally folds any bucket whose
    merge-on-read delta chain reaches that length (compact_deltas —
    bucket-local, far cheaper than the full rewrite); the fold runs first
    so a full compaction triggered in the same call sees folded state.

    ``zorder`` (opt-in) makes the triggered full compaction a z-order
    clustering rewrite (compact(zorder=...)) — a tail that periodically
    compacts keeps its multi-column pruning layout without a separate
    maintenance pass."""
    if max_deltas is not None:
        compact_deltas(lake_dir, min_deltas=max_deltas, store=store)
    m = read_manifest(lake_dir, store=store)
    if len(m.txns) <= max_txns:
        return None
    return compact(lake_dir, num_buckets=num_buckets, store=store, zorder=zorder)


def compact(
    lake_dir: str,
    num_buckets: int | None = None,
    store: "LakeStore | None" = None,
    sort: bool = False,
    zorder: "tuple[str, ...] | None" = None,
) -> Manifest:
    """Rewrite the whole lake as ONE transaction and drop superseded files.
    ``num_buckets`` defaults to the lake's committed modulus; passing a
    different value is the ONE sanctioned way to re-bucket (the whole
    state is rewritten, so no stale bucket ids survive).

    After many incremental applies each bucket's state is spread over one
    file per touching txn; compaction (the LSM major-compaction analog —
    and the engine's answer to "never one giant file, but not a million
    tiny ones either") reads the committed state INCLUDING tombstones,
    re-buckets, commits it as ``compact-<version>``, publishes a manifest
    referencing only that txn, and vacuums everything else. State before
    and after is byte-identical (tested); per-bucket high watermarks are
    preserved because each bucket's max-LSN winner survives LWW.

    ``sort=True`` is SORT-ORDER compaction (the Iceberg sort-order /
    Delta Z-order analog for this key shape): a range-partitioned global
    sort on (bucket, repo, path) before the write, so every output file
    covers one contiguous key range of its bucket. Per-file (repo, path)
    min/max in the manifest then become DISJOINT, which turns read_key /
    range-scan pruning from bloom-assisted into exact interval lookup,
    and row-group pushdown inside a file prunes by the same order. A
    range shuffle, not a per-bucket map_groups: a whole bucket never has
    to fit in one worker's heap, so it holds at 100 TB buckets.

    ``zorder=(colA, colB, ...)`` is MULTI-COLUMN clustering (the Delta
    OPTIMIZE ZORDER analog, zorder.py): rows sort by the Morton
    interleave of the named columns' sample-ranked positions, so every
    output file covers a small hyper-rectangle of the combined space and
    ``read_lake(ranges=)`` predicates on ANY of the z columns prune
    files from manifest metadata alone. Costs one extra bounded
    sampling pass (columns= pruned, O(blocks x 512) values to the
    driver) on top of the same single range-partitioned sort
    ``sort=True`` pays; mutually exclusive with ``sort``.
    """
    from .sink import Manifest as _Manifest
    from .sink import _publish, _retain_metrics, _write_txn_data, read_manifest, vacuum

    m = read_manifest(lake_dir, store=store)
    if num_buckets is None:
        # an in-flight online rescale finishes HERE (compact rewrites the
        # whole state anyway, so default to the rescale's target modulus;
        # the fresh manifest below clears the rescale marker either way)
        if m.rescale:
            num_buckets = m.rescale["to"]
        else:
            num_buckets = m.num_buckets or DEFAULT_NUM_BUCKETS
    if sort and zorder:
        raise ValueError("sort and zorder are mutually exclusive")
    txn = f"compact-{m.version + 1:06d}"
    ds = read_lake(lake_dir, live_only=False, store=store)  # tombstones kept
    ds = ds.map_batches(lambda b: add_bucket(b, num_buckets), batch_format="pyarrow")
    if zorder:
        from .zorder import apply_zorder, sample_bounds

        cols = list(zorder)
        # bounded sampling pass over ONLY the z columns (pruned read)
        bounds = sample_bounds(
            read_lake(lake_dir, live_only=False, store=store, columns=cols),
            cols,
        )
        ds = apply_zorder(ds, cols, bounds)
        ds = ds.sort(["bucket", "_z"]).map_batches(
            lambda t: t.drop_columns(["_z"]), batch_format="pyarrow"
        )
    elif sort:
        ds = ds.sort(["bucket", "repo", "path"])
    # write the compact txn's data files WITHOUT publishing, then publish
    # exactly ONE manifest referencing only the compact txn — no
    # intermediate state mixing old bucket dirs with re-bucketed data is
    # ever visible (crash before the publish leaves the old manifest
    # intact and the compact files unreferenced/vacuumable)
    bucket_stats = _write_txn_data(lake_dir, txn, ds, store=store)
    final = _Manifest(
        version=m.version + 1,
        buckets=bucket_stats,
        txns=[txn],
        schema_version=m.schema_version,
        schema_fields=m.schema_fields,
        num_buckets=num_buckets,
        # lineage metrics survive compaction even though the txns they
        # describe are vacuumed — they are history, not file references
        metrics=_retain_metrics(m.metrics),
        constraints=m.constraints,
    )
    _publish(lake_dir, final, store=store)
    # reclaim the txns THIS commit provably superseded without waiting
    # out vacuum's orphan grace window; anything else (a concurrent
    # writer mid-commit, foreign staging) stays age-gated
    vacuum(lake_dir, store=store, reclaim=set(m.txns))
    return final
