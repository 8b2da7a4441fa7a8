"""Downstream CDC consumers: the views a lake's change feed exists to
serve, each expressed Ray-Data-first over the derived binlog.

* SCD Type-2 dimension history — every key's version intervals
  ``[valid_from, valid_to)`` with a current flag; the version-history
  flattening the reference's manifest serializer performs per object
  (``…/mets/MetsBrowsingSerializer.kt:296-412`` keeps one flattened
  "latest" view; SCD2 is the SAME fold keeping every interval).
* Partial-column (patch) upserts — Debezium-style events that carry only
  the columns that changed; the merge is per-COLUMN last-writer-wins
  (coalesce down the LSN order), not per-row. Reference analog: Jhove's
  embedded-MIX extraction patches SOME metadata fields of an existing
  record while leaving the rest (``…/validation/XsdValidator.kt:225-273``).
* Watermark / late-event flagging — the streaming-ingest policy decision
  (route late data to a correction path instead of the hot window), done
  as a DISTRIBUTED PREFIX SCAN: per-range maxima -> driver prefix-max of
  ~64 scalars -> per-range vectorized cummax. No global sort.
* Incremental view maintenance — a per-repo COUNT/SUM materialized view
  advanced from snapshot v1 to v2 using ONLY v1's live rows and the new
  event segment (never rescanning v2): the textbook delta-maintenance
  argument for why a CDC feed is worth producing at all.
* MERGE INTO — conditional merge rules (matched-update, matched-delete
  with a protection guard, not-matched-insert, pass-through) applied to
  a committed snapshot + change segment: the generic upsert shape a
  plain last-writer-wins merge cannot express.

Every op keeps the engine's merge contract (LWW by (lsn, op-rank,
commit); deletes apply before inserts within an LSN — merge.py:47-92)
and has an exact ANSI-SQL oracle sharing queries.py's event-derivation
CTEs.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa

from .kernels import import_polars as _pl
import pyarrow.compute as pc

from .events import STRIDE
from .merge import lww_winners
from .schemas import DEFAULT_NUM_BUCKETS
from .sources import read_table
from .transforms import add_bucket

if TYPE_CHECKING:
    import ray.data


# ---------------------------------------------------------------------------
# SCD Type-2 dimension history
# ---------------------------------------------------------------------------


def q_cdc_scd2_history(sf_dir: str):
    """Slowly-changing-dimension (type 2) history: one row per surviving
    version of every key, with ``valid_from`` = its LSN, ``valid_to`` =
    the LSN of the NEXT event on the key (any op — a newer version or a
    delete closes the interval), ``is_current`` when nothing follows.

    Shape at scale: exactly the flagship merge's shuffle — dedup +
    interval assignment are per-key folds, so one bucketed
    ``groupby(hash(repo,path) % B)`` co-locates each key's whole history
    and the kernel is one vectorized sort + shift per bucket. Duplicate
    deliveries (at-least-once) are dropped inside the bucket BEFORE the
    shift so they cannot create zero-length intervals. Event order within
    a key follows the merge contract: lsn, then delete-before-insert at
    the same lsn (rename-set semantics), then commit."""
    from .pipeline import compiled_log
    from .queries import E

    compiled = compiled_log(sf_dir, E).map_batches(
        lambda b: add_bucket(b, DEFAULT_NUM_BUCKETS), batch_format="pyarrow"
    )

    def scd2_bucket(g: pa.Table) -> pa.Table:
        pl = _pl()

        df = pl.from_arrow(g.drop_columns(["bucket"])).unique(
            subset=["repo", "path", "lsn", "op", "commit"]
        )
        df = df.with_columns(
            (pl.col("op") != "delete").cast(pl.Int8).alias("_rk")
        ).sort(["repo", "path", "lsn", "_rk", "commit"])
        df = df.with_columns(
            pl.col("lsn").shift(-1).over(["repo", "path"]).alias("valid_to")
        )
        return (
            df.filter(pl.col("op") != "delete")
            .with_columns(pl.col("valid_to").is_null().alias("is_current"))
            .rename({"lsn": "valid_from"})
            .select(
                ["repo", "path", "commit", "content", "valid_from", "valid_to", "is_current"]
            )
            .to_arrow()
        )

    return compiled.groupby("bucket").map_groups(scd2_bucket, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Partial-column (patch) upserts — per-column LWW
# ---------------------------------------------------------------------------

# Deterministic patch rule over the derived version events (epoch e =
# lsn // STRIDE): an event carries `content` only when e % 2 == 0 and
# `lang` (as 'lang-r<e>', so the winning epoch is observable) only when
# e % 3 == 0; e = 0 is the full insert. Kept in sync with the SQL oracle.


def patchify(batch: pa.Table) -> pa.Table:
    """Version events -> patch events: null out the columns this epoch's
    patch does not carry, and record per-column LSNs (-1 = absent) so the
    per-column LWW reduce is a plain max_by."""
    keep = pc.is_in(batch["op"], value_set=pa.array(["insert", "update"]))
    t = batch.filter(keep)
    lsn = t["lsn"].to_numpy(zero_copy_only=False).astype(np.int64)
    e = lsn // STRIDE
    has_content = e % 2 == 0
    has_lang = e % 3 == 0
    lang_val = pc.binary_join_element_wise(
        pc.cast(t["lang"], pa.string()),
        pa.array([f"-r{x}" for x in e], type=pa.string()),
        "",
    )
    return pa.table(
        {
            "repo": t["repo"],
            "path": t["path"],
            "lsn": t["lsn"],
            "content": pc.if_else(pa.array(has_content), t["content"], None),
            "content_lsn": pa.array(np.where(has_content, lsn, -1)),
            "lang": pc.if_else(pa.array(has_lang), lang_val, None),
            "lang_lsn": pa.array(np.where(has_lang, lsn, -1)),
        }
    )


def patch_reduce(t: pa.Table) -> pa.Table:
    """Per-column LWW fold: for each key keep each column's value at its
    max carrying LSN. Associative/commutative — the same kernel is the
    map-side combiner AND the per-bucket reduce."""
    pl = _pl()

    cols = [c for c in t.column_names if c != "bucket"]
    out = (
        pl.from_arrow(t.select(cols))
        .group_by(["repo", "path"])
        .agg(
            pl.col("lsn").max().alias("lsn"),
            pl.col("content").sort_by("content_lsn").drop_nulls().last().alias("content"),
            pl.col("content_lsn").max().alias("content_lsn"),
            pl.col("lang").sort_by("lang_lsn").drop_nulls().last().alias("lang"),
            pl.col("lang_lsn").max().alias("lang_lsn"),
        )
        .to_arrow()
    )
    # polars emits large_string; the bucket hash kernel needs string keys
    for k in ("repo", "path"):
        out = out.set_column(
            out.schema.get_field_index(k), k, pc.cast(out[k], pa.string())
        )
    return out


def q_cdc_patch_upserts(sf_dir: str):
    """Patch-style CDC merge: events carry only changed columns; the
    final row per key coalesces each column down the LSN order (last
    non-null wins per COLUMN — per-row LWW would resurrect stale columns
    from the newest patch). Same shuffle discipline as the flagship:
    per-batch combiner, then one bucketed groupby; the combiner is
    lossless because per-column max-by is associative."""
    from .pipeline import derive_event_log
    from .queries import E

    ds = (
        derive_event_log(sf_dir, E)
        .map_batches(patchify, batch_format="pyarrow")
        .map_batches(patch_reduce, batch_format="pyarrow")  # combiner
        .map_batches(
            lambda b: add_bucket(b, DEFAULT_NUM_BUCKETS), batch_format="pyarrow"
        )
    )

    def finish(g: pa.Table) -> pa.Table:
        out = patch_reduce(g)
        return (
            out.rename_columns(
                ["repo", "path", "last_lsn", "content", "content_lsn", "lang", "lang_lsn"]
            ).select(["repo", "path", "last_lsn", "content", "lang"])
        )

    return ds.groupby("bucket").map_groups(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Watermark / late-event flagging — distributed prefix scan
# ---------------------------------------------------------------------------

LATENESS_US = 3_600 * 1_000_000  # allowed lateness: 1 hour
JITTER_MOD_S = 7_200  # synthetic network delay: hash(event_id) % 2h
# Knuth multiplicative hash. The product is computed in uint64 with
# EXPLICIT mod-2^64 wrap on BOTH the engine (numpy uint64) and the oracle
# (HUGEINT % 2^64) — int64 would silently wrap in numpy but not in DuckDB
# once event_id exceeds ~3.5e9, i.e. exactly at the 10^10-event target.
_JITTER_MUL = 2654435761
_U64_MOD = 1 << 64
WM_RANGES = 64  # arrival-range granularity of the prefix scan


def _event_time(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(event_id, event-time µs): delivery order is ``event_id`` (the
    binlog position — ts is monotone in it in the corpus), event TIME is
    ts minus a deterministic per-event network delay, so late events
    exist and both sides compute them identically."""
    eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.int64)
    # uint64 multiply wraps mod 2^64 by definition — the oracle SQL
    # applies the same wrap via HUGEINT % 2^64
    delay_s = (eid.astype(np.uint64) * np.uint64(_JITTER_MUL)) % np.uint64(
        JITTER_MOD_S
    )
    delay_us = delay_s.astype(np.int64) * 1_000_000
    return eid, ts - delay_us


def q_events_watermark(sf_dir: str):
    """Flag late events against a running watermark (max event-time seen
    so far in delivery order) with 1 h allowed lateness — the router a
    streaming ingest needs in front of its window aggregates.

    A running max over delivery order is a PREFIX SCAN, done without a
    global sort: (1) one combiner-first pass computes the max event-time
    of each of ~64 delivery-order ranges (one tiny groupby; driver holds
    64 scalars — at larger scale make ranges a two-level tree, the payoff
    per level is x4096); (2) the exclusive prefix-max of those scalars is
    broadcast, and each range computes its own cummax seeded by its
    prefix — vectorized, each range independent. Total shuffle traffic:
    one row per (range, block) in pass 1, one groupby("range") in pass 2
    that moves only (event_id, event_ts) pairs."""
    import ray
    from ray.data.aggregate import Max

    from .sources import get_broadcast

    ds = read_table(sf_dir, "events", columns=["event_id", "ts"])
    n = ds.count()  # parquet row count — metadata, not a scan
    width = max(1, -(-n // WM_RANGES))

    def keyed(batch: pa.Table) -> pa.Table:
        eid, ets = _event_time(batch)
        return pa.table(
            {
                "event_id": pa.array(eid),
                "event_ts": pa.array(ets),
                "rng": pa.array(eid // width),
            }
        )

    def range_max(batch: pa.Table) -> pa.Table:
        pl = _pl()

        return (
            pl.from_arrow(batch.select(["rng", "event_ts"]))
            .group_by("rng")
            .agg(pl.col("event_ts").max().alias("mx"))
            .to_arrow()
        )

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow")
    maxima = (
        keyed_ds.map_batches(range_max, batch_format="pyarrow")
        .groupby("rng")
        .aggregate(Max("mx", alias_name="mx"))
        .take_all()  # <= WM_RANGES rows by construction
    )
    maxima.sort(key=lambda r: r["rng"])
    prefix: dict[int, int] = {}
    run = np.iinfo(np.int64).min
    for r in maxima:
        prefix[int(r["rng"])] = run  # EXCLUSIVE prefix: strictly earlier ranges
        run = max(run, int(r["mx"]))
    ref = ray.put(prefix)

    def scan_range(g: pa.Table) -> pa.Table:
        pfx = get_broadcast(ref)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        ets = g["event_ts"].to_numpy(zero_copy_only=False)
        order = np.argsort(eid, kind="stable")
        eid, ets = eid[order], ets[order]
        seed = pfx.get(int(g["rng"][0].as_py()), np.iinfo(np.int64).min)
        wm = np.maximum(np.maximum.accumulate(ets), seed)
        return pa.table(
            {
                "event_id": pa.array(eid),
                "event_ts": pa.array(ets).cast(pa.timestamp("us")),
                "watermark": pa.array(wm).cast(pa.timestamp("us")),
                "is_late": pa.array(ets < wm - LATENESS_US),
            }
        )

    return keyed_ds.groupby("rng").map_groups(scan_range, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Incremental view maintenance (delta-only advance of a materialized agg)
# ---------------------------------------------------------------------------


def q_cdc_incremental_view(sf_dir: str):
    """Maintain a per-repo materialized view (n_files, total_chars)
    across a commit WITHOUT rescanning the new snapshot: the view over
    snapshot v1 is advanced by joining segment-2's per-key LWW winners
    against v1's live rows only — added keys contribute (+1, +len),
    deletes (-1, -old_len), updates (0, new_len - old_len). COUNT and SUM
    are self-maintainable under deltas; note MAX is NOT (a delete can
    lower it), which is exactly why the view carries no hwm column — that
    lives in the manifest lineage instead (sink.Manifest.hwm).

    Scale shape: the only all-to-all is the bucketed cogroup of
    (v1 live keys x seg2 winners) — and since the lake's data layout IS
    bucket-partitioned (sink.py), a deployment reads v1 co-partitioned
    and only the winners move. The view tables themselves are ~#repos
    rows. Reference analog: the per-batch summary emit
    (``…/processors/ReorderFiles.kt:396-410``) advances repo counters
    per applied batch rather than recounting the store."""
    from ray.data.aggregate import Sum

    from .pipeline import compiled_log
    from .queries import E, _two_txn_lake
    from .sink import read_lake

    lake, cut = _two_txn_lake(sf_dir, "twotxn")

    def live_partial():
        def fn(batch: pa.Table) -> pa.Table:
            pl = _pl()

            df = pl.from_arrow(batch.select(["repo", "content"]))
            return (
                df.group_by("repo")
                .agg(
                    pl.len().cast(pl.Int64).alias("n_files"),
                    pl.col("content").str.len_chars().sum().cast(pl.Int64).alias("total_chars"),
                )
                .to_arrow()
            )

        return fn

    view1 = read_lake(lake, version=1, columns=["repo", "content"]).map_batches(
        live_partial(), batch_format="pyarrow"
    )

    # the delta inputs: v1's live keys (old side) + seg2's per-key winners
    def old_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": batch["repo"],
                "path": batch["path"],
                "lsn": batch["lsn"],
                "op": pa.array(["base"] * batch.num_rows, type=pa.string()),
                "len": pc.cast(pc.utf8_length(batch["content"]), pa.int64()),
                "_src": pa.array(["base"] * batch.num_rows, type=pa.string()),
            }
        )

    seg2 = compiled_log(sf_dir, E, min_lsn=cut)

    def delta_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": batch["repo"],
                "path": batch["path"],
                "lsn": batch["lsn"],
                "op": batch["op"],
                "len": pc.cast(pc.utf8_length(batch["content"]), pa.int64()),
                "_src": pa.array(["delta"] * batch.num_rows, type=pa.string()),
            }
        )

    both = (
        read_lake(lake, version=1, columns=["repo", "path", "lsn", "content"])
        .map_batches(old_rows, batch_format="pyarrow")
        .union(lww_winners(seg2).map_batches(delta_rows, batch_format="pyarrow"))
        .map_batches(
            lambda b: add_bucket(b, DEFAULT_NUM_BUCKETS), batch_format="pyarrow"
        )
    )

    def bucket_delta(g: pa.Table) -> pa.Table:
        pl = _pl()

        df = pl.from_arrow(g.drop_columns(["bucket"]))
        k = df.group_by(["repo", "path"]).agg(
            pl.col("len").filter(pl.col("_src") == "base").max().alias("old_len"),
            pl.col("lsn").filter(pl.col("_src") == "base").max().alias("old_lsn"),
            pl.col("len").filter(pl.col("_src") == "delta").max().alias("new_len"),
            pl.col("lsn").filter(pl.col("_src") == "delta").max().alias("new_lsn"),
            (pl.col("op").filter(pl.col("_src") == "delta") == "delete")
            .any()
            .alias("is_del"),
            (pl.col("_src") == "delta").any().alias("has_delta"),
        )
        k = k.filter(pl.col("has_delta"))  # untouched keys contribute nothing
        has_old = pl.col("old_lsn").is_not_null()
        # LWW guard: a delta older than the live row is a no-op (cannot
        # happen with monotone segment LSNs, but the math stays correct
        # for out-of-order feeds)
        stale = has_old & (pl.col("new_lsn") <= pl.col("old_lsn"))
        dn = (
            pl.when(stale)
            .then(0)
            .when(pl.col("is_del"))
            .then(pl.when(has_old).then(-1).otherwise(0))
            .otherwise(pl.when(has_old).then(0).otherwise(1))
        )
        dc = (
            pl.when(stale)
            .then(0)
            .when(pl.col("is_del"))
            .then(pl.when(has_old).then(-pl.col("old_len")).otherwise(0))
            .otherwise(
                pl.when(has_old)
                .then(pl.col("new_len") - pl.col("old_len"))
                .otherwise(pl.col("new_len"))
            )
        )
        k = k.with_columns(
            dn.cast(pl.Int64).alias("n_files"), dc.cast(pl.Int64).alias("total_chars")
        )
        return (
            k.group_by("repo")
            .agg(pl.col("n_files").sum(), pl.col("total_chars").sum())
            .to_arrow()
        )

    deltas = both.groupby("bucket").map_groups(bucket_delta, batch_format="pyarrow")

    # A repo whose live set fully drains sums to (repo, 0, 0); the view
    # contract (and the SQL oracle's GROUP BY over surviving rows) omits
    # such repos entirely, so drop the zero rows rather than emit phantoms.
    return (
        view1.union(deltas)
        .groupby("repo")
        .aggregate(
            Sum("n_files", alias_name="n_files"),
            Sum("total_chars", alias_name="total_chars"),
        )
        .map_batches(
            lambda t: t.filter(pc.greater(t["n_files"], 0)), batch_format="pyarrow"
        )
    )


# ---------------------------------------------------------------------------
# MERGE INTO — conditional merge rules beyond last-writer-wins
# ---------------------------------------------------------------------------


def q_cdc_merge_into(sf_dir: str):
    """Generic conditional MERGE (the SQL ``MERGE INTO`` shape) of a
    change segment into a committed snapshot — the rule table a plain
    LWW upsert cannot express:

    * WHEN MATCHED and source is a delete and target ``lang='de'``
      -> KEEP the target row (``protected`` — the retention/legal-hold
      rule; reference analog: the penalize-don't-drop routing decision,
      ``…/exceptions/RoutedException.kt:5-10``),
    * WHEN MATCHED and source is a delete -> drop the row,
    * WHEN MATCHED otherwise -> take the source row (``updated``),
    * WHEN NOT MATCHED and source is not a delete -> insert (``inserted``),
    * target rows the segment never touched pass through (``unchanged``).

    Scale shape: identical to the flagship merge — both sides carry only
    their final per-key row (v1 live state; seg2 LWW winners), one
    bucketed shuffle co-locates each key, and the rule table is a
    vectorized full join + mask per bucket. Since the lake's layout IS
    bucket-partitioned (sink.py), a deployment reads the target
    co-partitioned and only winners move."""
    from .pipeline import compiled_log
    from .queries import E, _two_txn_lake
    from .sink import read_lake

    lake, cut = _two_txn_lake(sf_dir, "twotxn")

    seg2 = compiled_log(sf_dir, E, min_lsn=cut)

    def tag(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            cols = ["repo", "path", "commit", "lang", "content", "lsn"]
            t = batch.select(cols + (["op"] if "op" in batch.column_names else []))
            if "op" not in t.column_names:
                t = t.append_column(
                    "op", pa.array(["live"] * t.num_rows, type=pa.string())
                )
            return t.append_column(
                "_side", pa.array([side] * t.num_rows, type=pa.string())
            )

        return fn

    both = (
        read_lake(lake, version=1)
        .map_batches(tag("tgt"), batch_format="pyarrow")
        .union(lww_winners(seg2).map_batches(tag("src"), batch_format="pyarrow"))
        .map_batches(
            lambda b: add_bucket(b, DEFAULT_NUM_BUCKETS), batch_format="pyarrow"
        )
    )

    return both.groupby("bucket").map_groups(merge_rules, batch_format="pyarrow")


def merge_rules(g: pa.Table) -> pa.Table:
    """The vectorized MERGE rule table over one co-located bucket of
    tagged rows (_side: tgt|src). Module-level so the property tests can
    drive it on arbitrary inputs (tests/test_cdc_views.py)."""
    pl = _pl()

    df = pl.from_arrow(g.drop_columns(["bucket"]) if "bucket" in g.column_names else g)
    t = df.filter(pl.col("_side") == "tgt").drop("_side", "op")
    s = df.filter(pl.col("_side") == "src").drop("_side")
    m = t.join(s, on=["repo", "path"], how="full", suffix="_s", coalesce=True)
    has_t = pl.col("lsn").is_not_null()
    has_s = pl.col("lsn_s").is_not_null()
    is_del = has_s & (pl.col("op") == "delete")
    action = (
        pl.when(~has_s)
        .then(pl.lit("unchanged"))
        .when(~has_t & ~is_del)
        .then(pl.lit("inserted"))
        .when(is_del & has_t & (pl.col("lang") == "de"))
        .then(pl.lit("protected"))
        .when(is_del)
        .then(pl.lit(None, dtype=pl.Utf8))  # deleted -> dropped
        .otherwise(pl.lit("updated"))
    )
    take_src = pl.col("action").is_in(["inserted", "updated"])
    out = (
        m.with_columns(action.alias("action"))
        .filter(pl.col("action").is_not_null())
        .with_columns(
            pl.when(take_src)
            .then(pl.col(f"{c}_s"))
            .otherwise(pl.col(c))
            .alias(c)
            for c in ["commit", "lang", "content", "lsn"]
        )
        .select(["repo", "path", "commit", "lang", "content", "lsn", "action"])
    )
    return out.to_arrow().cast(
        pa.schema(
            [
                ("repo", pa.string()),
                ("path", pa.string()),
                ("commit", pa.string()),
                ("lang", pa.string()),
                ("content", pa.large_string()),
                ("lsn", pa.int64()),
                ("action", pa.string()),
            ]
        )
    )


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def registry():
    from .queries import COMPILED_CTE, EVENTS_CTE

    queries = {
        "cdc_scd2_history": q_cdc_scd2_history,
        "cdc_patch_upserts": q_cdc_patch_upserts,
        "events_watermark": q_events_watermark,
        "cdc_incremental_view": q_cdc_incremental_view,
        "cdc_merge_into": q_cdc_merge_into,
    }
    cut = 2 * STRIDE
    merge_sql = f"""
        WITH {EVENTS_CTE}, {COMPILED_CTE},
        t_rank AS (
          SELECT *, row_number() OVER (PARTITION BY repo, path
              ORDER BY lsn DESC, (op <> 'delete') DESC, "commit" DESC) AS rn
          FROM normalized WHERE lsn < {cut}),
        tgt AS (
          SELECT repo, path, "commit", lang, content, lsn
          FROM t_rank WHERE rn = 1 AND op <> 'delete'),
        s_rank AS (
          SELECT *, row_number() OVER (PARTITION BY repo, path
              ORDER BY lsn DESC, (op <> 'delete') DESC, "commit" DESC) AS rn
          FROM normalized WHERE lsn >= {cut}),
        src AS (
          SELECT repo, path, "commit", lang, content, lsn, op
          FROM s_rank WHERE rn = 1),
        m AS (
          SELECT COALESCE(t.repo, s.repo) AS repo,
                 COALESCE(t.path, s.path) AS path,
                 t."commit" AS t_commit, t.lang AS t_lang,
                 t.content AS t_content, t.lsn AS t_lsn,
                 s."commit" AS s_commit, s.lang AS s_lang,
                 s.content AS s_content, s.lsn AS s_lsn, s.op AS s_op,
                 CASE
                   WHEN s.lsn IS NULL THEN 'unchanged'
                   WHEN t.lsn IS NULL AND s.op <> 'delete' THEN 'inserted'
                   WHEN s.op = 'delete' AND t.lsn IS NOT NULL
                        AND t.lang = 'de' THEN 'protected'
                   WHEN s.op = 'delete' THEN NULL
                   ELSE 'updated'
                 END AS action
          FROM tgt t FULL JOIN src s
            ON t.repo = s.repo AND t.path = s.path)
        SELECT repo, path,
               CASE WHEN action IN ('inserted','updated')
                    THEN s_commit ELSE t_commit END AS "commit",
               CASE WHEN action IN ('inserted','updated')
                    THEN s_lang ELSE t_lang END AS lang,
               CASE WHEN action IN ('inserted','updated')
                    THEN s_content ELSE t_content END AS content,
               CASE WHEN action IN ('inserted','updated')
                    THEN s_lsn ELSE t_lsn END AS lsn,
               action
        FROM m WHERE action IS NOT NULL"""
    sql = {
        "cdc_scd2_history": f"""
            WITH {EVENTS_CTE}, {COMPILED_CTE},
            dedup AS (
              SELECT DISTINCT lsn, op, repo, path, "commit", content
              FROM normalized),
            ordered AS (
              SELECT *, lead(lsn) OVER (
                  PARTITION BY repo, path
                  ORDER BY lsn, (op <> 'delete'), "commit") AS valid_to
              FROM dedup)
            SELECT repo, path, "commit", content, lsn AS valid_from,
                   valid_to, (valid_to IS NULL) AS is_current
            FROM ordered WHERE op <> 'delete'""",
        "cdc_patch_upserts": f"""
            WITH {EVENTS_CTE},
            patched AS (
              SELECT repo, path, lsn,
                     CASE WHEN (lsn // {STRIDE}) % 2 = 0 THEN content END AS content,
                     CASE WHEN (lsn // {STRIDE}) % 3 = 0
                          THEN lang || '-r' || CAST(lsn // {STRIDE} AS VARCHAR)
                     END AS lang
              FROM ev WHERE op IN ('insert', 'update'))
            SELECT repo, path, max(lsn) AS last_lsn,
                   max_by(content, lsn) FILTER (WHERE content IS NOT NULL) AS content,
                   max_by(lang, lsn) FILTER (WHERE lang IS NOT NULL) AS lang
            FROM patched GROUP BY repo, path""",
        "events_watermark": f"""
            WITH delayed AS (
              SELECT event_id,
                     ts - to_microseconds(
                         CAST(((CAST(event_id AS HUGEINT) * {_JITTER_MUL})
                               % {_U64_MOD}) % {JITTER_MOD_S} AS BIGINT)
                         * 1000000
                     ) AS event_ts
              FROM events),
            w AS (
              SELECT event_id, event_ts,
                     max(event_ts) OVER (
                         ORDER BY event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS watermark
              FROM delayed)
            SELECT event_id, event_ts, watermark,
                   (event_ts < watermark - to_microseconds({LATENESS_US})) AS is_late
            FROM w""",
        "cdc_merge_into": merge_sql,
        "cdc_incremental_view": f"""
            WITH {EVENTS_CTE}, {COMPILED_CTE}
            SELECT repo, CAST(count(*) AS BIGINT) AS n_files,
                   CAST(sum(length(content)) AS BIGINT) AS total_chars
            FROM ranked WHERE rn = 1 AND op <> 'delete'
            GROUP BY repo""",
    }
    return queries, sql
