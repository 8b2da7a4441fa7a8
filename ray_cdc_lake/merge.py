"""Last-writer-wins CDC merge — the engine's one logical shuffle.

Reference analog: the per-batch staged rename apply of
``RenameDiskUtils.kt:32-105`` / ``RenameS3Utils.kt:35-135``, where "latest
batch wins" (``StandardCopyOption.REPLACE_EXISTING``, RenameDiskUtils.kt:72,91)
— made explicit here as LWW by commit LSN per ``(repo, path)``
(SURVEY.md §2.9, §7 step 5).

Scale design:
* ``partial_lww`` is a per-batch COMBINER run inside ``map_batches`` before
  the shuffle: it keeps only the winning event per key per batch, so the
  all-to-all exchange moves one row per (key, batch) instead of every event.
  LWW is an associative/commutative reduce, so combining is lossless —
  including tombstones, which must survive to the final reduce.
* the shuffle is a ``groupby("bucket")`` on a stable hash of (repo, path)
  (transforms.key_hash_u64) — B buckets sized to the cluster, NOT one group
  per key (millions of tiny groups would drown the scheduler).
* ``final_lww`` runs per bucket, fully vectorized (sort + first-per-key).
* hot keys need no salting for the pure reduce (the combiner already
  collapses them), but ``salted`` buckets are supported for skewed *group*
  work; salted LWW must equal unsalted (tested).

Why groupby+map_groups and not raw bucket-pinned merge actors: the merge
is an associative reduce the Dataset API expresses directly, so the
streaming executor gets to schedule, pipeline and spill it; the "merge
buffer + sorted-run dedup index" state the north star names lives INSIDE
the reduce (partial_lww per map-side block; state.SortedRunIndex with
disk-spilled runs when a group exceeds memory), where it needs no
cross-task mutability. Raw actors would re-implement the shuffle for no
semantic gain (the brief's last-resort rule).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import pyarrow as pa
import pyarrow.compute as pc

from .schemas import DEFAULT_NUM_BUCKETS
from .transforms import add_bucket

if TYPE_CHECKING:
    import ray.data


def _winner_per_key(t: pa.Table, keys: list[str]) -> pa.Table:
    """Vectorized LWW: order by (lsn, op!='delete', commit) descending
    within key, keep the first row per key.

    The op rank implements rename-set semantics: a swap/cycle rename
    (A->B, B->A in one batch, RenameS3Utils.kt:62-66,120-127) compiles to
    delete+insert pairs AT THE SAME LSN on the same key — the batch is a
    set, deletes apply before inserts, so the insert wins. Remaining ties
    on (lsn, op, commit) are exact duplicate deliveries, where any pick is
    identical — the deterministic tie-break the reference lacks
    (SURVEY.md §2.9 'Ordering semantics')."""
    if t.num_rows == 0:
        return t
    added_rank = False
    if "op" in t.column_names:
        t = t.append_column("_op_rank", pc.cast(pc.not_equal(t["op"], "delete"), pa.int8()))
        added_rank = True
    sort_keys = [(k, "ascending") for k in keys] + [("lsn", "descending")]
    if added_rank:
        sort_keys.append(("_op_rank", "descending"))
    # Determinism contract: (lsn, op-rank, commit) totally orders DISTINCT
    # event versions because the commit id IDENTIFIES the event (md5 of
    # key@lsn in the derivation; a commit SHA in a real repo log). Rows
    # tying on all three are exact duplicate deliveries (any pick is the
    # same row); a log where one commit id carries two different payloads
    # is malformed and the winner among them is unspecified — the SQL
    # oracle's row_number() has the identical contract.
    sort_keys.append(("commit", "descending"))
    idx = pc.sort_indices(t, sort_keys=sort_keys)
    # Winners-only gather: materializing the full sorted table would copy
    # every content byte (the dominant column) just to immediately drop
    # all but one row per key — in the bandwidth-bound fan-out regime that
    # take IS the stage cost. Instead, find each key run's first position
    # using only the (small) key columns in sorted order, then take the
    # full rows for winners alone.
    import numpy as np

    n = t.num_rows
    first = np.ones(n, dtype=bool)
    for k in keys:
        col = pc.take(t[k], idx)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        neq = pc.not_equal(col.slice(1), col.slice(0, n - 1))
        neq = np.asarray(neq.to_numpy(zero_copy_only=False), dtype=bool)
        if k == keys[0]:
            diff = neq
        else:
            diff |= neq
    first[1:] = diff
    idx_np = idx.to_numpy(zero_copy_only=False)
    t = t.take(pa.array(idx_np[first]))
    if added_rank:
        t = t.drop_columns(["_op_rank"])
    return t


# Reduce-side memory guard: groups above this row count go through the
# sorted-run dedup index (state.SortedRunIndex) instead of one big sort —
# peak heap O(chunk), not O(group). The threshold is deliberately high:
# partial_lww already collapses each map-side block to <=1 row per key,
# so only a pathologically hot bucket reaches it.
SPILL_THRESHOLD_ROWS = 500_000


def _group_winners(group: pa.Table, keys: list[str]) -> pa.Table:
    if group.num_rows > SPILL_THRESHOLD_ROWS:
        from .state import merge_group_spilling

        return merge_group_spilling(group, keys)
    return _winner_per_key(group, keys)


def partial_lww(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: winning event per (repo, path) within this batch.
    Keeps tombstones (op='delete') — they must reach the final reduce."""
    return _winner_per_key(batch, ["repo", "path"])


def final_lww(group: pa.Table) -> pa.Table:
    """Per-bucket final reduce: LWW winner per key, then drop tombstones.
    Input columns: compiled-event columns + 'bucket'."""
    t = _group_winners(group, ["repo", "path"])
    t = t.filter(pc.not_equal(t["op"], "delete"))
    drop = [c for c in ("op", "bucket") if c in t.column_names]
    return t.drop_columns(drop)


def lww_winners(
    compiled: "ray.data.Dataset",
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> "ray.data.Dataset":
    """LWW winner per key INCLUDING tombstones (op column kept) — the merge
    core exposed for inspection/oracle checks."""
    ds = compiled.map_batches(partial_lww, batch_format="pyarrow")
    ds = ds.map_batches(lambda b: add_bucket(b, num_buckets), batch_format="pyarrow")
    return ds.groupby("bucket").map_groups(
        lambda g: _group_winners(g, ["repo", "path"]).drop_columns(["bucket"]),
        batch_format="pyarrow",
    )


def lww_winners_keep_bucket(
    ds: "ray.data.Dataset", combined: bool = False
) -> "ray.data.Dataset":
    """LWW winners per key for a dataset that ALREADY has a 'bucket'
    column; keeps 'bucket', 'op' and tombstone rows (the sink persists
    tombstones LSM-style so stale events can't resurrect deleted keys).

    ``combined=True`` skips the map-side combiner — for callers that
    already applied ``partial_lww`` upstream (e.g. per-branch BEFORE a
    union: a combiner placed after a UnionOperator cannot fuse into the
    branches' map chains, so the full pre-combine fan-out would hit the
    object store just to be collapsed one operator later)."""
    if not combined:
        ds = ds.map_batches(partial_lww, batch_format="pyarrow")
    return ds.groupby("bucket").map_groups(
        lambda g: _group_winners(g, ["repo", "path"]), batch_format="pyarrow"
    )


def lww_merge(
    compiled: "ray.data.Dataset",
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    salt_mod: int = 0,
) -> "ray.data.Dataset":
    """compiled change events -> final surviving rows (one per live key).

    Pipeline: map_batches(combiner) -> groupby(bucket) -> map_groups(LWW).
    With ``salt_mod > 0``, events are first reduced within
    ``num_buckets * salt_mod`` salted sub-partitions, then merged back by a
    second (much smaller) groupby on the true bucket — the skew path of
    SURVEY.md §7 step 9.
    """
    ds = compiled.map_batches(partial_lww, batch_format="pyarrow")
    if salt_mod > 0:
        ds = ds.map_batches(
            lambda b: add_bucket(b, num_buckets, salt_mod=salt_mod),
            batch_format="pyarrow",
        )
        # sub-partition reduce: winner per key within each salted bucket
        ds = ds.groupby("bucket").map_groups(
            lambda g: _group_winners(g, ["repo", "path"]), batch_format="pyarrow"
        )
        # merge-back: recompute the unsalted bucket and do the final reduce
        ds = ds.map_batches(
            lambda b: add_bucket(b.drop_columns(["bucket"]), num_buckets),
            batch_format="pyarrow",
        )
    else:
        ds = ds.map_batches(
            lambda b: add_bucket(b, num_buckets), batch_format="pyarrow"
        )
    return ds.groupby("bucket").map_groups(final_lww, batch_format="pyarrow")
