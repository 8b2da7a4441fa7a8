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

from .kernels import _winner_per_key
from .schemas import DEFAULT_NUM_BUCKETS
from .state import merge_group_spilling
from .transforms import add_bucket

if TYPE_CHECKING:
    import ray.data


# Reduce-side memory guard: groups above this row count go through the
# sorted-run dedup index (state.SortedRunIndex) instead of one big sort —
# peak heap O(chunk), not O(group). The threshold is deliberately high:
# partial_lww already collapses each map-side block to <=1 row per key,
# so only a pathologically hot bucket reaches it.
SPILL_THRESHOLD_ROWS = 500_000


def _group_winners(
    group: pa.Table,
    keys: list[str],
    spill_threshold: int | None = None,
    spill_kwargs: dict | None = None,
) -> pa.Table:
    thr = SPILL_THRESHOLD_ROWS if spill_threshold is None else spill_threshold
    if group.num_rows > thr:
        return merge_group_spilling(group, keys, **(spill_kwargs or {}))
    return _winner_per_key(group, keys)


def partial_lww(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: winning event per (repo, path) within this batch.
    Keeps tombstones (op='delete') — they must reach the final reduce."""
    return _winner_per_key(batch, ["repo", "path"])


def final_lww(
    group: pa.Table,
    spill_threshold: int | None = None,
    spill_kwargs: dict | None = None,
) -> pa.Table:
    """Per-bucket final reduce: LWW winner per key, then drop tombstones.
    Input columns: compiled-event columns + 'bucket'. ``spill_threshold``/
    ``spill_kwargs`` override the hot-bucket spill gate (tests and the
    cdc_final_state_spill driver proof force the LSM path with them)."""
    t = _group_winners(group, ["repo", "path"], spill_threshold, spill_kwargs)
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
