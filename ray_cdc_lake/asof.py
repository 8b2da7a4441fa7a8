"""As-of (temporal) join: enrich each probe row with the latest matching
right-side row at or before the probe's point in the ordering column —
"what did the lake/history say about this key as of lsn L".

Ray Data has no native as-of join; this is the composition the brief
prescribes for it: ONE hash(keys)-bucketed shuffle co-locating probes
and history, then a fully vectorized per-bucket kernel (lexsort +
running-maximum scan — no per-row Python, no per-probe binary-search
loop). Scale shape at 10^10 events: the shuffle moves each side once;
every bucket is processed independently, so a bucket only has to fit a
worker's heap (the same partitioning contract as the LWW merge), and
skewed keys can reuse the salting the merge path already owns.

Tie semantics mirror the engine's LWW rank: among right rows with equal
(keys, right_on), the winner is op != 'delete' first, then max commit —
exactly ``merge.partial_lww``'s ordering — when those columns exist;
otherwise input order decides (deterministic per sorted run). At equal
probe/history ordinates the history row MATCHES (backward as-of is
inclusive: right_on <= left_on).

Reference analog: ReorderFiles' "look up the current repo image for
this changed file before deciding the batch's final op"
(ReorderFiles.kt:149-185) — generalized to arbitrary time points.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .kernels import hash_utf8_u64

if TYPE_CHECKING:
    import ray.data


def _joined_keys(t: pa.Table, keys: tuple[str, ...]) -> pa.ChunkedArray:
    cols = [t[k].cast(pa.string()) for k in keys]
    if len(cols) == 1:
        return cols[0]
    # the in-kernel grouping compares the PACKED string, so a NUL inside
    # a key value would alias distinct multi-key rows (("a", "b\0c") ==
    # ("a\0b", "c")) and silently mis-join — reject loudly instead (the
    # engine's own path-safety already bans NUL; this guards the
    # operator's generic-key surface)
    for k, c in zip(keys, cols):
        if pc.any(pc.match_substring(c, "\x00")).as_py():
            raise ValueError(
                f"join key column {k!r} contains NUL (\\x00), the "
                "multi-key pack separator — NUL-bearing keys would alias "
                "across columns; sanitize them first"
            )
    return pc.binary_join_element_wise(*cols, "\x00")


def _bucket_of(joined, num_buckets: int) -> np.ndarray:
    # vectorized over the raw Arrow byte buffer — no pandas object-array
    # round-trip per batch on the join hot path (kernels.hash_utf8_u64);
    # transient per-query buckets, so no persisted-layout stability needed
    return (hash_utf8_u64(joined) % np.uint64(num_buckets)).astype(np.int64)


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    keys: tuple[str, ...] = ("repo", "path"),
    left_on: str = "qlsn",
    right_on: str = "lsn",
    num_buckets: int = 64,
    salt_mod: int = 0,
) -> "ray.data.Dataset":
    """Backward as-of join (inclusive): for every left row, attach the
    right row with the greatest ``right_on <= left_on`` among equal
    ``keys``. Right payload columns come back prefixed ``asof_`` (the
    ordering column as ``asof_<right_on>``); unmatched left rows keep
    all their columns with null asof_* (LEFT join semantics).

    Both inputs stream through ONE bucketed groupby; the per-bucket
    kernel is O(n log n) vectorized numpy.

    ``salt_mod > 0`` is the hot-key answer (same shape as
    merge.salted_lww_merge): probes spread across ``salt_mod``
    sub-buckets by their ordinate, and the HISTORY side is replicated
    into every sub-bucket map-side — probes of one scorching key then
    process on ``salt_mod`` workers instead of one, at the cost of
    history x salt_mod shuffle bytes. Results are identical to the
    unsalted join (each sub-bucket sees the key's full history)."""
    import ray.data  # noqa: F401

    left_schema = left.schema()
    right_schema = right.schema()
    left_names = list(left_schema.names)
    if any(n.startswith("asof_") for n in left_names):
        raise ValueError("left columns may not start with the asof_ prefix")
    payload = [n for n in right_schema.names if n not in keys]

    fields = [
        pa.field(n, ty) for n, ty in zip(left_schema.names, left_schema.types)
    ]
    fields += [
        pa.field(f"asof_{n}", right_schema.types[right_schema.names.index(n)])
        for n in payload
    ]
    fields += [pa.field("_ord", pa.int64()), pa.field("_side", pa.int8())]
    union_schema = pa.schema(fields)
    names = [f.name for f in union_schema]
    types = {f.name: f.type for f in union_schema}
    out_names = left_names + [f"asof_{n}" for n in payload]
    asof_names = set(out_names) - set(left_names)

    def conform(t: pa.Table, side: int, on: str) -> pa.Table:
        cols = []
        for n in names:
            if n == "_ord":
                c = t[on].cast(pa.int64())
            elif n == "_side":
                c = pa.array(np.full(t.num_rows, side, dtype=np.int8))
            elif side == 0 and n.startswith("asof_"):
                c = t[n[5:]].cast(types[n])  # right payload, renamed
            elif (
                (side == 1 or n in keys)
                and n in t.column_names
                and not n.startswith("asof_")
            ):
                # keys (both sides) and left extras; a right column that
                # merely shares a left extra's name must NOT leak into it
                c = t[n].cast(types[n])
            else:
                c = pa.nulls(t.num_rows, types[n])
            cols.append(c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c)
        out = pa.Table.from_arrays(cols, names=names)
        b = _bucket_of(_joined_keys(out, keys), num_buckets)
        if salt_mod > 0:
            if side == 1:
                # probes fan across sub-buckets by ordinate
                ordv = out["_ord"].to_numpy(zero_copy_only=False)
                b = b * salt_mod + (ordv % salt_mod)
                return out.append_column("bucket", pa.array(b))
            # history replicates into EVERY sub-bucket of its key
            idx = np.repeat(np.arange(out.num_rows, dtype=np.int64), salt_mod)
            rep = out.take(pa.array(idx))
            sub = np.repeat(b, salt_mod) * salt_mod + np.tile(
                np.arange(salt_mod, dtype=np.int64), out.num_rows
            )
            return rep.append_column("bucket", pa.array(sub))
        return out.append_column("bucket", pa.array(b))

    lefts = left.map_batches(
        lambda t: conform(t, 1, left_on), batch_format="pyarrow"
    )
    rights = right.map_batches(
        lambda t: conform(t, 0, right_on), batch_format="pyarrow"
    )
    combined = lefts.union(rights)

    def per_bucket(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        side = t["_side"].to_numpy()
        n = len(side)
        if n == 0 or not (side == 1).any():
            return union_schema.empty_table().select(out_names)
        # key ids from the ACTUAL key strings (collision-proof, unlike
        # factorizing the u64 shuffle hash)
        joined = np.asarray(_joined_keys(t, keys).to_pandas(), dtype=object)
        kid = np.unique(joined, return_inverse=True)[1]
        ordv = t["_ord"].to_numpy(zero_copy_only=False)
        # LWW tiebreak among equal (key, ord) history rows: winner LAST
        # in ascending sort order -> (op != 'delete') asc, commit asc
        tie: list[np.ndarray] = []
        if "asof_commit" in t.column_names:
            tie.append(
                np.asarray(
                    t["asof_commit"].fill_null("").to_pandas(), dtype=object
                )
            )
        if "asof_op" in t.column_names:
            tie.append(
                pc.not_equal(
                    t["asof_op"].fill_null("delete"), "delete"
                ).to_numpy(zero_copy_only=False)
            )
        # sort: key, ordinate, history-before-probe at equal ordinate
        perm = np.lexsort((*tie, side, ordv, kid))
        side_s = side[perm]
        kid_s = kid[perm]
        # sorted-space index of the most recent history row at or before
        # each position (running maximum over history positions)
        cand = np.maximum.accumulate(np.where(side_s == 0, np.arange(n), -1))
        probe_mask = side_s == 1
        cand_p = cand[probe_mask]
        # a candidate from a DIFFERENT key means "no history before me"
        ok = (cand_p >= 0) & (kid_s[np.maximum(cand_p, 0)] == kid_s[probe_mask])
        left_idx = pa.array(perm[probe_mask], type=pa.int64())
        hist_idx = pa.array(
            perm[np.maximum(cand_p, 0)], type=pa.int64(), mask=~ok
        )
        cols = [
            t[c].take(hist_idx if c in asof_names else left_idx)
            for c in out_names
        ]
        return pa.Table.from_arrays(cols, names=out_names)

    return combined.groupby("bucket").map_groups(
        per_bucket, batch_format="pyarrow"
    )
