"""Leaf kernel module: the vectorized LWW winner-per-key gather.

Lives in its own module (no intra-package imports) so BOTH merge.py and
state.py can bind it at import time — a function-local relative import
executed inside a Ray worker re-imports the package BY NAME and fails
whenever the driver runs from another cwd (pickle-by-value ships module
objects, not sys.path entries).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


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


# ---------------------------------------------------------------------------
# Content hashing — THE md5 code path
# ---------------------------------------------------------------------------
# Arrow has no md5 kernel and the SQL oracles use DuckDB's md5(), so content
# hashing is necessarily a per-row Python loop.  It lives HERE, once, so every
# stage (exact dedup, curation partials, incremental-ingest projection, event
# commit ids) shares one loop whose behavior and cost are audited in one
# place.  Nulls fail loudly (AttributeError) — a null content column is a
# data bug upstream, not something to hash around.


def _iter_utf8(values):
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_pylist()
    for v in values:
        yield v if isinstance(v, (bytes, bytearray)) else v.encode("utf-8")


def md5_hex(values) -> pa.Array:
    """Hex digests as ``pa.string()``; matches DuckDB ``md5(col)`` exactly.

    ``values``: a pyarrow string/binary Array/ChunkedArray, or any iterable
    of ``str``/``bytes``.
    """
    import hashlib

    md5 = hashlib.md5
    return pa.array([md5(b).hexdigest() for b in _iter_utf8(values)], type=pa.string())


def md5_hex_prefix(values, nbytes: int = 8, byteorder: str = "little"):
    """One digest pass -> ``(hex pa.Array, uint64 prefix ndarray)``.

    The prefix is ``int.from_bytes(digest[:nbytes], byteorder)`` — with
    ``nbytes=4, byteorder='big'`` it equals ``int(hex[:8], 16)`` (the
    SQL-oracle-visible bucket derivation); with ``nbytes=8, 'little'`` it is
    the u64 used by bloom filters and co-partitioning.  Sites that need both
    hex and a numeric key call this instead of hashing twice.
    """
    import hashlib

    md5 = hashlib.md5
    hexes: list[str] = []
    out = []
    for b in _iter_utf8(values):
        d = md5(b).digest()
        hexes.append(d.hex())
        out.append(int.from_bytes(d[:nbytes], byteorder))
    return pa.array(hexes, type=pa.string()), np.array(out, dtype=np.uint64)


_POLY = np.uint64(1099511628211)  # FNV-1a 64-bit prime (odd -> invertible mod 2^64)
_LEN_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer: diffuses the polynomial hash's low-entropy
    high bits before a modulus takes the low bits."""
    h = h.copy()
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    return h


def hash_utf8_u64(col: "pa.Array | pa.ChunkedArray") -> np.ndarray:
    """Deterministic uint64 hash of a utf8 Arrow column — fully
    vectorized over the RAW Arrow byte buffer: no pandas round-trip, no
    per-row Python objects (the join hot paths hash every batch's key
    column; materializing an object ndarray per batch costs more than
    the hash itself).  Polynomial hash (byte+1)*P^pos summed per string
    mod 2^64 (natural uint64 wraparound), xor'd with the length and
    splitmix-finalized.  Equal strings always hash equal; stability is
    per-process-version only — use ``transforms.key_hash_u64`` for
    PERSISTED layouts (committed lakes depend on its exact values)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        col = pc.fill_null(col, "")
    if pa.types.is_large_string(col.type):
        off_dtype = np.int64
    elif pa.types.is_string(col.type):
        off_dtype = np.int32
    else:
        col = pc.cast(col, pa.string())
        off_dtype = np.int32
    n = len(col)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    bufs = col.buffers()
    off = np.frombuffer(bufs[1], dtype=off_dtype)[
        col.offset : col.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else (
        np.empty(0, dtype=np.uint8)
    )
    lens = np.diff(off)
    start, stop = int(off[0]), int(off[-1])
    seg = data[start:stop].astype(np.uint64) + np.uint64(1)
    if stop > start:
        pos = np.arange(stop - start, dtype=np.int64) - np.repeat(
            off[:-1] - start, lens
        )
        max_len = int(lens.max())
        powers = np.empty(max_len, dtype=np.uint64)
        powers[0] = np.uint64(1)
        if max_len > 1:
            np.cumprod(
                np.full(max_len - 1, _POLY, dtype=np.uint64), out=powers[1:]
            )
        terms = seg * powers[pos]
        cs = np.concatenate(
            (np.zeros(1, dtype=np.uint64), np.cumsum(terms, dtype=np.uint64))
        )
        sums = cs[off[1:] - start] - cs[off[:-1] - start]
    else:
        sums = np.zeros(n, dtype=np.uint64)
    return _mix64(sums ^ (lens.astype(np.uint64) * _LEN_MIX))


def import_polars():
    """Import polars capped to ONE internal thread per process (must be
    set before the first import anywhere in the process; a no-op if
    something already imported it).

    Why: every per-group UDF here runs inside a Ray worker PROCESS, and
    32 workers each spawning a full-width rayon pool thrash the same 32
    cores — measured 19.7 ms -> 0.94 ms for one 50-row ``group_by.agg``
    call once capped. Parallelism belongs to Ray's process pool; the
    per-group data is deliberately small (bucketed, pre-combined), so
    intra-call threading has nothing to win. Every UDF that needs polars
    calls this instead of ``import polars``.
    """
    import os
    import sys

    if "polars" not in sys.modules:
        os.environ.setdefault("POLARS_MAX_THREADS", "1")
    import polars as pl

    return pl
