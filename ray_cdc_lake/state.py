"""Per-partition merge state: a RocksDB-like sorted-run dedup index.

Reference analog: the in-memory staged-file lists + ``temp_conflicts_<uuid>/``
staging area that ``RenameDiskUtils.kt:39-41,73`` / ``RenameS3Utils.kt:62-87``
hold while applying one batch — the reference's "merge buffer" (SURVEY.md
§2.3 A4). At 10^10-event scale a hot partition's event set can exceed a
reduce worker's heap, so the buffer becomes an LSM-style index:

* events are consumed in bounded chunks; each chunk is LWW-combined
  (winner per key — an associative/commutative reduce, so chunk-local
  combining is lossless, tombstones included) and written to a SORTED RUN
  (a Parquet file sorted by key, one row per key — an L0 "SSTable"),
* runs are COMPACTED with a fan-in of MAX_RUNS: once more than MAX_RUNS
  runs exist they are k-way merged into one (total I/O O(N log_k N); a
  row-count trigger could not converge below the live key count),
* ``finish_iter()`` k-way merges the remaining runs + the in-memory tail
  STREAMING — one buffered chunk per run, chunk-boundary merge — and
  yields final LWW winners per key in key order; ``finish()`` concats the
  chunks for callers that need one table.

Peak heap during the merge is O(runs × chunk + largest compaction input),
never O(events in partition) and never O(live keys in partition). The group table itself arrives as object-store-backed Arrow
memory (mmap'd, zero-copy slices), so chunking it does not copy.

Partitioning assumption (documented per the build brief): one index
instance sees ALL events of its key range — i.e. it runs inside the
per-bucket reduce after the hash shuffle (merge.final_lww), or inside a
bucket-pinned merge actor.
"""

from __future__ import annotations

import os
import tempfile
import uuid

import pyarrow as pa
import pyarrow.parquet as pq


from .kernels import _winner_per_key  # noqa: E402 — leaf module, no cycle


class SortedRunIndex:
    """LWW dedup index for one partition with bounded memory.

    ``add()`` event batches in any order; ``finish()`` returns one row per
    key — the (lsn, commit)-max event, tombstones included. Spills sorted
    runs under ``spill_dir`` once ``max_rows_in_mem`` is exceeded and
    compacts runs so no single merge step exceeds the budget by more than
    the final key count (if the LIVE key set of one partition exceeds
    memory, no merge algorithm holding one row per key fits — size
    num_buckets so it doesn't).
    """

    def __init__(
        self,
        keys: list[str] | None = None,
        max_rows_in_mem: int = 200_000,
        spill_dir: str | None = None,
    ):
        self.keys = keys or ["repo", "path"]
        self.max_rows = int(max_rows_in_mem)
        self._base = spill_dir or os.path.join(
            tempfile.gettempdir(), "ray_cdc_lake_runs"
        )
        self._dir: str | None = None  # created lazily on first spill
        self._buf: list[pa.Table] = []
        self._buf_rows = 0
        self._runs: list[str] = []  # oldest first
        self._run_rows: list[int] = []
        self._spill_seq = 0  # monotonic: run names must never collide
        # with files kept across compactions

    # ------------------------------------------------------------------
    def add(self, batch: pa.Table) -> None:
        if batch.num_rows == 0:
            return
        self._buf.append(batch)
        self._buf_rows += batch.num_rows
        if self._buf_rows > self.max_rows:
            self._spill()

    def _combine_buf(self) -> pa.Table | None:
        if not self._buf:
            return None
        t = pa.concat_tables(self._buf, promote_options="permissive")
        self._buf, self._buf_rows = [], 0
        return _winner_per_key(t, self.keys)

    def _spill(self) -> None:
        t = self._combine_buf()
        if t is None or t.num_rows == 0:
            return
        if self._dir is None:
            self._dir = os.path.join(self._base, uuid.uuid4().hex)
            os.makedirs(self._dir, exist_ok=True)
        path = os.path.join(self._dir, f"run-{self._spill_seq:06d}.parquet")
        self._spill_seq += 1
        pq.write_table(
            t, path, compression="zstd", row_group_size=self._row_group_rows()
        )
        self._runs.append(path)
        self._run_rows.append(t.num_rows)
        self._maybe_compact()

    MAX_RUNS = 8  # compaction fan-in

    def _row_group_rows(self) -> int:
        """Run files are read back with a chunked cursor in finish_iter;
        a parquet reader decodes a whole row group at a time, so the row
        group — not the cursor chunk — is the true read-back memory unit.
        Tie it to the caller's declared in-memory budget."""
        return max(1_024, min(self.max_rows, 65_536))

    def _maybe_compact(self) -> None:
        # size-tiered compaction: once the run count exceeds MAX_RUNS,
        # k-way-merge only the MAX_RUNS SMALLEST runs — accumulated large
        # runs are left in place until they are themselves among the
        # smallest (geometric level growth). Re-merging the big run on
        # every cycle (the old all-runs policy) re-reads it once per
        # MAX_RUNS spills — quadratic write amplification on mostly-
        # distinct keys; smallest-K gives each row O(log_k N) merge
        # participations and bounds a cycle's memory to the K smallest
        # runs, not the whole accumulated index.
        if len(self._runs) <= self.MAX_RUNS:
            return
        order = sorted(range(len(self._runs)), key=lambda i: self._run_rows[i])
        merge_idx = set(order[: self.MAX_RUNS])
        merged = _winner_per_key(
            pa.concat_tables(
                [pq.read_table(self._runs[i]) for i in sorted(merge_idx)],
                promote_options="permissive",
            ),
            self.keys,
        )
        out = os.path.join(self._dir, f"run-c{uuid.uuid4().hex[:8]}.parquet")
        pq.write_table(
            merged, out, compression="zstd", row_group_size=self._row_group_rows()
        )
        for i in merge_idx:
            os.unlink(self._runs[i])
        # order is irrelevant for correctness: every run holds at most one
        # row per key and _winner_per_key is order-insensitive (lsn,commit)
        kept = [
            (p, n)
            for i, (p, n) in enumerate(zip(self._runs, self._run_rows))
            if i not in merge_idx
        ]
        self._runs = [p for p, _ in kept] + [out]
        self._run_rows = [n for _, n in kept] + [merged.num_rows]

    # ------------------------------------------------------------------
    FINISH_CHUNK_ROWS = 65_536

    def finish_iter(self, chunk_rows: int | None = None):
        """STREAMING k-way finish: yield LWW winners in key order with peak
        heap O(runs × chunk), never O(live keys).

        Every run (and the combined tail) is key-sorted with at most one
        row per key (``_winner_per_key`` gathers in sorted-index order), so
        the merge is a chunk-boundary merge: buffer one chunk per run, take
        ``boundary = min over runs of its buffer's LAST key`` — any key
        <= boundary cannot appear in unread rows of ANY run (sorted, keys
        unique per run) — slice each buffer to the boundary, LWW-combine
        the slices, yield. Key columns must be non-null (true for the CDC
        (repo, path) keys by construction).

        Tombstones are kept — callers filter op != 'delete' where needed.
        The index is consumed; spill files are deleted on exhaustion."""
        chunk = int(chunk_rows or self.FINISH_CHUNK_ROWS)
        try:
            cursors: list[_RunCursor] = [
                _RunCursor.from_parquet(p, chunk) for p in self._runs
            ]
            tail = self._combine_buf()
            if tail is not None and tail.num_rows:
                cursors.append(_RunCursor.from_table(tail, chunk))
            while True:
                live = [c for c in cursors if c.fill()]
                if not live:
                    return
                boundary = min(c.last_key(self.keys) for c in live)
                parts = [c.split_le(self.keys, boundary) for c in live]
                parts = [p for p in parts if p.num_rows]
                merged = _winner_per_key(
                    pa.concat_tables(parts, promote_options="permissive"),
                    self.keys,
                )
                if merged.num_rows:
                    yield merged
        finally:
            for p in self._runs:
                try:
                    os.unlink(p)
                except OSError:
                    pass
            if self._dir is not None:
                try:
                    os.rmdir(self._dir)
                except OSError:
                    pass
            self._runs, self._run_rows = [], []

    def finish(self) -> pa.Table:
        """Materialized convenience over ``finish_iter`` (the output itself
        is O(live keys); the MERGE working set stays O(runs × chunk))."""
        parts = list(self.finish_iter())
        if not parts:
            return pa.table({})
        return pa.concat_tables(parts, promote_options="permissive")


class _RunCursor:
    """Chunked forward cursor over one key-sorted run (parquet file or
    in-memory table). ``fill`` buffers the next chunk; ``split_le`` hands
    off the buffer prefix with key <= boundary (zero-copy slices)."""

    def __init__(self, batches_iter, chunk_rows: int):
        self._it = batches_iter
        self._chunk = chunk_rows
        self._buf: pa.Table | None = None

    @classmethod
    def from_parquet(cls, path: str, chunk_rows: int) -> "_RunCursor":
        f = pq.ParquetFile(path)

        def gen():
            for rb in f.iter_batches(batch_size=chunk_rows):
                yield pa.Table.from_batches([rb])
            f.close()

        return cls(gen(), chunk_rows)

    @classmethod
    def from_table(cls, t: pa.Table, chunk_rows: int) -> "_RunCursor":
        def gen():
            for off in range(0, t.num_rows, chunk_rows):
                yield t.slice(off, chunk_rows)  # zero-copy

        return cls(gen(), chunk_rows)

    def fill(self) -> bool:
        """Ensure the buffer is non-empty; False = cursor exhausted."""
        while self._buf is None or self._buf.num_rows == 0:
            nxt = next(self._it, None)
            if nxt is None:
                self._buf = None
                return False
            self._buf = nxt
        return True

    def last_key(self, keys: list[str]) -> tuple:
        n = self._buf.num_rows
        return tuple(self._buf[k][n - 1].as_py() for k in keys)

    def split_le(self, keys: list[str], boundary: tuple) -> pa.Table:
        """Detach and return the buffer prefix with key <= boundary
        (lexicographic over ``keys``); the remainder stays buffered."""
        import pyarrow.compute as pc

        t = self._buf
        mask = pc.less_equal(t[keys[-1]], boundary[-1])
        for k, b in zip(reversed(keys[:-1]), reversed(boundary[:-1])):
            mask = pc.or_(
                pc.less(t[k], b), pc.and_(pc.equal(t[k], b), mask)
            )
        # sorted run: the mask is a True-prefix, so the split is a slice
        import numpy as np

        cut = int(np.count_nonzero(mask.to_numpy(zero_copy_only=False)))
        head = t.slice(0, cut)
        self._buf = t.slice(cut)
        return head


def merge_group_spilling(
    group: pa.Table,
    keys: list[str],
    chunk_rows: int = 100_000,
    max_rows_in_mem: int = 200_000,
) -> pa.Table:
    """LWW winners for one (possibly huge) group via the sorted-run index.

    The group arrives as object-store-backed Arrow memory; ``slice`` is
    zero-copy, so peak HEAP is O(chunk + compaction), not O(group).
    """
    idx = SortedRunIndex(keys=keys, max_rows_in_mem=max_rows_in_mem)
    for off in range(0, group.num_rows, chunk_rows):
        idx.add(group.slice(off, chunk_rows))
    return idx.finish()
