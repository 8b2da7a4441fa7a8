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
* ``finish()`` merges all remaining runs + the in-memory tail and emits
  the final LWW winner per key.

Peak heap is O(chunk + largest compaction input), never O(events in
partition). The group table itself arrives as object-store-backed Arrow
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
        pq.write_table(t, path, compression="zstd")
        self._runs.append(path)
        self._run_rows.append(t.num_rows)
        self._maybe_compact()

    MAX_RUNS = 8  # compaction fan-in

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
        pq.write_table(merged, out, compression="zstd")
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
    def finish(self) -> pa.Table:
        """Merge all runs + the in-memory tail; returns winners per key
        (tombstones kept — callers filter op != 'delete' where needed).
        The index is consumed; spill files are deleted."""
        parts: list[pa.Table] = []
        tail = self._combine_buf()
        if tail is not None:
            parts.append(tail)
        for p in self._runs:
            parts.append(pq.read_table(p))
        try:
            if not parts:
                return pa.table({})
            out = _winner_per_key(
                pa.concat_tables(parts, promote_options="permissive"), self.keys
            )
            return out
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
