"""End-to-end CDC pipelines, composed Ray-Data-first.

The flagship replay (SURVEY.md §3.1 reborn):

    read documents -> map_batches(DeriveEvents)      # binlog source
      -> map_batches(compile_changes)                # rename -> delete+insert
      -> map_batches(normalize_content)              # text normalization
      -> lww_merge(...)                              # THE shuffle (bucketed)
      -> map_batches(add_sha256)                     # per-row invariant
      [-> exactly-once sink via sink.commit_txn]

Everything streams; nothing materializes the full dataset on the driver.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import pyarrow as pa

from .events import DeriveEvents, compile_changes
from .merge import lww_merge
from .schemas import DEFAULT_EPOCHS, DEFAULT_NUM_BUCKETS
from .transforms import add_sha256, normalize_content

if TYPE_CHECKING:
    import ray.data


def derive_event_log(
    sf_dir: str, epochs: int = DEFAULT_EPOCHS, parallelism: int = -1
) -> "ray.data.Dataset":
    """documents.parquet -> the deterministic change-event log (events.py).

    ``parallelism``: number of input blocks for the derive fan-out. The test
    corpus is a single small parquet file (= one read block), which would
    serialize the whole derive stage; at real scale the input is thousands
    of files and this override is a no-op cost-wise. Defaults to 2 blocks
    per available CPU.
    """
    from .sources import read_table

    docs = read_table(
        sf_dir,
        "documents",
        columns=["doc_id", "lang", "source", "text"],
        parallelism=parallelism,
    )
    return docs.map_batches(DeriveEvents(epochs), batch_format="pyarrow")


def compiled_log(
    sf_dir: str, epochs: int = DEFAULT_EPOCHS, min_lsn: int | None = None
) -> "ray.data.Dataset":
    """The compiled, content-normalized change log every consumer reads:
    derive -> compile_changes -> normalize_content, optionally pruned to
    the tail ``lsn >= min_lsn`` (a change *segment*). One definition so
    SCD2 / IVM / MERGE INTO / the query registry cannot drift from the
    flagship's derivation chain."""
    import pyarrow.compute as pc

    ds = (
        derive_event_log(sf_dir, epochs)
        .map_batches(compile_changes, batch_format="pyarrow")
        .map_batches(normalize_content, batch_format="pyarrow")
    )
    if min_lsn is not None:
        ds = ds.map_batches(
            lambda t, _m=min_lsn: t.filter(pc.greater_equal(t["lsn"], _m)),
            batch_format="pyarrow",
        )
    return ds


def replay_to_lake(
    events: "ray.data.Dataset",
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    salt_mod: int = 0,
    base_state: "ray.data.Dataset | None" = None,
) -> "ray.data.Dataset":
    """Change-event log -> final lake rows (LAKE_SCHEMA minus partition col).

    ``base_state``: existing lake rows to merge against — each behaves as an
    insert event at its recorded LSN (SURVEY.md §7 step 5). Returned dataset
    is lazy; consume with write_parquet / iter_batches.
    """
    compiled = events.map_batches(compile_changes, batch_format="pyarrow")
    compiled = compiled.map_batches(normalize_content, batch_format="pyarrow")
    if base_state is not None:
        compiled = compiled.union(
            base_state.map_batches(_lake_rows_as_events, batch_format="pyarrow")
        )
    merged = lww_merge(compiled, num_buckets=num_buckets, salt_mod=salt_mod)
    return merged.map_batches(add_sha256, batch_format="pyarrow")


def binlog_cuts(epochs: int, micro_batches: int) -> list[int]:
    """Window boundaries in LSN space: the epoch band split evenly, then
    one final window for the post-epoch delete/rename band
    (lsn >= E*STRIDE)."""
    from .events import STRIDE

    hi = (epochs + 1) * STRIDE * 3  # past every derivable lsn
    return [
        (i + 1) * epochs * STRIDE // max(1, micro_batches - 1)
        for i in range(micro_batches - 1)
    ] + [hi]


def persist_binlog(
    lake_dir: str, sf_dir: str, epochs: int, cuts: list[int]
) -> str:
    """Persist the derived log ONCE as LSN-segment-partitioned parquet —
    the binlog. Each micro-batch then READS only its segment directory
    (partition-pruned), the way a real tail consumes binlog segments;
    nothing is materialized in the object store across windows. Returns
    the binlog dir (idempotent: an existing binlog is trusted — the
    staging+rename protocol below guarantees it is complete)."""
    import os

    import numpy as np

    binlog_dir = os.path.join(lake_dir, "_binlog")
    if os.path.isdir(binlog_dir):
        return binlog_dir
    cuts_arr = np.array(cuts, dtype=np.int64)

    def tag_segment(t):
        import pyarrow as _pa

        lsn = t["lsn"].to_numpy(zero_copy_only=False)
        seg = np.searchsorted(cuts_arr, lsn, side="right").astype(np.int64)
        return t.append_column("segment", _pa.array(seg))

    ev_all = derive_event_log(sf_dir, epochs).map_batches(
        compile_changes, batch_format="pyarrow"
    )
    ev_all = ev_all.map_batches(normalize_content, batch_format="pyarrow")
    # stage + atomic rename: a crash mid-write leaves only the staging
    # dir, so a resumed run re-derives instead of trusting a partial log
    staging = binlog_dir + ".staging"
    if os.path.isdir(staging):
        import shutil

        shutil.rmtree(staging)
    ev_all.map_batches(tag_segment, batch_format="pyarrow").write_parquet(
        staging, partition_cols=["segment"], compression="zstd"
    )
    os.replace(staging, binlog_dir)
    return binlog_dir


def tail_replay(
    lake_dir: str,
    sf_dir: str,
    epochs: int = DEFAULT_EPOCHS,
    micro_batches: int = 4,
    num_buckets: int | None = None,
    mode: str = "cow",
    on_invalid: str | None = None,
) -> list[str]:
    """Binlog-tail simulation: consume the event log as ``micro_batches``
    consecutive LSN windows, each applied as one exactly-once transaction
    (stage -> commit -> watermark advance). Re-running after a crash in
    window k re-applies only window k (txn idempotence) and later windows
    skip already-applied events via the per-bucket high watermark — the
    NiFi infinite-flow delivery model (SURVEY.md §2.9) made explicit.

    ``mode="mor"`` commits every window after the first as merge-on-read
    delta entries (checkpoint.apply_incremental) — pair with periodic
    compact_deltas / maybe_compact(max_deltas=) to bound chain length.
    ``on_invalid`` is the ingest validation gate ('raise' / 'drop' /
    None), forwarded to every window's apply.

    Returns the committed txn ids in order.
    """
    import os

    import ray.data as rd

    from .checkpoint import apply_incremental
    from .schemas import COMPILED_SCHEMA

    cuts = binlog_cuts(epochs, micro_batches)
    binlog_dir = persist_binlog(lake_dir, sf_dir, epochs, cuts)

    txns = []
    for i in range(len(cuts)):
        seg_dir = os.path.join(binlog_dir, f"segment={i}")
        if not os.path.isdir(seg_dir):
            continue  # empty LSN window -> no segment written
        files = [
            os.path.join(seg_dir, f)
            for f in sorted(os.listdir(seg_dir))
            if f.endswith(".parquet")
        ]
        if not files:
            continue
        win = rd.read_parquet(files).map_batches(
            lambda t: t.drop_columns(["segment"])
            if "segment" in t.column_names
            else t,
            batch_format="pyarrow",
        )
        txn_id = f"tail-{i:04d}"
        apply_incremental(
            lake_dir, txn_id, win, num_buckets=num_buckets,
            events_schema=COMPILED_SCHEMA, mode=mode, on_invalid=on_invalid,
        )
        txns.append(txn_id)
    return txns


def _lake_rows_as_events(batch: pa.Table) -> pa.Table:
    """Lake rows re-entering a merge behave as inserts at their stored LSN."""
    cols = ["lsn", "repo", "path", "commit", "lang", "content"]
    t = batch.select(cols)
    t = t.add_column(1, "op", pa.array(["insert"] * t.num_rows, type=pa.string()))
    return t


def cdc_final_state(
    sf_dir: str,
    epochs: int = DEFAULT_EPOCHS,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    salt_mod: int = 0,
    parallelism: int = -1,
) -> "ray.data.Dataset":
    """The flagship pipeline: full replay of the derived binlog into the
    final lake state, with content_sha256 per row."""
    return replay_to_lake(
        derive_event_log(sf_dir, epochs, parallelism=parallelism),
        num_buckets=num_buckets,
        salt_mod=salt_mod,
    )
