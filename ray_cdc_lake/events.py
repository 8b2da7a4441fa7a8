"""Deterministic change-event derivation + rename compilation.

The binlog replayed by the engine is derived deterministically from the
driver-provided ``documents`` table (TESTDATA.md) so that the exact same
event log can be expressed in ANSI SQL for the DuckDB oracle. The event mix
mirrors the reference's test corpus (SURVEY.md §5, FIXTURES.md §2):

* E versioned upserts per key (insert + E-1 updates, LWW by LSN),
* deletes for ``doc_id % 7 == 3`` (emptied-source-cleanup analog,
  ``ReorderFiles.kt:200-240``),
* renames for ``doc_id % 5 == 2`` (RenameInstruction analog,
  ``RenameInstruction.kt:3-6``; compiled to delete+insert at the same LSN —
  swap/cycle semantics of ``RenameS3Utils.kt:62-66,120-127``),
* exact duplicate deliveries for ``doc_id % 11 == 0`` (idempotence; the
  reference replays batches at-least-once, SURVEY.md §2.9).

Derivation spec (shared with the SQL in queries.py — keep in sync).
LSNs are EPOCH-MAJOR (a real binlog is globally ordered: later deliveries
carry higher LSNs — required for per-bucket high-watermark resume):

    STRIDE  = 10_000_000
    repo    = source
    path    = 'docs/<lang>/doc_<doc_id zero-padded to 6>.txt'
    version e in [0, E): lsn = e*STRIDE + doc_id,
                         op  = insert (e=0) / update, content = text||' [rev e]'
    delete:  lsn = E*STRIDE + 2*doc_id        (after all epochs; even)
    rename:  lsn = E*STRIDE + 2*doc_id + 1    (odd; wins over same-key delete),
             new_path = path with .txt -> .md, content = text||' [rev E-1]'
    dup:     exact copy of the e=1 event
    commit  = md5(repo || '/' || path || '@' || lsn)

All of it vectorized: numpy fan-out + pyarrow concat; the only per-row
Python is the md5 of a short key string.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .kernels import md5_hex
from .schemas import COMPILED_SCHEMA, DEFAULT_EPOCHS, EVENT_SCHEMA

STRIDE = 10_000_000  # lsn stride per epoch (epoch-major global LSN order)
TS_BASE_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in epoch microseconds


class DeriveEvents:
    """``map_batches`` fan-out: documents batch -> change-event batch.

    A stateless callable class (usable as plain fn too); one documents row
    yields E version events plus optional delete / rename / duplicate rows.
    """

    def __init__(self, epochs: int = DEFAULT_EPOCHS):
        self.epochs = int(epochs)
        # E distinct rev suffixes, built once — the fan-out just takes
        # from this array instead of stringifying n*E integers per batch
        # (large_string to match the content column's type family)
        self._suffixes = pa.array(
            [f" [rev {i}]" for i in range(self.epochs)], type=pa.large_string()
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        E = self.epochs
        doc_id_a = batch["doc_id"].combine_chunks()
        doc_id = doc_id_a.to_numpy(zero_copy_only=False).astype(np.int64)
        lang = batch["lang"].combine_chunks()
        source = batch["source"].combine_chunks()
        # content is the byte-dominant column: keep it large_string from the
        # START so the take/join fan-out emits the schema type directly and
        # _events_table's cast is a no-op — a string->large_string cast at
        # the end would re-copy n*E*len(content) bytes. (Array args of the
        # join kernel must share one type family; scalars adapt.)
        text = pc.cast(batch["text"].combine_chunks(), pa.large_string())
        n = len(doc_id)

        path = pc.binary_join_element_wise(
            "docs/",
            lang,
            "/doc_",
            pc.utf8_lpad(pc.cast(doc_id_a, pa.string()), 6, "0"),
            ".txt",
            "",
        )

        tables: list[pa.Table] = []

        # versioned upserts: fan out n rows -> n*E rows (repeat-major by doc)
        idx = pa.array(np.repeat(np.arange(n), E))
        e = np.tile(np.arange(E, dtype=np.int64), n)
        lsn = e * STRIDE + np.repeat(doc_id, E)
        op = pc.if_else(pa.array(e == 0), pa.scalar("insert"), pa.scalar("update"))
        sep = pa.scalar("", type=pa.large_string())
        content = pc.binary_join_element_wise(
            pc.take(text, idx), pc.take(self._suffixes, pa.array(e)), sep
        )
        tables.append(
            _events_table(
                lsn=lsn,
                op=op,
                repo=pc.take(source, idx),
                path=pc.take(path, idx),
                new_path=pa.nulls(len(idx), pa.string()),
                lang=pc.take(lang, idx),
                content=content,
            )
        )

        # deletes
        didx_np = np.nonzero(doc_id % 7 == 3)[0]
        didx = pa.array(didx_np)
        if len(didx):
            tables.append(
                _events_table(
                    lsn=E * STRIDE + 2 * doc_id[didx_np],
                    op=pa.array(["delete"] * len(didx)),
                    repo=pc.take(source, didx),
                    path=pc.take(path, didx),
                    new_path=pa.nulls(len(didx), pa.string()),
                    lang=pa.nulls(len(didx), pa.string()),
                    content=pa.nulls(len(didx), pa.large_string()),
                )
            )

        # renames
        ridx_np = np.nonzero(doc_id % 5 == 2)[0]
        ridx = pa.array(ridx_np)
        if len(ridx):
            path_r = pc.take(path, ridx)
            tables.append(
                _events_table(
                    lsn=E * STRIDE + 2 * doc_id[ridx_np] + 1,
                    op=pa.array(["rename"] * len(ridx)),
                    repo=pc.take(source, ridx),
                    path=path_r,
                    new_path=pc.replace_substring(path_r, ".txt", ".md"),
                    lang=pc.take(lang, ridx),
                    content=pc.binary_join_element_wise(
                        pc.take(text, ridx),
                        pa.scalar(f" [rev {E - 1}]", type=pa.large_string()),
                        sep,
                    ),
                )
            )

        # exact duplicate delivery of the e=1 event
        if E > 1:
            qidx_np = np.nonzero(doc_id % 11 == 0)[0]
            qidx = pa.array(qidx_np)
            if len(qidx):
                tables.append(
                    _events_table(
                        lsn=STRIDE + doc_id[qidx_np],
                        op=pa.array(["update"] * len(qidx)),
                        repo=pc.take(source, qidx),
                        path=pc.take(path, qidx),
                        new_path=pa.nulls(len(qidx), pa.string()),
                        lang=pc.take(lang, qidx),
                        content=pc.binary_join_element_wise(
                            pc.take(text, qidx),
                            pa.scalar(" [rev 1]", type=pa.large_string()),
                            sep,
                        ),
                    )
                )

        return pa.concat_tables(tables)


def _events_table(lsn, op, repo, path, new_path, lang, content) -> pa.Table:
    """Assemble one event sub-table from pyarrow arrays (lsn: numpy int64).

    Everything is vectorized except the md5 of the short commit-key string
    (no columnar md5 kernel exists); the key strings themselves are built
    with one binary_join_element_wise.
    """
    lsn_a = pa.array(np.asarray(lsn, dtype=np.int64))
    key = pc.binary_join_element_wise(
        pc.cast(repo, pa.string()),
        "/",
        pc.cast(path, pa.string()),
        "@",
        pc.cast(lsn_a, pa.string()),
        "",
    )
    # bytes straight out of Arrow (keys are ASCII): skips a per-row
    # str.encode in the md5 loop — the only per-row Python here
    commit = md5_hex(pc.cast(key, pa.binary()))
    ts = pa.array(
        (TS_BASE_US + np.asarray(lsn, dtype=np.int64)).astype("datetime64[us]")
    )
    return pa.Table.from_arrays(
        [
            lsn_a,
            pc.cast(op, pa.string()),
            pc.cast(repo, pa.string()),
            pc.cast(path, pa.string()),
            pc.cast(new_path, pa.string()),
            commit,
            pc.cast(lang, pa.string()),
            pc.cast(content, pa.large_string()),
            ts,
        ],
        schema=EVENT_SCHEMA,
    )


def compile_changes(batch: pa.Table) -> pa.Table:
    """Explode renames into delete(old)+insert(new) at the same LSN.

    Reference analog: one RenameInstruction becomes a staged move applied as
    a *set* so swaps/cycles (A->B, B->A) are safe
    (``RenameS3Utils.kt:62-66,120-127``; ``RenameDiskUtils.kt:44-93``).
    Vectorized: one filter + two projections, no per-row Python.
    """
    is_ren = pc.equal(batch["op"], "rename")
    plain = batch.filter(pc.invert(is_ren))
    rens = batch.filter(is_ren)

    # zero-copy column reorder/drop — content is already large_string
    # (EVENT_SCHEMA); a combine_chunks+cast here would re-copy every
    # content byte of the non-rename majority
    parts = [
        plain.select([f.name for f in COMPILED_SCHEMA]).cast(COMPILED_SCHEMA)
    ]
    if rens.num_rows:
        nulls = pa.nulls(rens.num_rows, pa.string())
        parts.append(
            pa.Table.from_arrays(
                [
                    rens["lsn"],
                    pa.array(["delete"] * rens.num_rows),
                    rens["repo"],
                    rens["path"],
                    rens["commit"],
                    nulls,
                    pa.nulls(rens.num_rows, pa.large_string()),
                ],
                schema=COMPILED_SCHEMA,
            )
        )
        parts.append(
            pa.Table.from_arrays(
                [
                    rens["lsn"],
                    pa.array(["insert"] * rens.num_rows),
                    rens["repo"],
                    rens["new_path"],
                    rens["commit"],
                    rens["lang"],
                    rens["content"].combine_chunks().cast(pa.large_string()),
                ],
                schema=COMPILED_SCHEMA,
            )
        )
    return pa.concat_tables(parts)
