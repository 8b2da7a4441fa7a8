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

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .schemas import COMPILED_SCHEMA, DEFAULT_EPOCHS, EVENT_SCHEMA

STRIDE = 10_000_000  # lsn stride per epoch (epoch-major global LSN order)


def _md5_hex(keys: list[str]) -> list[str]:
    return [hashlib.md5(k.encode("utf-8")).hexdigest() for k in keys]


class DeriveEvents:
    """``map_batches`` fan-out: documents batch -> change-event batch.

    A stateless callable class (usable as plain fn too); one documents row
    yields E version events plus optional delete / rename / duplicate rows.
    """

    def __init__(self, epochs: int = DEFAULT_EPOCHS):
        self.epochs = int(epochs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        E = self.epochs
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lang = batch["lang"].to_pylist()
        source = batch["source"].to_pylist()
        text = batch["text"].to_pylist()
        n = len(doc_id)

        path = [f"docs/{lg}/doc_{d:06d}.txt" for lg, d in zip(lang, doc_id)]

        tables: list[pa.Table] = []

        # versioned upserts: fan out n rows -> n*E rows (repeat-major by doc)
        idx = np.repeat(np.arange(n), E)
        e = np.tile(np.arange(E, dtype=np.int64), n)
        lsn = e * STRIDE + doc_id[idx]
        op = np.where(e == 0, "insert", "update")
        content = [f"{text[i]} [rev {ep}]" for i, ep in zip(idx, e)]
        tables.append(
            _events_table(
                lsn=lsn,
                op=op.tolist(),
                repo=[source[i] for i in idx],
                path=[path[i] for i in idx],
                new_path=[None] * len(idx),
                lang=[lang[i] for i in idx],
                content=content,
            )
        )

        # deletes
        dmask = doc_id % 7 == 3
        didx = np.nonzero(dmask)[0]
        if len(didx):
            dlsn = E * STRIDE + 2 * doc_id[didx]
            tables.append(
                _events_table(
                    lsn=dlsn,
                    op=["delete"] * len(didx),
                    repo=[source[i] for i in didx],
                    path=[path[i] for i in didx],
                    new_path=[None] * len(didx),
                    lang=[None] * len(didx),
                    content=[None] * len(didx),
                )
            )

        # renames
        rmask = doc_id % 5 == 2
        ridx = np.nonzero(rmask)[0]
        if len(ridx):
            rlsn = E * STRIDE + 2 * doc_id[ridx] + 1
            tables.append(
                _events_table(
                    lsn=rlsn,
                    op=["rename"] * len(ridx),
                    repo=[source[i] for i in ridx],
                    path=[path[i] for i in ridx],
                    new_path=[path[i].replace(".txt", ".md") for i in ridx],
                    lang=[lang[i] for i in ridx],
                    content=[f"{text[i]} [rev {E - 1}]" for i in ridx],
                )
            )

        # exact duplicate delivery of the e=1 event
        if E > 1:
            qmask = doc_id % 11 == 0
            qidx = np.nonzero(qmask)[0]
            if len(qidx):
                qlsn = STRIDE + doc_id[qidx]
                tables.append(
                    _events_table(
                        lsn=qlsn,
                        op=["update"] * len(qidx),
                        repo=[source[i] for i in qidx],
                        path=[path[i] for i in qidx],
                        new_path=[None] * len(qidx),
                        lang=[lang[i] for i in qidx],
                        content=[f"{text[i]} [rev 1]" for i in qidx],
                    )
                )

        return pa.concat_tables(tables)


def _events_table(lsn, op, repo, path, new_path, lang, content) -> pa.Table:
    commit = _md5_hex([f"{r}/{p}@{l}" for r, p, l in zip(repo, path, lsn)])
    return pa.Table.from_arrays(
        [
            pa.array(np.asarray(lsn, dtype=np.int64)),
            pa.array(op, type=pa.string()),
            pa.array(repo, type=pa.string()),
            pa.array(path, type=pa.string()),
            pa.array(new_path, type=pa.string()),
            pa.array(commit, type=pa.string()),
            pa.array(lang, type=pa.string()),
            pa.array(content, type=pa.large_string()),
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

    parts = [
        pa.Table.from_arrays(
            [
                plain["lsn"],
                plain["op"],
                plain["repo"],
                plain["path"],
                plain["commit"],
                plain["lang"],
                plain["content"].combine_chunks().cast(pa.large_string()),
            ],
            schema=COMPILED_SCHEMA,
        )
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
