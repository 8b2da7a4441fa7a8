"""Change-batch JSON ingestion — the reference's native input format.

A NiFi FlowFile carries one batch document (fixture shape:
``…/test/resources/reorder-files/flowfile.json``)::

    {"batchId": "...", "font": "...", "language": "...", ...,
     "changes": [{"itemId": "<uuid>|missing", "orderedImageIds": [...]}]}

``ReorderFiles`` compiles it to ``RenameInstruction(originalName, newName)``
rows (``ReorderFiles.kt:304-327`` -> ``addInstruction`` :124-189):

* position k (0-based) in ``orderedImageIds`` names the target
  ``tekst_<itemId>_<zero-padded k+1>.<ext>`` (pad fmt property, default
  ``%05d``, :57-65) — an image id may come FROM another item (cross-item
  move);
* a missing/blank/"null" itemId mints a new UUIDv7 key (:312-316; here a
  deterministic md5-derived key, like the injected ``uuidProvider`` the
  reference uses for tests, :39-41);
* an image id without an extension probes the EXISTING object store for
  ``.tif/.tiff/.jp2`` variants and emits ONE INSTRUCTION PER DISCOVERED
  extension (:149-185, the M3 fan-out); nothing found -> default ``.tif``
  (warn path :163-171);
* every source and target name passes PathSafety (:146-147,169-170).

Engine mapping: batches arrive as a Dataset of JSON strings; the existing
name set is a broadcast small side (``ray.put`` once, read per worker —
J3/J5 semi-join shape); each instruction becomes a delete(old)+insert(new)
CDC event pair at the batch's LSN so the LWW merge applies the batch as a
set (swap/cycle-safe, see merge.py).
"""

from __future__ import annotations

import hashlib
import json

import pyarrow as pa

from .transforms import is_safe_name

KNOWN_EXTS = ("tif", "tiff", "jp2")
DEFAULT_PAD = "%05d"


def mint_item_id(batch_id: str, change_index: int) -> str:
    """Deterministic surrogate key for a change without an itemId —
    UUID-shaped, derived from (batchId, position) so replays of the same
    batch mint the same key (idempotence; UUIDv7Generator.kt:11-43 analog
    with the determinism of the injected uuidProvider)."""
    h = hashlib.md5(f"{batch_id}#{change_index}".encode("utf-8")).hexdigest()
    return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"


def _split_ext(image_id: str) -> tuple[str, str | None]:
    """Recognize extensions case-insensitively but PRESERVE the original
    spelling: an instruction for 'page.TIF' must target the key that
    actually exists, not a lowercased one."""
    base, dot, ext = image_id.rpartition(".")
    if dot and ext.lower() in KNOWN_EXTS:
        return base, ext
    return image_id, None


def compile_change_batch(
    doc: dict,
    existing_names: frozenset[str] | set[str] = frozenset(),
    zero_pad: str = DEFAULT_PAD,
) -> list[dict]:
    """One batch document -> instruction dicts
    ``{batch_id, item_id, seq, original_name, new_name, safe}``.

    ``existing_names``: current object-store key set used for extension
    discovery (the reference probes the source item's folders on disk;
    distributed, this is a membership lookup against the lake key set).
    """
    batch_id = doc.get("batchId", "")
    out: list[dict] = []
    for ci, change in enumerate(doc.get("changes", [])):
        item_id = (change.get("itemId") or "").strip()
        if not item_id or item_id.lower() == "null":
            item_id = mint_item_id(batch_id, ci)
        for idx, image_id in enumerate(change.get("orderedImageIds", [])):
            base, ext = _split_ext(image_id)
            if ext is not None:
                exts = [ext]
            else:
                exts = [e for e in KNOWN_EXTS if f"{base}.{e}" in existing_names]
                if not exts:
                    exts = ["tif"]  # warn-path default (ReorderFiles.kt:163-171)
            new_base = f"tekst_{item_id}_{zero_pad % (idx + 1)}"
            for e in exts:
                src = f"{base}.{e}"
                dst = f"{new_base}.{e}"
                out.append(
                    {
                        "batch_id": batch_id,
                        "item_id": item_id,
                        "seq": idx + 1,
                        "original_name": src,
                        "new_name": dst,
                        "safe": is_safe_name(src) and is_safe_name(dst),
                    }
                )
    return out


def compile_batches_table(
    batch: pa.Table,
    existing_names: frozenset[str] | set[str] = frozenset(),
    json_col: str = "batch_json",
    lsn_col: str = "lsn",
) -> pa.Table:
    """``map_batches`` form: rows of (lsn, batch_json) -> instruction rows
    (one per page per discovered extension). Unsafe names are ROUTED
    (safe=false), not raised — poison-row quarantine instead of a crashed
    task (SURVEY.md §4 'Retries')."""
    lsns = batch[lsn_col].to_pylist()
    docs = batch[json_col].to_pylist()
    rows: list[dict] = []
    for lsn, s in zip(lsns, docs):
        for r in compile_change_batch(json.loads(s), existing_names):
            r["lsn"] = lsn
            rows.append(r)
    return pa.Table.from_arrays(
        [
            pa.array([r["lsn"] for r in rows], type=pa.int64()),
            pa.array([r["batch_id"] for r in rows], type=pa.string()),
            pa.array([r["item_id"] for r in rows], type=pa.string()),
            pa.array([r["seq"] for r in rows], type=pa.int64()),
            pa.array([r["original_name"] for r in rows], type=pa.string()),
            pa.array([r["new_name"] for r in rows], type=pa.string()),
            pa.array([r["safe"] for r in rows], type=pa.bool_()),
        ],
        names=["lsn", "batch_id", "item_id", "seq", "original_name", "new_name", "safe"],
    )


def instructions_to_events(instr: pa.Table, repo: str = "store") -> pa.Table:
    """Instruction rows -> compiled CDC events: delete(original) +
    insert(new) at the instruction's LSN, content = the moved object's
    key (content-addressed stores move pointers, not bytes). The LWW
    merge then applies the whole batch as a set — swaps/cycles safe."""
    from .schemas import COMPILED_SCHEMA

    n = instr.num_rows
    commits = [
        hashlib.md5(f"{b}:{o}->{w}".encode("utf-8")).hexdigest()
        for b, o, w in zip(
            instr["batch_id"].to_pylist(),
            instr["original_name"].to_pylist(),
            instr["new_name"].to_pylist(),
        )
    ]
    dels = pa.Table.from_arrays(
        [
            instr["lsn"],
            pa.array(["delete"] * n, type=pa.string()),
            pa.array([repo] * n, type=pa.string()),
            instr["original_name"],
            pa.array(commits, type=pa.string()),
            pa.nulls(n, pa.string()),
            pa.nulls(n, pa.large_string()),
        ],
        schema=COMPILED_SCHEMA,
    )
    ins = pa.Table.from_arrays(
        [
            instr["lsn"],
            pa.array(["insert"] * n, type=pa.string()),
            pa.array([repo] * n, type=pa.string()),
            instr["new_name"],
            pa.array(commits, type=pa.string()),
            pa.nulls(n, pa.string()),
            pa.array(
                instr["original_name"].to_pylist(), type=pa.large_string()
            ),
        ],
        schema=COMPILED_SCHEMA,
    )
    return pa.concat_tables([dels, ins])
