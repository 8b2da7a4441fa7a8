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

# module-scope import: UDF closures below run in Ray workers whose cwd
# may not resolve `ray_cdc_lake` by path — an in-function relative import
# raises ModuleNotFoundError there, while module-scope references travel
# with the self-contained pickle (same note as replicate.py)
from .transforms import add_path_safety, is_safe_name

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


def parse_batch_images(
    batch: pa.Table, json_col: str = "batch_json", lsn_col: str = "lsn"
) -> pa.Table:
    """Rows of (lsn, batch_json) -> one row per page image WITHOUT doing
    extension discovery: ``(lsn, batch_id, item_id, seq, base, ext)`` with
    ``ext == ''`` marking an image id that needs discovery. The JSON parse
    is inherently row-wise; everything downstream of it is vectorized."""
    lsns = batch[lsn_col].to_pylist()
    docs = batch[json_col].to_pylist()
    lsn_o: list[int] = []
    bid_o: list[str] = []
    iid_o: list[str] = []
    seq_o: list[int] = []
    base_o: list[str] = []
    ext_o: list[str] = []
    for lsn, s in zip(lsns, docs):
        doc = json.loads(s)
        batch_id = doc.get("batchId", "")
        for ci, change in enumerate(doc.get("changes", [])):
            item_id = (change.get("itemId") or "").strip()
            if not item_id or item_id.lower() == "null":
                item_id = mint_item_id(batch_id, ci)
            for idx, image_id in enumerate(change.get("orderedImageIds", [])):
                base, ext = _split_ext(image_id)
                lsn_o.append(lsn)
                bid_o.append(batch_id)
                iid_o.append(item_id)
                seq_o.append(idx + 1)
                base_o.append(base)
                ext_o.append(ext or "")
    return pa.table(
        {
            "lsn": pa.array(lsn_o, type=pa.int64()),
            "batch_id": pa.array(bid_o, type=pa.string()),
            "item_id": pa.array(iid_o, type=pa.string()),
            "seq": pa.array(seq_o, type=pa.int64()),
            "base": pa.array(base_o, type=pa.string()),
            "ext": pa.array(ext_o, type=pa.string()),
        }
    )


_IMG_ID_COLS = ["lsn", "batch_id", "item_id", "seq", "base"]


def _instructions_from_images(t: pa.Table, zero_pad: str = DEFAULT_PAD) -> pa.Table:
    """(lsn, batch_id, item_id, seq, base, ext) rows -> instruction rows,
    fully vectorized (string concat + lpad + path-safety kernels)."""
    import pyarrow.compute as pc

    width = (
        int(zero_pad[2:-1])
        if zero_pad.startswith("%0") and zero_pad.endswith("d")
        else 5
    )
    seq_str = pc.utf8_lpad(pc.cast(t["seq"], pa.string()), width, "0")
    original = pc.binary_join_element_wise(t["base"], t["ext"], ".")
    new_name = pc.binary_join_element_wise(
        "tekst_", t["item_id"], "_", seq_str, ".", t["ext"], ""
    )
    safe = pc.and_(
        add_path_safety(pa.table({"path": original}))["is_safe"].combine_chunks(),
        add_path_safety(pa.table({"path": new_name}))["is_safe"].combine_chunks(),
    )
    return pa.table(
        {
            "lsn": t["lsn"],
            "batch_id": t["batch_id"],
            "item_id": t["item_id"],
            "seq": t["seq"],
            "original_name": original,
            "new_name": new_name,
            "safe": safe,
        }
    )


def compile_batches_against_lake(
    batches,
    lake: str,
    store=None,
    zero_pad: str = DEFAULT_PAD,
    verify_buckets: int = 64,
    json_col: str = "batch_json",
    lsn_col: str = "lsn",
):
    """Change-batch compile with extension discovery against the COMMITTED
    lake key set — the M3 fan-out (ReorderFiles.kt:149-185) with NO
    driver-side materialization of lake data at any point:

    1. a bloom filter over the lake's path column is built DISTRIBUTED:
       per-block partial bit arrays, OR-merged as fixed 16-KiB blobs (the
       dedup_incremental combiner) — the driver ever holds one blob,
       whatever the key count;
    2. each extension-less image id fans out to one candidate name per
       known extension; candidates probe the broadcast bloom — a miss is
       DEFINITELY absent and skips the shuffle;
    3. bloom hits (true keys + ~1e-5 FPs) are verified EXACTLY by a
       bucketed semi-join co-partitioned on the md5-u64 of the candidate
       name — the all-to-all moves the lake's path column and the
       probable-hit candidates, never whole rows and never the driver;
    4. candidates regroup per source image: discovered extensions emit
       one instruction each, nothing discovered defaults to ``.tif``
       (the warn path, ReorderFiles.kt:163-171).

    Image ids that already carry an extension bypass discovery entirely.
    Returns a Dataset of instruction rows (same schema as
    ``compile_batches_table``)."""
    import numpy as np
    import pyarrow.compute as pc
    import ray

    from .curation import bloom_build, bloom_probe
    from .kernels import md5_hex_prefix
    from .sink import read_lake
    from .sources import get_broadcast

    images = batches.map_batches(
        lambda b: parse_batch_images(b, json_col, lsn_col),
        batch_format="pyarrow",
    )
    direct = images.map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t["ext"], ""))),
        batch_format="pyarrow",
    )

    # 1. distributed bloom over the committed key set
    paths = read_lake(lake, columns=["path"], store=store)

    def bloom_partial(t: pa.Table) -> pa.Table:
        _, u64 = md5_hex_prefix(t["path"])
        return pa.table(
            {"bits": pa.array([bloom_build(u64).tobytes()], type=pa.binary())}
        )

    def bloom_reduce(t: pa.Table) -> pa.Table:
        total = None
        for blob in t["bits"].to_pylist():
            b = np.frombuffer(blob, dtype=np.uint8)
            total = b.copy() if total is None else (total | b)
        return pa.table({"bits": pa.array([total.tobytes()], type=pa.binary())})

    bits_row = (
        paths.map_batches(bloom_partial, batch_format="pyarrow")
        .repartition(1)
        # batch_size=None: all partials must OR together in ONE batch
        .map_batches(bloom_reduce, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    bits_ref = ray.put(np.frombuffer(bits_row[0]["bits"], dtype=np.uint8))

    # 2. candidate fan-out + bloom probe (one candidate per known ext)
    def fan_out(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["ext"], ""))
        n = t.num_rows
        k = len(KNOWN_EXTS)
        rep = t.take(pa.array(np.repeat(np.arange(n, dtype=np.int64), k)))
        exts = pa.array(list(KNOWN_EXTS) * n, type=pa.string())
        names = pc.binary_join_element_wise(rep["base"], exts, ".")
        _, u64 = md5_hex_prefix(names)
        hit = bloom_probe(u64.astype(np.uint64), get_broadcast(bits_ref))
        return pa.table(
            {
                **{c: rep[c] for c in _IMG_ID_COLS},
                "ext": exts,
                "name": names,
                "u64": pa.array(u64),
                "hit": pa.array(hit),
            }
        )

    cands = images.map_batches(fan_out, batch_format="pyarrow")

    def flag_misses(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(t["hit"]))
        return t.select(_IMG_ID_COLS + ["ext"]).append_column(
            "present", pa.array(np.zeros(t.num_rows, dtype=bool))
        )

    misses = cands.map_batches(flag_misses, batch_format="pyarrow")
    hits = cands.map_batches(
        lambda t: t.filter(t["hit"]), batch_format="pyarrow"
    )

    # 3. exact verify: union with the lake's path column, co-partitioned
    # on the name hash; build-side rows are marked by seq == -1
    def build_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        _, u64 = md5_hex_prefix(t["path"])
        return pa.table(
            {
                "lsn": pa.array(np.zeros(n, dtype=np.int64)),
                "batch_id": pa.nulls(n, pa.string()),
                "item_id": pa.nulls(n, pa.string()),
                "seq": pa.array(np.full(n, -1, dtype=np.int64)),
                "base": pa.nulls(n, pa.string()),
                "ext": pa.nulls(n, pa.string()),
                "name": t["path"],
                "u64": pa.array(u64),
                "hit": pa.array(np.ones(n, dtype=bool)),
            }
        )

    def add_name_bucket(t: pa.Table) -> pa.Table:
        u64 = t["u64"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "_b", pa.array((u64 % np.uint64(verify_buckets)).astype(np.int64))
        )

    def verify(g: pa.Table) -> pa.Table:
        is_build = pc.equal(g["seq"], -1)
        build_names = g.filter(is_build)["name"].combine_chunks()
        cand = g.filter(pc.invert(is_build))
        present = pc.is_in(cand["name"].combine_chunks(), value_set=build_names)
        return cand.select(_IMG_ID_COLS + ["ext"]).append_column(
            "present", present
        )

    verified = (
        hits.union(paths.map_batches(build_rows, batch_format="pyarrow"))
        .map_batches(add_name_bucket, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(verify, batch_format="pyarrow")
    )

    # 4. per-image regroup: present extensions fan out, none -> .tif
    def add_image_bucket(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(t["lsn"], pa.string()),
            t["batch_id"],
            t["item_id"],
            pc.cast(t["seq"], pa.string()),
            t["base"],
            "\x00",
        )
        _, u64 = md5_hex_prefix(key)
        return t.append_column(
            "_g", pa.array((u64 % np.uint64(verify_buckets)).astype(np.int64))
        )

    def resolve(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_g"])
        found = g.filter(g["present"]).select(_IMG_ID_COLS + ["ext"])
        agg = g.group_by(_IMG_ID_COLS).aggregate([("present", "any")])
        none = agg.filter(pc.invert(agg["present_any"]))
        defaults = pa.table(
            {
                **{c: none[c] for c in _IMG_ID_COLS},
                "ext": pa.array(["tif"] * none.num_rows, type=pa.string()),
            }
        )
        return pa.concat_tables([found, defaults])

    resolved = (
        verified.union(misses)
        .map_batches(add_image_bucket, batch_format="pyarrow")
        .groupby("_g")
        .map_groups(resolve, batch_format="pyarrow")
    )

    return resolved.union(direct).map_batches(
        lambda t: _instructions_from_images(t, zero_pad), batch_format="pyarrow"
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
