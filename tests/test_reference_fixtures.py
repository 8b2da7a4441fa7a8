"""Conformance against the reference's OWN fixture corpus
(…/test/resources/reorder-files/ in /root/reference — read-only inputs;
no code is copied, only the JSON fixtures are read).

* flowfile.json + addRenameInstruction.json: the reference asserts
  ``addInstruction(itemId, orderedImageIds, "%05d", baseDir)`` over a
  seeded .tif store equals the expected instruction SET
  (ReorderFilesTest.kt:164-178, order-insensitive). The engine's
  ``compile_change_batch`` must produce the identical set.
* renameInstructions.json: the input corpus of RenameDiskUtilsTest.kt —
  a batch containing TWO swap pairs and a cross-item chain. Compiled to
  delete+insert event pairs and LWW-merged, the final key set must be
  exactly the instruction targets with each target carrying its source's
  content (the two-phase temp-dir dance of RenameDiskUtils.kt:32-105,
  reborn as same-LSN set semantics).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

FIXTURES = (
    "/root/reference/nifi-tekst-bundle-processors/src/test/resources/reorder-files"
)


def _load(name: str) -> dict:
    with open(os.path.join(FIXTURES, name)) as f:
        return json.load(f)


def test_add_instruction_set_matches_reference_fixture():
    from ray_cdc_lake.change_batches import compile_change_batch

    flowfile = _load("flowfile.json")
    expected = {
        (r["originalName"], r["newName"])
        for r in _load("addRenameInstruction.json")["addInstruction"]
    }
    change1 = flowfile["changes"][0]
    # the reference seeds the disk store with .tif files for every image
    # id (TestFileUtils.createDiskFiles); the engine's store probe is the
    # broadcast key set
    existing = {f"{iid}.tif" for iid in change1["orderedImageIds"]}
    out = compile_change_batch(
        {"batchId": flowfile["batchId"], "changes": [change1]},
        existing_names=existing,
    )
    got = {(r["original_name"], r["new_name"]) for r in out}
    assert got == expected
    assert all(r["safe"] for r in out)
    assert [r["seq"] for r in out] == [1, 2, 3, 4, 5]


def test_full_flowfile_compiles_all_changes():
    """All three changes of the reference flowfile: explicit itemIds keep
    their keys, the itemId-less change mints a deterministic UUID-shaped
    key (the reference injects uuidProvider for the same determinism,
    ReorderFiles.kt:39-41)."""
    from ray_cdc_lake.change_batches import compile_change_batch, mint_item_id

    flowfile = _load("flowfile.json")
    all_ids = [
        iid for ch in flowfile["changes"] for iid in ch["orderedImageIds"]
    ]
    existing = {f"{iid}.tif" for iid in all_ids}
    out = compile_change_batch(flowfile, existing_names=existing)
    assert len(out) == len(all_ids)  # one instruction per page, one ext each
    minted = mint_item_id(flowfile["batchId"], 2)
    ch3 = [r for r in out if r["item_id"] == minted]
    assert len(ch3) == 1
    assert ch3[0]["new_name"] == f"tekst_{minted}_00001.tif"
    assert ch3[0]["original_name"] == flowfile["changes"][2]["orderedImageIds"][0] + ".tif"
    # replaying the same batch mints the same key (idempotence)
    again = compile_change_batch(flowfile, existing_names=existing)
    assert [r["item_id"] for r in again] == [r["item_id"] for r in out]


def test_rename_instruction_corpus_swaps_apply_as_a_set():
    """The RenameDiskUtilsTest input corpus contains swap pairs
    (…_00002 <-> …_00003 twice) and a cross-item move chain; applying the
    compiled delete+insert events through the LWW merge must land every
    target with its source's content and leave no source-only keys."""
    import ray.data as rd

    from ray_cdc_lake.change_batches import instructions_to_events
    from ray_cdc_lake.merge import lww_merge

    rows = _load("renameInstructions.json")["renameInstructions"]
    n = len(rows)
    instr = pa.table(
        {
            "lsn": pa.array([1] * n, type=pa.int64()),
            "batch_id": pa.array(["batch-ref"] * n),
            "item_id": pa.array(["x"] * n),
            "seq": pa.array(list(range(1, n + 1)), type=pa.int64()),
            "original_name": pa.array([r["originalName"] for r in rows]),
            "new_name": pa.array([r["newName"] for r in rows]),
            "safe": pa.array([True] * n),
        }
    )
    events = instructions_to_events(instr)
    # base state: every source object exists in the store at lsn 0
    sources = sorted({r["originalName"] for r in rows})
    base = pa.table(
        {
            "lsn": pa.array([0] * len(sources), type=pa.int64()),
            "op": pa.array(["insert"] * len(sources)),
            "repo": pa.array(["store"] * len(sources)),
            "path": pa.array(sources),
            "commit": pa.array([f"seed-{s}" for s in sources]),
            "lang": pa.array([None] * len(sources), type=pa.string()),
            "content": pa.array(
                [f"bytes:{s}" for s in sources], type=pa.large_string()
            ),
        }
    )
    merged = lww_merge(
        rd.from_arrow(pa.concat_tables([base, events])), num_buckets=8
    ).to_pandas()

    targets = {r["newName"] for r in rows}
    assert set(merged["path"]) == targets  # every source consumed or reused
    # content follows the move: target row carries its SOURCE key as
    # content (instructions_to_events moves pointers, not bytes)
    want = {r["newName"]: r["originalName"] for r in rows}
    got = dict(zip(merged["path"], merged["content"]))
    assert got == want
