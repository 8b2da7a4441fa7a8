"""Change-batch JSON -> rename-instruction compilation, mirroring the
reference's fixture-driven conformance tests (ReorderFilesTest.kt:165-178:
input batch JSON -> expected instruction list, order-insensitive set
compare; fixtures …/test/resources/reorder-files/*.json).

Covers: position-derived zero-padded names, cross-item moves, key minting
for missing itemId, extension discovery fan-out against the existing key
set, default-extension warn path, path-safety routing, and the end-to-end
apply through the LWW merge (batch-as-a-set, reorders are swaps).
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc

from ray_cdc_lake.change_batches import (
    compile_batches_table,
    compile_change_batch,
    instructions_to_events,
    mint_item_id,
)

I1 = "11111111-aaaa-7000-8000-000000000001"
I2 = "22222222-bbbb-7000-8000-000000000002"

BATCH = {
    "batchId": "batch-0001",
    "font": "ANTIQUA",
    "language": "NOB",
    "changes": [
        {
            # reorder within item 1 plus one page pulled in from item 2
            "itemId": I1,
            "orderedImageIds": [
                f"tekst_{I1}_00001",
                f"tekst_{I1}_00003",
                f"tekst_{I1}_00002",
                f"tekst_{I2}_00004",
                f"tekst_{I1}_00004",
            ],
        },
        {
            # reorder within item 2 (pages 2 and 3 swapped)
            "itemId": I2,
            "orderedImageIds": [
                f"tekst_{I2}_00001",
                f"tekst_{I2}_00003",
                f"tekst_{I2}_00002",
            ],
        },
        {
            # no itemId -> deterministic mint
            "orderedImageIds": [f"tekst_{I2}_00003"]
        },
    ],
}

# the object store currently holds .jp2 files for both items (extension
# discovery must emit .jp2, not the .tif default)
EXISTING = frozenset(
    f"tekst_{i}_{p:05d}.jp2" for i in (I1, I2) for p in range(1, 5)
)


def test_compile_matches_expected_instruction_set():
    got = {
        (r["original_name"], r["new_name"])
        for r in compile_change_batch(BATCH, EXISTING)
        if r["item_id"] in (I1, I2)
    }
    want = {
        (f"tekst_{I1}_00001.jp2", f"tekst_{I1}_00001.jp2"),
        (f"tekst_{I1}_00003.jp2", f"tekst_{I1}_00002.jp2"),
        (f"tekst_{I1}_00002.jp2", f"tekst_{I1}_00003.jp2"),
        (f"tekst_{I2}_00004.jp2", f"tekst_{I1}_00004.jp2"),
        (f"tekst_{I1}_00004.jp2", f"tekst_{I1}_00005.jp2"),
        (f"tekst_{I2}_00001.jp2", f"tekst_{I2}_00001.jp2"),
        (f"tekst_{I2}_00003.jp2", f"tekst_{I2}_00002.jp2"),
        (f"tekst_{I2}_00002.jp2", f"tekst_{I2}_00003.jp2"),
    }
    assert got == want


def test_minted_key_deterministic_and_default_ext():
    rows = compile_change_batch(BATCH, frozenset())  # nothing exists -> .tif
    minted = [r for r in rows if r["item_id"] not in (I1, I2)]
    assert len(minted) == 1
    assert minted[0]["item_id"] == mint_item_id("batch-0001", 2)
    assert minted[0]["original_name"].endswith(".tif")
    # replay mints the same key
    again = compile_change_batch(BATCH, frozenset())
    assert [r["item_id"] for r in again] == [r["item_id"] for r in rows]


def test_unsafe_names_routed_not_raised():
    evil = {
        "batchId": "b",
        "changes": [{"itemId": "x", "orderedImageIds": ["../../etc/passwd.tif"]}],
    }
    t = compile_batches_table(
        pa.table({"lsn": [1], "batch_json": [json.dumps(evil)]})
    )
    assert t.num_rows == 1
    assert t["safe"][0].as_py() is False


def test_compile_against_lake_matches_broadcast_compile(tmp_path):
    """The distributed discovery path (bloom over the committed key set +
    bucketed exact verify, no driver-side key materialization) must emit
    exactly the instruction set of the broadcast-set compile — including
    the default-.tif warn path and ids that already carry an extension."""
    import ray.data as rd

    from ray_cdc_lake.change_batches import compile_batches_against_lake
    from ray_cdc_lake.checkpoint import apply_incremental
    from ray_cdc_lake.schemas import COMPILED_SCHEMA

    # commit the EXISTING key set (plus decoys) into a lake
    keys = sorted(EXISTING) + ["unrelated_0001.tif", "tekst_zzz_00001.tiff"]
    seed = pa.Table.from_arrays(
        [
            pa.array(range(1, len(keys) + 1), type=pa.int64()),
            pa.array(["insert"] * len(keys), type=pa.string()),
            pa.array(["store"] * len(keys), type=pa.string()),
            pa.array(keys, type=pa.string()),
            pa.array([f"seed-{k}" for k in keys], type=pa.string()),
            pa.nulls(len(keys), pa.string()),
            pa.array(keys, type=pa.large_string()),
        ],
        schema=COMPILED_SCHEMA,
    )
    lake = str(tmp_path / "lake")
    apply_incremental(lake, "seed", rd.from_arrow(seed), num_buckets=4)

    # a batch mixing discovery ids, a known-extension id, and a miss
    batch = {
        "batchId": "b-1",
        "changes": [
            {
                "itemId": I1,
                "orderedImageIds": [
                    f"tekst_{I1}_00001",          # discovers .jp2
                    f"tekst_{I1}_00002.tif",      # extension given: no probe
                    "never_committed_page",       # nothing found -> .tif
                ],
            }
        ],
    }
    batches = pa.table({"lsn": [7], "batch_json": [json.dumps(batch)]})

    want = compile_batches_table(batches, existing_names=EXISTING)
    got = compile_batches_against_lake(
        rd.from_arrow(batches), lake, verify_buckets=8
    ).to_pandas()

    to_set = lambda df: {  # noqa: E731
        tuple(r) for r in df[sorted(df.columns)].itertuples(index=False)
    }
    assert to_set(got) == to_set(want.to_pandas())
    # and the warn-path default really is in there
    assert ("never_committed_page.tif" == got["original_name"]).any()


def test_batch_apply_through_lww_is_swap_safe():
    """The reorder 00002<->00003 is a swap; applying the compiled events
    through the merge must keep every page live with the right content."""
    from ray_cdc_lake.merge import _winner_per_key

    instr = compile_batches_table(
        pa.table({"lsn": [100], "batch_json": [json.dumps(BATCH)]}),
        existing_names=EXISTING,
    )
    events = instructions_to_events(instr.filter(instr["safe"]))
    # seed state: every existing object inserted at lsn 1
    seed_rows = sorted(EXISTING)
    from ray_cdc_lake.schemas import COMPILED_SCHEMA

    seed = pa.Table.from_arrays(
        [
            pa.array([1] * len(seed_rows), type=pa.int64()),
            pa.array(["insert"] * len(seed_rows), type=pa.string()),
            pa.array(["store"] * len(seed_rows), type=pa.string()),
            pa.array(seed_rows, type=pa.string()),
            pa.array([f"seed-{p}" for p in seed_rows], type=pa.string()),
            pa.nulls(len(seed_rows), pa.string()),
            pa.array(seed_rows, type=pa.large_string()),  # content = own key
        ],
        schema=COMPILED_SCHEMA,
    )
    all_ev = pa.concat_tables([seed, events])
    w = _winner_per_key(all_ev, ["repo", "path"])
    live = w.filter(pc.not_equal(w["op"], "delete"))
    state = dict(zip(live["path"].to_pylist(), live["content"].to_pylist()))
    # the swap: 00002 now holds what was 00003 and vice versa
    assert state[f"tekst_{I1}_00002.jp2"] == f"tekst_{I1}_00003.jp2"
    assert state[f"tekst_{I1}_00003.jp2"] == f"tekst_{I1}_00002.jp2"
    # cross-item move landed
    assert state[f"tekst_{I1}_00004.jp2"] == f"tekst_{I2}_00004.jp2"
    # item-2 swap landed too
    assert state[f"tekst_{I2}_00002.jp2"] == f"tekst_{I2}_00003.jp2"
    assert state[f"tekst_{I2}_00003.jp2"] == f"tekst_{I2}_00002.jp2"
    # the minted change pulled item-2 page 3 into its slot 1 (discovery
    # found the .jp2 variant, not the .tif default)
    minted = mint_item_id("batch-0001", 2)
    assert state[f"tekst_{minted}_00001.jp2"] == f"tekst_{I2}_00003.jp2"
