"""Property-based correctness of merge-on-read interleavings (hypothesis).

A dead-simple sequential reference model applies LSN-windowed micro
batches, predicate deletes and (semantically no-op) folds to a dict; the
lake — with a RANDOM cow/mor mode per window, random fold points and a
randomly placed metadata-only delete — must agree on the final live
state for ANY generated log. This is the randomized half of the MOR
guarantees test_mor.py pins example-by-example: delta-chain LWW merge,
hwm dedup across chains, lsn-scoped delete entries, fold idempotence.
"""

from __future__ import annotations

import shutil
import uuid

import pyarrow as pa
from hypothesis import HealthCheck, given, settings, strategies as st

from ray_cdc_lake.checkpoint import apply_incremental, compact_deltas
from ray_cdc_lake.schemas import COMPILED_SCHEMA
from ray_cdc_lake.sink import delete_where, read_lake

REPOS = ["r1", "r2"]
PATHS = ["a", "b", "c"]
MAX_LSN = 9

event_st = st.fixed_dictionaries(
    {
        "lsn": st.integers(min_value=0, max_value=MAX_LSN),
        "op": st.sampled_from(["insert", "update", "delete"]),
        "repo": st.sampled_from(REPOS),
        "path": st.sampled_from(PATHS),
        "content": st.text(alphabet="xyz", max_size=4),
    }
)

plan_st = st.fixed_dictionaries(
    {
        "events": st.lists(event_st, min_size=1, max_size=14),
        # lsn cut points -> up to 3 consecutive windows
        "cuts": st.lists(
            st.integers(min_value=1, max_value=MAX_LSN), max_size=2, unique=True
        ),
        "modes": st.lists(st.sampled_from(["cow", "mor"]), min_size=3, max_size=3),
        "folds": st.lists(st.booleans(), min_size=3, max_size=3),
        # delete repo r1 after window k (3 = never)
        "delete_after": st.integers(min_value=0, max_value=3),
    }
)


def _identify(e: dict) -> dict:
    # the commit id IDENTIFIES the event (same invariant as the engine's
    # derivation: md5 of key@lsn); duplicates share it, payloads don't
    c = f"{e['repo']}/{e['path']}@{e['lsn']}:{e['op']}:{e['content']}"
    return {**e, "commit": c, "content": None if e["op"] == "delete" else e["content"]}


def _window_table(events: list[dict]) -> pa.Table:
    return pa.Table.from_arrays(
        [
            pa.array([e["lsn"] for e in events], type=pa.int64()),
            pa.array([e["op"] for e in events], type=pa.string()),
            pa.array([e["repo"] for e in events], type=pa.string()),
            pa.array([e["path"] for e in events], type=pa.string()),
            pa.array([e["commit"] for e in events], type=pa.string()),
            pa.array(["py"] * len(events), type=pa.string()),
            pa.array([e["content"] for e in events], type=pa.large_string()),
        ],
        schema=COMPILED_SCHEMA,
    )


def _reference(windows: list[list[dict]], delete_after: int) -> dict:
    """Sequential model: LWW by (lsn, op!=delete, commit) per key across
    windows; the predicate delete drops every matching entry present at
    its point in the sequence (tombstones included — they were already
    dead); later upserts of matching keys survive."""
    state: dict[tuple, tuple] = {}
    for k, win in enumerate(windows):
        for e in win:
            key = (e["repo"], e["path"])
            rank = (e["lsn"], e["op"] != "delete", e["commit"])
            if key not in state or rank > state[key][:3]:
                state[key] = (e["lsn"], e["op"] != "delete", e["commit"], e)
        if delete_after == k:
            state = {key: v for key, v in state.items() if key[0] != "r1"}
    if delete_after >= len(windows):
        state = {key: v for key, v in state.items() if key[0] != "r1"}
    return {
        key: (v[3]["lsn"], v[3]["content"])
        for key, v in state.items()
        if v[3]["op"] != "delete"
    }


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(plan_st)
def test_mor_interleavings_match_reference(plan):
    import ray.data as rd

    events = [_identify(e) for e in plan["events"]]
    bounds = sorted(set(plan["cuts"])) + [MAX_LSN + 1]
    windows, lo = [], 0
    for hi in bounds:
        windows.append([e for e in events if lo <= e["lsn"] < hi])
        lo = hi
    windows = [w for w in windows if w]
    if not windows:
        return

    lake = f"/tmp/ray_cdc_prop_mor/{uuid.uuid4().hex}"
    shutil.rmtree(lake, ignore_errors=True)
    try:
        for k, win in enumerate(windows):
            apply_incremental(
                lake,
                f"w-{k}",
                rd.from_arrow(_window_table(win)),
                num_buckets=4,
                events_schema=COMPILED_SCHEMA,
                mode=plan["modes"][k % 3],
            )
            if plan["delete_after"] == k:
                delete_where(lake, f"del-{k}", "repo", "==", "r1")
            if plan["folds"][k % 3]:
                compact_deltas(lake)
        if plan["delete_after"] >= len(windows):
            delete_where(lake, "del-end", "repo", "==", "r1")

        df = read_lake(lake).to_pandas()
        got = {
            (r.repo, r.path): (int(r.lsn), r.content) for r in df.itertuples()
        }
        assert got == _reference(windows, plan["delete_after"])
    finally:
        shutil.rmtree(lake, ignore_errors=True)
