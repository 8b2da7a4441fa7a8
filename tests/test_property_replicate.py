"""Property-based convergence of cross-lake replication (hypothesis).

For ANY generated source history — micro-batch windows applied in a
random cow/mor mode mix, delta folds at random points, predicate deletes
that may RE-ISSUE the identical predicate after a matching re-upsert
(the GDPR re-erase flow that diverged silently before 5586183), and a
schema-evolved column added mid-chain — an incrementally-consumed
replica (replicated at random lag points, different bucket modulus)
must equal the source's live state at every replication point and at
the end, evolved columns included.

This is the randomized half of test_replicate.py's example-by-example
pins, and the generalization of the exact bug class ADVICE r4 found:
any manifest-chain step the extractor misclassifies (skipped delete,
whitelisted column, wrong watermark) shows up here as a state mismatch.
"""

from __future__ import annotations

import shutil
import uuid

import pandas as pd
import pyarrow as pa
from hypothesis import HealthCheck, given, settings, strategies as st

from ray_cdc_lake.checkpoint import apply_incremental, compact_deltas
from ray_cdc_lake.replicate import replicate
from ray_cdc_lake.schemas import COMPILED_SCHEMA
from ray_cdc_lake.sink import delete_where, read_lake

REPOS = ["r1", "r2"]
PATHS = ["a", "b"]
MAX_LSN = 9

event_st = st.fixed_dictionaries(
    {
        "lsn": st.integers(min_value=0, max_value=MAX_LSN),
        "op": st.sampled_from(["insert", "update", "delete"]),
        "repo": st.sampled_from(REPOS),
        "path": st.sampled_from(PATHS),
        "content": st.text(alphabet="xyz", max_size=3),
    }
)

plan_st = st.fixed_dictionaries(
    {
        "events": st.lists(event_st, min_size=1, max_size=12),
        # lsn cut points -> up to 3 consecutive windows
        "cuts": st.lists(
            st.integers(min_value=1, max_value=MAX_LSN), max_size=2, unique=True
        ),
        "modes": st.lists(st.sampled_from(["cow", "mor"]), min_size=3, max_size=3),
        "folds": st.lists(st.booleans(), min_size=3, max_size=3),
        # per window: issue `repo == 'r1'` after it? Two Trues with an r1
        # re-upsert between them IS the re-erase flow (identical triple,
        # distinct txn — must be detected by txn_id, not by the triple)
        "delete_r1_after": st.lists(st.booleans(), min_size=3, max_size=3),
        # window index that carries the evolved column (3 = never)
        "evolve_window": st.integers(min_value=0, max_value=3),
        # replicate (i.e. catch the replica up) after window k?
        "replicate_after": st.lists(st.booleans(), min_size=3, max_size=3),
        "unordered": st.booleans(),
    }
)


def _identify(e: dict) -> dict:
    c = f"{e['repo']}/{e['path']}@{e['lsn']}:{e['op']}:{e['content']}"
    return {**e, "commit": c, "content": None if e["op"] == "delete" else e["content"]}


def _window_table(events: list[dict], evolved: bool) -> pa.Table:
    t = pa.Table.from_arrays(
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
    if evolved:
        t = t.append_column(
            "stars", pa.array([e["lsn"] * 10 for e in events], type=pa.int64())
        )
    return t


def _live(lake: str) -> dict:
    df = read_lake(lake).to_pandas()
    out = {}
    for r in df.itertuples():
        stars = getattr(r, "stars", None)
        out[(r.repo, r.path)] = (
            int(r.lsn),
            r.content,
            None if stars is None or pd.isna(stars) else int(stars),
        )
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(plan_st)
def test_replica_converges_under_random_histories(plan):
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

    root = f"/tmp/ray_cdc_prop_repl/{uuid.uuid4().hex}"
    src, dst = f"{root}/src", f"{root}/dst"
    try:
        for k, win in enumerate(windows):
            # column ADDs go through cow by contract (mor null-backfills
            # old-shape events afterwards, but never introduces columns)
            mode = "cow" if plan["evolve_window"] == k else plan["modes"][k % 3]
            apply_incremental(
                src,
                f"w-{k}",
                rd.from_arrow(_window_table(win, plan["evolve_window"] == k)),
                num_buckets=4,
                mode=mode,
            )
            if plan["delete_r1_after"][k % 3]:
                delete_where(src, f"del-{k}", "repo", "==", "r1")
            if plan["folds"][k % 3]:
                compact_deltas(src)
            if plan["replicate_after"][k % 3]:
                replicate(
                    src,
                    dst,
                    num_buckets=2,
                    assume_ordered_log=not plan["unordered"],
                )
                # mid-chain: the replica equals the source AS OF NOW
                assert _live(dst) == _live(src), f"diverged after window {k}"
        replicate(
            src, dst, num_buckets=2, assume_ordered_log=not plan["unordered"]
        )
        assert _live(dst) == _live(src), "diverged at final catch-up"
        # idempotence: a second catch-up applies nothing and changes nothing
        again = replicate(
            src, dst, num_buckets=2, assume_ordered_log=not plan["unordered"]
        )
        assert again["applied"] == []
        assert _live(dst) == _live(src)
    finally:
        shutil.rmtree(root, ignore_errors=True)
