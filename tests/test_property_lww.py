"""Property-based correctness of the merge core (hypothesis).

An independent, dead-simple Python reference applies the event
semantics (rename compile -> set-apply -> LWW by (lsn, op-rank, commit))
one event-group at a time; the engine's vectorized kernels must agree on
ANY generated log — including same-LSN collisions, duplicate deliveries,
swaps, deletes of absent keys, and empty logs. This is the randomized
testing the reference lacks (SURVEY.md §5: 'No property-based/randomized
testing').
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import given, settings, strategies as st

from ray_cdc_lake.events import compile_changes
from ray_cdc_lake.merge import _winner_per_key
from ray_cdc_lake.schemas import EVENT_SCHEMA

PATHS = ["a", "b", "c", "d"]
REPOS = ["r1", "r2"]

event_st = st.fixed_dictionaries(
    {
        "lsn": st.integers(min_value=0, max_value=9),
        "op": st.sampled_from(["insert", "update", "delete", "rename"]),
        "repo": st.sampled_from(REPOS),
        "path": st.sampled_from(PATHS),
        "new_path": st.sampled_from(PATHS),
        "commit": st.text(alphabet="abcdef0123456789", min_size=1, max_size=6),
        "content": st.text(alphabet="xyz ", max_size=8),
    }
)


def _with_identifying_commits(events: list[dict]) -> list[dict]:
    """CDC invariant: the commit id IDENTIFIES the event (in the engine's
    derivation it is md5(repo/path@lsn); in git it is the commit SHA).
    Two different payloads never share a commit; exact duplicate
    deliveries do. The generator's free-form commit strings violate that,
    so derive the identifying form here."""
    return [
        {**e, "commit": f"{e['commit']}:{e['op']}:{e['new_path']}:{e['content']}"}
        for e in events
    ]


def _to_table(events: list[dict]) -> pa.Table:
    return pa.Table.from_arrays(
        [
            pa.array([e["lsn"] for e in events], type=pa.int64()),
            pa.array([e["op"] for e in events], type=pa.string()),
            pa.array([e["repo"] for e in events], type=pa.string()),
            pa.array([e["path"] for e in events], type=pa.string()),
            pa.array(
                [e["new_path"] if e["op"] == "rename" else None for e in events],
                type=pa.string(),
            ),
            pa.array([e["commit"] for e in events], type=pa.string()),
            pa.array(["py"] * len(events), type=pa.string()),
            pa.array(
                [None if e["op"] == "delete" else e["content"] for e in events],
                type=pa.large_string(),
            ),
            pa.array([e["lsn"] * 1000 for e in events], type=pa.timestamp("us")),
        ],
        schema=EVENT_SCHEMA,
    )


def _reference_apply(events: list[dict]) -> dict:
    """Independent implementation: compile renames, then pick the winner
    per key by max (lsn, op_rank, commit) and drop delete winners."""
    compiled = []
    for e in events:
        if e["op"] == "rename":
            compiled.append(
                {**e, "op": "delete", "content": None, "new_path": None}
            )
            compiled.append(
                {**e, "op": "insert", "path": e["new_path"], "new_path": None}
            )
        else:
            if e["op"] == "delete":
                e = {**e, "content": None}
            compiled.append(e)
    best: dict[tuple, dict] = {}
    for e in compiled:
        k = (e["repo"], e["path"])
        rank = (e["lsn"], 0 if e["op"] == "delete" else 1, e["commit"])
        if k not in best or rank > best[k]["_rank"]:
            best[k] = {**e, "_rank": rank}
    return {
        k: (v["lsn"], v["content"])
        for k, v in best.items()
        if v["op"] != "delete"
    }


@settings(max_examples=300, deadline=None)
@given(st.lists(event_st, max_size=40))
def test_engine_matches_reference_on_random_logs(events):
    events = _with_identifying_commits(events)
    t = _to_table(events)
    w = _winner_per_key(compile_changes(t), ["repo", "path"])
    live = w.filter(pc.not_equal(w["op"], "delete"))
    got = {
        (r, p): (l, c)
        for r, p, l, c in zip(
            live["repo"].to_pylist(),
            live["path"].to_pylist(),
            live["lsn"].to_pylist(),
            live["content"].to_pylist(),
        )
    }
    assert got == _reference_apply(events)


@settings(max_examples=100, deadline=None)
@given(st.lists(event_st, max_size=30), st.randoms())
def test_delivery_order_irrelevant(events, rnd):
    """Shuffling the log never changes the outcome (at-least-once,
    out-of-order delivery)."""
    events = _with_identifying_commits(events)
    shuffled = list(events)
    rnd.shuffle(shuffled)
    a = _winner_per_key(compile_changes(_to_table(events)), ["repo", "path"])
    b = _winner_per_key(compile_changes(_to_table(shuffled)), ["repo", "path"])

    def canon(t):
        return sorted(
            map(
                tuple,
                t.select(["repo", "path", "lsn", "op", "commit"])
                .to_pandas()
                .astype(str)
                .values.tolist(),
            )
        )

    assert canon(a) == canon(b)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(event_st, min_size=1, max_size=30),
    st.sets(st.integers(min_value=1, max_value=9), min_size=1, max_size=2),
)
def test_segmented_commit_equals_reference(events, cuts):
    """Any LSN-window segmentation of the log, applied as consecutive
    exactly-once txns through the sink, ends at the reference state."""
    events = _with_identifying_commits(events)
    import shutil
    import tempfile

    import ray.data as rd

    from ray_cdc_lake.checkpoint import apply_incremental
    from ray_cdc_lake.sink import read_lake

    bounds = sorted(cuts) + [100]
    lake = tempfile.mkdtemp(prefix="prop_lake_")
    try:
        lo = 0
        for i, hi in enumerate(bounds):
            seg = [e for e in events if lo <= e["lsn"] < hi]
            if seg:
                t = compile_changes(_to_table(seg))
                apply_incremental(lake, f"txn-{i}", rd.from_arrow(t), num_buckets=4)
            lo = hi
        want = _reference_apply(events)
        try:
            df = read_lake(lake).to_pandas()
            got = {
                (r.repo, r.path): (r.lsn, r.content) for r in df.itertuples()
            }
        except FileNotFoundError:
            got = {}
        assert got == want
    finally:
        shutil.rmtree(lake, ignore_errors=True)
