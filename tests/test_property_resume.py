"""Property-based crash/resume convergence (hypothesis).

For ANY generated event log, window split, cow/mor mode mix and set of
crash points (fail_before_publish injected at randomly chosen windows,
then the whole tail re-run with the SAME txn ids), the resumed lake's
live state must equal a clean single-txn apply of the full log. This is
the randomized generalization of test_sink_resume's example-based
kill/resume pins: txn-id idempotence + per-bucket watermarks must make
every crash point invisible."""

from __future__ import annotations

import shutil
import uuid

import pyarrow as pa
from hypothesis import HealthCheck, given, settings, strategies as st

from ray_cdc_lake.checkpoint import apply_incremental
from ray_cdc_lake.schemas import COMPILED_SCHEMA
from ray_cdc_lake.sink import read_lake

REPOS = ["r1", "r2"]
PATHS = ["a", "b", "c"]
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
        "cuts": st.lists(
            st.integers(min_value=1, max_value=MAX_LSN), max_size=2, unique=True
        ),
        "modes": st.lists(st.sampled_from(["cow", "mor"]), min_size=3, max_size=3),
        # crash BEFORE publishing window k? (re-run resumes it)
        "crash_at": st.lists(st.booleans(), min_size=3, max_size=3),
    }
)


def _identify(e: dict) -> dict:
    c = f"{e['repo']}/{e['path']}@{e['lsn']}:{e['op']}:{e['content']}"
    return {**e, "commit": c, "content": None if e["op"] == "delete" else e["content"]}


def _table(events: list[dict]) -> pa.Table:
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


def _live(lake: str) -> dict:
    df = read_lake(lake).to_pandas()
    return {(r.repo, r.path): (int(r.lsn), r.content) for r in df.itertuples()}


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(plan_st)
def test_crash_resume_converges_to_clean_apply(plan):
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

    root = f"/tmp/ray_cdc_prop_resume/{uuid.uuid4().hex}"
    lake, clean = f"{root}/lake", f"{root}/clean"
    try:
        # the reference state: one clean single-txn apply of the full log
        apply_incremental(clean, "all", rd.from_arrow(_table(events)), num_buckets=4)

        def run_tail(inject: bool) -> None:
            for k, win in enumerate(windows):
                crash = inject and plan["crash_at"][k % 3]
                try:
                    apply_incremental(
                        lake,
                        f"w-{k}",
                        rd.from_arrow(_table(win)),
                        num_buckets=4,
                        mode=plan["modes"][k % 3],
                        fail_before_publish=crash,
                    )
                except RuntimeError:
                    assert crash
                    return  # crashed mid-tail; the resume re-runs from w-0

        # one crashing pass (stops at the first injected crash, leaving a
        # staged-but-unpublished txn), one no-crash resume pass with the
        # SAME txn ids — already-applied windows are idempotent no-ops,
        # the crashed window completes, later windows apply fresh
        run_tail(inject=True)
        run_tail(inject=False)

        assert _live(lake) == _live(clean)
    finally:
        shutil.rmtree(root, ignore_errors=True)
