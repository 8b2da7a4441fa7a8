"""Property-based invariants for the spill index, routing policy, and
manifest serializer (pure-Python paths — fast enough for hypothesis)."""

from __future__ import annotations

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from ray_cdc_lake.merge import _winner_per_key
from ray_cdc_lake.state import SortedRunIndex

event_st = st.fixed_dictionaries(
    {
        "repo": st.sampled_from(["r1", "r2"]),
        "path": st.sampled_from(["a", "b", "c", "d", "e"]),
        "lsn": st.integers(min_value=0, max_value=50),
        "commit": st.text(alphabet="abcdef", min_size=1, max_size=4),
        "op": st.sampled_from(["insert", "update", "delete"]),
        "content": st.text(alphabet="xy", max_size=4),
    }
)


def _table(events: list[dict]) -> pa.Table:
    # CDC invariant (same as test_property_lww): the commit id IDENTIFIES
    # the event payload — rows tying on (lsn, op-rank, commit) must be
    # exact duplicates, or the winner among them is unspecified and both
    # the engine and the reference may legitimately pick differently
    return pa.table(
        {
            "repo": pa.array([e["repo"] for e in events]),
            "path": pa.array([e["path"] for e in events]),
            "lsn": pa.array([e["lsn"] for e in events], type=pa.int64()),
            "commit": pa.array(
                [f'{e["commit"]}:{e["op"]}:{e["content"]}' for e in events]
            ),
            "op": pa.array([e["op"] for e in events]),
            "content": pa.array([e["content"] for e in events], type=pa.large_string()),
        }
    )


def _canon(t: pa.Table) -> list:
    return sorted(map(tuple, t.to_pandas().astype(str).values.tolist()))


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(event_st, max_size=120),
    chunk=st.integers(min_value=1, max_value=40),
    budget=st.integers(min_value=1, max_value=60),
)
def test_spill_index_equals_oneshot_any_chunking(tmp_path_factory, events, chunk, budget):
    """ANY chunking x ANY memory budget: the spilling index must equal the
    one-shot vectorized reduce (associativity/commutativity of LWW,
    including tombstones and same-(lsn,commit) duplicate deliveries)."""
    t = _table(events)
    want = _canon(_winner_per_key(t, ["repo", "path"])) if t.num_rows else []
    idx = SortedRunIndex(
        max_rows_in_mem=budget,
        spill_dir=str(tmp_path_factory.mktemp("runs")),
    )
    for off in range(0, t.num_rows, chunk):
        idx.add(t.slice(off, chunk))
    got = idx.finish()
    got_c = _canon(got) if got.num_rows else []
    assert got_c == want


route_st = st.sampled_from(["ok", "empty", "malformed", "transient", "weird"])


@settings(max_examples=60, deadline=None)
@given(
    routes=st.lists(route_st, min_size=1, max_size=50),
    attempts=st.lists(st.integers(min_value=0, max_value=5), min_size=50, max_size=50),
)
def test_policy_total_and_monotone(routes, attempts):
    """Every row gets exactly one disposition; attempts never decrease;
    penalties only attach to retried rows; no row is lost."""
    from ray_cdc_lake.routing import DEFAULT_POLICY, apply_route_policy

    n = len(routes)
    batch = pa.table(
        {
            "route": pa.array(routes),
            "attempt": pa.array(attempts[:n], type=pa.int64()),
        }
    )
    out = apply_route_policy(batch, DEFAULT_POLICY)
    assert out.num_rows == n
    disp = out["disposition"].to_pylist()
    assert set(disp) <= {"pass", "retry", "quarantine"}
    before = attempts[:n]
    after = out["attempt"].to_pylist()
    pen = out["penalty_ms"].to_pylist()
    for r, b, a, d, p in zip(routes, before, after, disp, pen):
        assert a >= b
        if d == "retry":
            assert a == b + 1
        else:
            assert a == b
            assert p == 0
        if d == "pass":
            assert r == "ok"


@settings(max_examples=40, deadline=None)
@given(
    files=st.lists(
        st.tuples(
            st.text(alphabet="abc/._", min_size=1, max_size=8),
            st.text(alphabet="0123456789abcdef", min_size=4, max_size=8),
        ),
        unique_by=lambda t: t[0],
        max_size=10,
    ),
    version=st.sampled_from([1, 2]),
)
def test_manifest_serialization_order_invariant(files, version):
    """Byte-exact determinism: any input permutation of the file list
    serializes to the identical manifest document."""
    from ray_cdc_lake.manifests import build_manifest_model, serialize_manifest

    paths = [p for p, _ in files]
    shas = [s for _, s in files]
    a = serialize_manifest(build_manifest_model("r", paths, shas), version)
    b = serialize_manifest(
        build_manifest_model("r", paths[::-1], shas[::-1]), version
    )
    assert a == b
