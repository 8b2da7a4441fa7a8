"""Property-based correctness of the CHECK-constraint gate
(checkpoint._constraint_mask vs a transparent row-by-row model).

For ANY generated batch (nulls anywhere, delete ops mixed in, missing
columns) and ANY generated constraint set over the supported ops, the
vectorized mask must agree with the obvious per-row Python evaluation
under SQL three-valued semantics (NULL passes value ops, not_null
catches it, deletes exempt)."""

from __future__ import annotations

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from ray_cdc_lake.checkpoint import _constraint_mask

LANGS = ["py", "md", "rs", None]
OPS = ["insert", "update", "delete"]

row_st = st.fixed_dictionaries(
    {
        "op": st.sampled_from(OPS),
        "lang": st.sampled_from(LANGS),
        "lsn": st.one_of(st.none(), st.integers(min_value=0, max_value=9)),
        "content": st.one_of(
            st.none(), st.text(alphabet="ab", min_size=0, max_size=6)
        ),
    }
)

constraint_st = st.one_of(
    st.builds(
        lambda c: {"name": f"nn_{c}", "column": c, "op": "not_null", "value": None},
        st.sampled_from(["lang", "lsn", "content", "absent_col"]),
    ),
    st.builds(
        lambda v: {"name": "langs", "column": "lang", "op": "in", "value": v},
        st.lists(st.sampled_from(["py", "md", "rs"]), min_size=0, max_size=3),
    ),
    st.builds(
        lambda v: {"name": "cap", "column": "lsn", "op": "<=", "value": v},
        st.integers(min_value=0, max_value=9),
    ),
    st.builds(
        lambda v: {"name": "floor", "column": "lsn", "op": ">=", "value": v},
        st.integers(min_value=0, max_value=9),
    ),
    st.builds(
        lambda v: {"name": "len", "column": "content", "op": "max_len", "value": v},
        st.integers(min_value=0, max_value=5),
    ),
)


def _model_violates(row: dict, c: dict) -> bool:
    if row["op"] == "delete":
        return False
    v = row.get(c["column"])
    op = c["op"]
    if op == "not_null":
        return v is None
    if v is None:
        return False  # three-valued: NULL passes value ops
    if op == "in":
        return v not in c["value"]
    if op == "<=":
        return v > c["value"]
    if op == ">=":
        return v < c["value"]
    if op == "max_len":
        return len(v) > c["value"]
    return False


@settings(max_examples=200, deadline=None)
@given(
    rows=st.lists(row_st, min_size=1, max_size=30),
    constraints=st.lists(constraint_st, min_size=1, max_size=4),
)
def test_mask_matches_row_model(rows, constraints):
    t = pa.Table.from_pylist(
        [{k: v for k, v in r.items()} for r in rows],
        schema=pa.schema(
            [
                ("op", pa.string()),
                ("lang", pa.string()),
                ("lsn", pa.int64()),
                ("content", pa.string()),
            ]
        ),
    )
    got = _constraint_mask(t, constraints).to_pylist()
    want = [
        any(_model_violates(r, c) for c in constraints) for r in rows
    ]
    assert got == want
