"""As-of join operator (ray_cdc_lake/asof.py).

Bar: backward-inclusive temporal lookup per key — latest right row with
right_on <= left_on — with LEFT-join nulls for probes before any
history, LWW tiebreak at equal ordinates, and key isolation (a probe
never matches another key's history)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ray_cdc_lake.asof import asof_join

HIST = [
    # repo, path, lsn, op, commit, content
    ("r1", "a", 1, "insert", "c01", "A1"),
    ("r1", "a", 5, "update", "c05", "A2"),
    ("r1", "a", 9, "delete", "c09", None),
    ("r1", "b", 3, "insert", "c03", "B1"),
    ("r2", "a", 4, "insert", "c04", "X1"),
    # equal-lsn LWW tie: insert must beat delete at lsn 7
    ("r1", "b", 7, "delete", "c07", None),
    ("r1", "b", 7, "insert", "c08", "B2"),
]

PROBES = [
    # repo, path, qlsn -> expected (asof_lsn, asof_op, asof_content)
    ("r1", "a", 0, None, None, None),  # before any history
    ("r1", "a", 1, 1, "insert", "A1"),  # inclusive at equal ordinate
    ("r1", "a", 6, 5, "update", "A2"),
    ("r1", "a", 99, 9, "delete", None),  # deletes are visible as-of
    ("r1", "b", 7, 7, "insert", "B2"),  # LWW tie: live beats delete
    ("r1", "b", 6, 3, "insert", "B1"),
    ("r2", "a", 8, 4, "insert", "X1"),  # never r1's history
    ("r9", "z", 50, None, None, None),  # key with no history at all
]


def _ds(rows, cols, types):
    import ray.data as rd

    arrays = [
        pa.array([r[i] for r in rows], type=types[i]) for i in range(len(cols))
    ]
    return rd.from_arrow(pa.Table.from_arrays(arrays, names=cols))


def test_asof_join_semantics():
    hist = _ds(
        HIST,
        ["repo", "path", "lsn", "op", "commit", "content"],
        [pa.string(), pa.string(), pa.int64(), pa.string(), pa.string(), pa.string()],
    )
    probes = _ds(
        [(r, p, q) for r, p, q, *_ in PROBES],
        ["repo", "path", "qlsn"],
        [pa.string(), pa.string(), pa.int64()],
    )
    out = asof_join(probes, hist, num_buckets=4).to_pandas()
    assert len(out) == len(PROBES)
    got = {
        (r.repo, r.path, int(r.qlsn)): (
            None if pd.isna(r.asof_lsn) else int(r.asof_lsn),
            None if pd.isna(r.asof_op) else r.asof_op,
            None if (r.asof_content is None or pd.isna(r.asof_content)) else r.asof_content,
        )
        for r in out.itertuples()
    }
    for repo, path, q, elsn, eop, econtent in PROBES:
        assert got[(repo, path, q)] == (elsn, eop, econtent), (repo, path, q)


def test_asof_join_salted_equals_unsalted():
    """Hot-key salting (probes spread by ordinate, history replicated
    into every sub-bucket) must be output-invariant."""
    hist = _ds(
        HIST,
        ["repo", "path", "lsn", "op", "commit", "content"],
        [pa.string(), pa.string(), pa.int64(), pa.string(), pa.string(), pa.string()],
    )
    # 90% of probes hammer one key
    rows = [("r1", "a", q) for q in range(2, 20)] + [("r1", "b", 8), ("r2", "a", 9)]
    probes = _ds(
        rows, ["repo", "path", "qlsn"], [pa.string(), pa.string(), pa.int64()]
    )

    def norm(df):
        cols = sorted(df.columns)
        return (
            df[cols]
            .sort_values(cols)
            .reset_index(drop=True)
            .to_dict("records")
        )

    plain = asof_join(probes, hist, num_buckets=4).to_pandas()
    salted = asof_join(probes, hist, num_buckets=4, salt_mod=3).to_pandas()
    assert norm(plain) == norm(salted)


def test_asof_join_matches_bruteforce_model():
    """Randomized histories/probes vs a brute-force model (hypothesis)."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    hist_st = st.lists(
        st.tuples(
            st.sampled_from(["r1", "r2"]),
            st.sampled_from(["a", "b"]),
            st.integers(min_value=0, max_value=9),
            st.sampled_from(["insert", "update", "delete"]),
            st.text(alphabet="xy", min_size=1, max_size=3),
        ),
        min_size=1,
        max_size=12,
    )
    probe_st = st.lists(
        st.tuples(
            st.sampled_from(["r1", "r2", "r9"]),
            st.sampled_from(["a", "b"]),
            st.integers(min_value=0, max_value=10),
        ),
        min_size=1,
        max_size=8,
    )

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(hist_st, probe_st)
    def run(hist_rows, probe_rows):
        hist_rows = [
            (r, p, l, op, f"c{l}{op}{c}", None if op == "delete" else c)
            for r, p, l, op, c in hist_rows
        ]
        hist = _ds(
            hist_rows,
            ["repo", "path", "lsn", "op", "commit", "content"],
            [pa.string(), pa.string(), pa.int64(), pa.string(), pa.string(), pa.string()],
        )
        probes = _ds(
            probe_rows,
            ["repo", "path", "qlsn"],
            [pa.string(), pa.string(), pa.int64()],
        )
        out = asof_join(probes, hist, num_buckets=4).to_pandas()
        got = sorted(
            (
                r.repo,
                r.path,
                int(r.qlsn),
                None if pd.isna(r.asof_lsn) else int(r.asof_lsn),
                None if (r.asof_commit is None or pd.isna(r.asof_commit)) else r.asof_commit,
            )
            for r in out.itertuples()
        )
        expect = []
        for r, p, q in probe_rows:
            cands = [
                h for h in hist_rows if h[0] == r and h[1] == p and h[2] <= q
            ]
            if not cands:
                expect.append((r, p, q, None, None))
            else:
                w = max(cands, key=lambda h: (h[2], h[3] != "delete", h[4]))
                expect.append((r, p, q, w[2], w[4]))
        assert got == sorted(expect)

    run()


def test_asof_join_rejects_asof_prefixed_left():
    import pytest

    hist = _ds(
        HIST[:1],
        ["repo", "path", "lsn", "op", "commit", "content"],
        [pa.string(), pa.string(), pa.int64(), pa.string(), pa.string(), pa.string()],
    )
    probes = _ds(
        [("r1", "a", 1, "x")],
        ["repo", "path", "qlsn", "asof_junk"],
        [pa.string(), pa.string(), pa.int64(), pa.string()],
    )
    with pytest.raises(ValueError, match="asof_"):
        asof_join(probes, hist)


def test_multi_key_nul_values_rejected():
    """A NUL inside a key value would alias distinct multi-key rows in
    the packed grouping ( ('a','b\\0c') == ('a\\0b','c') ) — rejected
    loudly; single-key joins take the column verbatim, so NUL is fine."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    left = rd.from_arrow(pa.table({
        "repo": ["a"], "path": ["b\x00c"], "qlsn": [5],
    }))
    right = rd.from_arrow(pa.table({
        "repo": ["a\x00b"], "path": ["c"], "lsn": [1], "v": [10],
    }))
    with pytest.raises(Exception, match="NUL"):
        asof_join(left, right, keys=("repo", "path"),
                  left_on="qlsn", right_on="lsn").materialize()
    # single key: passes through, no pack, no alias
    l1 = rd.from_arrow(pa.table({"k": ["x\x00y"], "qlsn": [5]}))
    r1 = rd.from_arrow(pa.table({"k": ["x\x00y"], "lsn": [1], "v": [10]}))
    out = asof_join(l1, r1, keys=("k",), left_on="qlsn",
                    right_on="lsn").to_pandas()
    assert list(out["asof_v"]) == [10]
