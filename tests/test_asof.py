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
