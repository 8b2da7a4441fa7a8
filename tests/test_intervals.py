"""Interval-overlap join operator (ray_cdc_lake/intervals.py).

Bar: exact inner overlap-join semantics (closed intervals,
max(starts) <= min(ends)), each pair emitted exactly ONCE regardless of
how many tiles the pair spans, key isolation, and endpoint
inclusiveness — property-tested against a brute-force quadratic model
over randomized inputs that force cross-tile spans, touching
endpoints, zero-length intervals, and multi-cell keys."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ray_cdc_lake.intervals import interval_join


def _ds(df: pd.DataFrame):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def _brute(left: pd.DataFrame, right: pd.DataFrame, key: str) -> pd.DataFrame:
    m = left.merge(right, on=key, suffixes=("", "_r"))
    m = m[(np.maximum(m["ls"], m["rs"]) <= np.minimum(m["le"], m["re"]))]
    return (
        m[[key, "lid", "rid"]]
        .sort_values([key, "lid", "rid"])
        .reset_index(drop=True)
    )


def _run(left: pd.DataFrame, right: pd.DataFrame, tile: int, key="k"):
    out = interval_join(
        _ds(left),
        _ds(right),
        keys=(key,),
        left_span=("ls", "le"),
        right_span=("rs", "re"),
        tile_width=tile,
        num_buckets=4,
    ).to_pandas()
    got = (
        out[[key, "lid", "r_rid"]]
        .rename(columns={"r_rid": "rid"})
        .sort_values([key, "lid", "rid"])
        .reset_index(drop=True)
    )
    return got


def test_interval_join_randomized_vs_brute():
    rng = np.random.default_rng(7)
    for trial in range(5):
        nl, nr = 120, 150
        # spans straddle many 100-wide tiles; lengths 0..350 force rows
        # replicated into up to 5 tiles
        ls = rng.integers(0, 2000, nl)
        le = ls + rng.integers(0, 350, nl)
        rs = rng.integers(0, 2000, nr)
        re_ = rs + rng.integers(0, 350, nr)
        left = pd.DataFrame(
            {
                "k": rng.integers(0, 6, nl).astype(str),
                "lid": np.arange(nl),
                "ls": ls,
                "le": le,
            }
        )
        right = pd.DataFrame(
            {
                "k": rng.integers(0, 6, nr).astype(str),
                "rid": np.arange(nr),
                "rs": rs,
                "re": re_,
            }
        )
        got = _run(left, right, tile=100)
        want = _brute(left, right, "k")
        pd.testing.assert_frame_equal(got, want)


def test_interval_join_endpoints_and_isolation():
    # touching endpoints are inclusive; disjoint by 1 is not a match;
    # identical spans under different keys never pair
    left = pd.DataFrame(
        {
            "k": ["a", "a", "a", "b"],
            "lid": [0, 1, 2, 3],
            "ls": [100, 100, 100, 100],
            "le": [200, 200, 200, 200],
        }
    )
    right = pd.DataFrame(
        {
            "k": ["a", "a", "a", "c"],
            "rid": [0, 1, 2, 3],
            "rs": [200, 201, 50, 100],
            "re": [300, 300, 100, 200],
        }
    )
    got = _run(left, right, tile=64)
    want = _brute(left, right, "k")
    pd.testing.assert_frame_equal(got, want)
    assert set(got.rid) == {0, 2}  # 201 misses; both touchers match


def test_interval_join_zero_length_points():
    # zero-length intervals behave as points
    left = pd.DataFrame(
        {"k": ["x"] * 3, "lid": [0, 1, 2], "ls": [5, 10, 1000], "le": [5, 10, 1000]}
    )
    right = pd.DataFrame(
        {"k": ["x"] * 2, "rid": [0, 1], "rs": [5, 11], "re": [5, 990]}
    )
    got = _run(left, right, tile=7)
    want = _brute(left, right, "k")
    pd.testing.assert_frame_equal(got, want)


def test_interval_join_rejects_reversed_span():
    left = pd.DataFrame({"k": ["x"], "lid": [0], "ls": [10], "le": [3]})
    right = pd.DataFrame({"k": ["x"], "rid": [0], "rs": [0], "re": [1]})
    with pytest.raises(Exception):
        _run(left, right, tile=8)


def test_interval_join_rejects_reserved_internal_columns():
    """Columns named '_s', '_e', '_side', or 'cell' on EITHER side would
    collide with the internal union schema — reject upfront with a clear
    message instead of a KeyError deep inside conform/per_cell."""
    left = pd.DataFrame({"k": [1], "lid": [1], "ls": [0], "le": [5]})
    right = pd.DataFrame({"k": [1], "rid": [1], "rs": [0], "re": [5]})
    for col in ("_s", "_e", "_side", "cell"):
        bad_l = left.copy()
        bad_l[col] = 0
        with pytest.raises(ValueError, match="internal union-schema"):
            interval_join(_ds(bad_l), _ds(right), keys=("k",),
                          left_span=("ls", "le"), right_span=("rs", "re"),
                          tile_width=10)
        bad_r = right.copy()
        bad_r[col] = 0
        with pytest.raises(ValueError, match="internal union-schema"):
            interval_join(_ds(left), _ds(bad_r), keys=("k",),
                          left_span=("ls", "le"), right_span=("rs", "re"),
                          tile_width=10)


def test_hash_utf8_u64_properties():
    """The join-bucket hash: equal strings hash equal across chunked and
    sliced layouts, nulls hash as empty, buckets are reasonably level."""
    import pyarrow as pa

    from ray_cdc_lake.kernels import hash_utf8_u64

    a = pa.array(["", "k", "kk", "a\x00b", "a\x00c", None, "k"])
    h = hash_utf8_u64(a)
    assert h[1] == h[6] and h[5] == h[0]
    assert len({int(x) for x in h[:5]}) == 5  # all distinct here
    chunked = pa.chunked_array([a[:4], a[4:]])
    assert (hash_utf8_u64(chunked) == h).all()
    assert (hash_utf8_u64(a.slice(1, 4)) == h[1:5]).all()
    keys = pa.array([f"r{i % 13}\x00p/{i}" for i in range(10000)])
    b = hash_utf8_u64(keys) % np.uint64(16)
    counts = np.bincount(b.astype(np.int64), minlength=16)
    assert counts.min() > 400  # no empty/starved bucket (mean 625)
