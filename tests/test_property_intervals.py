"""Property-based correctness of the interval-overlap join and the
z-order kernel (hypothesis).

interval_join: for ANY generated interval sets — degenerate points,
touching endpoints, spans crossing many tiles, duplicate spans, hot
keys — the tiled join must emit exactly the brute-force pair set,
each pair exactly once (the single-tile attribution rule), at every
tile width.  zorder_key: ranks are monotone per column with the other
fixed, interleaved keys stay within k*bits bits, and identical inputs
always map to identical keys."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from ray_cdc_lake.intervals import interval_join
from ray_cdc_lake.zorder import zorder_key

iv_st = st.tuples(
    st.sampled_from(["k1", "k2", "k3"]),  # key
    st.integers(min_value=0, max_value=300),  # start
    st.integers(min_value=0, max_value=120),  # length (0 = point)
)


def _df(rows, id_name, s_name, e_name):
    return pd.DataFrame(
        {
            "k": [r[0] for r in rows],
            id_name: np.arange(len(rows)),
            s_name: [r[1] for r in rows],
            e_name: [r[1] + r[2] for r in rows],
        }
    )


def _brute(left, right):
    m = left.merge(right, on="k")
    m = m[
        (np.maximum(m["ls"], m["rs"]) <= np.minimum(m["le"], m["re"]))
    ]
    return set(zip(m["k"], m["lid"], m["rid"]))


@settings(max_examples=12, deadline=None)
@given(
    left=st.lists(iv_st, min_size=1, max_size=25),
    right=st.lists(iv_st, min_size=1, max_size=25),
    tile=st.sampled_from([7, 64, 200]),
)
def test_interval_join_equals_bruteforce(left, right, tile):
    import ray.data as rd

    ldf = _df(left, "lid", "ls", "le")
    rdf = _df(right, "rid", "rs", "re")
    out = interval_join(
        rd.from_arrow(pa.Table.from_pandas(ldf, preserve_index=False)),
        rd.from_arrow(pa.Table.from_pandas(rdf, preserve_index=False)),
        keys=("k",),
        left_span=("ls", "le"),
        right_span=("rs", "re"),
        tile_width=tile,
        num_buckets=4,
    ).to_pandas()
    if len(out) == 0:  # a fully-empty Dataset may come back schemaless
        assert _brute(ldf, rdf) == set()
        return
    got_multiset = list(zip(out["k"], out["lid"], out["r_rid"]))
    # exactly once each: as a SET it matches brute force, and no pair
    # repeats (the attribution rule)
    assert len(got_multiset) == len(set(got_multiset))
    assert set(got_multiset) == _brute(ldf, rdf)


@settings(max_examples=50, deadline=None)
@given(
    vals=st.lists(
        st.integers(min_value=-(10**6), max_value=10**6), min_size=2, max_size=80
    ),
    other=st.integers(min_value=-(10**6), max_value=10**6),
    bits=st.sampled_from([2, 5, 10]),
)
def test_zorder_key_properties(vals, other, bits):
    v = np.sort(np.array(vals, dtype=np.int64))
    uq = np.unique(v)
    idx = np.linspace(0, len(uq) - 1, min((1 << bits) - 1, len(uq))).astype(int)
    bounds = [np.unique(uq[idx]), np.array([other])]
    z = zorder_key([v, np.full(len(v), other)], bounds, bits=bits)
    # monotone in the sorted column with the other fixed
    assert (np.diff(z) >= 0).all()
    # bounded to k*bits bits
    assert int(z.max()) < (1 << (2 * bits))
    # deterministic
    z2 = zorder_key([v, np.full(len(v), other)], bounds, bits=bits)
    assert (z == z2).all()
