"""Property-based correctness of the curation kernels (hypothesis):
bloom soundness, packing invariants, bottom-k merge equivalence, and
split determinism hold on ANY generated input, not just the fixtures."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from ray_cdc_lake import curation as cu

ids_st = st.lists(
    st.integers(min_value=0, max_value=2**40), min_size=0, max_size=300, unique=True
)


@settings(max_examples=60, deadline=None)
@given(members=ids_st, probes=ids_st)
def test_bloom_soundness(members, probes):
    """Members always probe True; non-members may false-positive but the
    filter never false-negatives (the property the pre-filter semi-join
    correctness rests on)."""
    m = np.array(members, dtype=np.uint64)
    bits = cu.bloom_build(m)
    if len(m):
        assert cu.bloom_probe(m, bits).all()
    p = np.array([x for x in probes if x in set(members)], dtype=np.uint64)
    if len(p):
        assert cu.bloom_probe(p, bits).all()


@settings(max_examples=60, deadline=None)
@given(
    n_tok=st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=200),
    budget=st.integers(min_value=1, max_value=4096),
)
def test_packing_invariants(n_tok, budget):
    """seq_id is non-decreasing; each doc starts inside its sequence's
    token window [seq*budget, (seq+1)*budget)."""
    toks = np.array(n_tok, dtype=np.int64)
    prev = np.concatenate(([0], np.cumsum(toks)[:-1]))
    seq = prev // budget
    assert (np.diff(seq) >= 0).all()
    assert ((prev >= seq * budget) & (prev < (seq + 1) * budget)).all()


@settings(max_examples=60, deadline=None)
@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=2**31 - 2),
        min_size=0,
        max_size=500,
        unique=True,
    ),
    n_blocks=st.integers(min_value=1, max_value=7),
)
def test_bottom_k_partial_merge_equals_global(ids, n_blocks):
    """Per-block bottom-k partials re-reduced == bottom-k over the whole
    input, for any block split — the mergeability q_corpus_sample relies
    on. Lehmer hash is injective below 2^31-1, so no priority ties."""
    k = 25
    a = np.array(ids, dtype=np.int64)
    h = (a * cu.LEHMER_A) % cu.LEHMER_M
    want = a[np.lexsort((a, h))[:k]]
    parts_i, parts_h = [], []
    for chunk in np.array_split(a, n_blocks):
        ch = (chunk * cu.LEHMER_A) % cu.LEHMER_M
        if len(chunk) > k:
            sel = np.argpartition(ch, k)[:k]
            chunk, ch = chunk[sel], ch[sel]
        parts_i.append(chunk)
        parts_h.append(ch)
    ai, ah = np.concatenate(parts_i), np.concatenate(parts_h)
    got = ai[np.lexsort((ai, ah))[:k]]
    assert (got == want).all()


@settings(max_examples=30, deadline=None)
@given(ids=st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300))
def test_split_assign_pure_function_of_key(ids):
    """Same key -> same split regardless of batch composition or order."""
    t_fwd = pa.table({"doc_id": pa.array(ids, type=pa.int64())})
    t_rev = pa.table({"doc_id": pa.array(ids[::-1], type=pa.int64())})
    fwd = dict(zip(ids, cu.split_assign(t_fwd)["split"].to_pylist()))
    rev = dict(zip(ids[::-1], cu.split_assign(t_rev)["split"].to_pylist()))
    assert fwd == rev
