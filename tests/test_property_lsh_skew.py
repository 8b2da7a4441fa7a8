"""Degenerate-duplicate-skew bounds for the LSH pair-verify kernels.

The adversarial shape: a 100%-identical-text corpus puts every doc in
the SAME band bucket on EVERY band, so an uncapped pairwise triangle
would build an O(u^2) index array inside one task.  The kernels instead
(1) collapse byte-identical signatures to star pairs through the
group's smallest-id representative — Theta(u) output and memory — and
(2) verify DISTINCT signatures in RUN_VERIFY_CAP-sized chunks.

Bar: on an all-identical corpus the pair count is linear and peak
allocation bounded; on an all-distinct corpus the output equals the
brute-force clique model EXACTLY; mixed corpora match the model's
connected components with identical estimates; a tiny cap stays
deterministic and only forfeits cross-chunk pairs."""

from __future__ import annotations

import tracemalloc

import numpy as np
import pyarrow as pa
import pytest

import ray_cdc_lake.dedup as dd
from ray_cdc_lake.dedup import (
    BANDS,
    MinHashLSH,
    ROWS_PER_BAND,
    SimHashBands,
    minhash_pairs_kernel,
    minhash_signature,
    simhash_pairs_kernel,
)


def _doc_batch(texts: list[str]) -> pa.Table:
    return pa.Table.from_arrays(
        [
            pa.array(np.arange(len(texts), dtype=np.int64)),
            pa.array(texts, type=pa.string()),
        ],
        names=["doc_id", "text"],
    )


def _minhash_model(texts: list[str], threshold: float) -> dict:
    """Brute-force clique model: for every band, every same-band-key
    pair; est = full-signature agreement; keep est >= threshold."""
    sigs = [minhash_signature(t) for t in texts]
    out: dict = {}
    for b in range(BANDS):
        key_of: dict = {}
        for i, s in enumerate(sigs):
            key_of.setdefault(
                tuple(s[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]), []
            ).append(i)
        for members in key_of.values():
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    i, j = members[x], members[y]
                    est = float((sigs[i] == sigs[j]).mean())
                    if est >= threshold:
                        out[(i, j)] = est
    return out


def _find(parent, x):
    while parent.setdefault(x, x) != x:
        parent[x] = parent[parent[x]]
        x = parent[x]
    return x


def _component_map(pairs, nodes):
    parent: dict = {}
    for a, b in pairs:
        parent[_find(parent, a)] = _find(parent, b)
    comp: dict = {}
    for n in nodes:
        comp.setdefault(_find(parent, n), set()).add(n)
    return {min(v): v for v in comp.values()}


def _kernel_pairs(texts, threshold=0.5):
    band = MinHashLSH()(_doc_batch(texts))
    out = minhash_pairs_kernel(threshold)(band)
    return {
        (int(a), int(b)): float(j)
        for a, b, j in zip(
            out["id_a"].to_pylist(),
            out["id_b"].to_pylist(),
            out["jaccard_est"].to_pylist(),
        )
    }


def test_all_identical_corpus_is_linear_and_memory_bounded():
    n = 2000
    texts = ["the same exact document body repeated verbatim"] * n
    band = MinHashLSH()(_doc_batch(texts))
    kern = minhash_pairs_kernel(0.5)
    tracemalloc.start()
    out = kern(band)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    # one star per band: BANDS * (n-1) rows, all (0, i) at est 1.0 —
    # the clique would have been BANDS * n*(n-1)/2 ~ 32M rows
    assert out.num_rows == BANDS * (n - 1)
    assert set(out["id_a"].to_pylist()) == {0}
    assert set(out["jaccard_est"].to_pylist()) == {1.0}
    # the uncapped triangle would allocate >=n^2/2 * NUM_HASHES compare
    # bytes (~128 MB here) in one shot; the star path stays far under
    assert peak < 60 * 1024 * 1024, peak


def test_all_distinct_corpus_equals_bruteforce_cliques():
    rng = np.random.default_rng(17)
    vocab = np.array([f"w{i}" for i in range(500)], dtype=object)
    texts = [" ".join(rng.choice(vocab, 12, replace=False)) for _ in range(90)]
    sigs = {tuple(minhash_signature(t)) for t in texts}
    assert len(sigs) == len(texts)  # precondition: all-singleton groups
    got = _kernel_pairs(texts, threshold=0.3)
    want = _minhash_model(texts, threshold=0.3)
    assert got == {k: pytest.approx(v) for k, v in want.items()}


def test_mixed_corpus_components_and_estimates_match_model():
    rng = np.random.default_rng(23)
    vocab = np.array([f"w{i}" for i in range(60)], dtype=object)
    for trial in range(4):
        base = [" ".join(rng.choice(vocab, 10)) for _ in range(25)]
        texts = []
        for t in base:
            texts.append(t)
            for _ in range(int(rng.integers(0, 4))):  # duplicate groups
                texts.append(t)
        order = rng.permutation(len(texts))
        texts = [texts[i] for i in order]
        got = _kernel_pairs(texts, threshold=0.5)
        want = _minhash_model(texts, threshold=0.5)
        nodes = {x for p in want for x in p}
        assert {x for p in got for x in p} == nodes
        assert _component_map(got, nodes) == _component_map(want, nodes)
        # every emitted sub-1.0 pair is a genuine model pair, same est
        for (a, b), j in got.items():
            if j < 1.0:
                assert want[(a, b)] == pytest.approx(j)


def test_tiny_cap_is_deterministic_and_a_subset(monkeypatch):
    rng = np.random.default_rng(31)
    vocab = np.array([f"w{i}" for i in range(40)], dtype=object)
    texts = [" ".join(rng.choice(vocab, 10)) for _ in range(60)]
    full = _kernel_pairs(texts, threshold=0.4)
    monkeypatch.setattr(dd, "RUN_VERIFY_CAP", 8)
    capped1 = _kernel_pairs(texts, threshold=0.4)
    capped2 = _kernel_pairs(texts, threshold=0.4)
    assert capped1 == capped2  # chunking is deterministic
    assert set(capped1) <= set(full)  # overflow only FORFEITS pairs
    for k, v in capped1.items():
        assert full[k] == pytest.approx(v)


def test_simhash_all_identical_is_linear():
    n = 1500
    texts = ["another identical body of text for the simhash case"] * n
    band = SimHashBands()(_doc_batch(texts))
    out = simhash_pairs_kernel(3)(band)
    # 4 bands x (n-1) star pairs, hamming 0, rep 0
    assert out.num_rows == 4 * (n - 1)
    assert set(out["id_a"].to_pylist()) == {0}
    assert set(out["hamming"].to_pylist()) == {0}


def test_index_probe_all_identical_batch(tmp_path):
    """The persisted-index probe on a 100%-duplicate probe batch: every
    new doc's verdict is the single indexed doc at est 1.0, via the
    identity-group short-circuit (no quadratic candidate expansion)."""
    from ray_cdc_lake.nearindex import index_append, index_probe
    from tests.test_nearindex import _docs_ds

    root = str(tmp_path / "sigidx")
    text = "one true document everything else duplicates"
    index_append(root, "base", _docs_ds({7: text}))
    new = {100 + i: text for i in range(800)}
    got = index_probe(root, _docs_ds(new), threshold=0.5).to_pandas()
    assert len(got) == len(new)
    assert set(got["dup_of"]) == {7}
    assert set(got["jaccard_est"]) == {1.0}


def test_embedding_lsh_all_identical_is_linear(tmp_path):
    """The embedding-LSH near-dup path on a 100%-identical-vector
    corpus: every vector lands in one bucket on all 24 bands; the
    identity-star collapse emits exactly n-1 final pairs (the clique
    would be ~2M per band) with cos 1.0 through the smallest id."""
    import pyarrow.parquet as pq_

    from ray_cdc_lake.dedup import q_dedup_embedding_lsh

    n, dim = 2000, 16
    vec = np.arange(1, dim + 1, dtype=np.float64)
    emb = pa.table({
        "vec_id": pa.array(np.arange(n), type=pa.int64()),
        "embedding": pa.array([vec.tolist()] * n, type=pa.list_(pa.float64())),
        "label": pa.array(["x"] * n),
    })
    sf = str(tmp_path)
    pq_.write_table(emb, f"{sf}/embeddings.parquet")
    got = q_dedup_embedding_lsh(sf).to_pandas()
    assert len(got) == n - 1
    assert set(got["vec_id_a"]) == {0}
    assert set(got["vec_id_b"]) == set(range(1, n))


def test_semantic_dedup_all_identical_keeps_one(tmp_path):
    """SemDeDup on a 100%-identical-vector corpus: one k-means cluster
    holds everything; the identity-star union (no cluster-sized cos
    matrix) must keep exactly the smallest vec_id."""
    import pyarrow.parquet as pq_

    from ray_cdc_lake.dedup import q_dedup_semantic

    n, dim = 1500, 16
    vec = np.linspace(1.0, 2.0, dim)
    emb = pa.table({
        "vec_id": pa.array(np.arange(5, 5 + n), type=pa.int64()),
        "embedding": pa.array([vec.tolist()] * n, type=pa.list_(pa.float64())),
        "label": pa.array(["x"] * n),
    })
    sf = str(tmp_path)
    pq_.write_table(emb, f"{sf}/embeddings.parquet")
    got = q_dedup_semantic(sf).to_pandas()
    assert list(got["vec_id"]) == [5]
