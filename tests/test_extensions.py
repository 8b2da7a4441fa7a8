"""Behavioral tests for the training-data extension operators (the parts a
SQL oracle can't express): planted-duplicate recall, ANN recall vs the
brute-force baseline, fingerprint determinism, decode-stub gating."""

from __future__ import annotations

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def _components(pairs_iter):
    """Union-find over emitted pairs — the star pair semantics route
    identical-signature docs through a representative, so duplicate
    detection is asserted on CONNECTIVITY, not on direct pair presence."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs_iter:
        parent[find(a)] = find(b)
    return find


def test_minhash_finds_planted_neardups():
    from ray_cdc_lake.dedup import q_dedup_minhash

    pairs = q_dedup_minhash(SF).to_pandas()
    found = set(zip(pairs.id_a, pairs.id_b))
    # exact copies (doc_id % 9 == 0 -> +2M) have identical signatures and
    # must ALL land in one duplicate component (est 1.0 star pairs)
    find = _components(found)
    for d in range(0, 500, 9):
        assert find(d) == find(d + 2_000_000), d
    assert ((pairs.id_b - pairs.id_a) == 2_000_000).sum() > 0
    # near-dup copies (one appended word) have DISTINCT signatures: the
    # rep-triangle path must emit them directly, >=90% recall
    near_expected = {(d, d + 1_000_000) for d in range(0, 500, 10)}
    recall = len(near_expected & found) / len(near_expected)
    assert recall >= 0.9, recall


def test_simhash_finds_exact_copies():
    from ray_cdc_lake.dedup import q_dedup_simhash

    pairs = q_dedup_simhash(SF).to_pandas()
    found = set(zip(pairs.id_a, pairs.id_b))
    find = _components(found)
    for d in range(0, 500, 9):
        assert find(d) == find(d + 2_000_000), d
    # exact copies have hamming distance 0
    zero = pairs[pairs.hamming == 0]
    assert len(zero) >= len(range(0, 500, 9))


def test_embedding_lsh_recall_and_precision():
    """The LSH near-dup path must (a) emit ONLY true pairs (cosine is
    verified exactly in-bucket, so precision is 1 by construction) and
    (b) recall every pair the all-pairs baseline finds on this corpus
    (b=24, r=4 banding; deterministic seed)."""
    from ray_cdc_lake.dedup import q_dedup_embedding, q_dedup_embedding_lsh

    base = q_dedup_embedding(SF).to_pandas()
    lsh = q_dedup_embedding_lsh(SF).to_pandas()
    b = set(zip(base.vec_id_a, base.vec_id_b))
    l = set(zip(lsh.vec_id_a, lsh.vec_id_b))
    assert len(b) > 0
    assert l <= b          # precision 1.0: every emitted pair is real
    assert l == b          # recall 1.0 on this corpus (seeded, deterministic)


def test_semantic_dedup_precision_and_recall():
    """SemDeDup (cluster + within-cluster prune, multi-probe): anything
    pruned must have a true >=threshold neighbor (precision 1.0 — cosine
    is exact in-cluster) and at probes=3 the pruned set must cover most
    of the all-pairs baseline's duplicate-component losers (boundary
    losses are the method's documented tradeoff; measured 0.93 recall on
    this seeded corpus)."""
    import collections

    import pyarrow.parquet as pq

    from ray_cdc_lake.dedup import q_dedup_embedding, q_dedup_semantic

    n_total = pq.ParquetFile(f"{SF}/embeddings.parquet").metadata.num_rows
    base = q_dedup_embedding(SF).to_pandas()
    adj = collections.defaultdict(set)
    for a, b in zip(base.vec_id_a, base.vec_id_b):
        adj[a].add(b)
        adj[b].add(a)
    seen, losers = set(), set()
    for s in adj:
        if s in seen:
            continue
        comp, stack = set(), [s]
        while stack:
            u = stack.pop()
            if u in comp:
                continue
            comp.add(u)
            stack.extend(adj[u] - comp)
        seen |= comp
        losers |= comp - {min(comp)}

    sem = q_dedup_semantic(SF).to_pandas()
    pruned = set(range(n_total)) - set(sem.vec_id)
    assert len(losers) > 0
    assert pruned <= set(adj)  # precision 1.0: pruned => has a true pair
    recall = len(pruned & losers) / len(losers)
    assert recall >= 0.85, recall


def test_connected_components_vs_union_find():
    """The distributed large-star/small-star CC must match a
    single-process union-find on a random graph (chains, cycles, stars,
    singleton-free)."""
    import pyarrow as pa
    import ray.data as rd

    from ray_cdc_lake.dedup import connected_components

    rng = np.random.default_rng(17)
    n_nodes, n_edges = 600, 500
    a = rng.integers(0, n_nodes, n_edges).astype("int64")
    b = rng.integers(0, n_nodes, n_edges).astype("int64")
    keep = a != b
    a, b = a[keep], b[keep]

    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a, b):
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    touched = set(a.tolist()) | set(b.tolist())
    want = {v: find(v) for v in sorted(touched)}
    # roots as min id per component
    comp_min: dict[int, int] = {}
    for v, r in want.items():
        comp_min[r] = min(comp_min.get(r, v), v)
    want = {v: comp_min[r] for v, r in want.items()}

    pairs = rd.from_arrow(
        pa.table({"id_a": pa.array(a), "id_b": pa.array(b)})
    )
    # small-side path (driver union-find)
    got_df = connected_components(pairs).to_pandas()
    got = dict(zip(got_df.member_id, got_df.cluster_id))
    assert got == want
    # distributed star rounds forced (threshold 0) — identical output
    got_dist = connected_components(pairs, driver_threshold=0).to_pandas()
    assert dict(zip(got_dist.member_id, got_dist.cluster_id)) == want


def test_langid_predicts_en_for_english_corpus():
    from ray_cdc_lake.textstats import q_text_langid

    df = q_text_langid(SF).to_pandas()
    assert len(df) == 500
    # synthetic corpus is English-ish function words; heuristic must be
    # deterministic and dominated by 'en'/'und'
    assert set(df.lang_pred.unique()) <= {"en", "und", "de", "es", "fr", "zh"}
    assert (df.lang_pred == "en").mean() > 0.5


def test_fingerprint_deterministic_and_sensitive():
    import pyarrow.parquet as pq

    from ray_cdc_lake.textstats import fingerprint

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    f1 = fingerprint(t)["fingerprint"].to_pylist()
    f2 = fingerprint(t)["fingerprint"].to_pylist()
    assert f1 == f2
    # different docs overwhelmingly get different fingerprints
    assert len(set(f1)) > 0.95 * len(f1)


def test_knn_ivf_recall_vs_bruteforce():
    from ray_cdc_lake.similarity import q_knn_bruteforce, q_knn_ivf

    bf = q_knn_bruteforce(SF).to_pandas()
    ivf = q_knn_ivf(SF).to_pandas()
    recalls = []
    for q in bf.query_id.unique():
        b = set(bf[bf.query_id == q].neighbor_id)
        v = set(ivf[ivf.query_id == q].neighbor_id)
        recalls.append(len(b & v) / len(b))
    assert np.mean(recalls) >= 0.5, recalls  # nprobe=2 of ~3 coarse cells


def test_knn_ivf_pq_recall_vs_bruteforce():
    """ADC candidate generation + exact rerank must recover most of the
    true top-K even on this (hardest-case) near-random embedding table;
    per-batch candidate pools make the distributed recall strictly
    better than the global-ADC lower bound (~0.64 measured offline)."""
    from ray_cdc_lake.similarity import q_knn_bruteforce, q_knn_ivf_pq

    bf = q_knn_bruteforce(SF).to_pandas()
    pq_ = q_knn_ivf_pq(SF).to_pandas()
    recalls = []
    for q in bf.query_id.unique():
        b = set(bf[bf.query_id == q].neighbor_id)
        v = set(pq_[pq_.query_id == q].neighbor_id)
        recalls.append(len(b & v) / len(b))
    assert np.mean(recalls) >= 0.6, recalls


def test_pq_encode_decode_fidelity():
    """Codebook round-trip: encoding the training sample and scoring via
    ADC correlates strongly with exact dots (sanity on the quantizer)."""
    from ray_cdc_lake.similarity import (
        _normalize,
        pq_adc_scores,
        pq_encode,
        train_pq,
    )

    rng = np.random.default_rng(3)
    x = _normalize(rng.normal(size=(400, 64)))
    books = train_pq(x)
    codes = pq_encode(x, books)
    q = x[0]
    adc = pq_adc_scores(q, codes, books)
    exact = x @ q
    corr = np.corrcoef(adc, exact)[0, 1]
    assert corr > 0.7, corr


def test_decode_image_is_gated():
    from ray_cdc_lake.multimodal import decode_image

    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_image(b"not-an-image")


def test_fake_decoder_deterministic():
    import pyarrow.parquet as pq

    from ray_cdc_lake.multimodal import FakeDecoder, encode_payloads

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    bins = encode_payloads(t)
    d1 = FakeDecoder()(bins)
    d2 = FakeDecoder()(bins)
    assert d1.equals(d2)
    assert d1["bin_sha256"][0].as_py() != d1["bin_sha256"][1].as_py()


def test_fake_resizer_matches_python_reference():
    """The stride-resize payload math vs a per-row pure-python reference:
    output = every stride-th byte, stride = ceil(n / target), bounded by
    the target."""
    import hashlib

    import pyarrow.parquet as pq

    from ray_cdc_lake.multimodal import RESIZE_TARGET, FakeResizer, encode_payloads

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    bins = encode_payloads(t)
    out = FakeResizer()(bins)
    texts = t["text"].to_pylist()
    for i in range(t.num_rows):
        p = texts[i].encode("utf-8")
        stride = max(1, -(-len(p) // RESIZE_TARGET))
        small = p[::stride]
        assert out["stride"][i].as_py() == stride
        assert out["n_bytes_out"][i].as_py() == len(small) <= RESIZE_TARGET
        assert out["out_sha256"][i].as_py() == hashlib.sha256(small).hexdigest()


def test_byte_histogram_extractor_matches_python_reference():
    """The batched scatter-add histogram vs a per-row reference, including
    the l1-normalized feature vector the oracle projection drops."""
    import numpy as np
    import pyarrow.parquet as pq

    from ray_cdc_lake.multimodal import ByteHistogramExtractor, encode_payloads

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    bins = encode_payloads(t)
    out = ByteHistogramExtractor()(bins)
    feats = np.array(out["features"].to_pylist(), dtype=np.float32)
    texts = t["text"].to_pylist()
    for i in range(t.num_rows):
        p = texts[i].encode("utf-8")
        ref = np.bincount(np.frombuffer(p, dtype=np.uint8), minlength=256)
        assert out["n_bytes"][i].as_py() == len(p)
        assert out["n_distinct_bytes"][i].as_py() == int((ref > 0).sum())
        np.testing.assert_allclose(
            feats[i], (ref / max(len(p), 1)).astype(np.float32), rtol=1e-6
        )
        assert abs(feats[i].sum() - 1.0) < 1e-4


def test_misra_gries_error_bound_and_merge():
    """MG invariants on adversarial data: counts undercount by at most
    N/(k+1); every value with true frequency > N/(k+1) survives; the
    add-then-trim merge preserves both."""
    from ray_cdc_lake.sketches import mg_merge, mg_partial, mg_trim

    rng = np.random.default_rng(3)
    k = 16
    # zipf-ish stream: few heavy values + a long tail
    vals = np.concatenate(
        [
            np.repeat(np.arange(5), 200),  # heavies: freq 200
            rng.integers(100, 2000, 3_000),  # tail
        ]
    )
    rng.shuffle(vals)
    n = len(vals)
    import pyarrow as pa

    sketch: dict[int, int] = {}
    for off in range(0, n, 97):  # awkward chunking
        chunk = pa.table({"v": pa.array(vals[off : off + 97], type=pa.int64())})
        sketch = mg_merge(sketch, mg_partial(chunk, "v", k), k)
    assert len(sketch) <= k
    true = {int(v): int(c) for v, c in zip(*np.unique(vals, return_counts=True))}
    bound = n / (k + 1)
    for v, c in sketch.items():
        assert c <= true[v]  # never overcounts
        assert true[v] - c <= bound  # bounded undercount
    for v, c in true.items():
        if c > bound:
            assert v in sketch, f"heavy value {v} (freq {c}) dropped"
    # trim is idempotent at or below budget
    assert mg_trim(dict(sketch), k) == sketch


def test_hll_within_tolerance_of_exact():
    from ray_cdc_lake.queries import q_distinct_users_exact, q_distinct_users_hll

    exact = q_distinct_users_exact(SF).to_pandas()["n_distinct"][0]
    est = q_distinct_users_hll(SF).to_pandas()["n_distinct_est"][0]
    assert exact > 0
    assert abs(est - exact) / exact < 0.03  # P=14 HLL: ~1.6% stderr


def test_fake_embedder_deterministic_unit_norm_and_composable():
    import pyarrow.parquet as pq

    from ray_cdc_lake.textstats import EMBED_DIM, FakeEmbedder

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).slice(0, 50)
    e1 = FakeEmbedder()(t)
    e2 = FakeEmbedder()(t)  # fresh actor, same output: no hidden state
    assert e1.equals(e2)
    mat = np.array(e1["embedding"].to_pylist(), dtype=np.float64)
    assert mat.shape == (50, EMBED_DIM)
    norms = np.linalg.norm(mat, axis=1)
    assert np.allclose(norms[norms > 0], 1.0)
    # different docs embed differently (hashing features discriminate)
    assert len({tuple(np.round(r, 6)) for r in mat}) > 45


def test_generate_json_reference_cases():
    """The three GenerateJsonFromPropsTest cases mirrored exactly:
    discard mode builds nested structure; merge mode preserves siblings
    while adding the new leaf; expression language renders ${attr}
    against the record's attributes."""
    import json

    from ray_cdc_lake.jsonpaths import (
        build_document,
        build_document_for_row,
        merge_json,
        render_template,
    )

    # discard mode (GenerateJsonFromPropsTest `overwrite mode ...`)
    doc = json.loads(
        build_document(
            {"metadata.title.value": "My Book", "metadata.title.lang": "eng"}
        )
    )
    assert doc == {"metadata": {"title": {"value": "My Book", "lang": "eng"}}}

    # merge mode (`merge mode merges with existing json`)
    existing = {"existing": "keep", "metadata": {"title": {"lang": "eng"}}}
    overlay = json.loads(build_document({"metadata.title.value": "New Title"}))
    merged = merge_json(existing, overlay)
    assert merged["existing"] == "keep"
    assert merged["metadata"]["title"] == {"lang": "eng", "value": "New Title"}

    # expression language (`nested attributes with expression language`)
    attrs = {
        "typeAttr": "Bilde",
        "idAttr": "URN:NBN:no-nb_plfut_00001",
        "titleAttr": "My Book Title",
    }
    doc = json.loads(
        build_document_for_row(
            {
                "metadata.type.value": "${typeAttr}",
                "metadata.type.lang": "nor",
                "metadata.identifier.value": "${idAttr}",
                "metadata.title.value": "${titleAttr}",
                "metadata.title.lang": "eng",
            },
            attrs,
        )
    )
    md = doc["metadata"]
    assert md["type"] == {"value": "Bilde", "lang": "nor"}
    assert md["identifier"] == {"value": "URN:NBN:no-nb_plfut_00001"}
    assert md["title"] == {"value": "My Book Title", "lang": "eng"}
    # NiFi EL null-to-empty default for a missing attribute
    assert render_template("${missing}!", attrs) == "!"
    assert render_template(42, attrs) == 42


def test_put_nested_paths_and_arrays():
    from ray_cdc_lake.jsonpaths import build_document, put_nested

    doc = {}
    put_nested(doc, "a.b.c", 1)
    put_nested(doc, "items[2].name", "x")   # pads [null, null, {...}]
    put_nested(doc, "items[0].name", "y")
    put_nested(doc, "grid[1][0]", 7)        # multi-dim brackets
    put_nested(doc, "a.b.d", 2)             # sibling into existing object
    assert doc == {
        "a": {"b": {"c": 1, "d": 2}},
        "items": [{"name": "y"}, None, {"name": "x"}],
        "grid": [None, [7]],
    }
    s = build_document({"k.v": 1, "k.w": 2})
    assert s == '{"k":{"v":1,"w":2}}'


def test_hll_aggregatefn_equals_map_reduce_path():
    import ray.data as rd

    from ray_cdc_lake.sketches import hll_distinct, make_hll_aggregate

    ds = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id"]).repartition(8)
    via_agg = ds.aggregate(make_hll_aggregate("user_id"))["n_distinct_est"]
    via_mr = hll_distinct(ds, "user_id").to_pandas()["n_distinct_est"][0]
    assert via_agg == via_mr


def test_distributed_kmeans_matches_single_process():
    import numpy as np

    from ray_cdc_lake.similarity import (
        KMEANS_ITERS,
        KMEANS_K,
        _load_embeddings,
        distributed_kmeans,
    )

    ids, mat = _load_embeddings(SF)
    init = np.linspace(0, len(mat) - 1, KMEANS_K).astype(int)
    c = mat[init].copy()
    for _ in range(KMEANS_ITERS):
        d2 = ((mat[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        for ci in range(KMEANS_K):
            members = mat[a == ci]
            if len(members):
                c[ci] = members.mean(axis=0)
    got = distributed_kmeans(SF)
    # float sums are batch-order dependent, so allclose, not equality
    assert np.allclose(c, got, atol=1e-9)


def test_heavy_hitters_falls_back_on_flat_data():
    """Near-uniform data (top frequency below N/(k+1)): the MG candidate
    set cannot cover the true top-N, so the operator must fall back to
    the exact path instead of returning a silently wrong answer."""
    import pyarrow as pa
    import ray.data as rd

    from ray_cdc_lake.sketches import heavy_hitters

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 2000, 120_000).astype("int64")  # ~60 each
    ds = rd.from_arrow(pa.table({"user_id": pa.array(vals)})).repartition(16)
    got = heavy_hitters(ds, "user_id", top=10).to_pandas()
    import collections

    c = collections.Counter(vals.tolist())
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(got.user_id, got.n_events)) == want


def test_quantiles_ignore_nan():
    import pyarrow as pa
    import ray.data as rd

    from ray_cdc_lake.sketches import distributed_quantiles

    rng = np.random.default_rng(7)
    v = rng.normal(size=5_000)
    v[::7] = np.nan  # ~14% NaN
    ds = rd.from_arrow(pa.table({"x": pa.array(v)})).repartition(8)
    got = distributed_quantiles(ds, "x", [0.5, 0.9]).to_pandas()
    clean = np.sort(v[~np.isnan(v)])
    n = len(clean)
    for q, val in zip(got.q, got.value):
        assert val == clean[int(np.floor(q * (n - 1)))]


def test_dedup_embedding_refuses_at_scale(monkeypatch):
    """The brute-force baseline is guarded: above the row cap it must fail
    loudly and point at the LSH scale path, never broadcast the matrix."""
    from ray_cdc_lake import dedup

    monkeypatch.setattr(dedup, "DEDUP_EMBEDDING_MAX_ROWS", 10)
    with pytest.raises(ValueError, match="dedup_embedding_lsh"):
        dedup.q_dedup_embedding(SF)
