"""Curation operators: properties the SQL oracle can't express —
CMS error bounds, bloom-filter soundness, bottom-k merge invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from ray_cdc_lake import curation as cu


def test_bloom_no_false_negatives():
    keys = np.arange(0, 5000, 7, dtype=np.uint64)
    bits = cu.bloom_build(keys)
    assert cu.bloom_probe(keys, bits).all(), "bloom must never miss a member"


def test_bloom_false_positive_rate_small():
    members = np.arange(0, 2000, dtype=np.uint64)
    bits = cu.bloom_build(members)
    probe = np.arange(1_000_000, 1_050_000, dtype=np.uint64)
    fp = cu.bloom_probe(probe, bits).mean()
    # m=131072 bits, n=2000, k=4 -> theoretical fp ~ (1-e^{-kn/m})^4 ~ 1.2e-5
    assert fp < 0.01, f"false-positive rate {fp} too high"


def test_cms_overcounts_within_bound():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 500, size=200_000).astype(np.int64)
    # split into 8 "blocks", merge partials by sum (the distributed shape)
    total = np.zeros((cu.CMS_DEPTH, cu.CMS_WIDTH), dtype=np.int64)
    for chunk in np.array_split(vals, 8):
        total += cu.cms_partial(chunk)
    probe = np.arange(0, 500, dtype=np.int64)
    est = cu.cms_query(total, probe)
    exact = np.bincount(vals, minlength=500)[:500]
    assert (est >= exact).all(), "CMS must never undercount"
    bound = np.e / cu.CMS_WIDTH * len(vals)
    # Markov bound holds per key w.p. >= 1 - e^-depth; allow a few outliers
    frac_over = ((est - exact) > bound).mean()
    assert frac_over < 0.05, f"{frac_over:.1%} keys exceed the eN/w bound"


def test_lehmer_bucket_matches_sql_semantics():
    ids = np.array([0, 1, 2, 499, 123456789], dtype=np.int64)
    expect = (ids * 48271) % 2147483647 % 100
    assert (cu.lehmer_bucket(ids) == expect).all()


def test_split_assign_fractions_and_determinism():
    ids = np.arange(100_000, dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids)})
    out1 = cu.split_assign(t)
    out2 = cu.split_assign(t)
    assert out1.equals(out2)
    splits = np.asarray(out1["split"].to_numpy(zero_copy_only=False))
    frac_train = (splits == "train").mean()
    assert 0.78 < frac_train < 0.82, frac_train


def test_bottom_k_merge_invariance():
    """Product kernels: partial bottom-k per block then re-select ==
    bottom-k over all (13 uneven blocks). The hypothesis variant in
    test_property_curation.py sweeps random splits; this pins one
    deterministic large case."""
    ids = np.arange(10_000, dtype=np.int64)
    k = cu.SAMPLE_K
    want = cu.bottom_k_final(*cu.bottom_k_partial(ids, len(ids) + 1), k)
    parts = [cu.bottom_k_partial(c, k) for c in np.array_split(ids, 13)]
    got = cu.bottom_k_final(
        np.concatenate([p[0] for p in parts]),
        np.concatenate([p[1] for p in parts]),
        k,
    )
    assert (got == want).all()


def test_mixture_filter_drops_sources_without_numeric_suffix():
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "source": pa.array(["src5", "weird", "src12"]),
        }
    )
    out = cu.mixture_filter(t)
    assert "weird" not in out["source"].to_pylist()


def test_mixture_oracle_sql_drops_no_suffix_sources_without_error():
    """Engine AND oracle must agree on the no-numeric-suffix drop: DuckDB
    regexp_extract returns '' on no match and a plain CAST('') errors —
    the oracle uses TRY_CAST, so it must run clean and drop the row."""
    import duckdb

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(1, 'src5'), (2, 'weird'), (3, 'src12')) t(doc_id, source)"
    )
    _, sql = cu.registry()
    rows = con.sql(sql["corpus_mixture"]).fetchall()
    assert all(r[1] != "weird" for r in rows)
    # engine on the same three rows agrees row-for-row
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "source": pa.array(["src5", "weird", "src12"]),
        }
    )
    got = sorted(zip(*[c.to_pylist() for c in cu.mixture_filter(t).columns]))
    assert got == sorted(rows)


def test_cms_query_vs_exact_on_events(sf_tiny, duck):
    """The registered sketch query's estimates bound the exact counts."""
    from ray_cdc_lake.curation import q_sketch_cms_counts
    from tests.util import to_pandas

    df = to_pandas(q_sketch_cms_counts(sf_tiny)).set_index("user_id")
    exact = dict(
        duck.execute(
            "SELECT user_id, count(*) FROM events "
            f"WHERE user_id IN ({','.join(map(str, cu.CMS_PROBE_USERS))}) "
            "GROUP BY user_id"
        ).fetchall()
    )
    n = duck.execute("SELECT count(*) FROM events").fetchone()[0]
    bound = np.e / cu.CMS_WIDTH * n
    for uid in cu.CMS_PROBE_USERS:
        est = int(df.loc[uid, "est_count"])
        true = int(exact.get(uid, 0))
        assert true <= est <= true + max(bound, 1) + 3, (uid, est, true)


def test_word_ngrams_masks_document_boundaries():
    """The vectorized n-gram kernel must produce exactly the per-document
    python n-grams: no gram may span two documents, short docs yield
    none."""
    import numpy as np
    import pyarrow as pa

    from ray_cdc_lake.curation import _word_ngrams

    texts = ["a b c d", "e f", "g h i j k", ""]
    k = 3
    grams, row_of, n_valid = _word_ngrams(pa.array(texts), k)
    got = list(zip(row_of.tolist(), grams.to_pylist()))
    want = []
    for i, t in enumerate(texts):
        w = t.split(" ")
        for j in range(max(len(w) - k + 1, 0)):
            want.append((i, " ".join(w[j : j + k])))
    assert got == want
    assert n_valid.tolist() == [2, 0, 3, 0]
