"""Deduplication operators over the ``documents`` table: exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Reference analog: the exact instruction dedup of ``RenameS3Utils.kt:52-58``
(``distinctBy`` normalized pairs) generalized to content-level dedup for
training-data pipelines.

The dedup corpus is the documents table augmented with deterministic
planted duplicates (expressible in SQL for the oracle):

    corpus = documents
           ∪ {doc_id+1_000_000, text || ' neardup'}   for doc_id % 10 == 0
           ∪ {doc_id+2_000_000, text}                 for doc_id % 9 == 0

Scale notes (documented partitioning assumptions):
* exact dedup = hash(content) -> bucket groupby -> per-group min-key; the
  shuffle moves one (hash, id) pair per row, not the content.
* MinHash-LSH: signatures computed per batch (stateless, vectorized);
  band rows carry the signature so candidate verification happens inside
  the band-bucket group with no second join. At 100 TB scale you would
  instead join candidate pairs back to a signature table partitioned by
  doc_id; the band-bucket groupby is the only all-to-all exchange.
* SimHash buckets by 4x16-bit bands: hamming distance <= 3 guarantees at
  least one identical band (pigeonhole), so bucket-local verification
  finds every close pair without an O(n^2) comparison.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

# ---------------------------------------------------------------------------
# corpus with planted duplicates
# ---------------------------------------------------------------------------

CORPUS_CTE = """
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text || ' neardup' FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 9 = 0
)"""


def corpus_batch(batch: pa.Table) -> pa.Table:
    doc_id = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    text = batch["text"].to_pylist()
    ids = list(doc_id)
    txts = list(text)
    for i in np.nonzero(doc_id % 10 == 0)[0]:
        ids.append(int(doc_id[i]) + 1_000_000)
        txts.append(text[i] + " neardup")
    for i in np.nonzero(doc_id % 9 == 0)[0]:
        ids.append(int(doc_id[i]) + 2_000_000)
        txts.append(text[i])
    return pa.Table.from_arrays(
        [pa.array(ids, type=pa.int64()), pa.array(txts, type=pa.string())],
        names=["doc_id", "text"],
    )


def corpus_ds(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(corpus_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# exact dedup: hash -> bucket shuffle of (hash, id) pairs only
# ---------------------------------------------------------------------------


def q_dedup_exact(sf_dir: str):
    from ray.data.aggregate import Min, Sum

    ds = corpus_ds(sf_dir)

    def hash_and_partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        md5s = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch["text"].to_pylist()]
        t = pa.Table.from_arrays(
            [pa.array(md5s, type=pa.string()), batch["doc_id"]],
            names=["text_md5", "doc_id"],
        )
        # per-batch combiner: one row per hash leaves the batch
        return (
            pl.from_arrow(t)
            .group_by("text_md5")
            .agg(
                pl.col("doc_id").min().alias("keeper_id"),
                pl.len().cast(pl.Int64).alias("n_copies"),
            )
            .to_arrow()
        )

    return (
        ds.map_batches(hash_and_partial, batch_format="pyarrow")
        .groupby("text_md5")
        .aggregate(
            Min("keeper_id", alias_name="keeper_id"),
            Sum("n_copies", alias_name="n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

NUM_HASHES = 64
BANDS = 16
ROWS_PER_BAND = NUM_HASHES // BANDS
_MERSENNE = np.uint64((1 << 61) - 1)
_RNG = np.random.RandomState(42)
_A = _RNG.randint(1, (1 << 61) - 1, size=NUM_HASHES).astype(np.uint64)
_B = _RNG.randint(0, (1 << 61) - 1, size=NUM_HASHES).astype(np.uint64)


def _shingles(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingle hashes (stable: md5-based, not PYTHONHASHSEED)."""
    words = text.split(" ")
    if len(words) < k:
        grams = [" ".join(words)]
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        out[i] = np.uint64(
            int.from_bytes(hashlib.md5(g.encode("utf-8")).digest()[:8], "little")
        )
    return out


def minhash_signature(text: str) -> np.ndarray:
    sh = _shingles(text)
    # (a*x + b) mod M for all hash fns x all shingles, min per fn — vectorized
    prod = sh[None, :] * _A[:, None] + _B[:, None]  # wraps mod 2^64 (deterministic)
    return prod.min(axis=1)


def minhash_lsh_batch(batch: pa.Table) -> pa.Table:
    """Stateless-per-batch signature + band explosion. Emits one row per
    (doc, band) with the band-bucket key; the signature travels with the
    row so verification is bucket-local (see module docstring for the
    at-scale variant)."""
    if True:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        out_key, out_id, out_sig = [], [], []
        for d, t in zip(ids, texts):
            sig = minhash_signature(t)
            for b in range(BANDS):
                band = sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
                bh = hashlib.md5(band.tobytes() + bytes([b])).hexdigest()[:16]
                out_key.append(f"{b}:{bh}")
                out_id.append(d)
                out_sig.append(sig.tobytes())
        return pa.Table.from_arrays(
            [
                pa.array(out_key, type=pa.string()),
                pa.array(out_id, type=pa.int64()),
                pa.array(out_sig, type=pa.binary()),
            ],
            names=["band_key", "doc_id", "sig"],
        )


def q_dedup_minhash(sf_dir: str, threshold: float = 0.5):
    ds = corpus_ds(sf_dir).map_batches(minhash_lsh_batch, batch_format="pyarrow")

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_pylist()
        sigs = [np.frombuffer(s, dtype=np.uint64) for s in group["sig"].to_pylist()]
        seen = {}
        for i, d in enumerate(ids):
            seen[d] = sigs[i]
        uids = sorted(seen)
        out_a, out_b, out_j = [], [], []
        for i in range(len(uids)):
            for j in range(i + 1, len(uids)):
                est = float(np.mean(seen[uids[i]] == seen[uids[j]]))
                if est >= threshold:
                    out_a.append(uids[i])
                    out_b.append(uids[j])
                    out_j.append(est)
        return pa.Table.from_arrays(
            [
                pa.array(out_a, type=pa.int64()),
                pa.array(out_b, type=pa.int64()),
                pa.array(out_j, type=pa.float64()),
            ],
            names=["id_a", "id_b", "jaccard_est"],
        )

    pairs = ds.groupby("band_key").map_groups(pairs_in_bucket, batch_format="pyarrow")
    # a pair can surface from several bands — keep one row per pair
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    words = text.split(" ")
    acc = np.zeros(64, dtype=np.int64)
    for w in set(words):
        h = int.from_bytes(hashlib.md5(w.encode("utf-8")).digest()[:8], "little")
        bits = np.unpackbits(np.frombuffer(h.to_bytes(8, "little"), dtype=np.uint8))
        acc += np.where(bits == 1, 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_bands_batch(batch: pa.Table) -> pa.Table:
    if True:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        key, did, sh = [], [], []
        for d, t in zip(ids, texts):
            h = simhash64(t)
            for b in range(4):  # 4x16-bit bands: hamming<=3 => one band equal
                band = (h >> (16 * b)) & 0xFFFF
                key.append(f"{b}:{band:04x}")
                did.append(d)
                sh.append(h)
        return pa.Table.from_arrays(
            [
                pa.array(key, type=pa.string()),
                pa.array(did, type=pa.int64()),
                pa.array(sh, type=pa.uint64()),
            ],
            names=["band_key", "doc_id", "simhash"],
        )


def q_dedup_simhash(sf_dir: str, max_hamming: int = 3):
    ds = corpus_ds(sf_dir).map_batches(simhash_bands_batch, batch_format="pyarrow")

    def pairs(group: pa.Table) -> pa.Table:
        seen: dict[int, int] = {}
        for d, h in zip(group["doc_id"].to_pylist(), group["simhash"].to_pylist()):
            seen[d] = h
        uids = sorted(seen)
        a, b, dist = [], [], []
        for i in range(len(uids)):
            for j in range(i + 1, len(uids)):
                hd = bin(seen[uids[i]] ^ seen[uids[j]]).count("1")
                if hd <= max_hamming:
                    a.append(uids[i])
                    b.append(uids[j])
                    dist.append(hd)
        return pa.Table.from_arrays(
            [
                pa.array(a, type=pa.int64()),
                pa.array(b, type=pa.int64()),
                pa.array(dist, type=pa.int64()),
            ],
            names=["id_a", "id_b", "hamming"],
        )

    out = ds.groupby("band_key").map_groups(pairs, batch_format="pyarrow")
    return out.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard on the planted near-dup pairs (SQL-checkable)
# ---------------------------------------------------------------------------


def q_dedup_ngram_jaccard(sf_dir: str):
    """Exact word-trigram Jaccard for each planted (orig, orig+1M) pair.
    Sort-merge-free: the pair is formed inside one batch (same source row),
    so this is a pure map — the verification kernel of the LSH pipeline,
    isolated and oracle-checked."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        sel = np.nonzero(ids % 10 == 0)[0]
        out_a, out_b, out_j = [], [], []
        for i in sel:
            t1, t2 = texts[i], texts[i] + " neardup"
            s1 = _trigram_set(t1)
            s2 = _trigram_set(t2)
            inter = len(s1 & s2)
            union = len(s1 | s2)
            out_a.append(int(ids[i]))
            out_b.append(int(ids[i]) + 1_000_000)
            out_j.append(inter / union if union else 0.0)
        return pa.Table.from_arrays(
            [
                pa.array(out_a, type=pa.int64()),
                pa.array(out_b, type=pa.int64()),
                pa.array(out_j, type=pa.float64()),
            ],
            names=["id_a", "id_b", "jaccard"],
        )

    return docs.map_batches(fn, batch_format="pyarrow")


def _trigram_set(text: str) -> set:
    w = text.split(" ")
    if len(w) < 3:
        return {" ".join(w)}
    return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def q_dedup_embedding(sf_dir: str, threshold: float = 0.45):
    """Embedding near-dup pairs (cosine >= threshold), brute-force within
    blocks against a broadcast matrix (the small-side-broadcast join shape;
    the at-scale path is the LSH/IVF variant in similarity.py). Cosine in
    float64 to match DuckDB's list_cosine_similarity."""
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids_all = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ref = ray.put((ids_all, mat_n))

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    class NearDup:
        def __init__(self, r):
            import ray as _ray

            self.ids, self.mat = _ray.get(r)

        def __call__(self, batch: pa.Table) -> pa.Table:
            bids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
            bm = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
            bm = bm / np.linalg.norm(bm, axis=1, keepdims=True)
            cos = bm @ self.mat.T
            ai, bj = np.nonzero(cos >= threshold)
            a = bids[ai]
            b = self.ids[bj]
            keep = a < b
            return pa.Table.from_arrays(
                [pa.array(a[keep]), pa.array(b[keep])],
                names=["vec_id_a", "vec_id_b"],
            )

    return ds.map_batches(
        NearDup, fn_constructor_args=(ref,), batch_format="pyarrow", concurrency=2
    )


SQL = {
    "dedup_exact": f"""
        WITH {CORPUS_CTE}
        SELECT md5(text) AS text_md5, min(doc_id) AS keeper_id,
               CAST(count(*) AS BIGINT) AS n_copies
        FROM corpus GROUP BY 1""",
    "dedup_ngram_jaccard": """
        WITH tri AS (
          SELECT doc_id, string_split(text, ' ') AS w1,
                 string_split(text || ' neardup', ' ') AS w2
          FROM documents WHERE doc_id % 10 = 0),
        sets AS (
          SELECT doc_id,
            list_distinct(list_transform(range(1, greatest(len(w1)-2, 1) + 1),
                i -> w1[i] || ' ' || w1[i+1] || ' ' || w1[i+2])) AS s1,
            list_distinct(list_transform(range(1, greatest(len(w2)-2, 1) + 1),
                i -> w2[i] || ' ' || w2[i+1] || ' ' || w2[i+2])) AS s2
          FROM tri)
        SELECT doc_id AS id_a, doc_id + 1000000 AS id_b,
               CAST(len(list_intersect(s1, s2)) AS DOUBLE)
                   / len(list_distinct(list_concat(s1, s2))) AS jaccard
        FROM sets""",
    "dedup_embedding": """
        SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45""",
}


def registry():
    queries = {
        "dedup_exact": q_dedup_exact,
        "dedup_minhash": q_dedup_minhash,
        "dedup_simhash": q_dedup_simhash,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_embedding": q_dedup_embedding,
    }
    return queries, dict(SQL)
