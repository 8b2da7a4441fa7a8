"""Similarity search over the ``embeddings`` table (list<float> column).

* ``knn_bruteforce`` — exact cosine top-k: the query matrix is broadcast
  once (``ray.put``), every batch computes a float64 matmul against it and
  emits per-batch partial top-k candidates; a tiny grouped reduce keeps the
  global top-k per query. This is the baseline every ANN variant is
  recall-checked against.
* ``knn_ivf`` — IVF-style scale path: vectors are bucketed by nearest
  coarse centroid (the ``label`` clusters), queries probe the ``nprobe``
  nearest centroids only. Partitioning assumption: each coarse bucket fits
  one task; at 100 TB the buckets are the shuffle key.

Cosines are computed in float64 so rank order matches DuckDB's
``list_cosine_similarity`` oracle; the emitted columns are ids + rank only
(float equality is never hash-compared).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .kernels import import_polars as _pl
from .sources import read_table

K = 5
N_QUERIES = 8  # query set: vec_id < 8


def _load_embeddings(sf_dir: str, filters=None):
    """Driver-side load of the SMALL side only — always pass ``filters``
    (parquet row-group/predicate pushdown) unless the full matrix is the
    explicit point (the single-process k-means test reference)."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=filters,
    )
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    mat = embedding_matrix(t["embedding"])
    return ids, mat


def _load_queries(sf_dir: str):
    """The query set (vec_id < N_QUERIES) via predicate pushdown — only
    matching row groups leave storage, never the full table."""
    return _load_embeddings(sf_dir, filters=[("vec_id", "<", N_QUERIES)])


def _sample_embeddings(sf_dir: str, max_rows: int) -> np.ndarray:
    """Quantizer-training sample: reads whole ROW GROUPS from the front
    until ``max_rows`` is covered — O(sample), not O(table), however big
    the table. Deterministic (file order)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    parts, rows = [], 0
    for rg in range(pf.metadata.num_row_groups):
        parts.append(pf.read_row_group(rg, columns=["embedding"]))
        rows += parts[-1].num_rows
        if rows >= max_rows:
            break
    t = pa.concat_tables(parts)
    return embedding_matrix(t["embedding"])[:max_rows]


def embedding_matrix(col, dtype=np.float64) -> np.ndarray:
    """``list<float>`` column -> ``(n, dim)`` matrix WITHOUT materializing
    n×dim Python objects: one flatten of the Arrow child buffer + reshape.
    Requires uniform non-null list lengths (the embedding-column
    contract); ragged or null rows fail loudly — a divisible-total ragged
    batch would otherwise silently scramble values across rows."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if col.null_count:
        raise ValueError("embedding column has null rows")
    if pa.types.is_fixed_size_list(col.type):
        dim = col.type.list_size
    else:
        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        if (lens != lens[0]).any():
            raise ValueError("ragged embedding column: lengths are not uniform")
        dim = int(lens[0])
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return np.ascontiguousarray(flat.reshape(n, dim), dtype=dtype)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def _final_topk(group: pa.Table) -> pa.Table:
    """Shared per-query top-K reducer for every knn variant: exact-scored
    (query_id, neighbor_id, cos) partials -> ranked top-K. Deterministic:
    cos desc, neighbor_id asc tiebreak."""
    c = group["cos"].to_numpy(zero_copy_only=False).astype(np.float64)
    n = group["neighbor_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    q = group["query_id"][0].as_py()
    order = np.lexsort((n, -c))[:K]
    return pa.Table.from_arrays(
        [
            pa.array([q] * len(order), type=pa.int64()),
            pa.array(n[order], type=pa.int64()),
            pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
        ],
        names=["query_id", "neighbor_id", "rank"],
    )


def q_knn_bruteforce(sf_dir: str):
    import ray
    import ray.data as rd

    qids, qmat = _load_queries(sf_dir)
    qmat = _normalize(qmat)
    ref = ray.put((qids, qmat))

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    from .sources import get_broadcast

    def partial_topk(batch: pa.Table) -> pa.Table:
        qids, qmat = get_broadcast(ref)  # once per worker process
        bids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bm = _normalize(embedding_matrix(batch["embedding"]))
        cos = qmat @ bm.T  # (Q, B)
        out_q, out_n, out_c = [], [], []
        for qi, q in enumerate(qids):
            mask = bids != q  # exclude self
            c = cos[qi][mask]
            n = bids[mask]
            k = min(K, len(n))
            if k == 0:
                continue
            # partial top-k within the batch — only K rows per query
            # leave each batch (combiner before the tiny shuffle)
            top = np.argpartition(-c, k - 1)[:k]
            out_q.extend([q] * k)
            out_n.extend(n[top].tolist())
            out_c.extend(c[top].tolist())
        return pa.Table.from_arrays(
            [
                pa.array(out_q, type=pa.int64()),
                pa.array(out_n, type=pa.int64()),
                pa.array(out_c, type=pa.float64()),
            ],
            names=["query_id", "neighbor_id", "cos"],
        )

    partial = ds.map_batches(partial_topk, batch_format="pyarrow")

    return partial.groupby("query_id").map_groups(_final_topk, batch_format="pyarrow")


def _kmeans_spherical(mat: np.ndarray, nlist: int, iters: int = 8) -> np.ndarray:
    """Deterministic spherical k-means for the coarse quantizer: seeded
    init (evenly-strided points), cosine assignment, mean + renormalize.
    At 100 TB this trains on a driver-side sample; assignment stays a
    vectorized matmul per batch."""
    idx = np.linspace(0, len(mat) - 1, nlist).astype(int)
    cents = mat[idx].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ cents.T, axis=1)
        for c in range(nlist):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


def q_knn_ivf(sf_dir: str, nlist: int = 8, nprobe: int = 3):
    """IVF variant (the ANN scale path): a deterministic spherical-k-means
    coarse quantizer; each vector lives in its nearest-centroid cell; a
    query scans only the ``nprobe`` closest cells. Recall vs the
    brute-force baseline is asserted in tests. Partitioning assumption:
    cell id is the shuffle key; each cell fits one task."""
    import ray
    import ray.data as rd

    # the coarse quantizer trains on a driver-side row-group SAMPLE
    # (nlist*1000 rows, O(sample) I/O) — never the full table
    sample = _normalize(_sample_embeddings(sf_dir, max_rows=nlist * 1000))
    cent_mat = _kmeans_spherical(sample, nlist)

    qids, qmat = _load_queries(sf_dir)
    qmat = _normalize(qmat)
    # probe list per query: nprobe nearest centroids, as a (Q, nlist)
    # boolean mask so the per-batch membership test is one numpy take
    qc = qmat @ cent_mat.T
    probe_mask = np.zeros((len(qids), nlist), dtype=bool)
    for i in range(len(qids)):
        probe_mask[i, np.argsort(-qc[i])[:nprobe]] = True
    ref = ray.put((qids, qmat, probe_mask, cent_mat))

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    from .sources import get_broadcast

    def probe_partial(batch: pa.Table) -> pa.Table:
        qids_b, qmat_b, probe_mask_b, cents_b = get_broadcast(ref)
        bids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bm = _normalize(embedding_matrix(batch["embedding"]))
        blab = np.argmax(bm @ cents_b.T, axis=1)
        out_q, out_n, out_c = [], [], []
        for qi, q in enumerate(qids_b):
            # vectorized cell-membership: one boolean take per query
            mask = probe_mask_b[qi][blab] & (bids != q)
            if not mask.any():
                continue
            c = bm[mask] @ qmat_b[qi]
            n = bids[mask]
            k = min(K, len(n))
            top = np.argpartition(-c, k - 1)[:k] if len(c) > k else np.arange(len(c))
            out_q.extend([q] * len(top))
            out_n.extend(n[top].tolist())
            out_c.extend(c[top].tolist())
        return pa.Table.from_arrays(
            [
                pa.array(out_q, type=pa.int64()),
                pa.array(out_n, type=pa.int64()),
                pa.array(out_c, type=pa.float64()),
            ],
            names=["query_id", "neighbor_id", "cos"],
        )

    partial = ds.map_batches(probe_partial, batch_format="pyarrow")

    return partial.groupby("query_id").map_groups(_final_topk, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# IVF-PQ: product-quantized ANN — the memory-compressed 100 TB path
# ---------------------------------------------------------------------------

PQ_M = 8  # subspaces (64-dim -> 8x 8-dim subvectors)
PQ_KS = 16  # centroids per subspace codebook (4-bit codes)
PQ_RERANK = 4  # exact-rerank pool = PQ_RERANK * K candidates per batch


def _kmeans_plain(x: np.ndarray, k: int, iters: int = 10) -> np.ndarray:
    """Deterministic Lloyd k-means for subspace codebooks: evenly spaced
    sample rows as init (no RNG), empty clusters keep their centroid."""
    c = x[np.linspace(0, len(x) - 1, k).astype(int)].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)
        for j in range(k):
            m = a == j
            if m.any():
                c[j] = x[m].mean(0)
    return c


def train_pq(sample: np.ndarray, m: int = PQ_M, ks: int = PQ_KS) -> np.ndarray:
    """(m, ks, dim/m) codebook tensor trained per subspace."""
    sub = sample.shape[1] // m
    return np.stack(
        [_kmeans_plain(sample[:, s * sub : (s + 1) * sub], ks) for s in range(m)]
    )


def pq_encode(vecs: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) uint8 codes: per-subspace nearest codebook entry. At 64-dim
    float32 -> 8 bytes/vector, a 32x compression of the stored index."""
    m, ks, sub = books.shape
    codes = np.empty((len(vecs), m), dtype=np.uint8)
    for s in range(m):
        d = ((vecs[:, None, s * sub : (s + 1) * sub] - books[s][None]) ** 2).sum(-1)
        codes[:, s] = d.argmin(1)
    return codes


def pq_adc_scores(q: np.ndarray, codes: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Asymmetric-distance dot products: per-subspace lookup table
    LUT[s][c] = q_sub(s) . book[s][c], candidate score = sum of table
    takes — no per-candidate float math beyond m adds."""
    m, ks, sub = books.shape
    lut = np.stack([books[s] @ q[s * sub : (s + 1) * sub] for s in range(m)])
    return lut[np.arange(m)[:, None], codes.T].sum(0)


def q_knn_ivf_pq(sf_dir: str):
    """Product-quantized ANN (ADC + exact rerank): vectors are PQ-encoded
    per batch (8 uint8 codes for a 64-dim vector — the index that fits
    in RAM when 100 TB of raw floats cannot); each query ranks a batch by
    table-lookup ADC scores, exact-reranks only the top PQ_RERANK*K
    candidates (their raw vectors are in the same batch — no fetch), and
    ships exact-scored partials to the same tiny per-query top-K reduce
    as the other knn variants. Codebooks train on the same O(sample)
    row-group sample as the IVF quantizer. Recall vs brute force is
    asserted in tests; no SQL oracle (approximate by design)."""
    import ray
    import ray.data as rd

    sample = _normalize(_sample_embeddings(sf_dir, max_rows=4000))
    books = train_pq(sample)

    qids, qmat = _load_queries(sf_dir)
    qmat = _normalize(qmat)
    ref = ray.put((qids, qmat, books))

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    from .sources import get_broadcast

    def adc_partial(batch: pa.Table) -> pa.Table:
        qids_b, qmat_b, books_b = get_broadcast(ref)
        bids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bm = _normalize(embedding_matrix(batch["embedding"]))
        codes = pq_encode(bm, books_b)
        pool = PQ_RERANK * K
        out_q, out_n, out_c = [], [], []
        for qi, q in enumerate(qids_b):
            adc = pq_adc_scores(qmat_b[qi], codes, books_b)
            adc[bids == q] = -np.inf
            r = min(pool, len(adc))
            cand = (
                np.argpartition(-adc, r - 1)[:r] if len(adc) > r else np.arange(len(adc))
            )
            cand = cand[np.isfinite(adc[cand])]
            if not len(cand):
                continue
            exact = bm[cand] @ qmat_b[qi]  # rerank: exact dot, cand-sized
            k = min(K, len(cand))
            top = np.argpartition(-exact, k - 1)[:k] if len(cand) > k else np.arange(len(cand))
            out_q.extend([q] * len(top))
            out_n.extend(bids[cand[top]].tolist())
            out_c.extend(exact[top].tolist())
        return pa.Table.from_arrays(
            [
                pa.array(out_q, type=pa.int64()),
                pa.array(out_n, type=pa.int64()),
                pa.array(out_c, type=pa.float64()),
            ],
            names=["query_id", "neighbor_id", "cos"],
        )

    partial = ds.map_batches(adc_partial, batch_format="pyarrow")

    return partial.groupby("query_id").map_groups(_final_topk, batch_format="pyarrow")


SQL = {
    "knn_bruteforce": f"""
        SELECT query_id, neighbor_id, rank FROM (
          SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                 row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(q.embedding, n.embedding) DESC,
                            n.vec_id) AS rank
          FROM embeddings q JOIN embeddings n ON n.vec_id <> q.vec_id
          WHERE q.vec_id < {N_QUERIES})
        WHERE rank <= {K}""",
}


def registry():
    queries = {
        "knn_bruteforce": q_knn_bruteforce,
        "knn_ivf": q_knn_ivf,
        "knn_ivf_pq": q_knn_ivf_pq,
        "kmeans_clusters": q_kmeans_clusters,
    }
    return queries, dict(SQL)


# ---------------------------------------------------------------------------
# distributed k-means (iterative algorithm over a Dataset)
# ---------------------------------------------------------------------------

KMEANS_K = 8
KMEANS_ITERS = 5


def distributed_kmeans(sf_dir: str, k: int = KMEANS_K, iters: int = KMEANS_ITERS):
    """Iterative distributed k-means (the brief's 'iterative algorithm'
    class — inherently non-SQL): each round broadcasts the centroids,
    every batch computes assignments + PARTIAL (sum, count) per cluster
    (the combiner), and one tiny grouped reduce updates the centroids.
    The fact table is re-scanned per iteration but never collected;
    driver state is k x dim floats. Deterministic: evenly-strided init,
    float64, ties broken by lowest cluster id (argmax on negated ...
    argmin picks first maximum index in numpy — stable).

    Returns (centroids ndarray, assignment Dataset fn) — see
    q_kmeans_clusters for the query surface.
    """
    import ray
    import pyarrow.parquet as pq

    # strided init WITHOUT assuming vec_id == row index (shifted /
    # replicated tables break that): seed rows are addressed by FILE
    # POSITION via row-group arithmetic. Driver IO is at most
    # min(k, n_row_groups) row-group reads of the embedding column —
    # bounded by the FILE'S row-group size, not the table — and every
    # decoded group is freed before the distributed iterations start.
    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    n_rows = pf.metadata.num_rows
    init_idx = np.linspace(0, n_rows - 1, k).astype(int)
    rg_starts = np.cumsum(
        [0] + [pf.metadata.row_group(i).num_rows for i in range(pf.num_row_groups)]
    )

    def _seed_rows() -> np.ndarray:
        rg_cache: dict[int, "pa.Table"] = {}
        seeds = []
        for p in init_idx:
            g = int(np.searchsorted(rg_starts, int(p), side="right") - 1)
            if g not in rg_cache:
                rg_cache[g] = pf.read_row_group(g, columns=["embedding"])
            emb = rg_cache[g]["embedding"][int(p - rg_starts[g])].as_py()
            seeds.append(np.asarray(emb, dtype=np.float64))
        return np.stack(seeds)  # caches die with this frame

    cents = _seed_rows()

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    from .sources import get_broadcast

    for _ in range(iters):
        ref = ray.put(cents)

        def partials(batch: pa.Table, ref=ref) -> pa.Table:
            c = get_broadcast(ref)
            m = embedding_matrix(batch["embedding"])
            d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            dim = m.shape[1]
            rows_c, rows_n, rows_s = [], [], []
            for ci in np.unique(assign):
                members = m[assign == ci]
                rows_c.append(int(ci))
                rows_n.append(len(members))
                rows_s.append(members.sum(axis=0).tobytes())
            return pa.Table.from_arrays(
                [
                    pa.array(rows_c, type=pa.int64()),
                    pa.array(rows_n, type=pa.int64()),
                    pa.array(rows_s, type=pa.binary()),
                ],
                names=["cluster", "n", "vec_sum"],
            )

        def merge_sums(g: pa.Table) -> pa.Table:
            tot = None
            for b in g["vec_sum"].to_pylist():
                v = np.frombuffer(b, dtype=np.float64)
                tot = v if tot is None else tot + v
            return pa.Table.from_arrays(
                [
                    g["cluster"].slice(0, 1),
                    pa.array([int(np.sum(g["n"].to_numpy(zero_copy_only=False)))]),
                    pa.array([tot.tobytes()], type=pa.binary()),
                ],
                names=["cluster", "n", "vec_sum"],
            )

        stats = (
            ds.map_batches(partials, batch_format="pyarrow")
            .groupby("cluster")
            .map_groups(merge_sums, batch_format="pyarrow")
            .take_all()  # k rows — tiny driver-side state, by design
        )
        new = cents.copy()
        for row in stats:
            ci = int(row["cluster"])
            n = int(row["n"])
            if n:
                new[ci] = np.frombuffer(row["vec_sum"], dtype=np.float64) / n
        cents = new
    return cents


def q_kmeans_clusters(sf_dir: str):
    """Final assignment counts + within-cluster mean distance per cluster
    after KMEANS_ITERS rounds (rows-only oracle — iterative; a unit test
    pins the whole algorithm against a single-process numpy reference)."""
    import ray

    cents = distributed_kmeans(sf_dir)
    ref = ray.put(cents)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    from .sources import get_broadcast
    from ray.data.aggregate import Sum

    def assign_partial(batch: pa.Table) -> pa.Table:
        c = get_broadcast(ref)
        m = embedding_matrix(batch["embedding"])
        d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        dmin = np.sqrt(d2[np.arange(len(a)), a])
        pl = _pl()

        t = pa.Table.from_arrays(
            [pa.array(a.astype(np.int64)), pa.array(dmin)],
            names=["cluster", "dist"],
        )
        return (
            pl.from_arrow(t)
            .group_by("cluster")
            .agg(
                pl.len().cast(pl.Int64).alias("n_members"),
                pl.col("dist").sum().alias("dist_sum"),
            )
            .to_arrow()
        )

    out = (
        ds.map_batches(assign_partial, batch_format="pyarrow")
        .groupby("cluster")
        .aggregate(
            Sum("n_members", alias_name="n_members"),
            Sum("dist_sum", alias_name="dist_sum"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mean_d = pc.divide(t["dist_sum"], pc.cast(t["n_members"], pa.float64()))
        return pa.Table.from_arrays(
            [t["cluster"], t["n_members"], pc.round(mean_d, ndigits=6)],
            names=["cluster", "n_members", "mean_dist"],
        )

    return out.map_batches(finish, batch_format="pyarrow")
