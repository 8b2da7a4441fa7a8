"""Corpus-curation operators for training-data pipelines: deterministic
train/valid/test splitting, PII-style redaction, weighted per-source
mixture sampling, deterministic bottom-k reservoir sampling, a
Bloom-filter semi-join (the no-broadcast scale path for key membership),
and a count-min sketch (frequency estimation without a groupby).

These are the curation analogs of the reference's per-document routing
and membership probes (route columns: Jhove.kt:519-537; key-existence
probe: S3Utils.kt:27-33) applied to corpus assembly. Everything is
vectorized Arrow/numpy; the only driver-side materialization is the
small side of each operator (key sets, sketches), broadcast once with
``ray.put``.

Determinism note: every sampling decision is a pure function of the row
key via a Lehmer (minstd) multiplicative hash ``(key * 48271) mod
(2^31 - 1)`` — int64-safe in BOTH numpy and DuckDB for keys below
~1.9e14 (the product stays under 2^63), so the exact SQL oracle computes
the identical buckets. No RNG state, so re-runs and resumes agree.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .kernels import md5_hex
from .kernels import import_polars as _pl
from .sources import read_table

LEHMER_A = 48271
LEHMER_M = 2147483647  # 2^31 - 1 (prime -> multiplication is a bijection)

# split fractions: bucket < 80 -> train, < 90 -> valid, else test
TRAIN_PCT, VALID_PCT = 80, 90


def lehmer_bucket(keys: np.ndarray, mod: int = 100) -> np.ndarray:
    """Deterministic hash bucket in [0, mod) — identical to the SQL
    ``(key * 48271) % 2147483647 % mod`` (int64-safe, see module doc)."""
    return (keys.astype(np.int64) * LEHMER_A) % LEHMER_M % mod


def _lehmer_sql(col: str, mod: int = 100) -> str:
    return f"(({col} * {LEHMER_A}) % {LEHMER_M}) % {mod}"


# the mixture keep predicate, defined ONCE and interpolated into every
# oracle that filters by it (corpus_mixture, corpus_recipe). TRY_CAST:
# DuckDB regexp_extract returns '' on no match and CAST('') errors;
# TRY_CAST yields NULL so the comparison drops the row — matching
# mixture_filter's fill_null(-1) drop.
MIXTURE_PRED_SQL = (
    "(({col} * %d) %% %d) %% 100 < "
    "(TRY_CAST(regexp_extract(source, '([0-9]+)$') AS BIGINT) * 7 + 13) %% 101"
) % (LEHMER_A, LEHMER_M)


def _mixture_pred(col: str = "doc_id") -> str:
    return MIXTURE_PRED_SQL.format(col=col)


# ---------------------------------------------------------------------------
# deterministic train/valid/test split
# ---------------------------------------------------------------------------


def split_assign(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = lehmer_bucket(ids)
    split = np.where(b < TRAIN_PCT, "train", np.where(b < VALID_PCT, "valid", "test"))
    return pa.Table.from_arrays(
        [
            batch["doc_id"],
            pa.array(b, type=pa.int64()),
            pa.array(split.tolist(), type=pa.string()),
        ],
        names=["doc_id", "bucket", "split"],
    )


def q_corpus_split(sf_dir: str):
    """Deterministic train/valid/test assignment: pure map over the key —
    no shuffle, no RNG, stable under re-runs/resumes (the property a
    100 TB corpus split MUST have so late-arriving shards land in the
    same split)."""
    return read_table(sf_dir, "documents", columns=["doc_id"]).map_batches(
        split_assign, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# PII-style redaction scrub
# ---------------------------------------------------------------------------

# RE2-safe patterns (no lookaround): both pyarrow and DuckDB run RE2, so
# engine and oracle replace the SAME spans. Order matters and is fixed:
# term redaction first, then digit runs over the already-scrubbed text.
REDACT_TERMS = r"\b(customer|user|key)\b"
REDACT_DIGITS = r"[0-9]{6,}"


def redact_text(t):
    """The two-step replace chain (terms first, then digit runs over the
    scrubbed text) — the ONE place the order and tokens are defined, so
    q_text_redact and q_corpus_recipe cannot drift apart. Returns
    (redacted, n_redactions)."""
    n_terms = pc.count_substring_regex(t, REDACT_TERMS)
    t1 = pc.replace_substring_regex(t, REDACT_TERMS, "<REDACTED>")
    n_digits = pc.count_substring_regex(t1, REDACT_DIGITS)
    t2 = pc.replace_substring_regex(t1, REDACT_DIGITS, "<NUM>")
    n = pc.add(pc.cast(n_terms, pa.int64()), pc.cast(n_digits, pa.int64()))
    return t2, n


def redact(batch: pa.Table) -> pa.Table:
    t2, n = redact_text(batch["text"])
    return pa.Table.from_arrays(
        [batch["doc_id"], t2, n], names=["doc_id", "redacted", "n_redactions"]
    )


def q_text_redact(sf_dir: str):
    """PII-style scrub: two vectorized RE2 replace kernels per batch (term
    list, then long digit runs) plus match counts — the per-document
    content-normalization shape (JhoveParser/transforms analog) applied
    to corpus hygiene. Pure map; compiled-regex cost is amortized by the
    Arrow kernel, no per-row Python."""
    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        redact, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# weighted per-source mixture sampling
# ---------------------------------------------------------------------------


def mixture_rate_pct(src_num: np.ndarray) -> np.ndarray:
    """Keep-rate percent per source: deterministic function of the numeric
    source suffix — (7*n + 13) % 101 spans 0..100 across sources."""
    return (src_num.astype(np.int64) * 7 + 13) % 101


def mixture_filter(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    # numeric suffix of 'srcN' — vectorized regex extract, no Python rows.
    # A source with no numeric suffix extracts NULL; fill with -1 so its
    # keep-rate comparison is false — the same row-drop the SQL oracle
    # produces (DuckDB regexp_extract yields '' on no match and
    # TRY_CAST('') is NULL, so its comparison is NULL -> dropped).
    suffix = pc.extract_regex(batch["source"], r"(?P<n>[0-9]+)$")
    src_num = pc.fill_null(
        pc.cast(pc.struct_field(suffix, "n"), pa.int64()), -1
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    rate = np.where(src_num < 0, np.int64(-1), mixture_rate_pct(src_num))
    keep = lehmer_bucket(ids) < rate
    return batch.filter(pa.array(keep))


def q_corpus_mixture(sf_dir: str):
    """Weighted mixture sampling: each source contributes at its own
    deterministic keep-rate (the dataset-mixing step of an LLM data
    recipe). Hash-gated filter — a pure map, no shuffle; rates are a
    function of the source, so adding a source never reshuffles the
    existing sample."""
    return read_table(
        sf_dir, "documents", columns=["doc_id", "source"]
    ).map_batches(mixture_filter, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# deterministic bottom-k reservoir sample
# ---------------------------------------------------------------------------

SAMPLE_K = 100


def bottom_k_partial(ids: np.ndarray, k: int):
    """O(n) per-block bottom-k preselect by Lehmer-hash priority: returns
    (ids, hashes) of at most k candidates. Mergeable: re-selecting
    bottom-k over concatenated partials equals bottom-k over the whole
    input (property-tested)."""
    h = (ids.astype(np.int64) * LEHMER_A) % LEHMER_M
    if len(ids) > k:
        idx = np.argpartition(h, k)[:k]
        return ids[idx], h[idx]
    return ids, h


def bottom_k_final(ids: np.ndarray, h: np.ndarray, k: int) -> np.ndarray:
    """Exact bottom-k over (possibly merged) candidates, deterministic
    (hash asc, id asc) order."""
    return ids[np.lexsort((ids, h))[:k]]


def q_corpus_sample(sf_dir: str, k: int = SAMPLE_K):
    """Uniform k-sample WITHOUT an RNG or a global sort: keep the k rows
    with the smallest Lehmer hash (bottom-k priority sampling). The
    per-batch partial bottom-k is mergeable — each block ships at most k
    (hash, key) pairs, the final reduce re-selects bottom-k — so the
    collect is O(blocks*k), never the data. Equivalent SQL: ORDER BY
    hash LIMIT k (injective hash -> no ties across keys)."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids, h = bottom_k_partial(ids, k)
        return pa.table(
            {"doc_id": pa.array(ids), "h": pa.array(h)}
        )

    def final(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        h = batch["h"].to_numpy(zero_copy_only=False)
        keep = bottom_k_final(ids, h, k)
        ranks = np.arange(1, len(keep) + 1, dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(keep),
                "sample_rank": pa.array(ranks),
            }
        )

    return (
        read_table(sf_dir, "documents", columns=["doc_id"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        # batch_size=None: all partials must reach final() as ONE batch
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


# ---------------------------------------------------------------------------
# stratified per-source sample: bottom-k within each group
# ---------------------------------------------------------------------------

STRAT_K = 10


def q_corpus_sample_stratified(sf_dir: str, k: int = STRAT_K):
    """k-per-source stratified sample: within each source, keep the k
    rows with the smallest Lehmer hash (deterministic, RNG-free — the
    bottom-k priority sample applied per stratum). One groupby shuffle
    of (doc_id, source) pairs only; per-group work is an O(n)
    argpartition preselect of ~k candidates, then a sort of just those
    k — never a sort of the stratum."""

    def per_group(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # O(n) preselect, then sort only the ~k winners; source is the
        # group key, constant within the group
        keep = bottom_k_final(*bottom_k_partial(ids, k), k)
        n = len(keep)
        return pa.table(
            {
                "source": pa.array([g["source"][0].as_py()] * n),
                "doc_id": pa.array(keep),
                "rnk": pa.array(np.arange(1, n + 1, dtype=np.int64)),
            }
        )

    return (
        read_table(sf_dir, "documents", columns=["doc_id", "source"])
        .groupby("source")
        .map_groups(per_group, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# sequence packing: fixed token-budget training sequences
# ---------------------------------------------------------------------------

PACK_BUDGET = 2048  # tokens per packed training sequence


def pack_assign(n_tok: np.ndarray, budget: int) -> np.ndarray:
    """Sequence assignment for docs in a fixed order: seq_id = exclusive
    running token sum // budget. Non-decreasing; each doc starts inside
    its sequence's token window (property-tested)."""
    prev = np.concatenate(([0], np.cumsum(n_tok.astype(np.int64))[:-1]))
    return prev // budget


def q_corpus_pack_sequences(sf_dir: str, budget: int = PACK_BUDGET):
    """Pack documents into fixed-token-budget training sequences — the
    pretraining batch-assembly step. Deterministic contiguous packing:
    within each source (the packing partition), documents ordered by
    doc_id are assigned seq_id = floor(exclusive_running_token_sum /
    budget). Per-source cumsum inside ``map_groups`` — packing never
    needs a global order, so the only shuffle is the source groupby.
    A document larger than the budget still lands in one sequence (real
    packers then truncate/split downstream)."""

    def per_group(g: pa.Table) -> pa.Table:
        g = g.sort_by([("doc_id", "ascending")])
        n_tok = pc.cast(
            pc.list_value_length(pc.split_pattern(g["text"], " ")), pa.int64()
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        seq_id = pack_assign(n_tok, budget)
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "source": g["source"],
                "n_tokens": pa.array(n_tok),
                "seq_id": pa.array(seq_id),
            }
        )

    return (
        read_table(sf_dir, "documents", columns=["doc_id", "source", "text"])
        .groupby("source")
        .map_groups(per_group, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# deterministic global training shuffle into shards
# ---------------------------------------------------------------------------

N_SHARDS = 16  # scale knob: at 100 TB pick shards of ~2-4 GB so one
#                shard's key triples fit a single map_groups worker
SHUFFLE_SEED = 20260817  # epoch reshuffle = change the seed; the +seed
#                          offset decorrelates order from shard assignment


def shuffle_keys(batch: pa.Table) -> pa.Table:
    """Pure-map key assignment: shard = Lehmer(doc_id) % N_SHARDS, order
    key = Lehmer(doc_id + seed). Both int64-safe in numpy AND DuckDB
    (module determinism note), so the oracle computes identical keys."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    shard = lehmer_bucket(ids, N_SHARDS)
    skey = ((ids + SHUFFLE_SEED) * LEHMER_A) % LEHMER_M
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "shard": pa.array(shard, type=pa.int64()),
            "skey": pa.array(skey, type=pa.int64()),
        }
    )


def per_shard(g: pa.Table) -> pa.Table:
    """Rank one shard's rows by (skey, doc_id) — the vectorized per-group
    kernel of :func:`q_corpus_shuffle_shards` (module-level so property
    tests exercise the exact production ranking, not a re-derivation)."""
    ids = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    skey = g["skey"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((ids, skey))  # ties broken by doc_id
    rank = np.empty(len(order), dtype=np.int64)
    rank[order] = np.arange(1, len(order) + 1)
    return pa.table(
        {
            "shard": g["shard"],
            "doc_id": g["doc_id"],
            "shuffle_rank": pa.array(rank),
        }
    )


def q_corpus_shuffle_shards(sf_dir: str):
    """Deterministic global training shuffle: every document gets a
    (shard, shuffle_rank) — the reproducible read order a trainer
    consumes shard-by-shard. RNG-free (both keys are Lehmer hashes of
    doc_id, see module doc), so re-runs, resumes and late-arriving
    shards produce the SAME order, and a new epoch is just a new seed —
    the training-export analog of the reference's deterministic
    sequence assignment (``…/processors/ReorderFiles.kt:149-185``).

    Scale shape: key minting is a pure column-pruned map; the only
    shuffle is the shard groupby moving (doc_id, shard, skey) triples —
    never document payloads (a writer joins ranks back to payloads by
    doc_id, or re-derives both keys inline since they are pure
    functions). Per-shard rank is one vectorized lexsort; N_SHARDS is
    the knob that bounds per-group memory."""

    return (
        read_table(sf_dir, "documents", columns=["doc_id"])
        .map_batches(shuffle_keys, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(per_shard, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Bloom-filter semi-join: the no-broadcast-exact-set membership path
# ---------------------------------------------------------------------------

BLOOM_BITS_LOG2 = 17  # 128 Kbit = 16 KiB
BLOOM_K = 4


def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def bloom_build(keys: np.ndarray, bits_log2: int = BLOOM_BITS_LOG2) -> np.ndarray:
    """Bit array (uint8[2^bits_log2 / 8]) with BLOOM_K double-hash probes
    per key."""
    m = np.uint64(1 << bits_log2)
    bits = np.zeros((1 << bits_log2) // 8, dtype=np.uint8)
    h1 = _splitmix64(keys)
    h2 = _splitmix64(keys ^ np.uint64(0xDEADBEEFCAFEF00D)) | np.uint64(1)
    for i in range(BLOOM_K):
        pos = (h1 + np.uint64(i) * h2) % m
        np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64),
                         np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)))
    return bits


def bloom_probe(keys: np.ndarray, bits: np.ndarray,
                bits_log2: int = BLOOM_BITS_LOG2) -> np.ndarray:
    """Vectorized membership test: True = possibly present (FP rate
    ~ (1 - e^{-kn/m})^k), False = definitely absent."""
    m = np.uint64(1 << bits_log2)
    h1 = _splitmix64(keys)
    h2 = _splitmix64(keys ^ np.uint64(0xDEADBEEFCAFEF00D)) | np.uint64(1)
    hit = np.ones(len(keys), dtype=bool)
    for i in range(BLOOM_K):
        pos = (h1 + np.uint64(i) * h2) % m
        byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
        hit &= (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1 != 0
    return hit


SEMI_BUCKETS = 64


def q_semi_join_bloom(sf_dir: str):
    """Semi-join at the scale where the exact key set does NOT fit a
    broadcast: a 16 KiB Bloom filter (built from the small side, shipped
    once) prunes ~all non-members map-side; the few survivors are then
    verified EXACTLY by a co-partitioned set-intersect (union tagged
    probe/build keys, bucket by hash, per-bucket membership) — the
    shuffle moves only bloom survivors + build keys, never the full
    probe side. Result equals the plain semi-join (same SQL oracle)."""
    import ray
    import pyarrow.parquet as pq
    from .sources import get_broadcast

    build = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])[
        "s_suppkey"
    ].to_numpy(zero_copy_only=False).astype(np.int64)
    bits_ref = ray.put(bloom_build(build.astype(np.uint64)))

    ds = read_table(sf_dir, "events", columns=["user_id"])

    def prefilter(batch: pa.Table) -> pa.Table:
        pl = _pl()

        bits = get_broadcast(bits_ref)
        keys = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = batch.filter(pa.array(bloom_probe(keys.astype(np.uint64), bits)))
        t = pl.from_arrow(t).unique(maintain_order=False).to_arrow()
        return t.append_column(
            "is_build", pa.array(np.zeros(t.num_rows, dtype=bool))
        )

    survivors = ds.map_batches(prefilter, batch_format="pyarrow")

    import ray.data as rd

    build_tbl = pa.table(
        {
            "user_id": pa.array(np.unique(build)),
            "is_build": pa.array(np.ones(len(np.unique(build)), dtype=bool)),
        }
    )
    both = survivors.union(rd.from_arrow(build_tbl))

    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "_b", pa.array(lehmer_bucket(ids, SEMI_BUCKETS))
        )

    def verify(g: pa.Table) -> pa.Table:
        ids = g["user_id"].to_numpy(zero_copy_only=False)
        is_build = g["is_build"].to_numpy(zero_copy_only=False)
        build_keys = np.unique(ids[is_build])
        probe_keys = np.unique(ids[~is_build])
        out = probe_keys[np.isin(probe_keys, build_keys)]
        return pa.table({"user_id": pa.array(out, type=pa.int64())})

    return (
        both.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(verify, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# benchmark-contamination check: broadcast probe-token overlap
# ---------------------------------------------------------------------------

BENCH_DOC_MAX = 5  # docs with doc_id < 5 stand in for the eval benchmark


def q_corpus_contamination(sf_dir: str):
    """Train/eval contamination screen: fraction of each document's
    DISTINCT tokens that appear in the benchmark documents' token set
    (docs 0..4 stand in for the held-out eval set). The benchmark
    vocabulary is tiny by construction — read once with a parquet
    filter pushdown, broadcast via ``ray.put``, probed per batch with a
    vectorized ``is_in`` over per-row deduped token lists. One pure map,
    no shuffle; the ratio is a single float64 division so it matches
    the SQL oracle bit-for-bit."""
    import ray
    import pyarrow.parquet as pq
    import pyarrow.dataset as pads
    from .sources import get_broadcast

    bench_tbl = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["text"],
        filters=pads.field("doc_id") < BENCH_DOC_MAX,
    )
    bench_terms = pc.unique(
        pc.list_flatten(pc.split_pattern(bench_tbl["text"], " "))
    )
    # broadcast the python list (what polars is_in wants) so the
    # conversion happens once per worker via the get_broadcast cache,
    # not once per batch
    ref = ray.put(bench_terms.to_pylist())

    def score(batch: pa.Table) -> pa.Table:
        pl = _pl()

        bench = get_broadcast(ref)  # list[str] of benchmark tokens
        df = (
            pl.from_arrow(batch)
            .with_columns(
                pl.col("text").str.split(" ").list.unique().alias("terms")
            )
            .select(
                "doc_id",
                pl.col("terms").list.len().cast(pl.Int64).alias("n_distinct"),
                pl.col("terms")
                .list.eval(pl.element().is_in(bench))
                .list.sum()
                .cast(pl.Int64)
                .alias("n_hit"),
            )
        )
        n_distinct = df["n_distinct"].to_numpy().astype(np.int64)
        n_hit = df["n_hit"].to_numpy().astype(np.int64)
        ratio = n_hit / np.maximum(n_distinct, 1)
        return pa.table(
            {
                "doc_id": df["doc_id"].to_arrow(),
                "n_distinct": pa.array(n_distinct),
                "n_hit": pa.array(n_hit),
                "contamination": pa.array(ratio),
            }
        )

    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# count-min sketch: point frequency estimates without a groupby
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 2048  # error bound: est <= true + e/width * N  (w.h.p.)

_CMS_SEEDS = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5],
    dtype=np.uint64,
)


def cms_partial(values: np.ndarray, depth: int = CMS_DEPTH,
                width: int = CMS_WIDTH) -> np.ndarray:
    """int64[depth, width] counts for one batch — vectorized bincount per
    row of the sketch."""
    sk = np.zeros((depth, width), dtype=np.int64)
    v = values.astype(np.uint64)
    for d in range(depth):
        idx = (_splitmix64(v ^ _CMS_SEEDS[d]) % np.uint64(width)).astype(np.int64)
        sk[d] = np.bincount(idx, minlength=width)
    return sk


def cms_query(sketch: np.ndarray, keys: np.ndarray,
              width: int = CMS_WIDTH) -> np.ndarray:
    """Point estimates: min over rows (classic CMS upper-bound estimate)."""
    v = keys.astype(np.uint64)
    ests = np.empty((sketch.shape[0], len(keys)), dtype=np.int64)
    for d in range(sketch.shape[0]):
        idx = (_splitmix64(v ^ _CMS_SEEDS[d]) % np.uint64(width)).astype(np.int64)
        ests[d] = sketch[d][idx]
    return ests.min(axis=0)


CMS_PROBE_USERS = [1, 2, 3, 4, 5]


def cms_counts(ds, column: str, probe_keys: list[int]):
    """Dataset -> table (key, est_count): per-batch partial sketches
    (depth*width int64 = 64 KiB blobs) merged by elementwise SUM — the
    same tiny-blob combiner shape as the HLL — then probed for the given
    keys. Estimates overcount only (est >= true; est <= true + eN/w)."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[column].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"sk": pa.array([cms_partial(v).tobytes()], type=pa.binary())}
        )

    def reduce_all(batch: pa.Table) -> pa.Table:
        total = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
        for blob in batch["sk"].to_pylist():
            total += np.frombuffer(blob, dtype=np.int64).reshape(CMS_DEPTH, CMS_WIDTH)
        ests = cms_query(total, np.array(probe_keys, dtype=np.int64))
        return pa.table(
            {
                column: pa.array(probe_keys, type=pa.int64()),
                "est_count": pa.array(ests),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        # batch_size=None: all partials must reach reduce_all as ONE batch
        .map_batches(reduce_all, batch_format="pyarrow", batch_size=None)
    )


def q_sketch_cms_counts(sf_dir: str):
    """Per-user event-count estimates for a probe set via count-min sketch
    — frequency lookup on a 10^10-event stream without any groupby. No
    SQL oracle (approximate); the tolerance test pins est>=exact and the
    eN/w error bound."""
    ds = read_table(sf_dir, "events", columns=["user_id"])
    return cms_counts(ds, "user_id", CMS_PROBE_USERS)


# ---------------------------------------------------------------------------
# the composed curation recipe: mixture -> redact -> exact-dedup -> split
# ---------------------------------------------------------------------------


def q_corpus_recipe(sf_dir: str):
    """The end-to-end curation recipe as ONE streaming pipeline:
    weighted mixture filter -> PII redaction -> exact dedup on the
    redacted text (keep the lowest doc_id) -> train/valid/test split.
    Everything up to the dedup shuffle is fused maps; the dedup uses the
    combiner-first shape (per-batch min per md5, so the groupby moves
    one row per (hash, block)). The keeper's (doc_id, source) rides the
    shuffle as a single lexicographically-ordered packed key — min of
    the packed string IS min by doc_id — so no second join is needed to
    recover the keeper's attributes."""
    from ray.data.aggregate import Min

    def redact_keep(batch: pa.Table) -> pa.Table:
        t2, _ = redact_text(batch["text"])
        return pa.table(
            {"doc_id": batch["doc_id"], "source": batch["source"], "redacted": t2}
        )

    def partial(batch: pa.Table) -> pa.Table:
        # md5 has no Arrow kernel — the one per-row loop in this pipeline
        md5s = md5_hex(batch["redacted"])
        # zero-padded doc_id prefix -> lexicographic min == numeric min;
        # built with Arrow kernels (lpad + elementwise join), no row loop
        packed = pc.binary_join_element_wise(
            pc.utf8_lpad(pc.cast(batch["doc_id"], pa.string()), 20, "0"),
            batch["source"],
            "|",
        )
        t = pa.table({"h": md5s, "packed": packed})
        return (
            t.group_by("h")
            .aggregate([("packed", "min")])
            .rename_columns(["h", "packed"])
        )

    def unpack_and_split(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch["packed"], "|", max_splits=1)
        ids = pc.cast(pc.list_element(parts, 0), pa.int64())
        srcs = pc.list_element(parts, 1)
        out = pa.table({"doc_id": ids, "source": srcs})
        split = split_assign(out.select(["doc_id"]))
        return out.append_column("split", split["split"])

    return (
        read_table(sf_dir, "documents", columns=["doc_id", "source", "text"])
        .map_batches(mixture_filter, batch_format="pyarrow")
        .map_batches(redact_keep, batch_format="pyarrow")
        .map_batches(partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min("packed", alias_name="packed"))
        .map_batches(unpack_and_split, batch_format="pyarrow")
    )


def q_corpus_funnel(sf_dir: str):
    """Per-stage audit of the curation recipe — the observability row a
    100 TB run publishes next to its output (how many documents survived
    mixture, dedup, and where the winners landed): stages ``input``,
    ``mixture``, ``dedup``, ``train``/``valid``/``test``. The lineage
    analog of the reference's batch-summary emit
    (``…/processors/Jhove.kt:519-537`` route tallies).

    One combiner-first pass computes every count: per-batch partials of
    (md5, group_n, min zero-padded doc_id) so the single groupby moves
    one ~60-byte row per (hash, block); mixture-kept = sum(group_n),
    dedup-unique = group count, splits from each winner's id — all five
    reduced in ONE ``Dataset.sum`` over indicator columns (a scalar
    result, no driver-side data). The ``input`` count is parquet
    metadata only."""
    from ray.data.aggregate import Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        kept = mixture_filter(batch)
        t2, _ = redact_text(kept["text"])
        md5s = md5_hex(t2)
        w = pc.utf8_lpad(pc.cast(kept["doc_id"], pa.string()), 20, "0")
        t = pa.table({"h": md5s, "w": w})
        g = t.group_by("h").aggregate([("w", "count"), ("w", "min")])
        return g.rename_columns(["h", "n", "w"]).set_column(
            1, "n", pc.cast(g.column(1), pa.int64())
        )

    def indicators(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch["w"], pa.int64()).to_numpy(zero_copy_only=False)
        b = lehmer_bucket(ids.astype(np.int64))
        return pa.table(
            {
                "n": batch["n"],
                "one": pa.array(np.ones(len(ids), dtype=np.int64)),
                "is_train": pa.array((b < TRAIN_PCT).astype(np.int64)),
                "is_valid": pa.array(
                    ((b >= TRAIN_PCT) & (b < VALID_PCT)).astype(np.int64)
                ),
                "is_test": pa.array((b >= VALID_PCT).astype(np.int64)),
            }
        )

    n_input = read_table(sf_dir, "documents", columns=["doc_id"]).count()
    sums = (
        read_table(sf_dir, "documents", columns=["doc_id", "source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("n", alias_name="n"), Min("w", alias_name="w"))
        .map_batches(indicators, batch_format="pyarrow")
        .sum(["n", "one", "is_train", "is_valid", "is_test"])
    ) or {}
    return pa.table(
        {
            "stage": pa.array(
                ["input", "mixture", "dedup", "train", "valid", "test"]
            ),
            "n_rows": pa.array(
                [
                    n_input,
                    sums.get("sum(n)", 0),
                    sums.get("sum(one)", 0),
                    sums.get("sum(is_train)", 0),
                    sums.get("sum(is_valid)", 0),
                    sums.get("sum(is_test)", 0),
                ],
                type=pa.int64(),
            ),
        }
    )


MIXTURE_ALPHA = 0.3  # sampling temperature: weight ∝ n^alpha (GPT-3 style)
MIXTURE_QUOTA = 100_000  # planned docs per training epoch


def q_corpus_mixture_weights(sf_dir: str):
    """Temperature-based mixture reweighting planner — the per-source
    sampling table multilingual/multi-domain training recipes publish
    (weight ∝ n^alpha, alpha<1 upsamples small sources; GPT-3 App. A,
    XLM-R §3.1). The planning analog of the reference's batch-summary
    emit (``…/processors/Jhove.kt:519-537``).

    One combiner-first count per source (per-batch polars partials, the
    groupby moves one (source, n) pair per block; ~#sources rows total —
    the result is driver-side BY DESIGN, it is the broadcast input of a
    sampling stage). Weights are emitted as integer parts-per-million so
    the DuckDB oracle hash-compares exactly (both sides: float64 pow,
    round, cast)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        pl = _pl()

        return (
            pl.from_arrow(batch)
            .group_by("source")
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .to_arrow()
        )

    rows = (
        read_table(sf_dir, "documents", columns=["source"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()  # #sources rows — tiny by design (the plan table)
    )
    by_src = {r["source"]: r["n"] for r in rows}
    src = sorted(by_src)
    n = np.array([by_src[s] for s in src], dtype=np.float64)
    a = np.power(n, MIXTURE_ALPHA)
    z = a.sum()
    # round half AWAY FROM ZERO (floor(x+0.5) — all values positive) to
    # match DuckDB's round(); np.round is banker's half-to-even and
    # diverges by 1 when a quotient lands on x.5.
    return pa.table(
        {
            "source": pa.array(src),
            "n_docs": pa.array(n.astype(np.int64)),
            "weight_ppm": pa.array(
                np.floor(1e6 * a / z + 0.5).astype(np.int64)
            ),
            "quota_docs": pa.array(
                np.floor(MIXTURE_QUOTA * a / z + 0.5).astype(np.int64)
            ),
        }
    )


# ---------------------------------------------------------------------------
# word-window kernel: chunking with overlap + segment-level global dedup
# ---------------------------------------------------------------------------

CHUNK_W, CHUNK_STRIDE = 32, 24  # training-chunk window / stride (words)
SEG_W = 4  # aligned boilerplate segment width (words)
SEG_DUP_MIN_DOCS = 2  # segment is boilerplate if seen in >= this many docs


def word_windows(texts, width: int, stride: int):
    """Explode each string into word windows ``[s, s+width)`` for
    ``s in range(0, n_words, stride)`` — the shared kernel for training
    chunking (overlapping) and segment dedup (non-overlapping,
    ``stride == width``). Fully vectorized: one ``split_pattern``, one
    gather (``take`` with numpy-computed indices), one ``binary_join``;
    no Python loop over rows or windows.

    Returns ``(row_idx, ord_, lens, window_texts)`` where ``row_idx``
    maps each window back to its input row, ``ord_`` is the window
    ordinal within the row, ``lens`` the window word count.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    words = pc.split_pattern(texts, " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    off = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    off = off - off[0]  # normalize in case of a sliced buffer
    flat = words.flatten()
    n = np.diff(off)
    n_win = (n + stride - 1) // stride  # == len(range(0, n, stride))
    total = int(n_win.sum())
    row_idx = np.repeat(np.arange(len(n), dtype=np.int64), n_win)
    cum = np.concatenate([[0], np.cumsum(n_win)])
    ord_ = np.arange(total, dtype=np.int64) - np.repeat(cum[:-1], n_win)
    starts = ord_ * stride
    lens = np.minimum(starts + width, n[row_idx]) - starts
    out_off = np.concatenate([[0], np.cumsum(lens)])
    base = off[row_idx] + starts
    take_idx = (
        np.arange(out_off[-1], dtype=np.int64)
        - np.repeat(out_off[:-1], lens)
        + np.repeat(base, lens)
    )
    la = pa.ListArray.from_arrays(
        pa.array(out_off, type=pa.int32()), flat.take(pa.array(take_idx))
    )
    return row_idx, ord_, lens, pc.binary_join(la, " ")


def _one_chunk(batch: pa.Table, name: str):
    c = batch.column(name)
    return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c


def chunk_docs(batch: pa.Table) -> pa.Table:
    """doc -> overlapping training chunks of CHUNK_W words, stride
    CHUNK_STRIDE (tail windows may be short; all are emitted)."""
    row_idx, ord_, lens, chunks = word_windows(
        _one_chunk(batch, "text"), CHUNK_W, CHUNK_STRIDE
    )
    return pa.table(
        {
            "doc_id": _one_chunk(batch, "doc_id").take(pa.array(row_idx)),
            "chunk_id": pa.array(ord_, type=pa.int64()),
            "chunk_text": chunks,
            "n_words": pa.array(lens, type=pa.int64()),
        }
    )


NGRAM_K = 13  # GPT-3-style decontamination n-gram size (shared with oracle)


def _word_ngrams(texts: "pa.ChunkedArray | pa.Array", k: int):
    """Vectorized word n-grams for a WHOLE batch: split once, then build
    every n-gram string with ONE ``binary_join_element_wise`` over k
    shifted slices of the flat word array — no per-document Python. Grams
    that would cross a document boundary are masked out via the list
    offsets. Returns (grams StringArray over valid positions, row index of
    each valid gram, n_valid_grams per row)."""
    words = pc.split_pattern(texts, " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    n = len(words)
    offs = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = words.flatten()
    total = len(flat)
    n_per_row = np.diff(offs)
    n_valid = np.maximum(n_per_row - (k - 1), 0)
    if total < k:
        return pa.array([], type=pa.string()), np.empty(0, np.int64), n_valid
    parts = [flat.slice(j, total - k + 1) for j in range(k)]
    grams_all = pc.binary_join_element_wise(*parts, " ")  # one per start pos
    starts = np.arange(total - k + 1, dtype=np.int64)
    row_of = np.repeat(np.arange(n, dtype=np.int64), n_per_row)
    valid = row_of[starts] == row_of[starts + k - 1]
    grams = grams_all.filter(pa.array(valid))
    return grams, row_of[starts][valid], n_valid


def q_corpus_contamination_ngram(sf_dir: str):
    """Exact 13-gram decontamination screen (the GPT-3 recipe): a document
    is contaminated when any of its word 13-grams appears verbatim in the
    benchmark docs (doc_id < BENCH_DOC_MAX). The benchmark gram set is
    built once driver-side from a filter-pushdown read and broadcast; each
    batch builds ALL its grams with one vectorized join kernel and probes
    them with one ``pc.is_in`` — exact strings, no hash-collision caveat,
    so the SQL oracle matches bit-for-bit. Pure map, no shuffle."""
    import ray
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from .sources import get_broadcast

    bench_tbl = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["text"],
        filters=pads.field("doc_id") < BENCH_DOC_MAX,
    )
    bench_grams, _, _ = _word_ngrams(bench_tbl["text"], NGRAM_K)
    ref = ray.put(pc.unique(bench_grams))

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        bench = get_broadcast(ref)
        n = batch.num_rows
        grams, row_of, n_valid = _word_ngrams(batch["text"], NGRAM_K)
        hit = pc.is_in(grams, value_set=bench).to_numpy(zero_copy_only=False)
        n_cont = np.zeros(n, dtype=np.int64)
        np.add.at(n_cont, row_of, hit.astype(np.int64))
        return pa.Table.from_arrays(
            [
                batch["doc_id"],
                pa.array(n_valid.astype(np.int64)),
                pa.array(n_cont),
                pa.array(n_cont > 0),
            ],
            names=["doc_id", "n_grams", "n_contaminated", "is_contaminated"],
        )

    return docs.map_batches(score, batch_format="pyarrow")


def q_corpus_chunk(sf_dir: str):
    """Fixed-window training chunking with overlap (W=32 words, stride
    24): each document becomes ceil(n_words/stride) chunks, consecutive
    chunks sharing W-stride words — the standard long-document -> LLM
    context-window preparation step. Pure streaming flat-map (one
    ``map_batches``, no shuffle, no state); output rows carry
    (doc_id, chunk_id, chunk_text, n_words) so a downstream tokenizer
    or packer can run without re-reading the corpus. Reference analog:
    the page-window fan-out of one item into ordered per-page rows
    (ReorderFiles.kt:311-326)."""
    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        chunk_docs, batch_format="pyarrow"
    )


def q_text_seg_dedup(sf_dir: str):
    """C4-style boilerplate removal, exact at segment granularity: split
    every document into aligned non-overlapping SEG_W-word segments,
    find segments occurring in >= SEG_DUP_MIN_DOCS distinct documents,
    and rebuild each document from its non-boilerplate segments.

    Shape at scale: pass A is combiner-first — each batch emits one row
    per (segment, distinct-doc-count-in-batch), valid because a doc
    lives in exactly one batch, so the global ``groupby(seg).sum`` is
    an exact distinct-doc count; only the duplicated tail (empirically
    ~5-8%% of unique segments on this corpus, and bounded by true
    boilerplate on a real one) is collected and broadcast once with
    ``ray.put``. Pass B is a pure map: re-explode, vectorized ``is_in``
    against the broadcast set, vectorized per-row rebuild. At 100 TB the
    broadcast set swaps for this module's bloom filter (bloom_build /
    bloom_probe) with an identical pass structure."""
    import ray
    import pandas as pd
    from .sources import get_broadcast

    SEG_BUCKETS = 64

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def seg_partial(batch: pa.Table) -> pa.Table:
        row_idx, _, _, segs = word_windows(_one_chunk(batch, "text"), SEG_W, SEG_W)
        t = pa.table(
            {
                "seg": segs,
                "doc_id": _one_chunk(batch, "doc_id").take(pa.array(row_idx)),
            }
        )
        t = (
            t.group_by("seg")
            .aggregate([("doc_id", "count_distinct")])
            .rename_columns(["seg", "nd"])
        )
        # bucketed shuffle key: a groupby over ~unique-segment-count
        # string groups is the sort-aggregate trap; 64 hash buckets keep
        # the all-to-all coarse (same pattern as merge.add_bucket)
        h = pd.util.hash_array(
            np.asarray(t["seg"].to_pandas(), dtype=object), categorize=False
        )
        return t.append_column(
            "_sb", pa.array((h % np.uint64(SEG_BUCKETS)).astype(np.int64))
        )

    def bucket_dups(g: pa.Table) -> pa.Table:
        pl = _pl()

        return (
            pl.from_arrow(g)
            .group_by("seg")
            .agg(pl.col("nd").sum().alias("n_docs"))
            .filter(pl.col("n_docs") >= SEG_DUP_MIN_DOCS)
            .select("seg")
            .to_arrow()
        )

    dup = (
        docs.map_batches(seg_partial, batch_format="pyarrow")
        .groupby("_sb")
        .map_groups(bucket_dups, batch_format="pyarrow")
    )
    # empty blocks surface as zero-column tables — drop them before concat
    dup_tbls = [t for t in (ray.get(r) for r in dup.to_arrow_refs()) if t.num_columns]
    dup_segs = (
        pc.cast(pa.concat_tables(dup_tbls)["seg"].combine_chunks(), pa.string())
        if dup_tbls
        else pa.array([], pa.string())
    )
    ref = ray.put(dup_segs)

    def clean(batch: pa.Table) -> pa.Table:
        dupset = get_broadcast(ref)
        row_idx, _, _, segs = word_windows(_one_chunk(batch, "text"), SEG_W, SEG_W)
        keep = pc.invert(pc.is_in(segs, value_set=dupset))
        keep_np = keep.to_numpy(zero_copy_only=False)
        n_rows = batch.num_rows
        n_segs = np.bincount(row_idx, minlength=n_rows).astype(np.int64)
        n_kept = np.bincount(row_idx[keep_np], minlength=n_rows).astype(np.int64)
        out_off = np.concatenate([[0], np.cumsum(n_kept)])
        la = pa.ListArray.from_arrays(
            pa.array(out_off, type=pa.int32()), segs.filter(keep)
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "clean_text": pc.binary_join(la, " "),
                "n_segments": pa.array(n_segs),
                "n_removed": pa.array(n_segs - n_kept),
            }
        )

    return docs.map_batches(clean, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

SQL = {
    "corpus_split": f"""
        SELECT doc_id,
               {_lehmer_sql('doc_id')} AS bucket,
               CASE WHEN {_lehmer_sql('doc_id')} < {TRAIN_PCT} THEN 'train'
                    WHEN {_lehmer_sql('doc_id')} < {VALID_PCT} THEN 'valid'
                    ELSE 'test' END AS split
        FROM documents""",
    "text_redact": f"""
        WITH s1 AS (
          SELECT doc_id,
                 regexp_replace(text, '{REDACT_TERMS}', '<REDACTED>', 'g') AS t1,
                 CAST(len(regexp_extract_all(text, '{REDACT_TERMS}')) AS BIGINT) AS n1
          FROM documents)
        SELECT doc_id,
               regexp_replace(t1, '{REDACT_DIGITS}', '<NUM>', 'g') AS redacted,
               n1 + CAST(len(regexp_extract_all(t1, '{REDACT_DIGITS}')) AS BIGINT)
                   AS n_redactions
        FROM s1""",
    "corpus_mixture": f"""
        SELECT doc_id, source
        FROM documents
        WHERE {_mixture_pred()}""",
    "corpus_sample": f"""
        SELECT doc_id,
               row_number() OVER (
                 ORDER BY (doc_id * {LEHMER_A}) % {LEHMER_M}, doc_id
               ) AS sample_rank
        FROM documents
        ORDER BY (doc_id * {LEHMER_A}) % {LEHMER_M}, doc_id
        LIMIT {SAMPLE_K}""",
    "semi_join_bloom": """
        SELECT DISTINCT e.user_id
        FROM events e
        WHERE e.user_id IN (SELECT s_suppkey FROM supplier)""",
    "corpus_sample_stratified": f"""
        WITH r AS (
          SELECT source, doc_id,
                 row_number() OVER (
                   PARTITION BY source
                   ORDER BY (doc_id * {LEHMER_A}) % {LEHMER_M}, doc_id
                 ) AS rnk
          FROM documents)
        SELECT source, doc_id, rnk FROM r WHERE rnk <= {STRAT_K}""",
    "corpus_shuffle_shards": f"""
        SELECT {_lehmer_sql('doc_id', N_SHARDS)} AS shard,
               doc_id,
               row_number() OVER (
                 PARTITION BY {_lehmer_sql('doc_id', N_SHARDS)}
                 ORDER BY ((doc_id + {SHUFFLE_SEED}) * {LEHMER_A}) % {LEHMER_M},
                          doc_id
               ) AS shuffle_rank
        FROM documents""",
    "corpus_pack_sequences": f"""
        WITH t AS (
          SELECT doc_id, source,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          FROM documents),
        c AS (
          SELECT *,
                 COALESCE(sum(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS prev
          FROM t)
        SELECT doc_id, source, n_tokens,
               CAST(prev // {PACK_BUDGET} AS BIGINT) AS seq_id
        FROM c""",
    "corpus_recipe": f"""
        WITH kept AS (
          SELECT doc_id, source, text FROM documents
          WHERE {_mixture_pred()}),
        red AS (
          SELECT doc_id, source,
                 regexp_replace(
                   regexp_replace(text, '{REDACT_TERMS}', '<REDACTED>', 'g'),
                   '{REDACT_DIGITS}', '<NUM>', 'g') AS redacted
          FROM kept),
        ded AS (
          SELECT doc_id, source,
                 row_number() OVER (PARTITION BY redacted ORDER BY doc_id) AS rn
          FROM red)
        SELECT doc_id, source,
               CASE WHEN {_lehmer_sql('doc_id')} < {TRAIN_PCT} THEN 'train'
                    WHEN {_lehmer_sql('doc_id')} < {VALID_PCT} THEN 'valid'
                    ELSE 'test' END AS split
        FROM ded WHERE rn = 1""",
    "corpus_funnel": f"""
        WITH red AS (
          SELECT doc_id,
                 regexp_replace(
                   regexp_replace(text, '{REDACT_TERMS}', '<REDACTED>', 'g'),
                   '{REDACT_DIGITS}', '<NUM>', 'g') AS redacted
          FROM documents
          WHERE {_mixture_pred()}),
        grp AS (
          SELECT min(doc_id) AS win, CAST(count(*) AS BIGINT) AS n
          FROM red GROUP BY redacted)
        SELECT 'input' AS stage, CAST(count(*) AS BIGINT) AS n_rows
          FROM documents
        UNION ALL
        SELECT 'mixture', CAST(COALESCE(sum(n), 0) AS BIGINT) FROM grp
        UNION ALL
        SELECT 'dedup', CAST(count(*) AS BIGINT) FROM grp
        UNION ALL
        SELECT 'train', CAST(COALESCE(sum(
          CASE WHEN {_lehmer_sql('win')} < {TRAIN_PCT} THEN 1 ELSE 0 END
        ), 0) AS BIGINT) FROM grp
        UNION ALL
        SELECT 'valid', CAST(COALESCE(sum(
          CASE WHEN {_lehmer_sql('win')} >= {TRAIN_PCT}
                AND {_lehmer_sql('win')} < {VALID_PCT} THEN 1 ELSE 0 END
        ), 0) AS BIGINT) FROM grp
        UNION ALL
        SELECT 'test', CAST(COALESCE(sum(
          CASE WHEN {_lehmer_sql('win')} >= {VALID_PCT} THEN 1 ELSE 0 END
        ), 0) AS BIGINT) FROM grp""",
    "corpus_mixture_weights": f"""
        WITH c AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY source),
        t AS (SELECT sum(pow(n_docs, {MIXTURE_ALPHA})) AS z FROM c)
        SELECT source, n_docs,
               CAST(round(1000000 * pow(n_docs, {MIXTURE_ALPHA}) / z)
                    AS BIGINT) AS weight_ppm,
               CAST(round({MIXTURE_QUOTA} * pow(n_docs, {MIXTURE_ALPHA}) / z)
                    AS BIGINT) AS quota_docs
        FROM c, t""",
    "corpus_chunk": f"""
        WITH w AS (
          SELECT doc_id, string_split(text, ' ') AS words FROM documents)
        SELECT doc_id,
               CAST(start // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
               array_to_string(
                 words[start + 1 : least(start + {CHUNK_W}, len(words))], ' '
               ) AS chunk_text,
               CAST(least(start + {CHUNK_W}, len(words)) - start AS BIGINT)
                   AS n_words
        FROM w, unnest(range(0, len(words), {CHUNK_STRIDE})) AS t(start)""",
    "text_seg_dedup": f"""
        WITH w AS (
          SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        segs AS (
          SELECT doc_id, start,
                 array_to_string(
                   words[start + 1 : least(start + {SEG_W}, len(words))], ' '
                 ) AS seg
          FROM w, unnest(range(0, len(words), {SEG_W})) AS t(start)),
        dup AS (
          SELECT seg FROM segs
          GROUP BY seg
          HAVING count(DISTINCT doc_id) >= {SEG_DUP_MIN_DOCS})
        SELECT s.doc_id,
               COALESCE(
                 string_agg(s.seg, ' ' ORDER BY s.start)
                   FILTER (WHERE d.seg IS NULL), '') AS clean_text,
               CAST(count(*) AS BIGINT) AS n_segments,
               CAST(count(d.seg) AS BIGINT) AS n_removed
        FROM segs s LEFT JOIN dup d USING (seg)
        GROUP BY s.doc_id""",
    # word 13-grams via list slices; positions come from a per-row
    # generate_series, so the oracle is unbounded exactly like the engine
    "corpus_contamination_ngram": f"""
        WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        pos AS (
          SELECT doc_id,
                 array_to_string(w[i+1:i+{NGRAM_K}], ' ') AS g
          FROM (SELECT doc_id, w,
                       unnest(generate_series(0, len(w) - {NGRAM_K})) AS i
                FROM words WHERE len(w) >= {NGRAM_K})),
        bench AS (SELECT DISTINCT g FROM pos WHERE doc_id < {BENCH_DOC_MAX}),
        scored AS (
          SELECT p.doc_id, count(*) AS n_grams,
                 count(*) FILTER (p.g IN (SELECT g FROM bench)) AS n_contaminated
          FROM pos p GROUP BY p.doc_id)
        SELECT w.doc_id,
               CAST(COALESCE(s.n_grams, 0) AS BIGINT) AS n_grams,
               CAST(COALESCE(s.n_contaminated, 0) AS BIGINT) AS n_contaminated,
               COALESCE(s.n_contaminated, 0) > 0 AS is_contaminated
        FROM words w LEFT JOIN scored s USING(doc_id)""",
    "corpus_contamination": f"""
        WITH bench AS (
          SELECT DISTINCT unnest(string_split(text, ' ')) AS term
          FROM documents WHERE doc_id < {BENCH_DOC_MAX}),
        d AS (
          SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
          FROM documents)
        SELECT d.doc_id,
               CAST(count(*) AS BIGINT) AS n_distinct,
               CAST(sum(CASE WHEN b.term IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hit,
               CAST(sum(CASE WHEN b.term IS NOT NULL THEN 1 ELSE 0 END)
                    AS DOUBLE) / greatest(count(*), 1) AS contamination
        FROM d LEFT JOIN bench b USING (term)
        GROUP BY d.doc_id""",
}


def registry():
    queries = {
        "corpus_split": q_corpus_split,
        "text_redact": q_text_redact,
        "corpus_mixture": q_corpus_mixture,
        "corpus_sample": q_corpus_sample,
        "corpus_sample_stratified": q_corpus_sample_stratified,
        "corpus_pack_sequences": q_corpus_pack_sequences,
        "corpus_shuffle_shards": q_corpus_shuffle_shards,
        "corpus_funnel": q_corpus_funnel,
        "corpus_mixture_weights": q_corpus_mixture_weights,
        "semi_join_bloom": q_semi_join_bloom,
        "corpus_contamination": q_corpus_contamination,
        "corpus_contamination_ngram": q_corpus_contamination_ngram,
        "corpus_chunk": q_corpus_chunk,
        "text_seg_dedup": q_text_seg_dedup,
        "corpus_recipe": q_corpus_recipe,
        "sketch_cms_counts": q_sketch_cms_counts,
    }
    return queries, dict(SQL)
