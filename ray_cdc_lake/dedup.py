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
from .kernels import md5_hex, md5_hex_prefix
from .kernels import import_polars as _pl
from .similarity import embedding_matrix
from .sources import read_table

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

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(corpus_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# exact dedup: hash -> bucket shuffle of (hash, id) pairs only
# ---------------------------------------------------------------------------


def q_dedup_exact(sf_dir: str):
    from ray.data.aggregate import Min, Sum

    ds = corpus_ds(sf_dir)

    def hash_and_partial(batch: pa.Table) -> pa.Table:
        pl = _pl()

        t = pa.Table.from_arrays(
            [md5_hex(batch["text"]), batch["doc_id"]],
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


NUM_PAIR_BUCKETS = 128  # coarse shuffle key: many band_keys per group


class _WordHashCache:
    """Shared per-actor vocabulary cache: word -> stable 64-bit hash
    (md5-derived). Natural text is Zipfian, so after warmup nearly every
    word is a dict hit instead of an md5 call — the one-time-state-per-
    actor pattern of SURVEY.md §2.3."""

    MAX_ENTRIES = 1_000_000  # ~100 MB ceiling; open vocabularies (ids,
    # typo-heavy web text) would otherwise grow the worker without bound

    def __init__(self):
        self.cache: dict[str, int] = {}

    def hashes(self, words: list[str]) -> np.ndarray:
        c = self.cache
        if len(c) > self.MAX_ENTRIES:
            c.clear()  # cheap full reset; hashes are pure so only a perf hit
        out = np.empty(len(words), dtype=np.uint64)
        for i, w in enumerate(words):
            h = c.get(w)
            if h is None:
                h = int.from_bytes(hashlib.md5(w.encode("utf-8")).digest()[:8], "little")
                c[w] = h
            out[i] = h
        return out


_P1 = np.uint64(1_000_003)
_P2 = _P1 * _P1  # wraps mod 2^64 — fine, deterministic


def _gram_hashes(wh: np.ndarray, k: int = 3) -> np.ndarray:
    """Word k-gram hashes as a polynomial combine of word hashes —
    vectorized (no per-gram digest); general in k (the k=3 path is the
    unrolled common case)."""
    if len(wh) < k:
        # order-sensitive polynomial over ALL words (a sum would make any
        # permutation of a short document hash identically)
        h = np.uint64(0)
        for x in wh:
            h = h * _P1 + np.uint64(x)
        return np.array([h], dtype=np.uint64)
    if k == 3:
        return wh[:-2] * _P2 + wh[1:-1] * _P1 + wh[2:]
    m = len(wh) - k + 1
    out = np.zeros(m, dtype=np.uint64)
    for i in range(k):  # k summands, each a vectorized slice
        out = out * _P1 + wh[i : m + i]
    return out


def minhash_signature(text: str, _cache: _WordHashCache | None = None) -> np.ndarray:
    cache = _cache or _WordHashCache()
    g = _gram_hashes(cache.hashes(text.split(" ")))
    prod = g[None, :] * _A[:, None] + _B[:, None]  # wraps mod 2^64
    return prod.min(axis=1)


def _band_keys(sigs: np.ndarray, bands: int, rows: int):
    """Vectorized band keys for a (n, bands*rows) uint64 signature matrix:
    FNV-style fold of each band's row values + a band-index salt, then a
    murmur-like finalizer. Collisions (~2^-64) only ADD candidate pairs,
    which the group-local verification filters — never lose one. Returns
    (key int64 (n*bands,), coarse shuffle bucket int64 (n*bands,))."""
    n = sigs.shape[0]
    r = sigs.reshape(n, bands, rows)
    h = np.zeros((n, bands), dtype=np.uint64)
    for k in range(rows):  # `rows` summands, each vectorized
        h = h * np.uint64(0x100000001B3) + r[:, :, k]
    h ^= np.arange(bands, dtype=np.uint64)[None, :] * np.uint64(0x9E3779B97F4A7C15)
    h ^= h >> np.uint64(33)
    h = h * np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    key = h.reshape(-1)
    bucket = (key % np.uint64(NUM_PAIR_BUCKETS)).astype(np.int64)
    return key.view(np.int64), bucket


class MinHashLSH:
    """Actor-pool stage: signature + band explosion. One row per
    (doc, band): band_key (exact bucket id) + coarse ``bucket`` column so
    the downstream groupby shuffles into O(NUM_PAIR_BUCKETS) groups, not
    one group per band_key (millions of tiny groups drown the scheduler
    at scale). The signature travels with the row so candidate
    verification is group-local — no second join."""

    def __init__(self):
        self.words = _WordHashCache()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"].to_pylist()
        n = len(ids)
        sigs = np.empty((n, NUM_HASHES), dtype=np.uint64)
        for i, t in enumerate(texts):  # per-doc shingling is inherent
            sigs[i] = minhash_signature(t, self.words)
        key, bucket = _band_keys(sigs, BANDS, ROWS_PER_BAND)
        # the full signature travels with each band row as one fixed-size
        # list buffer (same bytes as the old binary blob, no per-row objects)
        sig_col = pa.FixedSizeListArray.from_arrays(
            pa.array(np.repeat(sigs, BANDS, axis=0).reshape(-1)), NUM_HASHES
        )
        return pa.Table.from_arrays(
            [
                pa.array(key),
                pa.array(bucket),
                pa.array(np.repeat(ids, BANDS)),
                sig_col,
            ],
            names=["band_key", "bucket", "doc_id", "sig"],
        )


_POPCOUNT = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _runs(sorted_keys: np.ndarray) -> list[tuple[int, int]]:
    """[start, end) index ranges of equal-key runs in a sorted array."""
    if len(sorted_keys) == 0:
        return []
    change = np.nonzero(sorted_keys[1:] != sorted_keys[:-1])[0] + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [len(sorted_keys)]))
    return list(zip(starts, ends))


# Per-run verify cap: pairwise triangles are built over at most this many
# DISTINCT signatures at a time, so one degenerate band bucket (e.g. an
# all-identical-text corpus puts every doc in the same bucket on every
# band) can never allocate an O(u^2) index array in a single task.
# Identical-signature docs are collapsed to a representative FIRST (star
# pairs, below), so the cap only bites when one band key collects more
# than RUN_VERIFY_CAP genuinely distinct signatures; those are verified
# in signature-sorted chunks and cross-chunk pairs of the SAME band are
# forfeited deterministically — the other bands still offer those pairs
# their own buckets.
RUN_VERIFY_CAP = 1024
# simhash compares one u64 per doc (no (pairs x hashes) matrix), so its
# triangle is ~16x cheaper per pair and the cap can sit higher
SIMHASH_RUN_CAP = 4096


def _log_overcap(kernel: str, v: int, cap: int) -> None:
    """One warning per over-cap band run: chunked verification forfeits
    cross-chunk pairs of THIS band (other bands still offer them their
    own buckets), and that recall trade must show up in worker logs
    rather than pass silently."""
    import logging

    logging.getLogger(__name__).warning(
        "%s band run holds %d distinct signatures (> cap %d): verifying "
        "in signature-sorted chunks; cross-chunk pairs of this band are "
        "forfeited deterministically",
        kernel,
        v,
        cap,
    )


def _identity_star(uids: np.ndarray, inv: np.ndarray):
    """Collapse identical-signature docs inside one equal-band-key run.

    ``uids`` is ascending; ``inv[i]`` is the identity-group id of
    ``uids[i]`` (docs with byte-identical signatures share a group).
    Returns ``(rep_idx, star_rep, star_member)``: per-group index (into
    ``uids``) of its smallest-id member, plus star pairs linking that
    representative to every OTHER member.  A g-member identity group
    thus contributes g-1 pairs instead of g(g-1)/2 — the degenerate
    100%-duplicate corpus costs Theta(u), not Theta(u^2), and connected
    components over the star equal those over the full clique."""
    order = np.argsort(inv, kind="stable")
    g = inv[order]
    change = np.nonzero(g[1:] != g[:-1])[0] + 1
    starts = np.concatenate(([0], change))
    counts = np.diff(np.concatenate((starts, [len(g)])))
    rep_idx = order[starts]  # stable + uids ascending => min id per group
    rep_of = np.repeat(rep_idx, counts)
    m = order != rep_of
    return rep_idx, rep_of[m], order[m]


_MINHASH_WORKER: MinHashLSH | None = None


def minhash_lsh_fn(batch: pa.Table) -> pa.Table:
    """Stateless-task form of MinHashLSH: the word-hash cache lives in a
    module global, i.e. once per WORKER PROCESS (Ray reuses workers), so
    no actor-pool startup is paid while the cache still persists across
    batches. Use the MinHashLSH class with concurrency=N when explicit
    pool sizing matters more than task flexibility."""
    global _MINHASH_WORKER
    if _MINHASH_WORKER is None:
        _MINHASH_WORKER = MinHashLSH()
    return _MINHASH_WORKER(batch)


def q_dedup_minhash(sf_dir: str, threshold: float = 0.5):
    """Banded MinHash-LSH near-dup pairs.  Pair semantics: docs with
    byte-identical signatures link through their group's smallest-id
    representative (star, est 1.0) rather than as a full clique — same
    connected components, Theta(dups) instead of Theta(dups^2) output
    and memory under duplicate skew; pairs between DISTINCT signatures
    are verified exhaustively up to RUN_VERIFY_CAP per band run."""
    ds = corpus_ds(sf_dir).map_batches(minhash_lsh_fn, batch_format="pyarrow")
    pairs = ds.groupby("bucket").map_groups(
        minhash_pairs_kernel(threshold), batch_format="pyarrow"
    )
    return _dedup_pairs(pairs)


def minhash_pairs_kernel(threshold: float):
    """Group kernel for the banded-LSH pair verify (factored out so the
    degenerate-skew property suite can drive it on synthetic band
    tables): star-collapse identical signatures, then capped pairwise
    triangles over distinct ones."""

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        keys = group["band_key"].to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        keys = keys[order]
        ids = group["doc_id"].to_numpy(zero_copy_only=False)[order]
        sc = group["sig"]
        if isinstance(sc, pa.ChunkedArray):
            sc = sc.combine_chunks()
        sig_all = (
            sc.flatten().to_numpy(zero_copy_only=False).reshape(len(sc), NUM_HASHES)
        )[order]
        out_a, out_b, out_j = [], [], []
        for s, e in _runs(keys):
            if e - s < 2:
                continue
            uids, first = np.unique(ids[s:e], return_index=True)
            u = len(uids)
            if u < 2:
                continue
            sig = sig_all[s:e][first]
            # 1) collapse byte-identical signatures: star pairs (rep ->
            #    member, est exactly 1.0) bound the duplicate-heavy case
            #    to Theta(u) — a member's pairs route through its rep
            _, inv = np.unique(sig, axis=0, return_inverse=True)
            rep_idx, sa, sb = _identity_star(uids, inv)
            if len(sa):
                out_a.append(uids[sa])
                out_b.append(uids[sb])
                out_j.append(np.ones(len(sa), dtype=np.float64))
            # 2) pairwise agreement between DISTINCT signatures only, in
            #    capped chunks (signature-lex order keeps similar sigs
            #    adjacent, so an over-cap run degrades gracefully)
            v = len(rep_idx)
            if v > RUN_VERIFY_CAP:
                # forfeited cross-chunk pairs must be OBSERVABLE, not a
                # silent recall cliff — the worker log names the run
                _log_overcap("minhash", v, RUN_VERIFY_CAP)
            rsig = sig[rep_idx]
            ruid = uids[rep_idx]
            for c0 in range(0, v, RUN_VERIFY_CAP):
                c1 = min(c0 + RUN_VERIFY_CAP, v)
                if c1 - c0 < 2:
                    continue
                iu, ju = np.triu_indices(c1 - c0, k=1)
                est = (rsig[c0:c1][iu] == rsig[c0:c1][ju]).mean(axis=1)
                hit = est >= threshold
                ra, rb = ruid[c0:c1][iu[hit]], ruid[c0:c1][ju[hit]]
                out_a.append(np.minimum(ra, rb))
                out_b.append(np.maximum(ra, rb))
                out_j.append(est[hit])
        a = np.concatenate(out_a) if out_a else np.empty(0, dtype=np.int64)
        b = np.concatenate(out_b) if out_b else np.empty(0, dtype=np.int64)
        j = np.concatenate(out_j) if out_j else np.empty(0, dtype=np.float64)
        return pa.Table.from_arrays(
            [
                pa.array(a.astype(np.int64)),
                pa.array(b.astype(np.int64)),
                pa.array(j.astype(np.float64)),
            ],
            names=["id_a", "id_b", "jaccard_est"],
        )

    return pairs_in_bucket


def _dedup_pairs(pairs, num_buckets: int = 64):
    """A pair can surface from several bands with identical payload — keep
    one row per (id_a, id_b). Bucketed by id_a hash, polars unique inside."""

    def add_pb(batch: pa.Table) -> pa.Table:
        ida = batch["id_a"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "pair_bucket", pa.array((ida * 2654435761 % num_buckets).astype(np.int64))
        )

    def uniq(group: pa.Table) -> pa.Table:
        pl = _pl()

        return (
            pl.from_arrow(group.drop_columns(["pair_bucket"]))
            .unique(subset=["id_a", "id_b"], keep="any", maintain_order=False)
            .sort(["id_a", "id_b"])
            .to_arrow()
        )

    return pairs.map_batches(add_pb, batch_format="pyarrow").groupby(
        "pair_bucket"
    ).map_groups(uniq, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------


_BITS64 = np.arange(64, dtype=np.uint64)


def _simhash64(words_cache: _WordHashCache, text: str) -> int:
    """Vectorized simhash: bit matrix of cached word hashes, +/-1 vote sum."""
    ws = list(set(text.split(" ")))
    hs = words_cache.hashes(ws)
    bits = ((hs[:, None] >> _BITS64[None, :]) & np.uint64(1)).astype(np.int64)
    acc = (2 * bits - 1).sum(axis=0)
    return int(((acc > 0).astype(np.uint64) << _BITS64).sum(dtype=np.uint64))


def simhash64(text: str) -> int:
    return _simhash64(_WordHashCache(), text)


class SimHashBands:
    """Actor-pool stage: simhash + 4x16-bit band explosion (hamming<=3 =>
    pigeonhole guarantees one equal band). Emits the coarse ``bucket``
    column like MinHashLSH so the groupby stays O(NUM_PAIR_BUCKETS)."""

    def __init__(self):
        self.words = _WordHashCache()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"].to_pylist()
        n = len(ids)
        hs = np.empty(n, dtype=np.uint64)
        for i, t in enumerate(texts):  # per-doc word hashing is inherent
            hs[i] = _simhash64(self.words, t)
        # vectorized 4x16-bit band explosion: key = band_idx<<16 | band bits
        b_idx = np.arange(4, dtype=np.uint64)
        bandv = (hs[:, None] >> (np.uint64(16) * b_idx[None, :])) & np.uint64(0xFFFF)
        key = ((b_idx[None, :] << np.uint64(16)) | bandv).reshape(-1)
        bucket = (
            (b_idx[None, :] * np.uint64(65536) + bandv).reshape(-1)
            % np.uint64(NUM_PAIR_BUCKETS)
        ).astype(np.int64)
        return pa.Table.from_arrays(
            [
                pa.array(key.view(np.int64)),
                pa.array(bucket),
                pa.array(np.repeat(ids, 4)),
                pa.array(np.repeat(hs, 4)),
            ],
            names=["band_key", "bucket", "doc_id", "simhash"],
        )


_SIMHASH_WORKER: SimHashBands | None = None


def simhash_bands_fn(batch: pa.Table) -> pa.Table:
    """Stateless-task form of SimHashBands (worker-local cache, see
    minhash_lsh_fn)."""
    global _SIMHASH_WORKER
    if _SIMHASH_WORKER is None:
        _SIMHASH_WORKER = SimHashBands()
    return _SIMHASH_WORKER(batch)


def q_dedup_simhash(sf_dir: str, max_hamming: int = 3):
    """4x16-bit banded SimHash near-dup pairs.  Same bounded pair
    semantics as q_dedup_minhash: equal-hash docs star through their
    smallest-id representative (hamming 0), distinct hashes verify in
    SIMHASH_RUN_CAP-sized chunks."""
    ds = corpus_ds(sf_dir).map_batches(simhash_bands_fn, batch_format="pyarrow")
    pairs = ds.groupby("bucket").map_groups(
        simhash_pairs_kernel(max_hamming), batch_format="pyarrow"
    )
    return _dedup_pairs(pairs)


def simhash_pairs_kernel(max_hamming: int):
    """Group kernel for the simhash band verify (factored out for the
    degenerate-skew property suite, like minhash_pairs_kernel)."""

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        keys = group["band_key"].to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        keys = keys[order]
        ids = group["doc_id"].to_numpy(zero_copy_only=False)[order]
        hashes = (
            group["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)[order]
        )
        out_a, out_b, out_d = [], [], []
        for s_, e_ in _runs(keys):
            if e_ - s_ < 2:
                continue
            uids, first = np.unique(ids[s_:e_], return_index=True)
            u = len(uids)
            if u < 2:
                continue
            h = hashes[s_:e_][first]
            # same bounded shape as the minhash kernel: equal-hash docs
            # collapse to star pairs (hamming 0), then the pairwise XOR
            # popcount triangle runs over DISTINCT hashes in capped,
            # value-sorted chunks
            _, inv = np.unique(h, return_inverse=True)
            rep_idx, sa, sb = _identity_star(uids, inv)
            if len(sa):
                out_a.append(uids[sa])
                out_b.append(uids[sb])
                out_d.append(np.zeros(len(sa), dtype=np.int64))
            v = len(rep_idx)
            if v > SIMHASH_RUN_CAP:
                _log_overcap("simhash", v, SIMHASH_RUN_CAP)
            rh = h[rep_idx]
            ruid = uids[rep_idx]
            for c0 in range(0, v, SIMHASH_RUN_CAP):
                c1 = min(c0 + SIMHASH_RUN_CAP, v)
                if c1 - c0 < 2:
                    continue
                iu, ju = np.triu_indices(c1 - c0, k=1)
                x = (rh[c0:c1][iu] ^ rh[c0:c1][ju]).view(np.uint8).reshape(-1, 8)
                hd = _POPCOUNT[x].sum(axis=1).astype(np.int64)
                hit = hd <= max_hamming
                ra, rb = ruid[c0:c1][iu[hit]], ruid[c0:c1][ju[hit]]
                out_a.append(np.minimum(ra, rb))
                out_b.append(np.maximum(ra, rb))
                out_d.append(hd[hit])
        a = np.concatenate(out_a) if out_a else np.empty(0, dtype=np.int64)
        b = np.concatenate(out_b) if out_b else np.empty(0, dtype=np.int64)
        d = np.concatenate(out_d) if out_d else np.empty(0, dtype=np.int64)
        return pa.Table.from_arrays(
            [
                pa.array(a.astype(np.int64)),
                pa.array(b.astype(np.int64)),
                pa.array(d.astype(np.int64)),
            ],
            names=["id_a", "id_b", "hamming"],
        )

    return pairs_in_bucket


# ---------------------------------------------------------------------------
# exact n-gram Jaccard on the planted near-dup pairs (SQL-checkable)
# ---------------------------------------------------------------------------


def q_dedup_ngram_jaccard(sf_dir: str):
    """Exact word-trigram Jaccard for each planted (orig, orig+1M) pair.
    Sort-merge-free: the pair is formed inside one batch (same source row),
    so this is a pure map — the verification kernel of the LSH pipeline,
    isolated and oracle-checked."""
    import ray.data as rd

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

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


# Hard cap on the brute-force near-dup baseline: above this the broadcast
# matrix + all-pairs matmul (O(N) driver memory, O(N^2) compute) is a
# scale-killer, and the caller must use the banded-LSH path instead.
DEDUP_EMBEDDING_MAX_ROWS = 200_000


def q_dedup_embedding(sf_dir: str, threshold: float = 0.45):
    """Embedding near-dup pairs (cosine >= threshold), brute-force within
    blocks against a broadcast matrix (the small-side-broadcast join shape;
    the at-scale path is the LSH/IVF variant in similarity.py). Cosine in
    float64 to match DuckDB's list_cosine_similarity.

    GUARDED recall baseline: refuses inputs above DEDUP_EMBEDDING_MAX_ROWS
    rows with a pointer at ``dedup_embedding_lsh`` — never ship this as the
    production dedup."""
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids_all = tbl["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(ids_all) > DEDUP_EMBEDDING_MAX_ROWS:
        raise ValueError(
            f"dedup_embedding is the O(N^2) brute-force recall baseline and "
            f"refuses {len(ids_all):,} rows (cap {DEDUP_EMBEDDING_MAX_ROWS:,}). "
            "Use dedup_embedding_lsh (banded hyperplane LSH) or knn_ivf_pq "
            "for at-scale near-duplicate detection."
        )
    mat = embedding_matrix(tbl["embedding"])
    mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ref = ray.put((ids_all, mat_n))

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    from .sources import get_broadcast

    def near_dup(batch: pa.Table) -> pa.Table:
        ids_b, mat_b = get_broadcast(ref)  # once per worker process
        bids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bm = embedding_matrix(batch["embedding"])
        bm = bm / np.linalg.norm(bm, axis=1, keepdims=True)
        cos = bm @ mat_b.T
        ai, bj = np.nonzero(cos >= threshold)
        a = bids[ai]
        b = ids_b[bj]
        keep = a < b
        return pa.Table.from_arrays(
            [pa.array(a[keep]), pa.array(b[keep])],
            names=["vec_id_a", "vec_id_b"],
        )

    return ds.map_batches(near_dup, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# duplicate-cluster resolution: distributed connected components
# ---------------------------------------------------------------------------

CC_NUM_BUCKETS = 64


def _cc_bucket(edges, col: str):
    def add(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(
            "_cb", pa.array((v * 2654435761 % CC_NUM_BUCKETS).astype(np.int64))
        )

    return edges.map_batches(add, batch_format="pyarrow")


def _star_round(edges, mode: str):
    """One star operation over a (src, dst) edge Dataset. ``large``:
    src-symmetrized input; for each node u emit (v, min(N(u) ∪ {u})) for
    neighbors v > u. ``small``: canonicalized input (src = larger
    endpoint); emit (v, m) for v != m plus (src, m), m = min(N(u) ∪ {u}).
    Grouped by a hash BUCKET of src (O(buckets) groups, per-node runs
    resolved inside the group — never one scheduler group per node)."""

    def per_bucket(group: pa.Table) -> pa.Table:
        src = group["src"].to_numpy(zero_copy_only=False)
        dst = group["dst"].to_numpy(zero_copy_only=False)
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        out_a, out_b = [], []
        for s, e in _runs(src):
            u = int(src[s])
            nbrs = np.unique(dst[s:e])
            m = int(min(nbrs[0], u))
            if mode == "large":
                big = nbrs[nbrs > u]
                out_a.extend(big.tolist())
                out_b.extend([m] * len(big))
            else:
                keep = nbrs[nbrs != m]
                out_a.extend(keep.tolist())
                out_b.extend([m] * len(keep))
                out_a.append(u)
                out_b.append(m)
        return pa.Table.from_arrays(
            [pa.array(out_a, type=pa.int64()), pa.array(out_b, type=pa.int64())],
            names=["src", "dst"],
        )

    return (
        _cc_bucket(edges, "src")
        .groupby("_cb")
        .map_groups(
            lambda g: per_bucket(g.drop_columns(["_cb"])), batch_format="pyarrow"
        )
    )


def _canon_batch(b: pa.Table) -> pa.Table:
    """Per-batch canonicalization (src = max, dst = min, self-loops
    dropped) — NO shuffle; duplicates are tolerated (every star group
    np.unique's its neighbor list) until the per-round distinct."""
    a = b["src"].to_numpy(zero_copy_only=False)
    c = b["dst"].to_numpy(zero_copy_only=False)
    keep = a != c
    a, c = a[keep], c[keep]
    return pa.Table.from_arrays(
        [pa.array(np.maximum(a, c)), pa.array(np.minimum(a, c))],
        names=["src", "dst"],
    )


def _canonical_distinct(edges):
    """(src, dst) -> distinct canonical edges — the once-per-round
    dedupe that bounds the edge set and stabilizes the convergence
    signature; bucketed unique (no one-group-per-edge)."""

    def uniq(g: pa.Table) -> pa.Table:
        pl = _pl()

        return (
            pl.from_arrow(g.drop_columns(["_cb"]))
            .unique(maintain_order=False)
            .to_arrow()
        )

    return (
        _cc_bucket(edges.map_batches(_canon_batch, batch_format="pyarrow"), "src")
        .groupby("_cb")
        .map_groups(uniq, batch_format="pyarrow")
    )


def _edge_signature(edges) -> tuple[int, int]:
    """(count, order-independent hash-sum) of a canonical edge set — the
    tiny per-round convergence probe (one partial per batch + one sum)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        a = b["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
        c = b["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
        mix = (a * np.uint64(0x9E3779B97F4A7C15) + c) * np.uint64(0xC2B2AE3D27D4EB4F)
        # top 32 bits only: int64 partial sums cannot overflow below
        # 2^31 edges per batch, and the final Sum stays in int64 range
        mix32 = (mix >> np.uint64(32)).astype(np.int64)
        return pa.Table.from_arrays(
            [
                pa.array([int(mix32.sum())], type=pa.int64()),
                pa.array([len(a)], type=pa.int64()),
            ],
            names=["h", "n"],
        )

    agg = edges.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("h", alias_name="h"), Sum("n", alias_name="n")
    )
    return (int(agg["n"] or 0), int(agg["h"] or 0))


DRIVER_CC_THRESHOLD = 1_000_000  # edges; below this, a single-process
# union-find beats ~10 shuffle rounds of fixed executor cost


def connected_components(pairs, max_rounds: int = 12,
                         driver_threshold: int = DRIVER_CC_THRESHOLD):
    """Connected components over a pair Dataset (id_a, id_b) — the
    cluster-resolution step that turns near-dup PAIRS into per-document
    cluster labels. Size-adaptive, like a broadcast join vs a shuffle
    join:

    * edge sets under ``driver_threshold`` are collected and resolved by
      a single-process union-find — the pair set is the DERIVED small
      side (dup pairs, not the corpus), and a dozen distributed shuffle
      rounds cost more in fixed executor overhead than the union-find
      does in total;
    * larger edge sets run alternating large-star / small-star rounds
      (Kiveris et al., "Connected Components in MapReduce and Beyond"):
      two bucketed groupbys over the edges per round (O(edges) traffic,
      O(buckets) groups), O(log n) rounds, edge set materialized per
      round with a tiny signature probe for convergence.

    Both paths return a Dataset (member_id, cluster_id) covering every
    node that appears in an edge; cluster_id is the component minimum.
    Both are pinned against the same union-find reference in tests.
    """

    def seed(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [b["id_a"].cast(pa.int64()), b["id_b"].cast(pa.int64())],
            names=["src", "dst"],
        )

    edges = _canonical_distinct(pairs.map_batches(seed, batch_format="pyarrow"))
    edges = edges.materialize()

    n_edges = edges.count()
    if n_edges <= driver_threshold:
        return _driver_union_find(edges)
    sig = _edge_signature(edges)
    for _ in range(max_rounds):
        # large-star works on the symmetrized view
        def both_dirs(b: pa.Table) -> pa.Table:
            return pa.concat_tables(
                [
                    b,
                    pa.Table.from_arrays(
                        [b["dst"], b["src"]], names=["src", "dst"]
                    ),
                ]
            )

        # the whole round is ONE lazy pipeline (3 bucketed shuffles)
        # ending in a single materialize — the small-star input only
        # needs per-batch canonicalization (groups unique their
        # neighbor lists), so no mid-round distinct shuffle barrier
        grown = _star_round(
            edges.map_batches(both_dirs, batch_format="pyarrow"), "large"
        )
        shrunk = _star_round(
            grown.map_batches(_canon_batch, batch_format="pyarrow"), "small"
        )
        edges = _canonical_distinct(shrunk).materialize()
        new_sig = _edge_signature(edges)
        if new_sig == sig:
            break
        sig = new_sig

    # converged: every edge is (member, component-root)
    def label(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [b["src"], b["dst"]], names=["member_id", "cluster_id"]
        )

    members = edges.map_batches(label, batch_format="pyarrow")

    def roots(b: pa.Table) -> pa.Table:
        r = np.unique(b["cluster_id"].to_numpy(zero_copy_only=False))
        return pa.Table.from_arrays(
            [pa.array(r), pa.array(r)], names=["member_id", "cluster_id"]
        )

    root_rows = members.map_batches(roots, batch_format="pyarrow")

    def uniq(g: pa.Table) -> pa.Table:
        pl = _pl()

        return (
            pl.from_arrow(g.drop_columns(["_cb"]))
            .unique(maintain_order=False)
            .sort(["member_id"])
            .to_arrow()
        )

    allrows = members.union(root_rows)
    return (
        _cc_bucket(allrows, "member_id")
        .groupby("_cb")
        .map_groups(uniq, batch_format="pyarrow")
    )


def _driver_union_find(edges):
    """Small-side CC: collect the (already distinct/canonical) edges and
    resolve with path-compressed union-find; emit (member_id, cluster_id)
    with min-id roots — byte-compatible with the distributed output."""
    import ray.data as rd

    df = edges.to_pandas()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(df["src"].to_numpy(), df["dst"].to_numpy()):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members = sorted(parent)
    labels = [find(v) for v in members]
    return rd.from_arrow(
        pa.table(
            {
                "member_id": pa.array(members, type=pa.int64()),
                "cluster_id": pa.array(labels, type=pa.int64()),
            }
        )
    )


def q_dedup_clusters(sf_dir: str, jaccard_threshold: float = 0.8):
    """Duplicate-cluster resolution over the planted corpus: edges =
    exact-dup STARS from the real content hash (per md5 group, keeper ->
    every other member — including COINCIDENTAL duplicate texts, which
    the sf0.1 corpus genuinely contains; an earlier shortcut derived the
    member from the planted +2M rule and fabricated nonexistent ids the
    moment a coincidental group appeared) ∪ n-gram near-dup pairs with
    jaccard >= threshold, resolved to (member_id, cluster_id) by
    distributed connected components. A doc that is both exactly AND
    nearly duplicated (doc_id % 90 == 0) forms a 3-node component — the
    transitive case a pairwise view cannot express; a coincidental
    cross-doc duplicate merges its planted stars the same way."""

    corpus = corpus_ds(sf_dir)

    def md5_rows(batch: pa.Table) -> pa.Table:
        h, hb = md5_hex_prefix(batch["text"], nbytes=4, byteorder="big")
        return pa.Table.from_arrays(
            [
                h,
                batch["doc_id"],
                pa.array((hb % 64).astype(np.int64)),
            ],
            names=["text_md5", "doc_id", "hb"],
        )

    def star(group: pa.Table) -> pa.Table:
        pl = _pl()

        g = pl.from_arrow(group.select(["text_md5", "doc_id"])).with_columns(
            pl.col("doc_id").min().over("text_md5").alias("keeper")
        )
        return (
            g.filter(pl.col("doc_id") != pl.col("keeper"))
            .select(
                pl.col("keeper").alias("id_a"), pl.col("doc_id").alias("id_b")
            )
            .to_arrow()
        )

    exact_star = (
        corpus.map_batches(md5_rows, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(star, batch_format="pyarrow")
    )

    near = q_dedup_ngram_jaccard(sf_dir)

    def near_pairs(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = b.filter(pc.greater_equal(b["jaccard"], jaccard_threshold))
        return t.select(["id_a", "id_b"])

    edges = exact_star.union(near.map_batches(near_pairs, batch_format="pyarrow"))
    return connected_components(edges)


# ---------------------------------------------------------------------------
# embedding near-dup, LSH-bucketed (the at-scale path)
# ---------------------------------------------------------------------------

EMB_LSH_BANDS = 24
EMB_LSH_ROWS = 4  # bits per band
EMB_LSH_SEED = 1234
# tile edge for the blocked per-run cosine triangle: 2048^2 float64
# block = 32 MB peak per tile, independent of run size
EMB_RUN_BLOCK = 2048


def _hyperplanes(dim: int) -> np.ndarray:
    """Seeded Gaussian hyperplane matrix (dim x bands*rows) — regenerated
    identically on every worker from the seed, so nothing is shipped."""
    rng = np.random.RandomState(EMB_LSH_SEED)
    return rng.standard_normal((dim, EMB_LSH_BANDS * EMB_LSH_ROWS))


def q_dedup_embedding_lsh(sf_dir: str, threshold: float = 0.45):
    """Embedding near-dup via random-hyperplane LSH — the 100 TB path that
    replaces the all-pairs broadcast of q_dedup_embedding (which stays as
    the recall baseline / oracle):

    * per batch: sign bits of (normalized vectors @ seeded hyperplanes),
      one row per (vec, band) with band_key = md5(band bits) and the same
      coarse NUM_PAIR_BUCKETS shuffle key as MinHashLSH — O(buckets)
      groups, never one group per band value;
    * the NORMALIZED vector travels with the row (float64 bytes; at real
      scale float32 halves the traffic) so candidate verification is
      group-local — no second join against the embeddings table;
    * per bucket: exact cosine among each band_key run's members, emit
      pairs >= threshold; banding makes a colliding pair appear in >=1
      run with probability 1-(1-p^r)^b (p = 1-theta/pi), ~0.99 at
      cos 0.45 with b=24, r=4 — recall-asserted vs the baseline in tests.

    No driver-side materialization: the hyperplanes are re-derived from
    the seed per worker, O(dim * bits)."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def explode_bands(batch: pa.Table) -> pa.Table:
        # fully vectorized: band codes via bit-packing (rows <= 62 bits),
        # band_key = (band_idx << rows) | code — exact, collision-free
        # (the old md5 key was just a deterministic mapping of the same
        # (band, bits) identity); bucket via an integer mix of the key.
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = embedding_matrix(batch["embedding"])
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        planes = _hyperplanes(m.shape[1])  # re-derived per worker from the seed
        n = len(ids)
        bits = (m @ planes) > 0  # (B, bands*rows)
        codes = bits.reshape(n, EMB_LSH_BANDS, EMB_LSH_ROWS).astype(np.int64) @ (
            np.int64(1) << np.arange(EMB_LSH_ROWS, dtype=np.int64)
        )  # (B, bands)
        band_idx = np.arange(EMB_LSH_BANDS, dtype=np.int64)
        key = ((band_idx[None, :] << EMB_LSH_ROWS) | codes).reshape(-1)
        mixed = key.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        bucket = ((mixed >> np.uint64(40)) % np.uint64(NUM_PAIR_BUCKETS)).astype(
            np.int64
        )
        # the normalized vector travels as one fixed-size-list buffer
        # repeated per band — no per-row bytes objects
        vec_col = pa.FixedSizeListArray.from_arrays(
            pa.array(np.repeat(m, EMB_LSH_BANDS, axis=0).reshape(-1)), m.shape[1]
        )
        return pa.Table.from_arrays(
            [
                pa.array(key),
                pa.array(bucket),
                pa.array(np.repeat(ids, EMB_LSH_BANDS)),
                vec_col,
            ],
            names=["band_key", "bucket", "vec_id", "vec"],
        )

    ds = ds.map_batches(explode_bands, batch_format="pyarrow")

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        keys = group["band_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(keys, kind="stable")
        keys = keys[order]
        ids = group["vec_id"].to_numpy(zero_copy_only=False)[order]
        vc = group["vec"]
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        dim = vc.type.list_size
        mat_all = (
            vc.flatten().to_numpy(zero_copy_only=False).reshape(len(vc), dim)[order]
        )
        out_a, out_b, out_c = [], [], []
        for s, e in _runs(keys):
            if e - s < 2:
                continue
            uids, first = np.unique(ids[s:e], return_index=True)
            if len(uids) < 2:
                continue
            mat = mat_all[s:e][first]
            # byte-identical vectors collapse to star pairs (cos exactly
            # 1.0) through the group's smallest-id rep — the duplicate-
            # heavy degenerate bucket costs Theta(u), not Theta(u^2)
            _, inv = np.unique(mat, axis=0, return_inverse=True)
            rep_idx, sa, sb = _identity_star(uids, inv)
            if len(sa):
                out_a.append(uids[sa])
                out_b.append(uids[sb])
                out_c.append(np.ones(len(sa), dtype=np.float64))
            v = len(rep_idx)
            if v < 2:
                continue
            rm = mat[rep_idx]
            ru = uids[rep_idx]
            # BLOCKED cosine triangle over distinct vectors: unlike the
            # hash kernels (which forfeit cross-chunk pairs), matmul
            # tiles cover EVERY rep pair exactly — memory is O(block^2)
            # per tile while time stays the inherent O(v^2 * dim)
            B = EMB_RUN_BLOCK
            for i0 in range(0, v, B):
                i1 = min(i0 + B, v)
                for j0 in range(i0, v, B):
                    j1 = min(j0 + B, v)
                    blk = rm[i0:i1] @ rm[j0:j1].T
                    mask = blk >= threshold
                    if i0 == j0:
                        mask &= np.triu(
                            np.ones(blk.shape, dtype=bool), k=1
                        )
                    ii, jj = np.nonzero(mask)
                    if len(ii) == 0:
                        continue
                    ra, rb = ru[i0 + ii], ru[j0 + jj]
                    out_a.append(np.minimum(ra, rb))
                    out_b.append(np.maximum(ra, rb))
                    out_c.append(blk[ii, jj])
        if not out_a:
            return pa.Table.from_arrays(
                [
                    pa.array([], type=pa.int64()),
                    pa.array([], type=pa.int64()),
                    pa.array([], type=pa.float64()),
                ],
                names=["id_a", "id_b", "cos"],
            )
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(out_a).astype(np.int64)),
                pa.array(np.concatenate(out_b).astype(np.int64)),
                pa.array(np.concatenate(out_c).astype(np.float64)),
            ],
            names=["id_a", "id_b", "cos"],
        )

    pairs = ds.groupby("bucket").map_groups(pairs_in_bucket, batch_format="pyarrow")
    deduped = _dedup_pairs(pairs)
    # present the same surface as the brute-force baseline
    return deduped.map_batches(
        lambda t: pa.Table.from_arrays(
            [t["id_a"], t["id_b"]], names=["vec_id_a", "vec_id_b"]
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# SemDeDup: semantic dedup via coarse clusters + within-cluster pruning
# ---------------------------------------------------------------------------

SEMDEDUP_NLIST = 16
SEMDEDUP_PROBES = 3


def q_dedup_semantic(
    sf_dir: str,
    nlist: int = SEMDEDUP_NLIST,
    threshold: float = 0.45,
    probes: int = SEMDEDUP_PROBES,
):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): coarse k-means clusters the embedding space, then
    near-duplicates are resolved WITHIN each cluster only — the published
    web-scale recipe (the paper runs ~100k clusters over 5B docs so each
    cluster is one task's worth of all-pairs work). Multi-probe extension:
    each vector joins its ``probes`` nearest clusters, recovering pairs
    the single-assignment recipe splits across a boundary (the paper's
    regime is near-identical cosine where one probe suffices; at looser
    thresholds boundary losses dominate — measured on this corpus:
    recall 0.43 at probes=1 vs the all-pairs baseline).

    * quantizer trains on an O(sample) row-group sample (never the full
      table), same as knn_ivf;
    * assignment is one broadcast-centroid matmul per batch, emitting
      ``probes`` rows per vector; the first shuffle key is the cluster
      id — nlist groups, sized so a cluster fits one task (documented
      partitioning assumption; at 100 TB nlist grows with the corpus);
    * per cluster: exact all-pairs cosine among members, union-find over
      pairs >= threshold, each member emitted with a survived flag
      (component-min wins);
    * a second tiny shuffle of (vec_id, flag) pairs — hash-BUCKETED, not
      per-key — keeps a vector only if it won in EVERY probe cluster.

    Precision is exact (a pruned row always has a true >=threshold
    neighbor); residual recall loss is pairs sharing none of their
    ``probes`` clusters — asserted vs the all-pairs baseline in tests.
    Rows-only driver check (iterative k-means is not SQL-expressible)."""
    import ray

    from .similarity import _kmeans_spherical, _normalize, _sample_embeddings
    from .sources import get_broadcast

    sample = _normalize(_sample_embeddings(sf_dir, max_rows=nlist * 250))
    cents = _kmeans_spherical(sample, nlist)
    ref = ray.put(cents)

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def assign(batch: pa.Table) -> pa.Table:
        c = get_broadcast(ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = embedding_matrix(batch["embedding"])
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ c.T
        p = min(probes, sims.shape[1])
        top = np.argsort(-sims, axis=1, kind="stable")[:, :p]  # ties: low id
        out_cl, out_id, out_vec = [], [], []
        for i, d in enumerate(ids):
            vb = m[i].tobytes()
            for cl in top[i]:
                out_cl.append(int(cl))
                out_id.append(int(d))
                out_vec.append(vb)
        return pa.Table.from_arrays(
            [
                pa.array(out_cl, type=pa.int64()),
                pa.array(out_id, type=pa.int64()),
                pa.array(out_vec, type=pa.binary()),
            ],
            names=["cluster", "vec_id", "vec"],
        )

    def prune(group: pa.Table) -> pa.Table:
        # bounded under duplicate skew, same design as the LSH kernels:
        # byte-identical vectors collapse to identity groups (star
        # union through the smallest id — an all-identical cluster is
        # Theta(c), not Theta(c^2)); DISTINCT vectors run a BLOCKED
        # cosine triangle (EMB_RUN_BLOCK tiles, union applied per tile)
        # so no task allocates a cluster-sized cos matrix. The union
        # result is identical to the full clique's components.
        ids = group["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        vecs = group["vec"].to_pylist()
        mat = np.stack([np.frombuffer(vecs[i], dtype=np.float64) for i in order])
        _, inv = np.unique(mat, axis=0, return_inverse=True)
        rep_idx, star_rep, star_mem = _identity_star(ids, inv)
        parent = np.arange(len(ids))

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        def union(i: int, j: int) -> None:
            ri, rj = find(int(i)), find(int(j))
            if ri != rj:  # ids sorted ascending: keep the smaller root
                parent[max(ri, rj)] = min(ri, rj)

        for i, j in zip(star_rep, star_mem):
            union(i, j)
        v = len(rep_idx)
        rm = mat[rep_idx]
        B = EMB_RUN_BLOCK
        for i0 in range(0, v, B):
            i1 = min(i0 + B, v)
            for j0 in range(i0, v, B):
                j1 = min(j0 + B, v)
                blk = rm[i0:i1] @ rm[j0:j1].T
                mask = blk >= threshold
                if i0 == j0:
                    mask &= np.triu(np.ones(blk.shape, dtype=bool), k=1)
                ii, jj = np.nonzero(mask)
                for i, j in zip(rep_idx[i0 + ii], rep_idx[j0 + jj]):
                    union(i, j)
        roots = np.array([find(int(i)) for i in range(len(ids))])
        keep = (roots == np.arange(len(ids))).astype(np.int64)
        bucket = (ids * 2654435761 % CC_NUM_BUCKETS).astype(np.int64)
        return pa.Table.from_arrays(
            [pa.array(ids), pa.array(keep), pa.array(bucket)],
            names=["vec_id", "won", "bucket"],
        )

    flags = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(prune, batch_format="pyarrow")
    )

    def survivors(group: pa.Table) -> pa.Table:
        pl = _pl()

        g = (
            pl.from_arrow(group.select(["vec_id", "won"]))
            .group_by("vec_id")
            .agg(pl.col("won").min().alias("won"))
            .filter(pl.col("won") == 1)
            .select("vec_id")
        )
        return g.to_arrow()

    return (
        flags.groupby("bucket")
        .map_groups(survivors, batch_format="pyarrow")
        .sort("vec_id")
    )


# ---------------------------------------------------------------------------
# end-to-end corpus curation (the training-data sweep, composed)
# ---------------------------------------------------------------------------

CURATION_MIN_TOKENS = 3
CURATION_MAX_STOP_RATIO = 0.5


def q_corpus_curation(sf_dir: str, jaccard_threshold: float = 0.8):
    """The composed training-data curation pipeline over the planted
    corpus — what a reference user runs end-to-end before training:

    1. MAP-SIDE projection: md5 content hash + quality metrics computed in
       one pass over the corpus; the quality gate (n_tokens >= 3,
       stopword_ratio < 0.5) applies HERE — identical text means identical
       metrics, so gating commutes with exact dedup — and the text column
       is dropped. Neither shuffle ever moves a payload byte: both move
       (doc_id, md5, n_tokens, stopword_ratio) rows (~50 bytes);
    2. EXACT dedup: one content-hash bucketed shuffle of the projected
       rows; within each bucket the min-doc_id row per md5 survives;
    3. NEAR-dup removal: verified n-gram-Jaccard pairs (>= threshold)
       name the dropped member; applied as a CO-PARTITIONED ANTI-JOIN by
       doc_id (tagged union -> hash-bucket groupby -> per-group filter) —
       the drop list never touches the driver, so at petabyte pair counts
       it stays a dataset, not a broadcast.

    Emits (doc_id, n_tokens, stopword_ratio) for every surviving doc."""
    import pyarrow.compute as pc

    from .textstats import quality_score

    # drop side of the anti-join: near-dup members, tagged _drop=True and
    # schema-aligned with the projected corpus side (metrics carry nulls)
    pairs = q_dedup_ngram_jaccard(sf_dir)

    def drop_rows(b: pa.Table) -> pa.Table:
        sel = b.filter(pc.greater_equal(b["jaccard"], jaccard_threshold))
        return pa.table(
            {
                "doc_id": sel["id_b"],
                "n_tokens": pa.nulls(sel.num_rows, type=pa.int64()),
                "stopword_ratio": pa.nulls(sel.num_rows, type=pa.float64()),
                "_drop": pa.array(np.ones(sel.num_rows, dtype=bool)),
            }
        )

    drop_side = pairs.map_batches(drop_rows, batch_format="pyarrow")

    corpus = corpus_ds(sf_dir)

    def project_and_gate(b: pa.Table) -> pa.Table:
        # ONE pass over the payload: hash + metrics + gate, then the text
        # leaves the pipeline — the shuffles below move ~50-byte rows.
        # nbytes=4/'big' == int(hex[:8], 16): the SQL-oracle-visible bucket
        md5s, pref = md5_hex_prefix(b["text"], nbytes=4, byteorder="big")
        bucket = (pref % NUM_PAIR_BUCKETS).astype(np.int64)
        q = quality_score(b)
        t = pa.table(
            {
                "doc_id": b["doc_id"],
                "text_md5": md5s,
                "n_tokens": q["n_tokens"],
                "stopword_ratio": q["stopword_ratio"],
                "_hb": pa.array(bucket),
            }
        )
        keep = pc.and_(
            pc.greater_equal(t["n_tokens"], CURATION_MIN_TOKENS),
            pc.less(t["stopword_ratio"], CURATION_MAX_STOP_RATIO),
        )
        return t.filter(keep)

    def keep_min_per_hash(g: pa.Table) -> pa.Table:
        pl = _pl()

        return (
            pl.from_arrow(g.drop_columns(["_hb"]))
            .sort("doc_id")
            .unique(subset=["text_md5"], keep="first", maintain_order=True)
            .drop("text_md5")
            .to_arrow()
        )

    deduped = (
        corpus.map_batches(project_and_gate, batch_format="pyarrow")
        .groupby("_hb")
        .map_groups(keep_min_per_hash, batch_format="pyarrow")
    )

    # anti-join by doc_id: union the tagged sides, co-partition on a doc_id
    # hash bucket, filter corpus rows whose id appears on the drop side —
    # the scale-safe trade for never collecting the drop list to the driver
    def tag_corpus(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_drop", pa.array(np.zeros(b.num_rows, dtype=bool))
        )

    def add_anti_bucket(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = (ids * 2654435761) % NUM_PAIR_BUCKETS
        return b.append_column("_ab", pa.array(bucket.astype(np.int64)))

    def anti(g: pa.Table) -> pa.Table:
        drop_mask = g["_drop"].to_numpy(zero_copy_only=False)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        keep = ~drop_mask & ~np.isin(ids, ids[drop_mask])
        return g.filter(pa.array(keep)).drop_columns(["_drop", "_ab"])

    return (
        deduped.map_batches(tag_corpus, batch_format="pyarrow")
        .union(drop_side)
        .map_batches(add_anti_bucket, batch_format="pyarrow")
        .groupby("_ab")
        .map_groups(anti, batch_format="pyarrow")
    )


SQL = {
    "corpus_curation": f"""
        WITH {CORPUS_CTE},
        tri AS (
          SELECT doc_id, string_split(text, ' ') AS w1,
                 string_split(text || ' neardup', ' ') AS w2
          FROM documents WHERE doc_id % 10 = 0),
        sets AS (
          SELECT doc_id,
            list_distinct(list_transform(range(1, greatest(len(w1)-2, 1) + 1),
                i -> w1[i] || ' ' || w1[i+1] || ' ' || w1[i+2])) AS s1,
            list_distinct(list_transform(range(1, greatest(len(w2)-2, 1) + 1),
                i -> w2[i] || ' ' || w2[i+1] || ' ' || w2[i+2])) AS s2
          FROM tri),
        near_drop AS (
          SELECT doc_id + 1000000 AS doc_id FROM sets
          WHERE CAST(len(list_intersect(s1, s2)) AS DOUBLE)
                / len(list_distinct(list_concat(s1, s2))) >= 0.8),
        keepers AS (
          SELECT min(doc_id) AS doc_id FROM corpus GROUP BY text),
        surv AS (
          SELECT c.doc_id, c.text FROM corpus c
          JOIN keepers k USING (doc_id)
          WHERE c.doc_id NOT IN (SELECT doc_id FROM near_drop)),
        q AS (
          SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                 CAST(len(list_filter(string_split(text, ' '),
                          x -> x IN ('the','a','of','to','and'))) AS DOUBLE)
                     / greatest(len(string_split(text, ' ')), 1) AS stopword_ratio
          FROM surv)
        SELECT doc_id, n_tokens, stopword_ratio FROM q
        WHERE n_tokens >= {CURATION_MIN_TOKENS}
          AND stopword_ratio < {CURATION_MAX_STOP_RATIO}""",
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
    # mirrors q_dedup_clusters' honest edge model: exact stars from the
    # REAL content hash over the
    # corpus (coincidental duplicate texts included — sf0.1 has them) ∪
    # planted near pairs with jaccard >= 0.8, resolved to components by
    # a recursive min-label propagation (DuckDB's transitive closure of
    # the same union-find the Ray side runs)
    "dedup_clusters": f"""
        WITH RECURSIVE {CORPUS_CTE},
        eg AS (SELECT md5(text) AS h, doc_id FROM corpus),
        keepers AS (SELECT h, MIN(doc_id) AS k FROM eg GROUP BY h),
        estar AS (
          SELECT kp.k AS a, eg.doc_id AS b
          FROM eg JOIN keepers kp USING (h) WHERE eg.doc_id != kp.k),
        tri AS (
          SELECT doc_id, string_split(text, ' ') AS w1,
                 string_split(text || ' neardup', ' ') AS w2
          FROM documents WHERE doc_id % 10 = 0),
        sets AS (
          SELECT doc_id,
            list_distinct(list_transform(range(1, greatest(len(w1)-2, 1) + 1),
                i -> w1[i] || ' ' || w1[i+1] || ' ' || w1[i+2])) AS s1,
            list_distinct(list_transform(range(1, greatest(len(w2)-2, 1) + 1),
                i -> w2[i] || ' ' || w2[i+1] || ' ' || w2[i+2])) AS s2
          FROM tri),
        near AS (
          SELECT doc_id FROM sets
          WHERE CAST(len(list_intersect(s1, s2)) AS DOUBLE)
                / len(list_distinct(list_concat(s1, s2))) >= 0.8),
        edges AS (
          SELECT a, b FROM estar
          UNION SELECT doc_id AS a, doc_id + 1000000 AS b FROM near),
        und AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
        nodes AS (SELECT DISTINCT a AS n FROM und),
        cc AS (
          SELECT n AS member_id, n AS label FROM nodes
          UNION
          SELECT u.b AS member_id, c.label
          FROM cc c JOIN und u ON u.a = c.member_id)
        SELECT member_id, CAST(MIN(label) AS BIGINT) AS cluster_id
        FROM cc GROUP BY member_id""",
    # the LSH path verifies candidates with the same exact cosine; with
    # b=24, r=4 its recall on the DRIVER'S corpora is 1.0 (deterministic
    # seed — asserted vs the brute-force baseline in tests at sf0.001,
    # driver-matched at sf0.01), so the full-join SQL is an exact oracle
    # at those scales. Banding recall is inherently probabilistic:
    # measured 139/144 = 0.965 at sf0.1 (5 borderline-cos pairs miss
    # every band) — at larger scales this entry moves to rows-only.
    "dedup_embedding_lsh": """
        SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45""",
}


# ---------------------------------------------------------------------------
# incremental ingest dedup: new docs vs the already-ingested corpus
# ---------------------------------------------------------------------------


def q_dedup_incremental(sf_dir: str):
    """Ingest-time dedup of an incoming batch against the EXISTING corpus
    (the reference's key-existence probe before apply, S3Utils.kt:27-33,
    at corpus scale). Existing = even doc_ids, incoming = odd; both sides
    carry parity-flipped injected duplicates (doc_id%7==0 -> doc_id +
    1,000,001, same text) so cross-half dups exist and the oracle
    reproduces them with a UNION ALL.

    Scale shape:
    1. DISTRIBUTED bloom build over the existing texts' md5-u64: per-batch
       partial bit arrays, OR-merged as 16 KiB blobs (the same mergeable-
       blob combiner as the HLL) — the existing side is never collected.
    2. Incoming probe: a bloom MISS is definitely-new and never enters the
       shuffle; only bloom hits (true dups + ~1e-5 FPs) are verified
       exactly by a co-partitioned anti-membership on the full md5 —
       the all-to-all moves probable-duplicate hashes, not the corpus.
    The hash projection (doc_id, md5, md5-u64, parity) is computed in ONE
    pass over the corpus and materialized before branching —
    column-pruned metadata, output-sized; a 10^10-doc run would write it
    to a parquet segment instead (resumable), same plan.
    """
    import ray
    from .curation import bloom_build, bloom_probe
    from .sources import get_broadcast, read_table

    def corpus(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = (batch["doc_id"].to_numpy(zero_copy_only=False) % 7) == 0
        inj = batch.filter(pa.array(m))
        inj = inj.set_column(
            inj.schema.get_field_index("doc_id"),
            "doc_id",
            pc.add(inj["doc_id"], 1_000_001),
        )
        return pa.concat_tables([batch, inj])

    def md5_project(batch: pa.Table) -> pa.Table:
        """The ONE md5 pass: texts leave the pipeline here; everything
        downstream works on (doc_id, h, u64, even) metadata."""
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        hexes, u64 = md5_hex_prefix(batch["text"], nbytes=8, byteorder="little")
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "h": hexes,
                "u64": pa.array(u64),
                "even": pa.array(ids % 2 == 0),
            }
        )

    hashes = (
        read_table(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(corpus, batch_format="pyarrow")
        .map_batches(md5_project, batch_format="pyarrow")
        .materialize()
    )

    def bloom_partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(batch["even"])
        u64 = t["u64"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {"bits": pa.array([bloom_build(u64).tobytes()], type=pa.binary())}
        )

    def bloom_reduce(batch: pa.Table) -> pa.Table:
        total = None
        for blob in batch["bits"].to_pylist():
            b = np.frombuffer(blob, dtype=np.uint8)
            total = b.copy() if total is None else (total | b)
        return pa.table({"bits": pa.array([total.tobytes()], type=pa.binary())})

    bits_row = (
        hashes.map_batches(bloom_partial, batch_format="pyarrow")
        .repartition(1)
        # batch_size=None: all partials must OR together in ONE batch
        .map_batches(bloom_reduce, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    bits_ref = ray.put(np.frombuffer(bits_row[0]["bits"], dtype=np.uint8))

    def probe(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.filter(pc.invert(batch["even"]))
        u64 = t["u64"].to_numpy(zero_copy_only=False).astype(np.uint64)
        hit = bloom_probe(u64, get_broadcast(bits_ref))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "h": t["h"],
                "u64": t["u64"],
                "cand": pa.array(hit),
            }
        )

    # probe is a cheap vectorized map over the materialized hash
    # projection; its two filtered consumers re-run only this map
    probed = hashes.map_batches(probe, batch_format="pyarrow")
    definitely_new = probed.filter(expr="cand == False").select_columns(["doc_id"])

    # exact verify of bloom hits: co-partitioned anti-membership on md5
    cands = probed.filter(expr="cand == True").select_columns(
        ["doc_id", "h", "u64"]
    )
    build = hashes.filter(expr="even == True").select_columns(
        ["h", "u64"]
    ).map_batches(
        lambda b: b.append_column(
            "doc_id", pa.array(np.full(b.num_rows, -1, dtype=np.int64))
        ),
        batch_format="pyarrow",
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        # co-partition by the md5-u64 column — vectorized, no re-parsing
        u64 = batch["u64"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return batch.drop_columns(["u64"]).append_column(
            "_b", pa.array((u64 % np.uint64(64)).astype(np.int64))
        )

    def anti(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        hs = np.array(g["h"].to_pylist())
        build_set = set(hs[ids == -1].tolist())
        keep = (ids != -1) & ~np.isin(hs, list(build_set) or [""])
        return pa.table({"doc_id": pa.array(ids[keep], type=pa.int64())})

    verified_new = (
        cands.union(build.select_columns(["doc_id", "h", "u64"]))
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(anti, batch_format="pyarrow")
    )
    return definitely_new.union(verified_new)


INCREMENTAL_SQL = """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000001 AS doc_id, text
      FROM documents WHERE doc_id % 7 = 0)
    SELECT i.doc_id FROM corpus i
    WHERE i.doc_id % 2 = 1
      AND NOT EXISTS (
        SELECT 1 FROM corpus e WHERE e.doc_id % 2 = 0 AND e.text = i.text)"""


def registry():
    queries = {
        "dedup_exact": q_dedup_exact,
        "dedup_minhash": q_dedup_minhash,
        "dedup_simhash": q_dedup_simhash,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_embedding": q_dedup_embedding,
        "dedup_embedding_lsh": q_dedup_embedding_lsh,
        "dedup_semantic": q_dedup_semantic,
        "dedup_clusters": q_dedup_clusters,
        "corpus_curation": q_corpus_curation,
        "dedup_incremental": q_dedup_incremental,
    }
    sql = dict(SQL)
    sql["dedup_incremental"] = INCREMENTAL_SQL
    return queries, sql
