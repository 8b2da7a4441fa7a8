"""Text-analysis operators over the ``documents`` table — the reference's
per-document metadata-extraction transforms (JhoveParser.kt:12-184 pulling
typed metadata out of content) reborn for training-data pipelines:
token counting, quality scoring, language ID, document fingerprinting.

All stages are stateless ``map_batches`` UDFs except language ID, which is
an actor-pool stage (stopword tables built once per actor — the
``Jhove.init()`` one-time-state shape, Jhove.kt:148-217).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .kernels import import_polars as _pl
import pyarrow.compute as pc
from .sources import read_table

STOPWORDS = ("the", "a", "of", "to", "and")

# tiny per-language function-word tables for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "de": ("der", "die", "das", "und", "nicht", "ist", "ein"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans"),
    "es": ("el", "la", "los", "y", "es", "una", "en"),
    "zh": ("de", "shi", "le", "zai", "he", "you"),
}


def _token_counts(texts: pa.ChunkedArray):
    """Vectorized per-row token counts + flattened token array using Arrow
    list kernels (single-space split matches the SQL oracle
    ``string_split(text, ' ')``)."""
    toks = pc.split_pattern(texts, " ")
    n = pc.list_value_length(toks)
    return toks, n


def _token_flat(texts):
    """The one place the tokenize-and-flatten contract lives: returns
    (flat token values as a plain numpy array, per-row int64 lengths).
    Shared by quality_score and repetition_score so the chunk-combining
    quirk is fixed in a single spot."""
    toks, n = _token_counts(texts)
    flat = toks.combine_chunks()
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    values = flat.flatten().to_numpy(zero_copy_only=False)
    lens = n.to_numpy(zero_copy_only=False).astype(np.int64)
    return values, lens


def token_count(batch: pa.Table) -> pa.Table:
    _, n = _token_counts(batch["text"])
    return pa.Table.from_arrays(
        [batch["doc_id"], pc.cast(n, pa.int64())], names=["doc_id", "n_tokens"]
    )


# GPT-2-style pretokenizer pattern, RE2-safe (no lookahead — both pyarrow
# and DuckDB run RE2, so engine and oracle count the SAME matches):
# contractions | optional-space letters | optional-space digits |
# optional-space punctuation runs | whitespace runs
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def token_count_bpe(batch: pa.Table) -> pa.Table:
    """BPE-ish token counting: non-overlapping matches of the GPT-2-style
    pretokenizer regex, as one vectorized RE2 kernel
    (``pc.count_substring_regex``) — no Python per row."""
    n = pc.count_substring_regex(batch["text"], BPE_PATTERN)
    return pa.Table.from_arrays(
        [batch["doc_id"], pc.cast(n, pa.int64())],
        names=["doc_id", "n_bpe_tokens"],
    )


def quality_score(batch: pa.Table) -> pa.Table:
    """Quality metrics: token count, chars/token, stopword ratio. Ratios
    are single integer divisions so they are bit-identical to the SQL
    oracle's DOUBLE division."""
    values, lengths = _token_flat(batch["text"])
    nchars = pc.cast(pc.utf8_length(batch["text"]), pa.int64())

    is_stop = pc.is_in(pa.array(values), value_set=pa.array(STOPWORDS))
    stop_np = is_stop.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    stop_counts = np.add.reduceat(stop_np, offsets[:-1]) if len(stop_np) else np.zeros(0, dtype=np.int64)
    stop_counts = np.where(lengths == 0, 0, stop_counts)

    n_np = lengths
    chars_np = nchars.to_numpy(zero_copy_only=False).astype(np.int64)
    chars_per_token = chars_np / np.maximum(n_np, 1)
    stop_ratio = stop_counts / np.maximum(n_np, 1)
    return pa.Table.from_arrays(
        [
            batch["doc_id"],
            pa.array(chars_np),
            pa.array(n_np),
            pa.array(stop_counts),
            pa.array(chars_per_token),
            pa.array(stop_ratio),
        ],
        names=["doc_id", "n_chars", "n_tokens", "n_stopwords", "chars_per_token", "stopword_ratio"],
    )


class LangId:
    """Actor-pool language-ID stage: marker tables compiled once per actor
    (``__init__``), batches scored vectorized (``__call__``).
    Deterministic tie-break: highest score wins, ties broken by language
    code ascending; zero hits -> 'und'."""

    def __init__(self):
        self.langs = sorted(LANG_MARKERS)
        self.marker_sets = [frozenset(LANG_MARKERS[lg]) for lg in self.langs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks, n = _token_counts(batch["text"])
        tok_lists = toks.to_pylist()
        preds = []
        for words in tok_lists:
            ws = set(w.lower() for w in words)
            best_lang, best_score = "und", 0
            for lg, markers in zip(self.langs, self.marker_sets):
                s = len(ws & markers)
                if s > best_score:
                    best_lang, best_score = lg, s
            preds.append(best_lang)
        return pa.Table.from_arrays(
            [batch["doc_id"], pa.array(preds, type=pa.string())],
            names=["doc_id", "lang_pred"],
        )


def fingerprint(batch: pa.Table, k: int = 8, w: int = 16) -> pa.Table:
    """Winnowing document fingerprint (rolling Rabin-Karp hash over byte
    k-grams, min per window, xor-folded to one u64). Deterministic across
    workers and runs — pure integer arithmetic, no dict order."""
    B = np.uint64(1000003)
    MOD_MASK = np.uint64((1 << 61) - 1)
    powers = np.array(
        [int(B) ** i % (1 << 61) for i in range(k)][::-1], dtype=np.uint64
    )  # depends only on k — shared across the batch
    out = []
    for s in batch["text"].to_pylist():
        data = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        if len(data) < k:
            out.append(int(np.bitwise_xor.reduce(data) if len(data) else 0))
            continue
        m = len(data) - k + 1
        grams = np.lib.stride_tricks.sliding_window_view(data, k)
        h = (grams * powers).sum(axis=1, dtype=np.uint64) & MOD_MASK
        if m <= w:
            mins = np.array([h.min()], dtype=np.uint64)
        else:
            wins = np.lib.stride_tricks.sliding_window_view(h, w)
            mins = np.unique(wins.min(axis=1))
        out.append(int(np.bitwise_xor.reduce(mins)))
    return pa.Table.from_arrays(
        [batch["doc_id"], pa.array(out, type=pa.uint64())],
        names=["doc_id", "fingerprint"],
    )


# ---------------------------------------------------------------------------
# batched "model inference": deterministic hashing embedder (actor pool)
# ---------------------------------------------------------------------------

EMBED_DIM = 64


class FakeEmbedder:
    """The batched-model-inference stage shape with a DETERMINISTIC stand-in
    model (no ML libs in this container): a feature-hashing vectorizer —
    token -> stable md5 bucket with a ±1 sign bit, accumulated and
    l2-normalized. ``__init__`` is where a real encoder would load its
    weights ONCE per actor (the Jhove.init() analog); ``__call__`` embeds
    a batch. Output schema matches the ``embeddings`` table
    (``embedding: list<float>``) so downstream knn/dedup stages compose."""

    def __init__(self, dim: int = EMBED_DIM):
        self.dim = dim
        self.words = _WordHashCacheForEmbed()

    def __call__(self, batch: pa.Table) -> pa.Table:
        # batched: one cache pass over the concatenated token stream, one
        # scatter-add into a (n_docs*dim,) accumulator, one reshape+norm —
        # no per-doc numpy setup, no per-row list objects on output
        texts = batch["text"].to_pylist()
        n = len(texts)
        words_per_doc = [t.split(" ") for t in texts]
        lens = np.fromiter((len(w) for w in words_per_doc), dtype=np.int64, count=n)
        h = self.words.hashes([w for ws in words_per_doc for w in ws])
        idx = (h % np.uint64(self.dim)).astype(np.int64)
        sign = np.where((h >> np.uint64(32)) & np.uint64(1), 1.0, -1.0)
        doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        flat = np.zeros(n * self.dim, dtype=np.float64)
        np.add.at(flat, doc_of * self.dim + idx, sign)
        mat = flat.reshape(n, self.dim)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = np.divide(mat, norms, out=mat, where=norms > 0)
        emb = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * self.dim, self.dim, dtype=np.int32)),
            pa.array(mat.reshape(-1).astype(np.float32)),
        )
        return pa.Table.from_arrays([batch["doc_id"], emb], names=["doc_id", "embedding"])


class _WordHashCacheForEmbed:
    """Per-actor token-hash cache (same shape as dedup._WordHashCache,
    local to avoid an import cycle)."""

    def __init__(self):
        self.cache: dict[str, int] = {}

    def hashes(self, words: list[str]) -> np.ndarray:
        import hashlib

        c = self.cache
        out = np.empty(len(words), dtype=np.uint64)
        for i, w in enumerate(words):
            h = c.get(w)
            if h is None:
                h = int.from_bytes(
                    hashlib.md5(w.encode("utf-8")).digest()[:8], "little"
                )
                c[w] = h
            out[i] = h
        return out


def q_text_embed_fake(sf_dir: str):
    """Batched 'model inference' over documents: actor pool, model state
    in __init__, per-batch vectorized accumulate. Deterministic, so no
    oracle SQL is needed beyond the rows-only check (a unit test pins
    determinism + norm + composability with the knn input schema)."""
    from .sources import actor_pool_size

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        FakeEmbedder,
        batch_format="pyarrow",
        batch_size=512,  # batched inference: the knob a real model needs
        concurrency=actor_pool_size(),
    )


# ---------------------------------------------------------------------------
# repetition filter: duplicate-trigram fraction per document
# ---------------------------------------------------------------------------


def repetition_score(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition quality signal: the fraction of a
    document's word trigrams that are duplicates. Fully vectorized —
    tokens integer-coded with one ``np.unique`` per batch (codes are
    injective within the batch, so code-triple equality IS string-triple
    equality), trigram triples compared via one lexsort + adjacent-diff,
    per-row distinct counts via bincount. No per-row Python."""
    values, lens = _token_flat(batch["text"])
    codes = (
        np.unique(values, return_inverse=True)[1]
        if len(values)
        else np.zeros(0, dtype=np.int64)
    )

    nrows = len(lens)
    offsets = np.zeros(nrows + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    n_tri = np.maximum(lens - 2, 0)
    total = int(n_tri.sum())
    if total:
        row_id = np.repeat(np.arange(nrows, dtype=np.int64), n_tri)
        tri_cum = np.cumsum(n_tri) - n_tri  # trigram index at each row start
        starts = (
            np.arange(total, dtype=np.int64)
            - np.repeat(tri_cum, n_tri)
            + np.repeat(offsets[:-1], n_tri)
        )
        tri = np.stack(
            [row_id, codes[starts], codes[starts + 1], codes[starts + 2]], axis=1
        )
        order = np.lexsort((tri[:, 3], tri[:, 2], tri[:, 1], tri[:, 0]))
        s = tri[order]
        first = np.concatenate(
            ([True], np.any(np.diff(s, axis=0) != 0, axis=1))
        )
        n_distinct = np.bincount(s[first, 0], minlength=nrows).astype(np.int64)
    else:
        n_distinct = np.zeros(nrows, dtype=np.int64)

    dup = np.where(
        n_tri == 0, 0.0, 1.0 - n_distinct / np.maximum(n_tri, 1)
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_trigrams": pa.array(n_tri),
            "n_distinct": pa.array(n_distinct),
            "dup_fraction": pa.array(dup),
        }
    )


def q_text_repetition(sf_dir: str):
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        repetition_score, batch_format="pyarrow"
    )


REPETITION_SQL = """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3 THEN
               [array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]
             ELSE [] END AS tris
      FROM t)
    SELECT doc_id,
           CAST(len(tris) AS BIGINT) AS n_trigrams,
           CAST(len(list_distinct(tris)) AS BIGINT) AS n_distinct,
           CASE WHEN len(tris) = 0 THEN 0.0
                ELSE 1.0 - CAST(len(list_distinct(tris)) AS DOUBLE) / len(tris)
           END AS dup_fraction
    FROM g"""


# ---------------------------------------------------------------------------
# per-source top terms: the TF-analysis shuffle done combiner-first
# ---------------------------------------------------------------------------

TOP_TERMS_K = 5


def q_text_top_terms(sf_dir: str, k: int = TOP_TERMS_K):
    """Top-k terms per source by frequency. The naive plan shuffles every
    token; this one pre-aggregates (source, term) counts INSIDE each
    batch (polars explode + group_by — vectorized), so the groupby
    shuffle moves one partial count per distinct (source, term, block),
    a tiny fraction of the token stream. Per-source top-k is a
    within-group sort with a deterministic (count desc, term asc)
    tie-break — never a global sort."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        pl = _pl()

        return (
            pl.from_arrow(batch)
            .with_columns(pl.col("text").str.split(" ").alias("term"))
            .drop("text")
            .explode("term")
            .group_by(["source", "term"])
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .to_arrow()
        )

    counts = (
        _read_docs(sf_dir, ["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "term"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def topk(g: pa.Table) -> pa.Table:
        pl = _pl()

        return (
            pl.from_arrow(g)
            .sort(["n", "term"], descending=[True, False])
            .head(k)
            .with_row_index("rank", offset=1)
            .with_columns(pl.col("rank").cast(pl.Int64))
            .select(["source", "term", "n", "rank"])
            .to_arrow()
        )

    return counts.groupby("source").map_groups(topk, batch_format="pyarrow")


TOP_TERMS_SQL = f"""
    WITH t AS (
      SELECT source, unnest(string_split(text, ' ')) AS term FROM documents),
    c AS (
      SELECT source, term, CAST(count(*) AS BIGINT) AS n
      FROM t GROUP BY source, term),
    r AS (
      SELECT source, term, n,
             row_number() OVER (
               PARTITION BY source ORDER BY n DESC, term) AS rank
      FROM c)
    SELECT source, term, n, rank FROM r WHERE rank <= {TOP_TERMS_K}"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def _read_docs(sf_dir: str, columns):
    import ray.data as rd

    return read_table(sf_dir, "documents", columns=columns)


def q_text_token_count(sf_dir: str):
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        token_count, batch_format="pyarrow"
    )


def q_text_token_count_bpe(sf_dir: str):
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        token_count_bpe, batch_format="pyarrow"
    )


def q_text_quality(sf_dir: str):
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        quality_score, batch_format="pyarrow"
    )


def q_text_langid(sf_dir: str):
    from .sources import actor_pool_size

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        LangId, batch_format="pyarrow", concurrency=actor_pool_size()
    )


def q_text_fingerprint(sf_dir: str):
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fingerprint, batch_format="pyarrow"
    )


def _markers_values_sql() -> str:
    rows = []
    for lg in sorted(LANG_MARKERS):
        for w in LANG_MARKERS[lg]:
            rows.append(f"('{lg}', '{w}')")
    return ", ".join(rows)


LANGID_SQL = f"""
    WITH words AS (
      SELECT DISTINCT doc_id, lower(unnest(string_split(text, ' '))) AS w
      FROM documents),
    markers(lg, w) AS (VALUES {_markers_values_sql()}),
    scores AS (
      SELECT doc_id, lg, count(*) AS s
      FROM words JOIN markers USING (w) GROUP BY doc_id, lg),
    best AS (
      SELECT doc_id, lg,
             row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, lg) AS rn
      FROM scores WHERE s > 0)
    SELECT d.doc_id, COALESCE(b.lg, 'und') AS lang_pred
    FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1"""


# ---------------------------------------------------------------------------
# Inverted index + TF-IDF — the retrieval-side corpus operators
# ---------------------------------------------------------------------------

TFIDF_K = 5  # terms kept per document


def q_text_inverted_index(sf_dir: str):
    """Distributed inverted-index build: term -> (document frequency,
    posting list). The classic retrieval structure, built the
    shuffle-light way: each batch emits its DISTINCT (term, doc_id)
    pairs (polars explode + unique — the within-batch duplicate tokens
    never leave the task), the groupby co-locates each term's postings,
    and the per-term fold sorts + joins doc ids. Postings travel as a
    comma-joined string so the result is hash-stable across engines
    (list<int64> columns stringify differently in Arrow vs DuckDB).

    Scale note: posting lists for ubiquitous terms are the classic skew —
    at 100 TB, cap or shard hot terms (df above a threshold adds a
    (term, shard) salt and a second concat fold). The synthetic corpus's
    31-term vocabulary exercises exactly that regime: every term is hot,
    so the per-group fold is the cost and stays vectorized."""

    def pairs(batch: pa.Table) -> pa.Table:
        pl = _pl()

        return (
            pl.from_arrow(batch)
            .with_columns(pl.col("text").str.split(" ").alias("term"))
            .drop("text")
            .explode("term")
            .unique(subset=["term", "doc_id"])
            .to_arrow()
        )

    def fold(g: pa.Table) -> pa.Table:
        pl = _pl()

        df = (
            pl.from_arrow(g)
            .unique(subset=["term", "doc_id"])  # cross-batch duplicates
            .sort("doc_id")
            .group_by("term")
            .agg(
                pl.len().cast(pl.Int64).alias("df"),
                pl.col("doc_id").cast(pl.Utf8).str.join(",").alias("postings"),
            )
        )
        return df.select(["term", "df", "postings"]).to_arrow().cast(
            pa.schema(
                [("term", pa.string()), ("df", pa.int64()), ("postings", pa.string())]
            )
        )

    return (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby("term")
        .map_groups(fold, batch_format="pyarrow")
    )


INVERTED_INDEX_SQL = """
    WITH pairs AS (
      SELECT DISTINCT term, doc_id FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents))
    SELECT term, CAST(count(*) AS BIGINT) AS df,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
    FROM pairs GROUP BY term"""


def q_text_tfidf(sf_dir: str):
    """Top-k terms per document by TF-IDF (idf = ln(N/df), the plain
    unsmoothed form, rounded to 12 dp on both sides — numpy log and
    DuckDB ln differ by 1 ulp on some inputs). Two
    shuffle-light passes over the token stream:

    1. document frequencies — per-batch distinct (term, doc) pairs,
       then one tiny groupby (vocabulary-sized result, broadcast via
       ``ray.put`` with the corpus row count N);
    2. per-document term counts stay INSIDE each batch (a document never
       spans batches), so scoring is map-only: explode, count per
       (doc, term), join the broadcast df table, score, per-doc top-k.

    The idf table at 100 TB is vocabulary-sized (millions of rows, a few
    hundred MB) — still broadcastable; beyond that, swap the broadcast
    for a shuffle join on term."""
    import ray

    from .sources import get_broadcast

    docs = _read_docs(sf_dir, ["doc_id", "text"])
    n_docs = docs.count()  # parquet metadata, not a scan

    def pairs(batch: pa.Table) -> pa.Table:
        pl = _pl()

        return (
            pl.from_arrow(batch)
            .with_columns(pl.col("text").str.split(" ").alias("term"))
            .drop("text")
            .explode("term")
            .unique(subset=["term", "doc_id"])
            .select(["term"])
            .to_arrow()
        )

    from ray.data.aggregate import Count

    df_rows = (
        docs.map_batches(pairs, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Count(alias_name="df"))
        .take_all()  # vocabulary-sized
    )
    df_map = {r["term"]: int(r["df"]) for r in df_rows}
    ref = ray.put(df_map)

    def score(batch: pa.Table) -> pa.Table:
        pl = _pl()

        dfm = get_broadcast(ref)
        counts = (
            pl.from_arrow(batch)
            .with_columns(pl.col("text").str.split(" ").alias("term"))
            .drop("text")
            .explode("term")
            .group_by(["doc_id", "term"])
            .agg(pl.len().cast(pl.Int64).alias("tf"))
        )
        dfs = np.array([dfm[t] for t in counts["term"].to_list()], dtype=np.int64)
        idf = np.log(float(n_docs) / dfs)
        # round to 12 dp (both sides): numpy's log and the oracle's ln
        # differ by 1 ulp on some inputs, and ranking/compare must not
        # depend on that noise
        tfidf = np.round(counts["tf"].to_numpy() * idf, 12)
        out = counts.with_columns(
            pl.Series("df", dfs),
            pl.Series("tfidf", tfidf),
        )
        return (
            out.sort(["doc_id", "tfidf", "term"], descending=[False, True, False])
            .group_by("doc_id", maintain_order=True)
            .head(TFIDF_K)
            .with_columns(
                pl.col("doc_id").cum_count().over("doc_id").cast(pl.Int64).alias("rank")
            )
            .select(["doc_id", "term", "tf", "df", "tfidf", "rank"])
            .to_arrow()
            .cast(
                pa.schema(
                    [
                        ("doc_id", pa.int64()),
                        ("term", pa.string()),
                        ("tf", pa.int64()),
                        ("df", pa.int64()),
                        ("tfidf", pa.float64()),
                        ("rank", pa.int64()),
                    ]
                )
            )
        )

    return docs.map_batches(score, batch_format="pyarrow")


TFIDF_SQL = f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM toks GROUP BY doc_id, term),
    dfreq AS (
      SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM toks GROUP BY term),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
             round(tf.tf * ln(n.n_docs / dfreq.df), 12) AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN n),
    ranked AS (
      SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
      FROM scored)
    SELECT doc_id, term, tf, df, tfidf, rank
    FROM ranked WHERE rank <= {TFIDF_K}"""


SQL = {
    "text_langid": LANGID_SQL,
    "text_token_count": """
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents""",
    "text_token_count_bpe": f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text,
                    '{BPE_PATTERN.replace("'", "''")}')) AS BIGINT)
                   AS n_bpe_tokens
        FROM documents""",
    "text_quality": f"""
        WITH toks AS (
          SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
                 string_split(text, ' ') AS w
          FROM documents)
        SELECT doc_id, n_chars,
               CAST(len(w) AS BIGINT) AS n_tokens,
               CAST(len(list_filter(w, x -> x IN {STOPWORDS!r})) AS BIGINT) AS n_stopwords,
               CAST(n_chars AS DOUBLE) / greatest(len(w), 1) AS chars_per_token,
               CAST(len(list_filter(w, x -> x IN {STOPWORDS!r})) AS DOUBLE)
                   / greatest(len(w), 1) AS stopword_ratio
        FROM toks""",
}


def registry():
    queries = {
        "text_token_count": q_text_token_count,
        "text_token_count_bpe": q_text_token_count_bpe,
        "text_quality": q_text_quality,
        "text_langid": q_text_langid,
        "text_fingerprint": q_text_fingerprint,
        "text_embed_fake": q_text_embed_fake,
        "text_top_terms": q_text_top_terms,
        "text_repetition": q_text_repetition,
        "text_inverted_index": q_text_inverted_index,
        "text_tfidf": q_text_tfidf,
    }
    sql = dict(SQL)
    sql["text_top_terms"] = TOP_TERMS_SQL
    sql["text_repetition"] = REPETITION_SQL
    sql["text_inverted_index"] = INVERTED_INDEX_SQL
    sql["text_tfidf"] = TFIDF_SQL
    return queries, sql
