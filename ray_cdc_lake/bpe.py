"""Distributed BPE (byte-pair-encoding) tokenizer TRAINING — the
piece a training-data pipeline needs beyond the static BPE-ish token
counter (textstats.q_text_token_count_bpe): learn the merge table
itself from the corpus.

Scale shape, and why this holds at 100 TB: classic BPE trainers
(Sennrich et al. 2016; HuggingFace tokenizers) never iterate the
corpus — they iterate the WORD-FREQUENCY table, which is vocab-sized,
not corpus-sized.  The corpus-scale stage here is exactly one
combiner-first shuffle (per-block word counts -> groupby sum), after
which training state is O(vocab): the word table is materialized once
and each merge round is a vectorized pass over it (pair counting via
numpy bincount over list-offsets, merge application via a greedy
non-overlapping mask) with only a pair-count table (bounded by the
live pair vocabulary) ever reaching the driver.  No per-round corpus
pass, no Python loop over rows — the only per-round driver work is an
argmax over the combined pair counts.

Determinism: ties in pair frequency break on the lexicographically
smallest (left, right) token strings, so the merge table is a pure
function of the corpus.

Reference analog: the reference ships static text analysis only; this
extends SURVEY.md's LLM-pipeline surface (token counting) to trainable
tokenization, per the build brief's training-data mandate.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa

if TYPE_CHECKING:
    import ray.data

# pair keys are a * PAIR_BASE + b; merges grow the id space by one per
# round, so ids stay far below 2**20 for any practical merge budget
PAIR_BASE = 1 << 20


def word_frequencies(
    ds: "ray.data.Dataset", column: str = "text"
) -> "ray.data.Dataset":
    """Corpus -> (word, freq): the ONE corpus-scale stage. Per-block
    whitespace split + partial count (combiner), then a global groupby
    sum over the word vocabulary — shuffle volume is the per-block
    DISTINCT words, not the corpus."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        words = pc.list_flatten(
            pc.split_pattern_regex(t[column].fill_null(""), r"\s+")
        )
        words = words.filter(pc.not_equal(words, ""))
        arr = np.asarray(words.to_pandas(), dtype=object)
        uniq, counts = np.unique(arr, return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(uniq, type=pa.string()), pa.array(counts.astype(np.int64))],
            names=["word", "freq"],
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("freq", alias_name="freq"))
    )


def _char_vocab(words: "ray.data.Dataset") -> list[str]:
    """Distinct characters across the word vocabulary (per-block char
    sets -> driver union; O(alphabet) driver state)."""

    def chars(t: pa.Table) -> pa.Table:
        s = sorted({c for w in t["word"].to_pylist() for c in w})
        return pa.Table.from_arrays([pa.array(s, type=pa.string())], names=["c"])

    seen: set[str] = set()
    for b in words.map_batches(chars, batch_format="pyarrow").iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        seen.update(b["c"].to_pylist())
    return sorted(seen)


def _tokenize_chars(t: pa.Table, alphabet: np.ndarray) -> pa.Table:
    """word -> list<int32> of char ids (runs once per DISTINCT word at
    init, not per corpus occurrence)."""
    words = t["word"].to_pylist()
    lengths = np.array([len(w) for w in words], dtype=np.int32)
    joined = np.array(list("".join(words)), dtype=object)
    ids = np.searchsorted(alphabet, joined).astype(np.int32)
    offsets = np.concatenate(([0], np.cumsum(lengths))).astype(np.int32)
    toks = pa.ListArray.from_arrays(pa.array(offsets), pa.array(ids))
    return pa.Table.from_arrays(
        [toks, t["freq"].combine_chunks()], names=["tokens", "freq"]
    )


def _pair_partial(t: pa.Table) -> pa.Table:
    """Per-block weighted adjacent-pair counts (vectorized)."""
    toks = t["tokens"].combine_chunks()
    vals = toks.values.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    freq = t["freq"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(vals)
    if n < 2:
        return pa.Table.from_arrays(
            [pa.array([], type=pa.int64()), pa.array([], type=pa.int64())],
            names=["pair", "freq"],
        )
    lengths = np.diff(offs)
    row_id = np.repeat(np.arange(len(lengths)), lengths)
    same = row_id[:-1] == row_id[1:]
    key = (vals[:-1] * PAIR_BASE + vals[1:])[same]
    w = freq[row_id[:-1][same]]
    uniq, inv = np.unique(key, return_inverse=True)
    sums = np.bincount(inv, weights=w).astype(np.int64)
    return pa.Table.from_arrays(
        [pa.array(uniq), pa.array(sums)], names=["pair", "freq"]
    )


def _apply_merge(t: pa.Table, a: int, b: int, new_id: int) -> pa.Table:
    """Greedy left-to-right non-overlapping replacement of (a, b) ->
    new_id inside every token list — fully vectorized, including the
    a == b run case (alternating positions within each candidate run)."""
    toks = t["tokens"].combine_chunks()
    vals = toks.values.to_numpy(zero_copy_only=False).astype(np.int32).copy()
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lengths = np.diff(offs)
    row_id = np.repeat(np.arange(len(lengths)), lengths)
    n = len(vals)
    if n >= 2:
        cand = (
            (vals[:-1] == a) & (vals[1:] == b) & (row_id[:-1] == row_id[1:])
        )
        pos = np.flatnonzero(cand)
    else:
        pos = np.array([], dtype=np.int64)
    if len(pos):
        new_run = np.ones(len(pos), dtype=bool)
        new_run[1:] = pos[1:] != pos[:-1] + 1
        run_first = np.maximum.accumulate(
            np.where(new_run, np.arange(len(pos)), 0)
        )
        keep = ((np.arange(len(pos)) - run_first) % 2) == 0
        pos = pos[keep]
        vals[pos] = new_id
        drop = np.zeros(n, dtype=bool)
        drop[pos + 1] = True
        vals = vals[~drop]
        lengths = lengths - np.bincount(
            row_id[pos], minlength=len(lengths)
        ).astype(lengths.dtype)
    new_offs = np.concatenate(([0], np.cumsum(lengths))).astype(np.int32)
    toks_new = pa.ListArray.from_arrays(
        pa.array(new_offs), pa.array(vals.astype(np.int32))
    )
    return pa.Table.from_arrays(
        [toks_new, t["freq"].combine_chunks()], names=["tokens", "freq"]
    )


def train_bpe(
    words: "ray.data.Dataset",
    num_merges: int,
    min_freq: int = 2,
    local_threshold: int = 100_000,
) -> pa.Table:
    """Learn ``num_merges`` BPE merges from a (word, freq) dataset.
    Returns the merge table (rank, left, right, merged, pair_freq) —
    token columns as strings, rank 0 first.  Stops early when no pair
    reaches ``min_freq``.

    Size-adaptive execution (the dedup_clusters pattern): the word
    table is vocab-sized, so when it fits comfortably on the driver
    (``<= local_threshold`` rows) the merge rounds run locally on the
    SAME vectorized kernels — per-round Ray task latency would dwarf
    sub-millisecond numpy passes.  Above the threshold every round is a
    distributed pass: per-block pair partials stream to the driver
    (bounded by the live pair vocabulary, never by rows) and the merge
    applies as a map_batches over the materialized state.  Results are
    identical by construction (same kernels, same tie-break)."""
    alphabet = np.array(_char_vocab(words), dtype=object)
    vocab: list[str] = list(alphabet)
    state = words.map_batches(
        lambda t: _tokenize_chars(t, alphabet), batch_format="pyarrow"
    ).materialize()
    local = state.count() <= local_threshold
    if local:
        parts = list(
            state.iter_batches(batch_size=None, batch_format="pyarrow")
        )
        local_state = (
            pa.concat_tables(parts).combine_chunks()
            if parts
            else pa.Table.from_arrays(
                [
                    pa.array([], type=pa.list_(pa.int32())),
                    pa.array([], type=pa.int64()),
                ],
                names=["tokens", "freq"],
            )
        )

    ranks, lefts, rights, mergeds, freqs = [], [], [], [], []
    for r in range(num_merges):
        best_pair, best_freq = None, 0
        agg: dict[int, int] = {}
        if local:
            partials = [_pair_partial(local_state)]
        else:
            partials = state.map_batches(
                _pair_partial, batch_format="pyarrow"
            ).iter_batches(batch_size=None, batch_format="pyarrow")
        for b in partials:
            for p, f in zip(
                b["pair"].to_numpy(zero_copy_only=False),
                b["freq"].to_numpy(zero_copy_only=False),
            ):
                agg[int(p)] = agg.get(int(p), 0) + int(f)
        if agg:
            # max freq; ties -> lexicographically smallest (left, right)
            best_pair = min(
                agg,
                key=lambda p: (
                    -agg[p],
                    vocab[p // PAIR_BASE],
                    vocab[p % PAIR_BASE],
                ),
            )
            best_freq = agg[best_pair]
        if best_pair is None or best_freq < min_freq:
            break
        a, b_ = best_pair // PAIR_BASE, best_pair % PAIR_BASE
        new_id = len(vocab)
        vocab.append(vocab[a] + vocab[b_])
        if local:
            local_state = _apply_merge(local_state, a, b_, new_id)
        else:
            state = state.map_batches(
                lambda t, a=a, b=b_, nid=new_id: _apply_merge(t, a, b, nid),
                batch_format="pyarrow",
            ).materialize()
        ranks.append(r)
        lefts.append(vocab[a])
        rights.append(vocab[b_])
        mergeds.append(vocab[new_id])
        freqs.append(best_freq)

    return pa.Table.from_arrays(
        [
            pa.array(ranks, type=pa.int64()),
            pa.array(lefts, type=pa.string()),
            pa.array(rights, type=pa.string()),
            pa.array(mergeds, type=pa.string()),
            pa.array(freqs, type=pa.int64()),
        ],
        names=["rank", "left", "right", "merged", "pair_freq"],
    )


def bpe_token_counts(
    ds: "ray.data.Dataset", merges: pa.Table, column: str = "text"
) -> "ray.data.Dataset":
    """Encode with a trained merge table: per document, the BPE token
    count after applying every merge in rank order.  The merge table is
    broadcast in the task closure (tiny); encoding is the same
    vectorized merge kernel applied per batch — corpus streams, no
    state."""
    merge_list = list(
        zip(merges["left"].to_pylist(), merges["right"].to_pylist())
    )

    def encode(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        words = pc.list_flatten(
            pc.split_pattern_regex(t[column].fill_null(""), r"\s+")
        )
        words_np = np.asarray(words.to_pandas(), dtype=object)
        nonempty = words_np != ""
        words_np = words_np[nonempty]
        # per-doc word spans
        per_doc = pc.list_value_length(
            pc.split_pattern_regex(t[column].fill_null(""), r"\s+")
        ).to_numpy(zero_copy_only=False)
        # recount after dropping empties: map each word to its doc
        doc_of = np.repeat(np.arange(t.num_rows), per_doc)[nonempty]
        # encode the DISTINCT words once per batch, then scatter
        uniq, inv = np.unique(words_np, return_inverse=True)
        alphabet = np.array(sorted({c for w in uniq for c in w}), dtype=object)
        vocab = list(alphabet)
        wt = pa.Table.from_arrays(
            [
                pa.array(uniq, type=pa.string()),
                pa.array(np.ones(len(uniq), dtype=np.int64)),
            ],
            names=["word", "freq"],
        )
        st = _tokenize_chars(wt, alphabet)
        tok2id = {s: i for i, s in enumerate(vocab)}
        for left, right in merge_list:
            ai, bi = tok2id.get(left), tok2id.get(right)
            nid = len(vocab)
            vocab.append(left + right)
            tok2id[left + right] = nid
            if ai is None or bi is None:
                continue
            st = _apply_merge(st, ai, bi, nid)
        toks = st["tokens"].combine_chunks()
        word_len = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
        n_tok = np.bincount(
            doc_of, weights=word_len[inv], minlength=t.num_rows
        ).astype(np.int64)
        return pa.Table.from_arrays(
            [t["doc_id"].combine_chunks(), pa.array(n_tok)],
            names=["doc_id", "n_bpe_tokens"],
        )

    return ds.map_batches(encode, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# registry surface

_MERGES_CACHE: dict[str, pa.Table] = {}


def _trained_merges(sf_dir: str) -> pa.Table:
    """Train to convergence over the sf's documents (memoized per
    process so the train and encode queries share one run)."""
    hit = _MERGES_CACHE.get(sf_dir)
    if hit is None:
        from .sources import read_table

        docs = read_table(sf_dir, "documents", columns=["text"])
        hit = train_bpe(word_frequencies(docs), num_merges=4096, min_freq=2)
        _MERGES_CACHE[sf_dir] = hit
    return hit


def q_text_bpe_train(sf_dir: str) -> pa.Table:
    """Distributed BPE tokenizer training (train_bpe): the learned merge
    table over the documents corpus, trained to convergence.  Iterative
    — no SQL expression; the driver records the rows-only check, and
    tests/test_bpe.py pins the semantics against a brute-force model.

    Always trains memo-COLD: a prior cached table never short-circuits
    this query, so any timing of it measures real training work (the r4
    bench recorded a misleading 0.0 s from a memo hit).  The memo is
    only REFRESHED here, for q_text_bpe_encode to share."""
    from .sources import read_table

    docs = read_table(sf_dir, "documents", columns=["text"])
    merges = train_bpe(word_frequencies(docs), num_merges=4096, min_freq=2)
    _MERGES_CACHE[sf_dir] = merges
    return merges


def q_text_bpe_encode(sf_dir: str):
    """Encode documents with the TRAINED merge table (bpe_token_counts).
    Trained to convergence on this corpus every distinct word reduces to
    one token, so the exact oracle is the per-document word count — an
    end-to-end train+encode check with a closed-form SQL answer."""
    from .sources import read_table

    merges = _trained_merges(sf_dir)
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return bpe_token_counts(docs, merges)


ENCODE_SQL = """
    SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                AS BIGINT) AS n_bpe_tokens
    FROM documents"""


def registry():
    queries = {
        "text_bpe_train": q_text_bpe_train,
        "text_bpe_encode": q_text_bpe_encode,
    }
    sql = {"text_bpe_encode": ENCODE_SQL}
    return queries, sql
