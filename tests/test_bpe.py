"""Distributed BPE tokenizer training (ray_cdc_lake/bpe.py).

Bar: the learned merge table equals a transparent brute-force BPE
trainer (greedy left-to-right pair replacement, max-frequency merge,
ties broken on lexicographically smallest (left, right) strings) —
including the overlapping a==b run case — on BOTH the local and the
distributed execution paths; word frequencies aggregate correctly from
the corpus; encoding with a converged table yields one token per word."""

from __future__ import annotations

import pyarrow as pa
import pytest

from ray_cdc_lake.bpe import (
    bpe_token_counts,
    train_bpe,
    word_frequencies,
)


def _brute_train(word_freq: dict[str, int], num_merges: int, min_freq: int = 2):
    """Reference model: symbol tuples + dict pair counting."""
    state = {tuple(w): f for w, f in word_freq.items()}
    merges = []
    for rank in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, f in state.items():
            i = 0
            while i < len(sym) - 1:
                counts[(sym[i], sym[i + 1])] = (
                    counts.get((sym[i], sym[i + 1]), 0) + f
                )
                # greedy left-to-right: an overlapping repeat of the
                # SAME pair is not double-counted as mergeable — but
                # raw counting in classic BPE counts every adjacent
                # occurrence; replicate the kernel: every adjacency
                i += 1
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p[0], p[1]))
        if counts[best] < min_freq:
            break
        a, b = best
        new_state: dict[tuple, int] = {}
        for sym, f in state.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_state[key] = new_state.get(key, 0) + f
        state = new_state
        merges.append((rank, a, b, a + b, counts[best]))
    return merges


def _words_ds(word_freq: dict[str, int]):
    import ray.data as rd

    return rd.from_arrow(
        pa.Table.from_arrays(
            [
                pa.array(list(word_freq.keys()), type=pa.string()),
                pa.array(list(word_freq.values()), type=pa.int64()),
            ],
            names=["word", "freq"],
        )
    )


WF = {
    "scan": 30,
    "scat": 20,
    "cat": 25,
    "banana": 12,
    "bandana": 9,
    "aaaa": 7,  # overlapping a==b runs: greedy pairs (aa)(aa)
    "aaa": 5,  # odd run: (aa)a
    "tie1": 3,
    "tie2": 3,
}


@pytest.mark.parametrize("local_threshold", [100_000, 0])
def test_train_matches_brute_force(local_threshold):
    got = train_bpe(
        _words_ds(WF), num_merges=12, min_freq=2, local_threshold=local_threshold
    ).to_pylist()
    want = _brute_train(WF, 12)
    assert [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_freq"])
        for r in got
    ] == want


def test_train_converges_and_stops():
    wf = {"ab": 10, "abc": 5}
    got = train_bpe(_words_ds(wf), num_merges=50).to_pylist()
    # converges to whole words then stops (no pair left at min_freq)
    assert got[-1]["merged"] in ("abc", "ab")
    merged_all = {r["merged"] for r in got}
    assert "ab" in merged_all and "abc" in merged_all
    assert len(got) < 50


def test_word_frequencies_from_corpus():
    import ray.data as rd

    docs = rd.from_items(
        [
            {"doc_id": 1, "text": "the cat  sat"},
            {"doc_id": 2, "text": "the the cat"},
            {"doc_id": 3, "text": ""},
        ]
    )
    wf = {
        r["word"]: r["freq"]
        for r in word_frequencies(docs).iter_rows()
    }
    assert wf == {"the": 3, "cat": 2, "sat": 1}


def test_encode_with_converged_table_counts_words():
    import ray.data as rd

    corpus = [
        {"doc_id": 1, "text": "scan cat scan"},
        {"doc_id": 2, "text": "banana  bandana scat"},
        {"doc_id": 3, "text": ""},
    ]
    docs = rd.from_items(corpus)
    merges = train_bpe(word_frequencies(docs), num_merges=500, min_freq=1)
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_counts(docs, merges).iter_rows()
    }
    assert got == {1: 3, 2: 3, 3: 0}


def test_encode_partial_merges():
    """With only ONE merge learned, token counts reflect exactly that
    merge applied greedily — not convergence."""
    import ray.data as rd

    merges = pa.Table.from_arrays(
        [
            pa.array([0], type=pa.int64()),
            pa.array(["a"], type=pa.string()),
            pa.array(["a"], type=pa.string()),
            pa.array(["aa"], type=pa.string()),
            pa.array([99], type=pa.int64()),
        ],
        names=["rank", "left", "right", "merged", "pair_freq"],
    )
    docs = rd.from_items([{"doc_id": 1, "text": "aaaa aaa ab"}])
    got = bpe_token_counts(docs, merges).to_pandas()
    # aaaa -> (aa)(aa) = 2; aaa -> (aa)a = 2; ab -> a b = 2
    assert got.n_bpe_tokens.tolist() == [6]
