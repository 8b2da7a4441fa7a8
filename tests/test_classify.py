"""Distributed multinomial Naive Bayes (ray_cdc_lake/classify.py).

Bar: the fitted model equals the closed-form Laplace-smoothed counts
(hand-computed on a tiny corpus), prediction matches an explicit
per-document log-score argmax with the smallest-label tie-break,
out-of-vocabulary words take the unseen likelihood, and empty
documents fall back to the prior argmax."""

from __future__ import annotations

import math

import numpy as np
import pytest

from ray_cdc_lake.classify import nb_predict, nb_train

CORPUS = [
    {"doc_id": 1, "lang": "en", "text": "cat dog cat"},
    {"doc_id": 2, "lang": "en", "text": "dog dog"},
    {"doc_id": 3, "lang": "de", "text": "katze hund"},
    {"doc_id": 4, "lang": "de", "text": "hund"},
    {"doc_id": 5, "lang": "en", "text": ""},
]


def _ds(rows):
    import ray.data as rd

    return rd.from_items(rows)


def test_model_counts_and_smoothing():
    m = nb_train(_ds(CORPUS), "lang")
    assert list(m.labels) == ["de", "en"]
    assert list(m.vocab) == ["cat", "dog", "hund", "katze"]
    # priors: de 2/5, en 3/5
    assert m.log_prior == pytest.approx([math.log(2 / 5), math.log(3 / 5)])
    # en totals = 5 tokens, de totals = 3 tokens, V = 4
    # P(cat|en) = (2+1)/(5+4); P(cat|de) = (0+1)/(3+4)
    vi = {w: i for i, w in enumerate(m.vocab)}
    assert m.log_like[vi["cat"], 1] == pytest.approx(math.log(3 / 9))
    assert m.log_like[vi["cat"], 0] == pytest.approx(math.log(1 / 7))
    assert m.log_unseen[0] == pytest.approx(math.log(1 / 7))
    assert m.log_unseen[1] == pytest.approx(math.log(1 / 9))


def test_predictions_match_explicit_scores():
    m = nb_train(_ds(CORPUS), "lang")
    test_rows = [
        {"doc_id": 10, "text": "cat cat dog"},  # en vocabulary
        {"doc_id": 11, "text": "hund katze katze"},  # de vocabulary
        {"doc_id": 12, "text": ""},  # prior argmax -> en (3/5 > 2/5)
        {"doc_id": 13, "text": "zebra"},  # OOV only: unseen likelihoods
    ]
    got = {
        r["doc_id"]: r["predicted_lang"]
        for r in nb_predict(_ds(test_rows), m).iter_rows()
    }
    assert got[10] == "en"
    assert got[11] == "de"
    assert got[12] == "en"
    # OOV-only doc: prior + log_unseen; de: ln(.4)+ln(1/7), en: ln(.6)+ln(1/9)
    de = math.log(0.4) + math.log(1 / 7)
    en = math.log(0.6) + math.log(1 / 9)
    assert got[13] == ("de" if de > en else "en")


def test_tie_breaks_to_smallest_label():
    rows = [
        {"doc_id": 1, "lang": "b", "text": "x"},
        {"doc_id": 2, "lang": "a", "text": "x"},
    ]
    m = nb_train(_ds(rows), "lang")
    # symmetric by construction: equal priors, equal likelihoods
    got = nb_predict(_ds([{"doc_id": 9, "text": "x x"}]), m).take_all()
    assert got[0]["predicted_lang"] == "a"


def test_multi_space_and_null_text():
    rows = [
        {"doc_id": 1, "lang": "en", "text": "cat  dog"},  # double space
        {"doc_id": 2, "lang": "de", "text": None},
    ]
    m = nb_train(_ds(rows), "lang")
    assert list(m.vocab) == ["cat", "dog"]
    got = nb_predict(_ds(rows), m).take_all()
    assert len(got) == 2


def test_keep_cols_pass_through_and_routing():
    train = [
        {"doc_id": 1, "lang": "en", "text": "cat dog cat"},
        {"doc_id": 2, "lang": "en", "text": "dog cat"},
        {"doc_id": 3, "lang": "de", "text": "katze hund"},
    ]
    m = nb_train(_ds(train), "lang")
    test = [
        {"doc_id": 10, "lang": "en", "text": "cat cat"},
        {"doc_id": 11, "lang": "de", "text": "cat dog"},  # mislabeled
    ]
    got = {
        r["doc_id"]: (r["lang"], r["predicted_lang"])
        for r in nb_predict(_ds(test), m, keep_cols=("lang",)).iter_rows()
    }
    # the recorded label passes through untouched while the prediction
    # disagrees on the mislabeled doc — the corpus_route_nb quarantine case
    assert got[10] == ("en", "en")
    assert got[11] == ("de", "en")


def test_labels_with_spaces_train_correctly():
    """The (label, word) shuffle pack uses \\x1f, so a label containing a
    space must round-trip intact instead of silently corrupting counts."""
    import numpy as np
    import pytest

    train = [
        {"doc_id": 1, "lang": "en US", "text": "cat dog cat"},
        {"doc_id": 2, "lang": "en US", "text": "dog cat"},
        {"doc_id": 3, "lang": "de DE", "text": "katze hund"},
    ]
    m = nb_train(_ds(train), "lang")
    assert list(m.labels) == ["de DE", "en US"]
    assert set(m.vocab) == {"cat", "dog", "katze", "hund"}
    got = {
        r["doc_id"]: r["predicted_lang"]
        for r in nb_predict(
            _ds([{"doc_id": 9, "lang": "x", "text": "cat cat"}]), m
        ).iter_rows()
    }
    assert got[9] == "en US"

    # a label carrying the separator itself is rejected loudly
    bad = [{"doc_id": 1, "lang": "a\x1fb", "text": "w"}]
    with pytest.raises(Exception, match="separator|\\\\x1f"):
        nb_train(_ds(bad), "lang")
