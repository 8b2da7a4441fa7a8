"""Distributed multinomial Naive Bayes text classifier — the
quality/language classifier stage of a training-data pipeline
(doc-level routing by predicted class), built so that BOTH phases have
the shapes that survive 100 TB:

* TRAIN is one combiner-first count aggregation: per-block partial
  (label, word) counts -> ONE groupby sum.  The fitted model is
  O(vocab x classes) — the small side — and is broadcast into the
  scoring tasks' closures, never re-shipped per batch.
* SCORE is a stateless vectorized map_batches pass: tokenize, rank
  words into the sorted vocabulary via searchsorted, accumulate
  per-class log-likelihoods with per-class bincount over the flattened
  occurrence stream (no Python loop over rows or tokens).

Unlike iterative classifiers (logistic regression / SGD), multinomial
NB with Laplace smoothing is CLOSED-FORM — a pure function of count
aggregates — so the full train+predict pipeline has an exact SQL
oracle (queries: text_classify_nb), the strongest check the driver
offers; prediction ties break on the lexicographically smallest label
to keep the argmax deterministic.

Reference analog: the reference routes documents by per-file validator
verdicts (Jhove.kt routing); this generalizes routing to a LEARNED
verdict while keeping the same stage shape (bounded state in the task,
stream through the corpus).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

if TYPE_CHECKING:
    import ray.data


@dataclass
class NBModel:
    labels: np.ndarray  # (C,) sorted label strings
    log_prior: np.ndarray  # (C,)
    vocab: np.ndarray  # (V,) sorted word strings
    log_like: np.ndarray  # (V, C) ln((c+1)/(tot_c+V))
    log_unseen: np.ndarray  # (C,) ln(1/(tot_c+V)) for out-of-vocab words


# (label, word) shuffle-key pack separator: ASCII unit separator, which
# no space-split token can contain and labels are validated against
_SEP = "\x1f"


def _tokens(col: pa.ChunkedArray) -> pa.ChunkedArray:
    # split on single spaces, drop empties — matches the SQL oracle's
    # string_split(text, ' ') + <> '' filter exactly
    w = pc.list_flatten(pc.split_pattern(col.fill_null(""), " "))
    return w.filter(pc.not_equal(w, ""))


def nb_train(
    ds: "ray.data.Dataset", label_col: str, text_col: str = "text"
) -> NBModel:
    """Fit multinomial NB with add-one smoothing.  One distributed
    count aggregation; the collected model is vocab x classes (the
    take_all is O(model), not O(corpus) — documented small)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        # fully Arrow-native: no per-batch object ndarrays, no np.char —
        # tokenize, pack and count with pyarrow kernels (the same
        # discipline as textstats)
        lab = t[label_col].cast(pa.string())
        if lab.null_count:
            # a null label would pack into a null shuffle key and crash
            # the driver-side unpack with an unrelated-looking error —
            # fail HERE with the real cause instead
            raise ValueError(
                f"label column {label_col!r} contains "
                f"{lab.null_count} null(s) — drop or impute them before "
                "training"
            )
        toks = pc.split_pattern(
            t[text_col].cast(pa.string()).fill_null(""), " "
        )
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "")
        # doc-count partial rides along with an out-of-band empty word
        # so the whole train pass is ONE shuffle: (label, word, n) plus
        # (label, "", docs). Separator is US (\x1f) — it cannot appear
        # in a word (tokens are space-split, but words may carry ANY
        # non-space byte) and labels carrying it are rejected below, so
        # the (label, word) pack round-trips losslessly even for labels
        # that contain spaces (same convention as q_text_classify_eval).
        lab_u = pc.unique(lab)
        if pc.any(pc.match_substring(lab_u, _SEP)).as_py():
            raise ValueError(
                f"label values must not contain {_SEP!r} (the internal "
                "(label, word) pack separator)"
            )
        idx = np.repeat(np.arange(t.num_rows), lens)[
            keep.to_numpy(zero_copy_only=False)
        ]
        owner = pc.take(lab, pa.array(idx))
        if isinstance(owner, pa.ChunkedArray):
            owner = owner.combine_chunks()
        words = flat.filter(keep)
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        key = pc.binary_join_element_wise(owner, words, _SEP)
        vc = pc.value_counts(key)
        lab_vc = pc.value_counts(lab)
        empty = pa.array([""] * len(lab_vc), type=pa.string())
        lab_keys = pc.binary_join_element_wise(
            lab_vc.field("values").cast(pa.string()), empty, _SEP
        )
        return pa.Table.from_arrays(
            [
                pa.concat_arrays([vc.field("values").cast(pa.string()), lab_keys]),
                pa.concat_arrays(
                    [vc.field("counts").cast(pa.int64()), lab_vc.field("counts").cast(pa.int64())]
                ),
            ],
            names=["key", "n"],
        )

    model_rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    lw_counts: dict[tuple[str, str], int] = {}
    doc_counts: dict[str, int] = {}
    for r in model_rows:
        label, word = r["key"].split(_SEP, 1)
        if word == "":
            doc_counts[label] = int(r["n"])
        else:
            lw_counts[(label, word)] = int(r["n"])

    labels = np.array(sorted(doc_counts), dtype=object)
    vocab = np.array(sorted({w for _, w in lw_counts}), dtype=object)
    c_idx = {l: i for i, l in enumerate(labels)}
    v_idx = {w: i for i, w in enumerate(vocab)}
    counts = np.zeros((len(vocab), len(labels)), dtype=np.float64)
    for (l, w), n in lw_counts.items():
        counts[v_idx[w], c_idx[l]] = n
    totals = counts.sum(axis=0)
    n_docs = sum(doc_counts.values())
    log_prior = np.log(
        np.array([doc_counts[l] for l in labels], dtype=np.float64) / n_docs
    )
    denom = totals + len(vocab)
    return NBModel(
        labels=labels,
        log_prior=log_prior,
        vocab=vocab,
        log_like=np.log((counts + 1.0) / denom),
        log_unseen=np.log(1.0 / denom),
    )


def nb_predict(
    ds: "ray.data.Dataset",
    model: NBModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "predicted_lang",
    keep_cols: tuple[str, ...] = (),
) -> "ray.data.Dataset":
    """Score + argmax per document (ties -> smallest label).  The model
    rides in the task closure — broadcast once, vectorized per batch.
    ``keep_cols`` pass through verbatim next to the prediction."""
    labels, vocab = model.labels, model.vocab
    log_prior, log_like, log_unseen = (
        model.log_prior,
        model.log_like,
        model.log_unseen,
    )
    # vocab lookups run through pc.index_in against this broadcast
    # Arrow array — no per-batch object ndarray, no searchsorted
    vocab_pa = pa.array(vocab.astype(str) if len(vocab) else [], type=pa.string())

    def score(t: pa.Table) -> pa.Table:
        n = t.num_rows
        toks = pc.split_pattern(
            t[text_col].cast(pa.string()).fill_null(""), " "
        )
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "")
        keep_np = keep.to_numpy(zero_copy_only=False)
        words = flat.filter(keep)
        doc_of = np.repeat(np.arange(n), lens)[keep_np]
        scores = np.tile(log_prior, (n, 1))
        if len(words):
            wi = pc.fill_null(pc.index_in(words, value_set=vocab_pa), -1)
            wi = wi.to_numpy(zero_copy_only=False).astype(np.int64)
            seen = wi >= 0
            ll = np.where(
                seen[:, None], log_like[np.maximum(wi, 0)], log_unseen[None, :]
            )
            for c in range(len(labels)):
                scores[:, c] += np.bincount(
                    doc_of, weights=ll[:, c], minlength=n
                )
        pred = labels[np.argmax(scores, axis=1)]  # argmax takes FIRST max
        # labels sorted ascending -> first max IS the smallest label
        return pa.Table.from_arrays(
            [t[id_col].combine_chunks()]
            + [t[c].combine_chunks() for c in keep_cols]
            + [pa.array(pred.astype(str), type=pa.string())],
            names=[id_col, *keep_cols, out_col],
        )

    return ds.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# registry surface

_NB_CACHE: dict = {}


def q_text_classify_nb(sf_dir: str):
    """TRAIN + PREDICT as one pipeline over the documents table: fit
    multinomial NB (label = lang, features = space-split words, add-one
    smoothing) on the full corpus, then classify every document.
    Closed-form counts make the whole thing SQL-expressible — the
    oracle recomputes priors, likelihoods and the per-document argmax
    (ties on the smaller lang) in DuckDB."""
    from .sources import read_table

    model = _NB_CACHE.get(sf_dir)
    if model is None:
        model = nb_train(
            read_table(sf_dir, "documents", columns=["lang", "text"]), "lang"
        )
        _NB_CACHE[sf_dir] = model
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return nb_predict(docs, model)


NB_SQL = """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
    tok2 AS (SELECT doc_id, w FROM tok WHERE w <> ''),
    cw AS (SELECT d.lang, t.w, count(*) AS c
           FROM tok2 t JOIN documents d USING (doc_id) GROUP BY d.lang, t.w),
    totals AS (SELECT lang, sum(c) AS tot FROM cw GROUP BY lang),
    vocab AS (SELECT count(DISTINCT w) AS v FROM tok2),
    classes AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    ndocs AS (SELECT count(*) AS n FROM documents),
    tokscore AS (
      SELECT t.doc_id, cl.lang,
             sum(ln((COALESCE(cw.c, 0) + 1)::DOUBLE / (tt.tot + v.v))) AS s
      FROM tok2 t
      CROSS JOIN classes cl
      CROSS JOIN vocab v
      LEFT JOIN cw ON cw.lang = cl.lang AND cw.w = t.w
      JOIN totals tt ON tt.lang = cl.lang
      GROUP BY t.doc_id, cl.lang),
    scores AS (
      SELECT d.doc_id, cl.lang,
             ln(cl.n::DOUBLE / nd.n) + COALESCE(ts.s, 0) AS score
      FROM documents d
      CROSS JOIN classes cl
      CROSS JOIN ndocs nd
      LEFT JOIN tokscore ts ON ts.doc_id = d.doc_id AND ts.lang = cl.lang)
    SELECT doc_id, lang AS predicted_lang FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, lang) AS rn
      FROM scores) WHERE rn = 1"""


def q_corpus_route_nb(sf_dir: str):
    """Classifier-driven corpus routing (the label-noise / quality gate
    of a curation pipeline, A1's verdict routing with a LEARNED
    verdict): every document is scored by the trained NB model and
    routed ``keep`` when the prediction agrees with its recorded lang,
    ``quarantine`` otherwise — the standard agreement filter before
    training-data export. Pure composition: the broadcast model scores
    in the same stateless pass that assigns the route column."""
    from .sources import read_table

    model = _NB_CACHE.get(sf_dir)
    if model is None:
        model = nb_train(
            read_table(sf_dir, "documents", columns=["lang", "text"]), "lang"
        )
        _NB_CACHE[sf_dir] = model
    docs = read_table(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    scored = nb_predict(docs, model, keep_cols=("lang",))

    def route(t: pa.Table) -> pa.Table:
        agree = pc.equal(t["predicted_lang"], t["lang"])
        r = pc.if_else(agree, "keep", "quarantine")
        return t.append_column("route", r)

    return scored.map_batches(route, batch_format="pyarrow")


ROUTE_SQL = (
    NB_SQL.replace(
        "SELECT doc_id, lang AS predicted_lang FROM (",
        """SELECT p.doc_id, d.lang, p.lang AS predicted_lang,
           CASE WHEN p.lang = d.lang THEN 'keep' ELSE 'quarantine' END AS route
    FROM (""",
    ).replace(
        "FROM scores) WHERE rn = 1",
        "FROM scores) p JOIN documents d USING (doc_id) WHERE p.rn = 1",
    )
)


def q_text_classify_eval(sf_dir: str):
    """Classifier EVALUATION as a distributed aggregate: the confusion
    matrix (lang x predicted_lang -> count) of the trained NB model over
    its training corpus — the quality report a curation pipeline ships
    next to the routed output. One vectorized predict pass + one
    combiner-first count aggregation; oracle = the NB score SQL joined
    back to documents and grouped."""
    from ray.data.aggregate import Sum

    from .sources import read_table

    model = _NB_CACHE.get(sf_dir)
    if model is None:
        model = nb_train(
            read_table(sf_dir, "documents", columns=["lang", "text"]), "lang"
        )
        _NB_CACHE[sf_dir] = model
    docs = read_table(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    scored = nb_predict(docs, model, keep_cols=("lang",))

    def partial(t: pa.Table) -> pa.Table:
        # two-column Arrow group_by — no separator pack to alias, no
        # object ndarrays (a raw label containing \x1f would have
        # mis-split the old packed form)
        g = (
            t.select(["lang", "predicted_lang"])
            .group_by(["lang", "predicted_lang"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["lang", "predicted_lang", "n_docs"]).set_column(
            2, "n_docs", g["count_all"].cast(pa.int64())
        )

    return (
        scored.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "predicted_lang"])
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )


EVAL_SQL = (
    NB_SQL.replace(
        "SELECT doc_id, lang AS predicted_lang FROM (",
        """SELECT d.lang, p.lang AS predicted_lang,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM (""",
    ).replace(
        "FROM scores) WHERE rn = 1",
        "FROM scores) p JOIN documents d USING (doc_id) "
        "WHERE p.rn = 1 GROUP BY d.lang, p.lang",
    )
)


def registry():
    return {
        "text_classify_nb": q_text_classify_nb,
        "corpus_route_nb": q_corpus_route_nb,
        "text_classify_eval": q_text_classify_eval,
    }, {
        "text_classify_nb": NB_SQL,
        "corpus_route_nb": ROUTE_SQL,
        "text_classify_eval": EVAL_SQL,
    }
