"""Kernel-level properties of the downstream CDC consumers
(cdc_views.py), complementing the end-to-end DuckDB oracles in
test_queries_vs_duckdb.py: combiner associativity, prefix-scan
partitioning invariance, and SCD2 interval laws on ANY input."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from ray_cdc_lake import cdc_views as cv


# ---------------------------------------------------------------------------
# patch_reduce: the per-column LWW fold must be associative (combiner-safe)
# ---------------------------------------------------------------------------

patch_rows_st = st.lists(
    st.tuples(
        st.integers(0, 3),  # key id
        st.integers(0, 10**6),  # lsn (may collide: duplicate deliveries)
        st.booleans(),  # carries content?
        st.booleans(),  # carries lang?
    ),
    min_size=1,
    max_size=120,
)


def _patch_table(rows) -> pa.Table:
    # value encodes (key, lsn) so a wrong pick is visible; duplicate
    # deliveries (same key+lsn) correctly encode to the same value
    return pa.table(
        {
            "repo": pa.array([f"r{k % 2}" for k, _, _, _ in rows]),
            "path": pa.array([f"p{k}" for k, _, _, _ in rows]),
            "lsn": pa.array([l for _, l, _, _ in rows], type=pa.int64()),
            "content": pa.array(
                [f"c-{k}-{l}" if hc else None for k, l, hc, _ in rows]
            ),
            "content_lsn": pa.array(
                [l if hc else -1 for _, l, hc, _ in rows], type=pa.int64()
            ),
            "lang": pa.array([f"g-{k}-{l}" if hg else None for k, l, _, hg in rows]),
            "lang_lsn": pa.array(
                [l if hg else -1 for _, l, _, hg in rows], type=pa.int64()
            ),
        }
    )


def _canon(t: pa.Table) -> list[tuple]:
    cols = ["repo", "path", "lsn", "content", "content_lsn", "lang", "lang_lsn"]
    rows = [tuple(t[c][i].as_py() for c in cols) for i in range(t.num_rows)]
    return sorted(rows, key=lambda r: (r[0], r[1]))


@settings(max_examples=80, deadline=None)
@given(rows=patch_rows_st, cut=st.integers(0, 120))
def test_patch_reduce_associative(rows, cut):
    """reduce(reduce(A) ++ reduce(B)) == reduce(A ++ B) for every split —
    the law that makes the map-side combiner lossless."""
    cut = min(cut, len(rows))
    whole = cv.patch_reduce(_patch_table(rows))
    a, b = rows[:cut], rows[cut:]
    parts = [cv.patch_reduce(_patch_table(p)) for p in (a, b) if p]
    recombined = cv.patch_reduce(pa.concat_tables(parts, promote_options="permissive"))
    assert _canon(whole) == _canon(recombined)


# ---------------------------------------------------------------------------
# watermark prefix scan: range width must not change the answer
# ---------------------------------------------------------------------------


def _naive_watermark(eid: np.ndarray, ets: np.ndarray):
    order = np.argsort(eid, kind="stable")
    wm = np.maximum.accumulate(ets[order])
    return eid[order], ets[order], wm


@settings(max_examples=60, deadline=None)
@given(
    ets=st.lists(st.integers(-(10**15), 10**15), min_size=1, max_size=200),
    width=st.integers(1, 50),
)
def test_prefix_scan_width_invariance(ets, width):
    """Computing the running max per range (seeded by the exclusive
    prefix of earlier-range maxima) equals the sequential scan for EVERY
    range width — the distributed decomposition is exact."""
    ets = np.array(ets, dtype=np.int64)
    eid = np.arange(len(ets), dtype=np.int64)
    _, _, want = _naive_watermark(eid, ets)

    rng = eid // width
    # stage A: per-range maxima; exclusive prefix
    prefix = {}
    run = np.iinfo(np.int64).min
    for b in np.unique(rng):
        prefix[int(b)] = run
        run = max(run, int(ets[rng == b].max()))
    # stage B: per-range seeded cummax, in any range order
    got = np.empty_like(want)
    for b in np.unique(rng)[::-1]:
        m = rng == b
        seg = ets[m]
        got[np.nonzero(m)[0]] = np.maximum(np.maximum.accumulate(seg), prefix[int(b)])
    assert (got == want).all()


def test_watermark_flags_late_events(sf_tiny, ray_session):
    """The synthetic delay produces a nontrivial late fraction, and no
    event is flagged whose event-time IS the current watermark."""
    t = pa.concat_tables(
        list(
            cv.q_events_watermark(sf_tiny).iter_batches(
                batch_size=None, batch_format="pyarrow"
            )
        )
    )
    late = t["is_late"].to_numpy(zero_copy_only=False)
    assert 0 < late.sum() < t.num_rows
    ets = t["event_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    wm = t["watermark"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    assert (wm >= ets).all()
    assert (late == (ets < wm - cv.LATENESS_US)).all()


# ---------------------------------------------------------------------------
# SCD2: interval laws over the real derived log
# ---------------------------------------------------------------------------


def test_scd2_intervals_disjoint_and_anchored(sf_tiny, ray_session):
    """Per key: intervals ordered by valid_from are non-overlapping
    (valid_to <= next valid_from), exactly one OPEN interval per key that
    is live in the final state, and zero open intervals for deleted keys."""
    import polars as pl

    from ray_cdc_lake.queries import q_cdc_final_state

    hist = pa.concat_tables(
        cv.q_cdc_scd2_history(sf_tiny).iter_batches(
            batch_size=None, batch_format="pyarrow"
        ),
        promote_options="permissive",
    )
    df = pl.from_arrow(hist).sort(["repo", "path", "valid_from"])
    g = df.group_by(["repo", "path"], maintain_order=True).agg(
        pl.col("valid_from"), pl.col("valid_to"), pl.col("is_current").sum().alias("n_open")
    )
    for vf, vt in zip(g["valid_from"], g["valid_to"]):
        vf, vt = vf.to_list(), vt.to_list()
        for i in range(len(vf) - 1):
            assert vt[i] is not None and vt[i] <= vf[i + 1]
        # the last interval is the only one allowed to be open
        assert all(v is not None for v in vt[:-1])
    # open intervals == live keys in the final state
    final = pa.concat_tables(
        q_cdc_final_state(sf_tiny).iter_batches(batch_size=None, batch_format="pyarrow"),
        promote_options="permissive",
    )
    live = {(r, p) for r, p in zip(final["repo"].to_pylist(), final["path"].to_pylist())}
    open_keys = {
        (r, p)
        for r, p, n in zip(g["repo"], g["path"], g["n_open"])
        if n == 1
    }
    multi_open = [k for k, n in zip(zip(g["repo"], g["path"]), g["n_open"]) if n > 1]
    assert not multi_open
    assert open_keys == live


# ---------------------------------------------------------------------------
# merge_rules: the MERGE-INTO rule table vs a naive per-key reference
# ---------------------------------------------------------------------------

merge_rows_st = st.lists(
    st.tuples(
        st.integers(0, 5),  # key id
        st.sampled_from(["none", "live"]),  # target presence
        st.sampled_from(["none", "insert", "update", "delete"]),  # source op
        st.sampled_from(["de", "en", "fr"]),  # target lang
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda r: r[0],
)


@given(merge_rows_st)
@settings(max_examples=60, deadline=None)
def test_merge_rules_match_naive_reference(rows):
    tagged = []
    expect = {}
    for k, tgt, sop, lang in rows:
        key = f"p{k}"
        has_t = tgt == "live"
        has_s = sop != "none"
        if not has_t and not has_s:
            continue
        if has_t:
            tagged.append(("r", key, f"tc{k}", lang, f"told{k}", k, "live", "tgt"))
        if has_s:
            tagged.append(("r", key, f"sc{k}", "xx", f"snew{k}", 100 + k, sop, "src"))
        # naive rule table
        if not has_s:
            expect[key] = ("unchanged", f"tc{k}", k)
        elif sop == "delete":
            if has_t and lang == "de":
                expect[key] = ("protected", f"tc{k}", k)
            # else dropped (matched delete, or src-only delete)
        elif not has_t:
            expect[key] = ("inserted", f"sc{k}", 100 + k)
        else:
            expect[key] = ("updated", f"sc{k}", 100 + k)
    if not tagged:
        return
    g = pa.table(
        {
            "repo": pa.array([r[0] for r in tagged]),
            "path": pa.array([r[1] for r in tagged]),
            "commit": pa.array([r[2] for r in tagged]),
            "lang": pa.array([r[3] for r in tagged]),
            "content": pa.array([r[4] for r in tagged], type=pa.large_string()),
            "lsn": pa.array([r[5] for r in tagged], type=pa.int64()),
            "op": pa.array([r[6] for r in tagged]),
            "_side": pa.array([r[7] for r in tagged]),
        }
    )
    out = cv.merge_rules(g)
    got = {
        p: (a, c, l)
        for p, a, c, l in zip(
            out["path"].to_pylist(),
            out["action"].to_pylist(),
            out["commit"].to_pylist(),
            out["lsn"].to_pylist(),
        )
    }
    assert got == expect
