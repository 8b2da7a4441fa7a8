"""Persisted LSH signature index (ray_cdc_lake/nearindex.py).

Bar: probe verdicts equal a transparent brute-force model (band
candidacy + signature-agreement threshold + the orientation rule
"indexed doc or earlier new doc", best partner by highest estimate then
smallest id); appends are exactly-once and crash-safe (data without a
manifest entry is invisible); probes read only the probe's bucket
partitions; the index grows micro-batch by micro-batch."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest

from ray_cdc_lake.dedup import BANDS, NUM_HASHES, ROWS_PER_BAND, minhash_signature
from ray_cdc_lake.nearindex import (
    index_append,
    index_probe,
    read_index_manifest,
)

THRESHOLD = 0.5


def _docs_ds(d: dict[int, str]):
    import ray.data as rd

    return rd.from_arrow(
        pa.Table.from_arrays(
            [
                pa.array(list(d.keys()), type=pa.int64()),
                pa.array(list(d.values()), type=pa.string()),
            ],
            names=["doc_id", "text"],
        )
    )


def _expected(existing: dict[int, str], new: dict[int, str]):
    """Brute-force model: LSH band candidacy, then agreement >= 0.5;
    partner must be indexed or an earlier (smaller-id) new doc; best
    partner = max estimate, ties to smallest id."""
    sigs = {i: minhash_signature(t) for i, t in {**existing, **new}.items()}

    def bands(s):
        return {tuple(s.reshape(BANDS, ROWS_PER_BAND)[b]) + (b,) for b in range(BANDS)}

    bnd = {i: bands(s) for i, s in sigs.items()}
    out = {}
    for d in new:
        best = None
        for p in list(existing) + [x for x in new if x < d]:
            if not (bnd[d] & bnd[p]):
                continue
            est = float((sigs[d] == sigs[p]).mean())
            if est < THRESHOLD:
                continue
            if best is None or est > best[1] or (est == best[1] and p < best[0]):
                best = (p, est)
        if best:
            out[d] = best
    return out


def _verdicts(root, new):
    got = index_probe(root, _docs_ds(new), threshold=THRESHOLD).to_pandas()
    return {
        int(r.doc_id): (int(r.dup_of), float(r.jaccard_est))
        for r in got.itertuples()
    }


def _mk_corpus(rng, n, vocab, n_words=10):
    return {
        i: " ".join(rng.choice(vocab, n_words)) for i in range(n)
    }


def test_probe_matches_bruteforce(tmp_path):
    rng = np.random.default_rng(11)
    vocab = np.array([f"w{i}" for i in range(40)], dtype=object)
    existing = _mk_corpus(rng, 30, vocab)
    # new batch: fresh docs + exact copies of indexed docs + near copies
    # + an intra-batch duplicate pair
    new = {100 + i: " ".join(rng.choice(vocab, 10)) for i in range(10)}
    new[120] = existing[3]  # exact copy of indexed
    new[121] = existing[7] + " extra"  # near copy of indexed
    new[122] = new[100]  # intra-batch exact copy (later id)
    new[123] = existing[3]  # second copy: indexed partner preferred over 120?
    root = str(tmp_path / "sigidx")
    index_append(root, "base", _docs_ds(existing))
    got = _verdicts(root, new)
    want = _expected(existing, new)
    assert got.keys() == want.keys()
    for d in want:
        assert got[d][0] == want[d][0], (d, got[d], want[d])
        assert got[d][1] == pytest.approx(want[d][1])
    # sanity: the planted exact copies are found with estimate 1.0
    assert got[120] == (3, 1.0)
    assert got[122][0] == 100 and got[122][1] == 1.0


def test_append_idempotent_and_crash_safe(tmp_path):
    rng = np.random.default_rng(5)
    vocab = np.array([f"w{i}" for i in range(30)], dtype=object)
    existing = _mk_corpus(rng, 10, vocab)
    root = str(tmp_path / "sigidx")
    m1 = index_append(root, "base", _docs_ds(existing))
    m2 = index_append(root, "base", _docs_ds(existing))  # same txn id: no-op
    assert m1.version == m2.version == 1 and m2.txns == ["base"]

    # simulate a crashed append: data dir present, no manifest entry
    orphan = os.path.join(root, "data", "crashed")
    os.makedirs(os.path.join(orphan, "bucket=0"), exist_ok=True)
    import pyarrow.parquet as pq

    sig = pa.FixedSizeListArray.from_arrays(
        pa.array(np.zeros(NUM_HASHES, dtype=np.uint64)), NUM_HASHES
    )
    pq.write_table(
        pa.Table.from_arrays(
            [
                pa.array([0], type=pa.int64()),
                pa.array([0], type=pa.int64()),
                pa.array([999], type=pa.int64()),
                sig,
            ],
            names=["band_key", "bucket", "doc_id", "sig"],
        ),
        os.path.join(orphan, "bucket=0", "part.parquet"),
    )
    assert read_index_manifest(root).txns == ["base"]
    # a probe of an exact copy of an existing doc still works and the
    # orphan's doc 999 never surfaces as a partner
    got = _verdicts(root, {200: existing[0]})
    assert got[200][0] != 999 and got[200][1] == 1.0


def test_incremental_growth(tmp_path):
    rng = np.random.default_rng(9)
    vocab = np.array([f"w{i}" for i in range(30)], dtype=object)
    b1 = _mk_corpus(rng, 8, vocab)
    root = str(tmp_path / "sigidx")
    index_append(root, "batch-1", _docs_ds(b1))
    # batch 2: one dup of batch 1, one fresh
    b2 = {50: b1[2], 51: " ".join(rng.choice(vocab, 10))}
    got = _verdicts(root, b2)
    assert 50 in got and got[50] == (2, 1.0)
    assert 51 not in got
    m = index_append(root, "batch-2", _docs_ds({51: b2[51]}))
    assert m.txns == ["batch-1", "batch-2"]
    # batch 3 now sees batch 2's survivor as indexed
    got3 = _verdicts(root, {60: b2[51]})
    assert got3[60] == (51, 1.0)


def test_probe_reads_only_probe_buckets(tmp_path):
    from ray_cdc_lake.nearindex import _probe_files, _store

    rng = np.random.default_rng(3)
    vocab = np.array([f"w{i}" for i in range(30)], dtype=object)
    root = str(tmp_path / "sigidx")
    index_append(root, "base", _docs_ds(_mk_corpus(rng, 40, vocab)))
    m = read_index_manifest(root)
    store = _store(None)
    all_buckets = {
        int(e.split("=", 1)[1])
        for e in store.listdir(os.path.join(root, "data", "base"))
    }
    some = set(list(sorted(all_buckets))[:3])
    files = _probe_files(root, m, some, store)
    assert files, "pruned probe must still find its buckets' files"
    for f in files:
        b = int(f.split("bucket=")[1].split(os.sep)[0])
        assert b in some


def test_index_vacuum_age_gated(tmp_path):
    rng = np.random.default_rng(2)
    vocab = np.array([f"w{i}" for i in range(20)], dtype=object)
    root = str(tmp_path / "sigidx")
    index_append(root, "base", _docs_ds(_mk_corpus(rng, 6, vocab)))
    orphan = os.path.join(root, "data", "crashed", "bucket=0")
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "x.parquet"), "wb") as f:
        f.write(b"junk")
    from ray_cdc_lake.nearindex import index_vacuum

    # inside the grace window the orphan is kept (could be an appender
    # between data move and manifest claim)
    assert index_vacuum(root) == []
    removed = index_vacuum(root, grace_s=0)
    assert any("crashed" in r for r in removed)
    assert read_index_manifest(root).txns == ["base"]
    assert os.path.isdir(os.path.join(root, "data", "base"))


def test_index_compact_folds_and_preserves_verdicts(tmp_path):
    from ray_cdc_lake.nearindex import index_compact

    rng = np.random.default_rng(7)
    vocab = np.array([f"w{i}" for i in range(30)], dtype=object)
    root = str(tmp_path / "sigidx")
    b1 = _mk_corpus(rng, 10, vocab)
    b2 = {20 + i: " ".join(rng.choice(vocab, 10)) for i in range(10)}
    index_append(root, "t1", _docs_ds(b1))
    index_append(root, "t2", _docs_ds(b2))
    probe = {90: b1[4], 91: b2[25], 92: " ".join(rng.choice(vocab, 10))}
    before = _verdicts(root, probe)
    m = index_compact(root)
    assert len(m.txns) == 1 and m.txns[0].startswith("compact-")
    assert _verdicts(root, probe) == before
    # superseded dirs SURVIVE the fold (in-flight readers may still be
    # on them); the age-gated vacuum is what reclaims them
    assert set(m.txns) < set(os.listdir(os.path.join(root, "data")))
    from ray_cdc_lake.nearindex import index_vacuum

    index_vacuum(root, grace_s=0)
    assert set(os.listdir(os.path.join(root, "data"))) == set(m.txns)
    assert _verdicts(root, probe) == before
    # compacting a single-txn index is a no-op
    assert index_compact(root).version == m.version


def test_index_compact_carries_concurrent_append(tmp_path):
    """An append that lands BETWEEN the fold's snapshot and its manifest
    claim must survive: the claim loop carries unknown txns forward."""
    from ray_cdc_lake import nearindex
    from ray_cdc_lake.nearindex import index_compact

    rng = np.random.default_rng(13)
    vocab = np.array([f"w{i}" for i in range(30)], dtype=object)
    root = str(tmp_path / "sigidx")
    b1 = _mk_corpus(rng, 6, vocab)
    b2 = {30: " ".join(rng.choice(vocab, 10))}
    late = {40: " ".join(rng.choice(vocab, 10))}
    index_append(root, "t1", _docs_ds(b1))
    index_append(root, "t2", _docs_ds(b2))

    real_read = nearindex.read_index_manifest
    state = {"compact_reads": 0, "fired": False}

    def racing_read(r, store=None):
        m = real_read(r, store)
        import inspect

        if inspect.stack()[1].function == "index_compact":
            state["compact_reads"] += 1
            # the 1st compact read is the fold SNAPSHOT; inject the
            # append at the 2nd (the claim-loop read), after the fold's
            # coverage was fixed
            if state["compact_reads"] == 2 and not state["fired"]:
                state["fired"] = True
                index_append(r, "t-late", _docs_ds(late))
                return real_read(r, store)
        return m

    import unittest.mock as mock

    with mock.patch.object(nearindex, "read_index_manifest", racing_read):
        m = index_compact(root)
    assert "t-late" in m.txns and m.txns[0].startswith("compact-")
    got = _verdicts(root, {99: late[40]})
    assert got[99] == (40, 1.0)


def test_index_fsck_healthy_and_detects_damage(tmp_path):
    """index_fsck: green on a healthy append+compact chain; catches a
    manifest txn whose data dir vanished and a file whose band_key sort
    (the probe's row-group pruning invariant) was broken."""
    import shutil

    import pyarrow.parquet as pq

    from ray_cdc_lake.nearindex import (
        DATA_DIR,
        index_compact,
        index_fsck,
        read_index_manifest,
    )

    rng = np.random.default_rng(3)
    vocab = np.array([f"w{i}" for i in range(30)], dtype=object)
    root = str(tmp_path / "sigidx")
    index_append(root, "t1", _docs_ds(_mk_corpus(rng, 12, vocab)))
    index_append(root, "t2", _docs_ds(_mk_corpus(rng, 12, vocab)))
    rep = index_fsck(root, data=True)
    assert rep["fails"] == [] and rep["files_checked"] > 0
    index_compact(root)
    index_append(root, "t3", _docs_ds(_mk_corpus(rng, 6, vocab)))
    rep = index_fsck(root, data=True)
    # the folded-away t1/t2 dirs are orphans (informational, vacuumable)
    assert rep["fails"] == [] and rep["orphan_data"] == ["t1", "t2"]
    from ray_cdc_lake.nearindex import index_vacuum

    index_vacuum(root, grace_s=0)
    rep = index_fsck(root, data=True)
    assert rep["fails"] == [] and rep["orphan_data"] == []

    # damage 1: break the within-file band_key sort of one live file
    m = read_index_manifest(root)
    tdir = os.path.join(root, DATA_DIR, m.txns[0])
    bdir = os.path.join(tdir, sorted(os.listdir(tdir))[0])
    f = os.path.join(bdir, sorted(os.listdir(bdir))[0])
    t = pq.read_table(f)
    if t.num_rows > 1:
        rev = t.take(list(range(t.num_rows - 1, -1, -1)))
        pq.write_table(rev.select(["band_key", "doc_id", "sig"]), f)
        rep = index_fsck(root, data=True)
        assert any("not sorted" in x for x in rep["fails"]), rep

    # damage 2: a committed txn loses its data dir entirely
    shutil.rmtree(os.path.join(root, DATA_DIR, m.txns[-1]))
    rep = index_fsck(root)
    assert any("no data directory" in x for x in rep["fails"]), rep


def test_two_compactors_never_duplicate_rows(tmp_path, monkeypatch):
    """Two compactors fold the same snapshot; the loser's claim-time
    manifest no longer lists its base txns, so it must ABORT its stale
    fold instead of committing it alongside the winner's (which would
    list every row twice)."""
    import ray_cdc_lake.nearindex as ni

    rng = np.random.default_rng(9)
    vocab = np.array([f"w{i}" for i in range(30)], dtype=object)
    root = str(tmp_path / "sigidx")
    corpus = _mk_corpus(rng, 10, vocab)
    index_append(root, "t1", _docs_ds(corpus))
    index_append(
        root, "t2", _docs_ds({100 + k: t for k, t in list(corpus.items())[:5]})
    )
    stale = ni.read_index_manifest(root)  # both compactors' snapshot

    # compactor A wins outright; superseded base dirs stay on disk for
    # in-flight readers (age-gated vacuum reclaims them later)
    m_a = ni.index_compact(root)
    assert m_a.txns[0].startswith("compact-") and len(m_a.txns) == 1
    for t in stale.txns:
        assert os.path.isdir(os.path.join(root, ni.DATA_DIR, t))

    # compactor B raced: its SNAPSHOT read happened before A's claim
    real_read = ni.read_index_manifest
    calls = {"n": 0}

    def stale_first(root_, store=None):
        calls["n"] += 1
        if calls["n"] == 1:
            return stale
        return real_read(root_, store)

    monkeypatch.setattr(ni, "read_index_manifest", stale_first)
    m_b = ni.index_compact(root)
    monkeypatch.setattr(ni, "read_index_manifest", real_read)

    # B adopted A's manifest instead of double-listing the fold
    assert m_b.txns == m_a.txns, (m_b.txns, m_a.txns)
    # and no doc is reported duplicated against itself twice: a probe
    # with one exact copy per indexed doc yields exactly one verdict per
    # probe doc, est 1.0 (duplicated index rows would still dedup in the
    # verdict, so ALSO check the raw committed row total)
    import pyarrow.parquet as pq

    rows = 0
    for t in real_read(root).txns:
        tdir = os.path.join(root, ni.DATA_DIR, t)
        for b in os.listdir(tdir):
            for f in os.listdir(os.path.join(tdir, b)):
                if f.endswith(".parquet"):
                    rows += pq.ParquetFile(
                        os.path.join(tdir, b, f)
                    ).metadata.num_rows
    from ray_cdc_lake.dedup import BANDS

    assert rows == 15 * BANDS  # one band row per (doc, band), nothing twice
    rep = ni.index_fsck(root, data=True)
    assert rep["fails"] == [], rep


def test_index_fsck_reports_stray_file_instead_of_crashing(tmp_path):
    """A stray regular file inside a committed txn dir is exactly the
    damage the audit surveys — it must land in fails, not crash the
    walk with NotADirectoryError."""
    from ray_cdc_lake.nearindex import DATA_DIR, index_fsck, read_index_manifest

    rng = np.random.default_rng(2)
    vocab = np.array([f"w{i}" for i in range(20)], dtype=object)
    root = str(tmp_path / "sigidx")
    index_append(root, "t1", _docs_ds(_mk_corpus(rng, 6, vocab)))
    m = read_index_manifest(root)
    stray = os.path.join(root, DATA_DIR, m.txns[0], "stray.marker")
    with open(stray, "w") as f:
        f.write("x")
    rep = index_fsck(root, data=True)
    assert any("non-directory" in x for x in rep["fails"]), rep
    assert rep["files_checked"] > 0  # the walk continued past the stray
