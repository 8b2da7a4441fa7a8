"""Persisted MinHash-LSH signature index + incremental near-dup probe —
the production shape of near-duplicate deduplication for a corpus that
GROWS: the corpus lake accumulates documents in micro-batches, and each
new batch must be checked against everything already committed without
re-running LSH over the whole history.

This is the near-dup twin of ``dedup.q_dedup_incremental`` (exact
bloom + anti-join) and composes the same machinery the CDC lake is
built from:

* The index is a partitioned parquet table of exploded band rows
  ``(band_key, doc_id, sig)`` under ``data/{txn}/bucket={B}/`` where
  ``B = band_key % NUM_PAIR_BUCKETS`` — the SAME coarse shuffle key the
  batch LSH uses, so probe and index co-partition by construction.
* Appends are EXACTLY-ONCE via the lake's own staged-write + atomic
  manifest-claim protocol (LakeStore.claim_with_content): data files
  stay invisible until a manifest lists their txn; a crashed append
  leaves reclaimable orphans; re-running a committed txn id is a no-op.
* A probe reads ONLY the bucket partitions its band keys name — at
  10^10 indexed docs a small update batch touches its own buckets'
  files, never the index's full breadth — then ONE groupby co-locates
  index and probe rows and the signature-agreement verification runs
  group-locally (the signature travels with the band row; no second
  join), exactly like dedup.q_dedup_minhash's kernel.

New-batch semantics: a new doc is a duplicate when some INDEXED doc, or
an earlier doc of the same batch (smaller doc_id — deterministic),
shares a band and agrees on >= threshold of signature positions.
Reference analog: the pre-apply key-existence probe
(S3Utils.kt:27-33) lifted from exact keys to near-duplicate content.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from .dedup import (
    NUM_HASHES,
    NUM_PAIR_BUCKETS,
    RUN_VERIFY_CAP,
    _runs,
    minhash_lsh_fn,
)
from .kernels import import_polars as _pl

DATA_DIR = "data"
STAGING_DIR = "_staging"
MANIFEST_DIR = "_manifests"
# probe band_key sets beyond this ride-along size stop paying for
# themselves (the filter ships with every read task); fall back to the
# full bucket-partition scan
PROBE_KEY_PUSHDOWN_MAX = 4_000_000


@dataclass
class IndexManifest:
    version: int = 0
    txns: list[str] = field(default_factory=list)


def _store(store):
    if store is not None:
        return store
    from .sink import _DEFAULT_STORE

    return _DEFAULT_STORE


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(root, MANIFEST_DIR, f"manifest-{version:06d}.json")


def read_index_manifest(root: str, store=None) -> IndexManifest | None:
    store = _store(store)
    mdir = os.path.join(root, MANIFEST_DIR)
    if not store.isdir(mdir):
        return None
    versions = [
        int(f[len("manifest-") : -len(".json")])
        for f in store.listdir(mdir)
        if f.startswith("manifest-") and f.endswith(".json")
    ]
    if not versions:
        return None
    v = max(versions)
    d = json.loads(store.read_text(_manifest_path(root, v)))
    return IndexManifest(version=d["version"], txns=list(d["txns"]))


def index_append(
    root: str, txn_id: str, docs, store=None
) -> IndexManifest:
    """Explode ``docs`` (doc_id, text) into band rows and commit them to
    the index under ``txn_id`` — exactly-once: already-committed txn ids
    return immediately; a crash before the manifest claim leaves the
    data dir unreferenced (invisible to probes, safe to redo)."""
    store = _store(store)
    m = read_index_manifest(root, store) or IndexManifest()
    if txn_id in m.txns:
        return m

    staging = os.path.join(root, STAGING_DIR, txn_id)
    final = os.path.join(root, DATA_DIR, txn_id)
    for d in (staging, final):
        store.rmtree(d)
    store.makedirs(staging)
    rows = docs.map_batches(minhash_lsh_fn, batch_format="pyarrow")
    # range-sort by (bucket, band_key): the partitioned write then
    # emits ~1 file per bucket per txn instead of blocks x buckets tiny
    # files (measured 8184 -> ~130 at sf0.1; probe read planning was
    # dominated by file count), and WITHIN each file rows are
    # band_key-ordered so row-group stats are tight band_key ranges —
    # the probe's isin() pushdown prunes row groups from footer stats.
    # One all-to-all over band rows — index-sized, not corpus-sized.
    rows = rows.sort(["bucket", "band_key"])
    rows.write_parquet(
        staging,
        partition_cols=["bucket"],
        filesystem=store.fs,
        compression="zstd",
    )
    store.makedirs(os.path.dirname(final))
    store.replace_dir(staging, final)

    # optimistic manifest claim (retry on conflict; idempotent re-check)
    while True:
        m = read_index_manifest(root, store) or IndexManifest()
        if txn_id in m.txns:
            return m
        new = IndexManifest(version=m.version + 1, txns=[*m.txns, txn_id])
        store.makedirs(os.path.join(root, MANIFEST_DIR))
        tmp = os.path.join(root, MANIFEST_DIR, f".tmp-{txn_id}-{new.version}")
        store.write_text(
            tmp, json.dumps({"version": new.version, "txns": new.txns})
        )
        try:
            store.claim_with_content(tmp, _manifest_path(root, new.version))
            return new
        except FileExistsError:
            continue  # someone else advanced the chain; re-read and retry
        finally:
            try:
                store.delete_file(tmp)
            except OSError:
                pass


def index_compact(root: str, store=None) -> IndexManifest:
    """Fold every committed txn's band rows into ONE compact txn — the
    index's read-fan-in bound (probe cost per bucket is files-per-bucket
    footer opens; a long append chain grows it linearly; compaction
    returns it to 1).  Concurrent-append-safe: the manifest claim loop
    carries FORWARD any txn committed after the fold's snapshot (the
    fold covers exactly the snapshot's txns, newcomers stay listed), so
    no append is ever silently dropped.  Concurrent-COMPACTOR-safe: if
    the claim-time manifest no longer lists every base txn of this
    fold's snapshot, another compactor already folded them — committing
    ours too would list the same rows twice, so the stale fold aborts
    (dir removed) and the winner's manifest is adopted.  Superseded
    dirs are NOT deleted here — a reader that planned from the prior
    manifest may still be mid-read; the age-gated ``index_vacuum``
    reclaims them (crashed folds too) after the grace window."""
    import ray.data as rd

    import uuid

    store = _store(store)
    m = read_index_manifest(root, store) or IndexManifest()
    if len(m.txns) <= 1:
        return m
    base = list(m.txns)
    # NONCE'd fold id (the rescale.py step-dir discipline): two
    # compactors racing from the same snapshot would otherwise derive
    # the SAME name, and the loser's staging prologue rmtree would
    # delete the winner's committed fold. Compact ids need no
    # idempotence — a crashed fold is redone under a fresh id and the
    # unreferenced dir is age-gated vacuumable.
    txn = f"compact-{m.version + 1:06d}-{uuid.uuid4().hex[:8]}"
    staging = os.path.join(root, STAGING_DIR, txn)
    final = os.path.join(root, DATA_DIR, txn)
    for d in (staging, final):
        store.rmtree(d)
    store.makedirs(staging)
    files: list[str] = []
    for t in base:
        tdir = os.path.join(root, DATA_DIR, t)
        if not store.isdir(tdir):
            continue
        for entry in store.listdir(tdir):
            bdir = os.path.join(tdir, entry)
            files += [
                os.path.join(bdir, f)
                for f in store.listdir(bdir)
                if f.endswith(".parquet")
            ]
    rows = rd.read_parquet(files, filesystem=store.fs)

    def fix_bucket(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("bucket"),
            "bucket",
            t["bucket"].cast(pa.int64()),
        )

    rows = rows.map_batches(fix_bucket, batch_format="pyarrow").sort(
        ["bucket", "band_key"]
    )
    rows.write_parquet(
        staging, partition_cols=["bucket"], filesystem=store.fs, compression="zstd"
    )
    store.makedirs(os.path.dirname(final))
    store.replace_dir(staging, final)

    base_set = set(base)
    while True:
        cur = read_index_manifest(root, store) or IndexManifest()
        if not base_set <= set(cur.txns):
            # a CONCURRENT COMPACTOR already folded part of our snapshot
            # (its compact txn replaced some base ids): committing our
            # fold now would list the same rows twice — once in ours,
            # once carried in theirs.  Our fold is stale; abort it and
            # adopt the winner's manifest (the rows are all there).
            store.rmtree(final)
            return cur
        carried = [t for t in cur.txns if t not in base_set]
        new = IndexManifest(version=cur.version + 1, txns=[txn, *carried])
        tmp = os.path.join(root, MANIFEST_DIR, f".tmp-{txn}-{new.version}")
        store.write_text(
            tmp, json.dumps({"version": new.version, "txns": new.txns})
        )
        try:
            store.claim_with_content(tmp, _manifest_path(root, new.version))
            break
        except FileExistsError:
            continue
        finally:
            try:
                store.delete_file(tmp)
            except OSError:
                pass
    # superseded base dirs are NOT reclaimed here: an in-flight reader
    # (a probe, or a competing compactor) that planned its file list
    # from the prior manifest may still be reading them — immediate
    # deletion turns that race into FileNotFoundError mid-read.  The
    # age-gated ``index_vacuum`` reclaims them once the grace window
    # says no planned read can still reference them (the lake's vacuum
    # discipline).
    return new


def _probe_files(
    root: str, m: IndexManifest, buckets: set[int], store
) -> list[str]:
    """The committed index files in exactly the probe's buckets — pruned
    by PARTITION PATH, no listing outside those directories."""
    files: list[str] = []
    for txn in m.txns:
        for b in sorted(buckets):
            d = os.path.join(root, DATA_DIR, txn, f"bucket={b}")
            if not store.isdir(d):
                continue
            files += [
                os.path.join(d, f)
                for f in store.listdir(d)
                if f.endswith(".parquet")
            ]
    return files


def index_vacuum(
    root: str, store=None, grace_s: float = 86400.0
) -> list[str]:
    """Reclaim unreferenced index txn dirs and stale staging dirs — the
    index's remove_orphan_files, with the SAME age gate as the lake's
    vacuum (sink.vacuum): an unreferenced dir younger than ``grace_s``
    may be a committing appender between its data move and manifest
    claim, so it is kept; ``grace_s=0`` restores unconditional reclaim
    for single-writer maintenance windows."""
    import time as _time

    store = _store(store)
    m = read_index_manifest(root, store) or IndexManifest()
    live = set(m.txns)
    removed: list[str] = []

    def _old_enough(path: str) -> bool:
        if grace_s <= 0:
            return True
        ts = store.newest_mtime(path)
        return ts is not None and (_time.time() - ts) > grace_s

    for base in (DATA_DIR, STAGING_DIR):
        d = os.path.join(root, base)
        if not store.isdir(d):
            continue
        for entry in store.listdir(d):
            p = os.path.join(d, entry)
            if (base == DATA_DIR and entry in live) or not _old_enough(p):
                continue
            store.rmtree(p)
            removed.append(p)
    return removed


def index_fsck(root: str, store=None, data: bool = False) -> dict:
    """Integrity audit for the signature index — the index-side analog
    of the lake's ``fsck``:

    * ``manifest_chain``: the manifest directory parses, the version
      file sequence is contiguous 1..V (claims mint every version), and
      the current manifest lists no duplicate txn ids;
    * ``txn_dirs``: every committed txn id owns an existing data dir
      (a manifest entry whose data vanished means lost rows);
    * ``orphans`` (informational, never a failure): data dirs no
      manifest references and staging leftovers — the age-gated
      ``index_vacuum`` targets;
    * with ``data=True``: every referenced parquet carries exactly the
      index schema (band_key, doc_id, sig + the bucket partition), and
      ``band_key`` is non-decreasing WITHIN each file — the invariant
      the probe's row-group isin() pushdown prunes by; a violated sort
      silently degrades probes to full-file scans, so it is a failure.

    Returns ``{"fails": [...], "orphan_data": [...],
    "stale_staging": [...], "files_checked": n}`` — empty ``fails``
    means healthy."""
    import pyarrow.parquet as pq

    store = _store(store)
    fails: list[str] = []
    out: dict = {"fails": fails, "orphan_data": [], "stale_staging": [], "files_checked": 0}
    mdir = os.path.join(root, MANIFEST_DIR)
    if not store.isdir(mdir):
        fails.append(f"no manifest directory at {mdir}")
        return out
    versions = sorted(
        int(f[len("manifest-") : -len(".json")])
        for f in store.listdir(mdir)
        if f.startswith("manifest-") and f.endswith(".json")
    )
    if not versions:
        fails.append("manifest directory holds no manifest files")
        return out
    if versions != list(range(versions[0], versions[-1] + 1)) or versions[0] != 1:
        fails.append(f"manifest version sequence not contiguous from 1: {versions}")
    try:
        m = read_index_manifest(root, store)
    except (ValueError, KeyError, OSError) as exc:
        fails.append(f"current manifest unreadable: {exc}")
        return out
    if len(set(m.txns)) != len(m.txns):
        fails.append(f"duplicate txn ids in manifest: {m.txns}")

    live = set(m.txns)
    ddir = os.path.join(root, DATA_DIR)
    present = set(store.listdir(ddir)) if store.isdir(ddir) else set()
    for t in m.txns:
        if t not in present:
            fails.append(f"manifest txn {t!r} has no data directory")
    out["orphan_data"] = sorted(present - live)
    sdir = os.path.join(root, STAGING_DIR)
    out["stale_staging"] = sorted(store.listdir(sdir)) if store.isdir(sdir) else []

    if data:
        want_cols = {"band_key", "doc_id", "sig"}
        for t in m.txns:
            tdir = os.path.join(ddir, t)
            if not store.isdir(tdir):
                continue
            for entry in sorted(store.listdir(tdir)):
                bdir = os.path.join(tdir, entry)
                if not store.isdir(bdir):
                    # the layout is bucket=N directories only — a stray
                    # regular file IS the kind of damage this audit
                    # exists to surface, not a reason to crash it
                    fails.append(
                        f"{bdir}: unexpected non-directory entry in txn dir"
                    )
                    continue
                for f in sorted(store.listdir(bdir)):
                    if not f.endswith(".parquet"):
                        continue
                    path = os.path.join(bdir, f)
                    pf = pq.ParquetFile(path, filesystem=getattr(store, "fs", None))
                    cols = set(pf.schema_arrow.names)
                    if cols != want_cols:
                        fails.append(
                            f"{path}: schema {sorted(cols)} != {sorted(want_cols)}"
                        )
                        continue
                    keys = pf.read(columns=["band_key"])["band_key"].to_numpy(
                        zero_copy_only=False
                    )
                    if len(keys) > 1 and not (keys[1:] >= keys[:-1]).all():
                        fails.append(
                            f"{path}: band_key not sorted within file — "
                            "row-group pruning invariant violated"
                        )
                    out["files_checked"] += 1
    return out


def index_probe(root: str, docs, threshold: float = 0.5, store=None):
    """Check a new batch against the committed index (and itself).
    Returns one row per duplicate new doc: (doc_id, dup_of,
    jaccard_est) with the smallest matching partner (ties: highest
    estimate wins first, then smallest id — deterministic)."""
    import ray.data as rd

    store = _store(store)
    m = read_index_manifest(root, store) or IndexManifest()
    new_rows = docs.map_batches(
        minhash_lsh_fn, batch_format="pyarrow"
    ).materialize()
    # the probe's bucket set (<= NUM_PAIR_BUCKETS ints) names which
    # index partitions are read at all, and its band_key set (16 ints
    # per probe doc) drives the ROW-LEVEL pushdown below — an index row
    # whose band_key no probe doc carries can never pair, so it must
    # not reach the shuffle. Both sets are probe-sized driver state.
    probe_buckets: set[int] = set()
    key_parts: list[np.ndarray] = []
    for b in new_rows.select_columns(["bucket", "band_key"]).iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        probe_buckets.update(
            np.unique(b["bucket"].to_numpy(zero_copy_only=False)).tolist()
        )
        key_parts.append(b["band_key"].to_numpy(zero_copy_only=False))
    probe_keys = (
        np.unique(np.concatenate(key_parts))
        if key_parts
        else np.empty(0, dtype=np.int64)
    )

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            t = t.select(["band_key", "bucket", "doc_id", "sig"])
            # hive partition values parse back as strings
            t = t.set_column(
                t.schema.get_field_index("bucket"),
                "bucket",
                t["bucket"].cast(pa.int64()),
            )
            return t.append_column(
                "side", pa.array(np.full(t.num_rows, side, dtype=np.int8))
            )

        return fn

    probe = new_rows.map_batches(tag(1), batch_format="pyarrow")
    files = _probe_files(root, m, probe_buckets, store)
    if files:
        import pyarrow.dataset as pads

        # band_key membership pushdown: files are band_key-sorted within
        # each bucket, so the isin() predicate prunes row groups from
        # footer stats and only MATCHING index rows are decoded and
        # shuffled — probe cost tracks matches, not index breadth.
        # Guarded for huge probe batches (the filter ships with every
        # read task); past the cap the full-bucket scan is cheaper.
        flt = None
        if 0 < len(probe_keys) <= PROBE_KEY_PUSHDOWN_MAX:
            flt = pads.field("band_key").isin(pa.array(probe_keys))
        # bound read blocks: one block PER FILE would hand the bucket
        # groupby hundreds of tiny sort tasks (measured: 12.8 s of task
        # overhead sorting 8k rows across 446 blocks); post-filter rows
        # are match-sized, so a few dozen blocks is plenty
        idx = rd.read_parquet(
            files,
            columns=["band_key", "bucket", "doc_id", "sig"],
            filesystem=store.fs,
            filter=flt,
            override_num_blocks=min(len(files), 48),
        ).map_batches(tag(0), batch_format="pyarrow")
        both = probe.union(idx)
    else:
        both = probe

    def verify(group: pa.Table) -> pa.Table:
        """Per band run: find each NEW doc its best valid partner (an
        indexed doc, or an earlier new doc with smaller id).  Bounded
        under duplicate skew: docs with byte-identical signatures are
        collapsed to identity groups first — a new doc whose group holds
        a valid partner gets it directly (est exactly 1.0, and the
        group's MINIMUM valid partner id, which is also the global
        tie-break winner since cross-group est < 1.0).  Only the docs
        their own group cannot serve run the cross-group scan, in
        (doc x group) chunks with a running per-doc best, so no task
        ever allocates an O(u^2) pair index."""
        keys = group["band_key"].to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        keys = keys[order]
        ids = group["doc_id"].to_numpy(zero_copy_only=False)[order]
        side = group["side"].to_numpy(zero_copy_only=False)[order]
        sc = group["sig"]
        if isinstance(sc, pa.ChunkedArray):
            sc = sc.combine_chunks()
        sig_all = (
            sc.flatten()
            .to_numpy(zero_copy_only=False)
            .reshape(len(sc), NUM_HASHES)
        )[order]
        INF = np.iinfo(np.int64).max
        DOC_CHUNK = 256
        out_d, out_p, out_j = [], [], []
        for s, e in _runs(keys):
            if e - s < 2:
                continue
            # one row per distinct (doc, side) in the run
            pairkey = ids[s:e] * 2 + side[s:e]
            uk, first = np.unique(pairkey, return_index=True)
            uids = ids[s:e][first]
            uside = side[s:e][first]
            if not (uside == 1).any():
                continue
            sig = sig_all[s:e][first]
            # identity groups over byte-identical signatures
            _, inv = np.unique(sig, axis=0, return_inverse=True)
            v = int(inv.max()) + 1
            idx_min = np.full(v, INF, dtype=np.int64)
            new_min = np.full(v, INF, dtype=np.int64)
            np.minimum.at(idx_min, inv[uside == 0], uids[uside == 0])
            np.minimum.at(new_min, inv[uside == 1], uids[uside == 1])
            g_first = np.unique(inv, return_index=True)[1]
            gsig = sig[g_first]
            new_mask = uside == 1
            nid_all = uids[new_mask]
            ng = inv[new_mask]
            # within-group: best partner = min(indexed id, earlier new id)
            earlier = np.where(new_min[ng] < nid_all, new_min[ng], INF)
            p_star = np.minimum(idx_min[ng], earlier)
            have = p_star != INF
            if have.any():
                out_d.append(nid_all[have])
                out_p.append(p_star[have])
                out_j.append(np.ones(int(have.sum()), dtype=np.float64))
            # cross-group scan only for docs their own group can't serve
            nid = nid_all[~have]
            if len(nid) == 0 or v < 2:
                continue
            nsig = sig[new_mask][~have]
            best_est = np.full(len(nid), -1.0)
            best_p = np.full(len(nid), INF, dtype=np.int64)
            for g0 in range(0, v, RUN_VERIFY_CAP):
                g1 = min(g0 + RUN_VERIFY_CAP, v)
                gs = gsig[g0:g1]
                gi = idx_min[g0:g1]
                gn = new_min[g0:g1]
                for d0 in range(0, len(nid), DOC_CHUNK):
                    d1 = min(d0 + DOC_CHUNK, len(nid))
                    est = (nsig[d0:d1, None, :] == gs[None, :, :]).mean(axis=2)
                    p = np.where(
                        gn[None, :] < nid[d0:d1, None], gn[None, :], INF
                    )
                    p = np.minimum(p, gi[None, :])
                    est = np.where(p == INF, -1.0, est)
                    me = est.max(axis=1)
                    pm = np.where(est == me[:, None], p, INF).min(axis=1)
                    sl = slice(d0, d1)
                    better = (me > best_est[sl]) | (
                        (me == best_est[sl]) & (pm < best_p[sl])
                    )
                    best_est[sl] = np.where(better, me, best_est[sl])
                    best_p[sl] = np.where(better, pm, best_p[sl])
            hit = (best_est >= threshold) & (best_p != INF)
            if hit.any():
                out_d.append(nid[hit])
                out_p.append(best_p[hit])
                out_j.append(best_est[hit])
        dd = np.concatenate(out_d) if out_d else np.empty(0, dtype=np.int64)
        pp = np.concatenate(out_p) if out_p else np.empty(0, dtype=np.int64)
        jj = np.concatenate(out_j) if out_j else np.empty(0, dtype=np.float64)
        return pa.Table.from_arrays(
            [
                pa.array(dd.astype(np.int64)),
                pa.array(pp.astype(np.int64)),
                pa.array(jj.astype(np.float64)),
            ],
            names=["doc_id", "dup_of", "jaccard_est"],
        )

    cands = both.groupby("bucket").map_groups(verify, batch_format="pyarrow")

    # one verdict per duplicate doc: best estimate, then smallest partner
    def best_per_doc(group: pa.Table) -> pa.Table:
        pl = _pl()
        return (
            pl.from_arrow(group)
            .sort(["doc_id", "jaccard_est", "dup_of"], descending=[False, True, False])
            .group_by("doc_id", maintain_order=True)
            .first()
            .to_arrow()
        )

    def add_db(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "db", pa.array((d % 64).astype(np.int64))
        )

    return (
        cands.map_batches(add_db, batch_format="pyarrow")
        .groupby("db")
        .map_groups(best_per_doc, batch_format="pyarrow")
        .drop_columns(["db"])
    )


# ---------------------------------------------------------------------------
# registry surface

_INDEX_BUILT: dict = {}


def q_dedup_index_probe(sf_dir: str):
    """Incremental NEAR-dup dedup against the persisted signature index:
    the planted-duplicate corpus splits into an existing corpus
    (doc_id % 3 != 0, committed to the index exactly-once as txn
    ``base``) and a new micro-batch (doc_id % 3 == 0) probed against it.
    Output: one verdict row per duplicate new doc (doc_id, dup_of,
    jaccard_est). MinHash estimates have no exact SQL form (the same
    no-oracle class as dedup_minhash); tests/test_nearindex.py pins the
    semantics against direct signature math and the planted exact
    copies."""
    import shutil

    import pyarrow.compute as pc

    from .dedup import corpus_ds

    root = f"/tmp/ray_cdc_sigindex/{sf_dir.strip('/').replace('/', '_')}"
    corpus = corpus_ds(sf_dir)

    def third(match: bool):
        def fn(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            m = (ids % 3) == 0
            return t.filter(pa.array(m if match else ~m))

        return fn

    if not _INDEX_BUILT.get(root):
        shutil.rmtree(root, ignore_errors=True)
        index_append(
            root, "base", corpus.map_batches(third(False), batch_format="pyarrow")
        )
        _INDEX_BUILT[root] = True
    new = corpus.map_batches(third(True), batch_format="pyarrow")
    return index_probe(root, new)


def registry():
    return {"dedup_index_probe": q_dedup_index_probe}, {}
