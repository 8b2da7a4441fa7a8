"""Lake integrity audit (``fsck``) — the ops tool a 100 TB lake needs
before trusting a manifest chain: verify, from METADATA where possible
and from a distributed key-columns scan when asked, that what the
current manifest claims actually holds on storage.

Checks (each one row in the report):
* ``manifest_chain``     — retained manifest versions are strictly
  increasing and the current pointer resolves.
* ``files_exist``        — every (bucket, file) the manifest references
  (bases AND merge-on-read delta chains) exists on storage.
* ``footer_rows``        — per-file ``rows`` recorded in the manifest
  equals the parquet footer's num_rows (one footer open per file — the
  same metadata cost a commit already paid; no data is read).
* ``watermarks``         — per-bucket hwm is monotone non-decreasing
  across the retained manifest chain.
* ``delta_invariant``    — every merge-on-read delta key is also a base
  bucket (the sink's documented invariant).
* ``orphans``            — informational count of unreferenced txn dirs
  (vacuum candidates), never a failure.
* ``bucket_assignment``  — (``data=True`` only) every live row's
  ``hash(repo, path)`` maps to the bucket directory holding it, under
  the manifest's modulus and any in-flight rescale's mixed rule —
  a DISTRIBUTED key-columns scan (columns-pruned read + map_batches
  partials), not a driver loop.

Output: (check, status, detail) rows, status in {"ok", "fail",
"info"}. Reference analog: the post-apply verification sweep the
reference performs before deleting originals — "originals that are
also finals must not be deleted" (RenameS3Utils.kt:124-127) — widened
to the whole committed surface.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from .sink import (
    DATA_DIR,
    STAGING_DIR,
    LakeStore,
    bucket_ids_mixed,
    read_manifest,
)
from .transforms import key_hash_u64


def _rows(items):
    checks, statuses, details = [], [], []
    for c, s, d in items:
        checks.append(c)
        statuses.append(s)
        details.append(d)
    return pa.Table.from_arrays(
        [
            pa.array(checks, type=pa.string()),
            pa.array(statuses, type=pa.string()),
            pa.array(details, type=pa.string()),
        ],
        names=["check", "status", "detail"],
    )


def fsck(
    lake_dir: str,
    store: "LakeStore | None" = None,
    data: bool = False,
    branch: str | None = None,
) -> pa.Table:
    from .sink import _DEFAULT_STORE, _parse_manifest_name

    store = store or _DEFAULT_STORE
    out: list[tuple[str, str, str]] = []
    m = read_manifest(lake_dir, store=store, branch=branch)

    # -- manifest chain ----------------------------------------------------
    mdir = os.path.join(lake_dir, "_manifests")
    versions = []
    if store.isdir(mdir):
        for fn in store.listdir(mdir):
            parsed = _parse_manifest_name(fn)
            if parsed is not None and parsed[0] == (branch or "main"):
                versions.append(parsed[1])
    versions.sort()
    chain_ok = bool(versions) and m.version == versions[-1]
    out.append(
        (
            "manifest_chain",
            "ok" if chain_ok else "fail",
            f"retained={len(versions)} current=v{m.version}",
        )
    )

    # -- referenced files exist + footer rows match ------------------------
    missing, row_mismatch, n_files = [], [], 0

    def _check_entry(b: str, entry: dict) -> None:
        nonlocal n_files
        bdir = os.path.join(lake_dir, DATA_DIR, entry["txn_id"], f"bucket={b}")
        fstats = entry.get("files")
        if fstats is None:  # legacy: existence of the dir is the best check
            if not store.isdir(bdir):
                missing.append(bdir)
            return
        rows_seen = 0
        for f in fstats:
            p = os.path.join(bdir, f["name"])
            n_files += 1
            if not store.exists(p):
                missing.append(p)
                continue
            md = store.parquet_metadata(p)
            rows_seen += md.num_rows
        if fstats and rows_seen != entry.get("rows", rows_seen):
            row_mismatch.append(
                f"bucket {b}@{entry['txn_id']}: manifest={entry.get('rows')} "
                f"footers={rows_seen}"
            )

    for b, info in m.buckets.items():
        _check_entry(b, info)
    for b, entries in m.deltas.items():
        for e in entries:
            _check_entry(b, e)
    out.append(
        (
            "files_exist",
            "ok" if not missing else "fail",
            f"{n_files} files checked"
            + (f"; missing: {missing[:3]}" if missing else ""),
        )
    )
    out.append(
        (
            "footer_rows",
            "ok" if not row_mismatch else "fail",
            "recorded rows match footers"
            if not row_mismatch
            else "; ".join(row_mismatch[:3]),
        )
    )

    # -- watermark monotonicity across the retained chain ------------------
    # (main only: branch manifests interleave versions with main's)
    regressions = []
    if branch in (None, "main"):
        prev: dict[int, int] = {}
        for v in versions:
            mv = read_manifest(lake_dir, store=store, version=v)
            hwm = mv.hwm()
            for bkt, w in hwm.items():
                if w < prev.get(bkt, -1):
                    regressions.append(
                        f"bucket {bkt}: v{v} hwm {w} < {prev[bkt]}"
                    )
            prev.update(hwm)
    out.append(
        (
            "watermarks",
            "ok" if not regressions else "fail",
            f"{len(versions)} versions monotone"
            if not regressions
            else "; ".join(regressions[:3]),
        )
    )

    # -- merge-on-read invariant -------------------------------------------
    bad_delta = [b for b in m.deltas if b not in m.buckets and m.deltas[b]]
    out.append(
        (
            "delta_invariant",
            "ok" if not bad_delta else "fail",
            "every delta key has a base"
            if not bad_delta
            else f"baseless delta buckets: {bad_delta[:5]}",
        )
    )

    # -- orphan accounting (informational) ----------------------------------
    live = set(m.txns) | {
        e["txn_id"] for es in m.deltas.values() for e in es
    }
    orphans = 0
    ddir = os.path.join(lake_dir, DATA_DIR)
    if store.isdir(ddir):
        orphans += sum(1 for t in store.listdir(ddir) if t not in live)
    sdir = os.path.join(lake_dir, STAGING_DIR)
    if store.isdir(sdir):
        orphans += len(store.listdir(sdir))
    out.append(("orphans", "info", f"{orphans} unreferenced dirs (vacuum candidates)"))

    # -- bucket assignment (distributed, opt-in) ----------------------------
    if data and m.buckets:
        import ray.data as rd

        num_buckets = m.num_buckets or (max((int(b) for b in m.buckets), default=0) + 1)
        rescale = m.rescale

        def misassigned(t: pa.Table) -> pa.Table:
            h = key_hash_u64(
                t["repo"].combine_chunks(), t["path"].combine_chunks()
            )
            want = bucket_ids_mixed(h, num_buckets, rescale)
            got = (
                t["bucket"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            )
            return pa.Table.from_arrays(
                [pa.array(np.array([int((want != got).sum())], dtype=np.int64))],
                names=["bad"],
            )

        # the stored bucket comes back as the hive partition value —
        # key columns only leave storage, distributed partial counts
        def _entry_files(b: str, entry: dict) -> list[str]:
            bdir = os.path.join(
                lake_dir, DATA_DIR, entry["txn_id"], f"bucket={b}"
            )
            fstats = entry.get("files")
            names = (
                [f["name"] for f in fstats]
                if fstats is not None
                else (
                    [f for f in store.listdir(bdir) if f.endswith(".parquet")]
                    if store.isdir(bdir)
                    else []
                )
            )
            return [
                os.path.join(bdir, n)
                for n in names
                if store.exists(os.path.join(bdir, n))
            ]

        paths: list[str] = []
        for b, info in m.buckets.items():
            paths += _entry_files(b, info)
        for b, entries in m.deltas.items():
            for e in entries:
                paths += _entry_files(b, e)
        ds = rd.read_parquet(
            paths,
            columns=["repo", "path", "bucket"],
            filesystem=store.fs,
        )
        bad = sum(
            int(b["bad"][0].as_py())
            for b in ds.map_batches(misassigned, batch_format="pyarrow").iter_batches(
                batch_size=None, batch_format="pyarrow"
            )
        )
        out.append(
            (
                "bucket_assignment",
                "ok" if bad == 0 else "fail",
                "all rows in their hash bucket"
                if bad == 0
                else f"{bad} rows in the wrong bucket",
            )
        )

    # -- registered CHECK constraints vs committed live data ----------------
    # (data=True only; constraints gate WRITES from their registration
    # forward, so pre-existing violations are possible — this check is
    # the retro-audit that finds them)
    if data and m.constraints and m.buckets:
        from .checkpoint import _constraint_mask
        from .sink import read_lake

        cols = sorted({c["column"] for c in m.constraints})
        cons = m.constraints

        def viol_count(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            n = (
                pc.sum(
                    pc.cast(_constraint_mask(t, cons), pa.int64())
                ).as_py()
                or 0
            )
            return pa.Table.from_pydict(
                {"n": pa.array([int(n)], type=pa.int64())}
            )

        nviol = int(
            read_lake(lake_dir, store=store, columns=cols, branch=branch)
            .map_batches(viol_count, batch_format="pyarrow")
            .sum("n")
            or 0
        )
        out.append(
            (
                "constraints",
                "ok" if nviol == 0 else "fail",
                f"{len(cons)} constraints hold over live data"
                if nviol == 0
                else f"{nviol} live rows violate registered constraints",
            )
        )

    return _rows(out)
