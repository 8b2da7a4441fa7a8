"""`ray job submit` entry point: `python -m ray_cdc_lake <cmd> ...`.

The deployment surface the north rule names — the same module a fixed
N-node cluster runs via

    ray job submit --working-dir . -- python -m ray_cdc_lake tail \
        --sf-dir /data/corpus --lake s3://bucket/lake

Commands (thin wrappers over the library; all idempotent/resumable):

* ``replay``  — full event-log replay into a lake as ONE exactly-once
  txn (re-running with the same --txn-id is a no-op).
* ``tail``    — segmented binlog tail: one txn per LSN window; a killed
  run resumes at the first uncommitted window (pipeline.tail_replay).
* ``compact`` — LSM major compaction + vacuum.
* ``rescale`` — online bucket-modulus rescale (start/step/finish);
  ingest keeps running between bucket-local split steps.
* ``replicate`` — converge a replica lake to the source's committed
  chain, one idempotent txn per source version, deltas only;
  ``--consumer NAME`` registers its applied watermark on the source.
* ``consumers`` — list/deregister the registered incremental consumers
  whose watermarks pin snapshot retention.
* ``vacuum``  — drop unreferenced txn data.
* ``metrics`` — print the manifest's per-bucket lineage and per-txn
  ingest metrics as JSON (the ops/observability surface).
* ``query``   — run any registry query by name against an sf dir.

Ray session ownership: this CLI owns its session (the brief's rule —
only bench.py, CLI entry points and the test fixture call ray.init).
Under `ray job submit` the bare ``ray.init()`` attaches to the cluster;
standalone it starts a local one.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_up() -> None:
    import ray

    if not ray.is_initialized():
        ray.init()  # job context attaches; standalone starts local
    from . import enable_self_contained_pickling, tune_data_context

    enable_self_contained_pickling()
    tune_data_context()


def cmd_replay(a) -> int:
    from .checkpoint import apply_incremental
    from .pipeline import derive_event_log
    from .schemas import COMPILED_SCHEMA
    from .transforms import normalize_content
    from .events import compile_changes

    _ray_up()
    ev = (
        derive_event_log(a.sf_dir, a.epochs)
        .map_batches(compile_changes, batch_format="pyarrow")
        .map_batches(normalize_content, batch_format="pyarrow")
    )
    m = apply_incremental(
        a.lake,
        a.txn_id,
        ev,
        num_buckets=a.buckets,
        events_schema=COMPILED_SCHEMA,
    )
    print(
        json.dumps(
            {
                "lake": a.lake,
                "version": m.version,
                "txns": m.txns,
                "metrics": m.metrics.get(a.txn_id, {}),
            }
        )
    )
    return 0


def cmd_tail(a) -> int:
    from .pipeline import tail_replay

    _ray_up()
    txns = tail_replay(
        a.lake, a.sf_dir, epochs=a.epochs, micro_batches=a.micro_batches,
        num_buckets=a.buckets, mode=a.mode, on_invalid=a.on_invalid,
    )
    print(json.dumps({"lake": a.lake, "committed": txns, "mode": a.mode}))
    return 0


def cmd_fold(a) -> int:
    from .checkpoint import compact_deltas
    from .sink import read_manifest

    _ray_up()
    m = compact_deltas(a.lake, min_deltas=a.min_deltas)
    if m is None:
        m = read_manifest(a.lake)
        folded = False
    else:
        folded = True
    print(
        json.dumps(
            {
                "lake": a.lake,
                "folded": folded,
                "version": m.version,
                "buckets_with_deltas": sum(1 for es in m.deltas.values() if es),
            }
        )
    )
    return 0


def cmd_compact(a) -> int:
    from .checkpoint import compact

    _ray_up()
    zorder = tuple(a.zorder.split(",")) if a.zorder else None
    m = compact(a.lake, num_buckets=a.buckets, sort=a.sort, zorder=zorder)
    print(json.dumps({"lake": a.lake, "version": m.version, "txns": m.txns}))
    return 0


def cmd_rescale(a) -> int:
    from .rescale import rescale_start, rescale_status, rescale_step

    if a.start is not None:
        rescale_start(a.lake, factor=a.start)
    elif a.step is not None or a.finish:
        _ray_up()  # the split reads/writes data
        rescale_step(a.lake, max_buckets=a.step)
    print(json.dumps({"lake": a.lake, **rescale_status(a.lake)}))
    return 0


def cmd_replicate(a) -> int:
    from .replicate import replicate

    _ray_up()
    out = replicate(
        a.src, a.dst, assume_ordered_log=not a.unordered, consumer=a.consumer
    )
    print(json.dumps({"src": a.src, "dst": a.dst, **out}))
    return 0


def cmd_consumers(a) -> int:
    from .sink import deregister_consumer, list_consumers

    if a.deregister:
        deregister_consumer(a.lake, a.deregister)
    print(json.dumps({"lake": a.lake, "consumers": list_consumers(a.lake)}))
    return 0


def cmd_vacuum(a) -> int:
    from .sink import vacuum

    dropped = vacuum(a.lake, grace_s=a.grace_s)
    print(json.dumps({"lake": a.lake, "dropped": dropped}))
    return 0


def cmd_expire(a) -> int:
    from .sink import expire_snapshots

    out = expire_snapshots(a.lake, keep_last=a.keep_last, force=a.force)
    print(json.dumps({"lake": a.lake, **out}))
    return 0


def cmd_delete_where(a) -> int:
    from .sink import delete_where

    m = delete_where(a.lake, a.txn, a.column, a.op, a.value)
    print(
        json.dumps(
            {
                "lake": a.lake,
                "version": m.version,
                "active_deletes": len(m.deletes),
            }
        )
    )
    return 0


def cmd_sigindex(a) -> int:
    from .nearindex import (
        index_append,
        index_compact,
        index_fsck,
        index_probe,
        index_vacuum,
        read_index_manifest,
    )

    def docs():
        from .sources import read_table

        return read_table(a.sf_dir, "documents", columns=["doc_id", "text"])

    if getattr(a, "fsck", False):
        rep = index_fsck(a.root, data=a.data)
        print(json.dumps({"root": a.root, **rep}))
        return 0 if not rep["fails"] else 1
    if a.append:
        _ray_up()
        m = index_append(a.root, a.append, docs())
        out = {"root": a.root, "version": m.version, "txns": m.txns}
    elif a.probe:
        _ray_up()
        n = index_probe(a.root, docs(), threshold=a.threshold).count()
        out = {"root": a.root, "duplicates": n}
    elif a.compact:
        _ray_up()
        m = index_compact(a.root)
        out = {"root": a.root, "version": m.version, "txns": m.txns}
    elif a.vacuum:
        removed = index_vacuum(a.root, grace_s=a.grace_s)
        out = {"root": a.root, "removed": removed}
    else:
        m = read_index_manifest(a.root)
        out = {
            "root": a.root,
            "version": m.version if m else 0,
            "txns": m.txns if m else [],
        }
    print(json.dumps(out))
    return 0


def cmd_constraint(a) -> int:
    from .sink import drop_constraint, read_manifest, set_constraint

    if a.set:
        name, column, op = a.set
        value = json.loads(a.value) if a.value is not None else None
        m = set_constraint(a.lake, name, column, op, value)
    elif a.drop:
        m = drop_constraint(a.lake, a.drop)
    else:
        m = read_manifest(a.lake)
    print(
        json.dumps(
            {"lake": a.lake, "version": m.version, "constraints": m.constraints}
        )
    )
    return 0


def cmd_fsck(a) -> int:
    from .fsck import fsck

    if a.data:
        _ray_up()  # the bucket-assignment check scans key columns
    report = fsck(a.lake, data=a.data)
    rows = report.to_pylist()
    print(json.dumps({"lake": a.lake, "report": rows}))
    return 0 if all(r["status"] != "fail" for r in rows) else 1


def cmd_metrics(a) -> int:
    from .sink import read_manifest

    m = read_manifest(a.lake, version=a.version)
    print(
        json.dumps(
            {
                "version": m.version,
                "num_buckets": m.num_buckets,
                "lineage": m.buckets,
                "txn_metrics": m.metrics,
                # merge-on-read chain depth per bucket (scan-time merge
                # cost indicator; 'fold' returns a bucket to depth 0)
                "delta_chain_depth": {
                    b: len(es) for b, es in m.deltas.items() if es
                },
            },
            indent=1,
            sort_keys=True,
        )
    )
    return 0


def cmd_branch(a) -> int:
    from .sink import create_branch, delete_branch, list_branches, merge_branch

    if a.create:
        v = create_branch(a.lake, a.create, from_version=a.version)
        print(f"branch {a.create!r} -> manifest v{v}")
    elif a.merge:
        m = merge_branch(a.lake, a.merge)
        print(f"fast-forwarded main to manifest v{m.version} ({a.merge!r})")
    elif a.delete:
        delete_branch(a.lake, a.delete)
        print(f"deleted branch {a.delete!r}")
    else:
        print(json.dumps(list_branches(a.lake), indent=1, sort_keys=True))
    return 0


def cmd_query(a) -> int:
    from .queries import registry

    queries, _ = registry()
    if a.name not in queries:
        # validate before paying for a Ray session — the registry is pure
        print(f"unknown query {a.name!r}; choose from:", file=sys.stderr)
        print("  " + "\n  ".join(sorted(queries)), file=sys.stderr)
        return 2
    _ray_up()
    res = queries[a.name](a.sf_dir)
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    print(df.head(a.limit).to_string())
    print(f"[{len(df)} rows]")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="python -m ray_cdc_lake")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, lake=True, sf=False, buckets=True):
        if lake:
            sp.add_argument("--lake", required=True, help="lake directory/URI")
        if sf:
            sp.add_argument("--sf-dir", required=True, help="input tables dir")
        if buckets:
            # None -> follow the lake's committed modulus (64 for new lakes)
            sp.add_argument("--buckets", type=int, default=None)

    sp = sub.add_parser("replay", help="full replay as one exactly-once txn")
    common(sp, sf=True)
    sp.add_argument("--epochs", type=int, default=4)
    sp.add_argument("--txn-id", default="replay-0001")
    sp.set_defaults(fn=cmd_replay)

    sp = sub.add_parser("tail", help="segmented binlog tail (resumable)")
    common(sp, sf=True)
    sp.add_argument("--epochs", type=int, default=4)
    sp.add_argument("--micro-batches", type=int, default=4)
    sp.add_argument(
        "--mode",
        choices=("cow", "mor"),
        default="cow",
        help="mor = merge-on-read delta commits (O(window) writes; pair "
        "with 'fold' to bound scan-time chain length)",
    )
    sp.add_argument(
        "--on-invalid",
        choices=("raise", "drop"),
        default=None,
        help="ingest validation gate: fail the window or drop-and-count "
        "malformed events (null key/lsn, unknown op); default trusts "
        "the compiler's output",
    )
    sp.set_defaults(fn=cmd_tail)

    sp = sub.add_parser(
        "fold",
        help="fold merge-on-read delta chains into their buckets' bases "
        "(bucket-local minor compaction)",
    )
    common(sp)
    sp.add_argument(
        "--min-deltas", type=int, default=1,
        help="only fold buckets whose chain is at least this long",
    )
    sp.set_defaults(fn=cmd_fold)

    sp = sub.add_parser("compact", help="major compaction + vacuum")
    common(sp)
    sp.add_argument(
        "--sort",
        action="store_true",
        help="sort-order compaction: range-sort (bucket, repo, path) so "
        "per-file key ranges are disjoint (exact manifest pruning)",
    )
    sp.add_argument(
        "--zorder",
        default=None,
        metavar="COL,COL[,...]",
        help="z-order clustering compaction: Morton-interleave the named "
        "columns' sample ranks so per-file manifest bounds are tight on "
        "every listed column (multi-column scan pruning); mutually "
        "exclusive with --sort",
    )
    sp.set_defaults(fn=cmd_compact)

    sp = sub.add_parser(
        "expire",
        help="snapshot retention: drop manifests older than the newest "
        "--keep-last of each chain, then reclaim txn/bucket dirs no "
        "retained manifest owns (branch-pinned versions survive)",
    )
    sp.add_argument("--lake", required=True)
    sp.add_argument("--keep-last", type=int, default=2)
    sp.add_argument(
        "--force",
        action="store_true",
        help="expire even past a registered consumer's lag window "
        "(explicitly breaks that replica)",
    )
    sp.set_defaults(fn=cmd_expire)

    sp = sub.add_parser("vacuum", help="drop unreferenced txn data")
    common(sp, buckets=False)
    sp.add_argument(
        "--grace-s",
        type=float,
        default=86400.0,
        help="orphan age threshold in seconds; unreferenced dirs younger "
        "than this are kept (a concurrent commit may be mid-flight). "
        "0 = unconditional reclaim (single-writer maintenance window)",
    )
    sp.set_defaults(fn=cmd_vacuum)

    sp = sub.add_parser(
        "replicate",
        help="advance a replica lake to the source's committed state: one "
        "idempotent txn per source version, watermark-delta extraction "
        "(--unordered re-ships changed buckets whole for multi-writer "
        "sources with unrelated LSN ranges); killed runs resume",
    )
    sp.add_argument("src")
    sp.add_argument("dst")
    sp.add_argument("--unordered", action="store_true")
    sp.add_argument(
        "--consumer",
        default=None,
        help="register this replica's applied watermark on the source so "
        "expire-snapshots refuses to break its lag window",
    )
    sp.set_defaults(fn=cmd_replicate)

    sp = sub.add_parser(
        "consumers",
        help="list registered incremental consumers (applied watermarks "
        "that pin snapshot retention); --deregister NAME removes one",
    )
    sp.add_argument("--lake", required=True)
    sp.add_argument("--deregister", default=None, metavar="NAME")
    sp.set_defaults(fn=cmd_consumers)

    sp = sub.add_parser(
        "rescale",
        help="online modulus rescale: --start FACTOR records the target; "
        "--step N splits N more buckets (bucket-local, one txn); "
        "--finish splits everything left and flips the modulus; no flag "
        "prints status. Ingest keeps running between steps.",
    )
    sp.add_argument("--lake", required=True)
    sp.add_argument("--start", type=int, metavar="FACTOR")
    sp.add_argument("--step", type=int, metavar="N")
    sp.add_argument("--finish", action="store_true")
    sp.set_defaults(fn=cmd_rescale)

    sp = sub.add_parser(
        "delete-where", help="metadata-only predicate delete (merge-on-read)"
    )
    sp.add_argument("lake")
    sp.add_argument("txn", help="delete txn id (idempotence key)")
    sp.add_argument("column")
    sp.add_argument("op", choices=["==", "prefix"])
    sp.add_argument("value")
    sp.set_defaults(fn=cmd_delete_where)

    sp = sub.add_parser(
        "sigindex",
        help="persisted LSH signature index: --append TXN (exactly-once) "
        "/ --probe (near-dup verdicts for --sf-dir docs) / --compact / "
        "--vacuum / --fsck [--data] (integrity audit) / no flag = show "
        "manifest",
    )
    sp.add_argument("--root", required=True, help="index directory")
    sp.add_argument("--sf-dir", default=None, help="documents source")
    sp.add_argument("--append", metavar="TXN", default=None)
    sp.add_argument("--probe", action="store_true")
    sp.add_argument("--threshold", type=float, default=0.5)
    sp.add_argument("--compact", action="store_true")
    sp.add_argument("--vacuum", action="store_true")
    sp.add_argument("--grace-s", type=float, default=86400.0)
    sp.add_argument("--fsck", action="store_true")
    sp.add_argument(
        "--data", action="store_true",
        help="with --fsck: also verify per-file schema and band_key sort",
    )
    sp.set_defaults(fn=cmd_sigindex)

    sp = sub.add_parser(
        "constraint",
        help="list / set / drop declarative CHECK constraints "
        "(metadata-only commits; enforced on every apply)",
    )
    common(sp, buckets=False)
    sp.add_argument(
        "--set", nargs=3, metavar=("NAME", "COLUMN", "OP"), default=None
    )
    sp.add_argument(
        "--value", default=None, help="JSON value for the op (e.g. '[\"de\"]')"
    )
    sp.add_argument("--drop", metavar="NAME", default=None)
    sp.set_defaults(fn=cmd_constraint)

    sp = sub.add_parser(
        "fsck",
        help="lake integrity audit: manifest chain, referenced files, "
        "footer-vs-manifest rows, watermark monotonicity, mor invariant; "
        "--data adds the distributed bucket-assignment scan. Exit 1 on "
        "any failed check",
    )
    common(sp, buckets=False)
    sp.add_argument("--data", action="store_true")
    sp.set_defaults(fn=cmd_fsck)

    sp = sub.add_parser("metrics", help="print lineage + ingest metrics")
    common(sp, buckets=False)
    sp.add_argument("--version", type=int, default=None)
    sp.set_defaults(fn=cmd_metrics)

    sp = sub.add_parser("branch", help="list/create/merge/delete branches")
    common(sp, buckets=False)
    sp.add_argument("--create", metavar="NAME")
    sp.add_argument("--merge", metavar="NAME", help="fast-forward main to NAME")
    sp.add_argument("--delete", metavar="NAME")
    sp.add_argument("--version", type=int, default=None, help="branch point")
    sp.set_defaults(fn=cmd_branch)

    sp = sub.add_parser("query", help="run a registry query by name")
    sp.add_argument("--name", required=True)
    sp.add_argument("--sf-dir", required=True)
    sp.add_argument("--limit", type=int, default=20)
    sp.set_defaults(fn=cmd_query)

    a = p.parse_args(argv)
    return a.fn(a)


if __name__ == "__main__":
    raise SystemExit(main())
