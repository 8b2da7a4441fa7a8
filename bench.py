"""Benchmark harness — the driver's per-round feedback loop.

Default mode: runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) inside ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line::

    {"metric": "cdc_replay_wall_sec", "value": N, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, "events": E,
     "events_per_sec": T}

``--scaling``: runs the flagship CDC replay at two parallelism levels
(default num_cpus=2 and 8 — N and 4N on physical cores) in fresh,
interleaved processes and reports both throughputs plus scaling
efficiency ``(tput_hi/tput_lo)/(hi/lo)`` — the sandbox stand-in for the
north rule's N vs 4N node criterion (see BASELINE.md).

This script OWNS its Ray session (ray.init/shutdown); the library never
initialises Ray.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# Epochs for the benchmark replay only (the oracle-checked queries use
# schemas.DEFAULT_EPOCHS=4); higher -> more change events per document.
# 512 -> ~2.56M events at sf0.1: large enough that the headline events/sec
# measures the engine, not fixed scheduling overhead.
BENCH_EPOCHS = int(os.environ.get("BENCH_EPOCHS", "512"))

# Secondary pipelines benched alongside the flagship, by registry name.
SECONDARY = [
    "q1_lineitem",
    "events_daily",
    "top_customers",
    "user_sessions",
    "events_session_windows",
    "events_window_hopping",
    "cdc_suppress_noops",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_exact",
    "dedup_embedding_lsh",
    "dedup_clusters",
    "dedup_incremental",
    "dedup_index_probe",  # persisted LSH index: exactly-once append + probe
    "corpus_curation",
    "corpus_recipe",
    "text_quality",
    "text_seg_dedup",
    "corpus_chunk",
    "corpus_shuffle_shards",
    "text_top_terms",
    "semi_join_bloom",
    "knn_bruteforce",
    "knn_ivf_pq",
    "dedup_semantic",
    "corpus_funnel",
    "cdc_scd2_history",
    "cdc_patch_upserts",
    "events_watermark",
    "cdc_incremental_view",
    "cdc_merge_into",
    "text_tfidf",
    "text_bpe_train",  # distributed BPE tokenizer training to convergence
    "text_bpe_encode",  # encode with the trained merge table
    "text_classify_nb",  # distributed NB train + vectorized predict
    "corpus_route_nb",  # classifier-driven keep/quarantine routing
    "text_classify_eval",  # confusion-matrix aggregate of the NB model
    "mm_resize",
    "mm_feature_extract",
    "corpus_contamination_ngram",
    "cdc_replay_committed",  # the exactly-once sink write path
    "cdc_mor_apply",  # merge-on-read delta commits (O(delta) writes)
    "cdc_mor_compact",  # ... plus the bucket-local delta fold
    "cdc_change_feed",  # CDF read with pre/post images
    "cdc_predicate_delete",  # metadata-only merge-on-read delete
    "cdc_rescale_online",  # online bucket-modulus rescale, mixed-modulus reads
    "cdc_replicate",  # cross-lake incremental replication + no-op convergence
    "cdc_asof_join",  # temporal as-of join over the compiled history
    "join_interval_overlap",  # tiled interval-overlap join over events
    "cdc_mor_evolution",  # column add, then old-shape mor tail (backfill)
    "cdc_scan_payload",  # payload-column ranges= scan (truncated bounds)
    "cdc_zorder_scan",  # z-order clustering compaction + 2-column pruned scan
    "cdc_constraints",  # CHECK-constraint gated ingest (drop-and-count)
]


def _consume(ds) -> int:
    """Execute a Dataset to completion, streaming; return row count."""
    if hasattr(ds, "iter_batches"):
        n = 0
        for b in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
            n += b.num_rows
        return n
    return len(ds)


class _HostMeter:
    """Record host conditions around a bench run, so every artifact
    carries its own noise context (this box is shared; co-tenant load
    swings single-shot timings 2-6x — documented A/Bs in BASELINE.md).
    steal_pct is the fraction of total CPU jiffies stolen by the
    hypervisor during the run; loadavg is sampled at start and end."""

    def _stat(self):
        try:
            with open("/proc/stat") as f:
                parts = f.readline().split()
            vals = [int(x) for x in parts[1:]]
            return sum(vals), vals[7] if len(vals) > 7 else 0
        except OSError:
            return None, None

    def __init__(self):
        self.load0 = os.getloadavg()
        self.total0, self.steal0 = self._stat()

    def snapshot(self) -> dict:
        out = {
            "loadavg_start": [round(x, 2) for x in self.load0],
            "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        }
        total1, steal1 = self._stat()
        if self.total0 is not None and total1 and total1 > self.total0:
            out["steal_pct"] = round(
                100.0 * (steal1 - self.steal0) / (total1 - self.total0), 2
            )
        return out


def run_suite(sf_dir: str, num_cpus: int, flagship_only: bool = False) -> dict:
    meter = _HostMeter()
    import ray

    if not ray.is_initialized():
        kw = {}
        # spill-regime knob (BASELINE.md 164M/328M-event points): the
        # default local store is ~42% of RAM; the biggest replays are
        # object-store-bound, and a larger store delays spill onset —
        # the single-box analog of "the fleet's aggregate store scales
        # with node count".
        obj_gb = os.environ.get("BENCH_OBJ_STORE_GB")
        if obj_gb:
            kw["object_store_memory"] = int(float(obj_gb) * (1 << 30))
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
            **kw,
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ray_cdc_lake import enable_self_contained_pickling, tune_data_context
    from ray_cdc_lake.pipeline import cdc_final_state, derive_event_log

    enable_self_contained_pickling()
    tune_data_context()

    # Fixed input partitioning across parallelism levels (the cluster
    # analog: same splits, more workers); 0 = auto (2 blocks/CPU).
    blocks = int(os.environ.get("BENCH_BLOCKS", "0")) or -1

    # warmup: spin up worker processes so timings measure the pipelines,
    # not Ray cold-start
    _consume(derive_event_log(sf_dir, epochs=1))

    # ---- flagship: full CDC replay (events derived + compiled + merged) ----
    # Sustained (steady-state) throughput: best of N runs — the first
    # pays one-time scheduler/executor warmup that a long-running tail
    # never sees (the north rule's metric is SUSTAINED events/sec), and
    # this box is shared, so min-of-N also rejects co-tenant noise.
    runs = max(1, int(os.environ.get("BENCH_RUNS", "2")))
    derive_sec = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        n_events = _consume(
            derive_event_log(sf_dir, epochs=BENCH_EPOCHS, parallelism=blocks)
        )
        derive_sec = min(derive_sec, time.perf_counter() - t0)

    replay_sec = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        n_final = _consume(
            cdc_final_state(sf_dir, epochs=BENCH_EPOCHS, parallelism=blocks)
        )
        replay_sec = min(replay_sec, time.perf_counter() - t0)

    queries = {"cdc_derive_events": round(derive_sec, 3), "cdc_replay": round(replay_sec, 3)}

    if not flagship_only:
        from ray_cdc_lake import queries as _q

        # untimed setup: the two-txn fixture lake shared by the
        # tt/diff/delpfx/ivm/merge/metrics/stats consumers — its first
        # timed consumer would otherwise pay the build and misreport the
        # OP's cost (the fixture is test scaffolding, not the operator)
        _q._two_txn_lake(sf_dir, "twotxn")

        reg, _ = _q.registry()
        # min-of-N per secondary, like the flagship: single-shot timings on
        # this shared box swing 2x with co-tenant load (the r2 snapshot
        # stamped q1_lineitem/dedup_simhash at 2.1x their quiet-box values);
        # min-of-N rejects the noise without needing a quiet window.
        qruns = max(1, int(os.environ.get("BENCH_QUERY_RUNS", "2")))
        for name in SECONDARY:
            fn = reg.get(name)
            if fn is None:
                continue
            try:
                best = float("inf")
                for _ in range(qruns):
                    t0 = time.perf_counter()
                    _consume(fn(sf_dir))
                    best = min(best, time.perf_counter() - t0)
                queries[name] = round(best, 3)
            except Exception as ex:  # keep the bench alive; record the failure
                queries[name] = f"ERROR:{type(ex).__name__}"

    out = {
        "metric": "cdc_replay_wall_sec",
        "value": round(replay_sec, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "events": n_events,
        "final_rows": n_final,
        "events_per_sec": round(n_events / replay_sec, 1),
        "host": meter.snapshot(),
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    """Same job at N and 4N parallelism, fresh processes (BASELINE.md plan).

    Levels default to 2 and 8 CPUs: this box exposes 32 hyperthreads over
    ~16 physical cores, so 8->32 measures hyperthread contention, not the
    engine (a pure-CPU md5 microbenchmark scales 2->8 at eff ~1.0 but
    4->16 at ~0.78 here). N=2, 4N=8 keeps both levels on real cores —
    the sandbox stand-in for N and 4N nodes.
    """
    lo = int(os.environ.get("SCALE_CPUS_LO", "2"))
    hi = int(os.environ.get("SCALE_CPUS_HI", "8"))
    rounds = max(1, int(os.environ.get("SCALE_ROUNDS", "3")))
    epochs = os.environ.get("BENCH_EPOCHS", "1024")  # ~5.1M events at sf0.1

    def one(cpus: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(cpus),
            GRAFT_SF_DIR=SF_DIR,
            BENCH_EPOCHS=epochs,
            # both levels process the same 4-blocks-per-high-CPU splits
            # (finer tasks pack the last wave better than 2/CPU)
            BENCH_BLOCKS=os.environ.get("BENCH_BLOCKS", str(4 * hi)),
            BENCH_RUNS=os.environ.get("BENCH_RUNS", "2"),
        )
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--one"],
            env=env,
            capture_output=True,
            text=True,
            timeout=1200,
        )
        if proc.returncode != 0 or not proc.stdout.strip():
            sys.stderr.write(proc.stderr[-2000:])
            raise RuntimeError(
                f"scaling child at num_cpus={cpus} failed "
                f"(rc={proc.returncode}); stderr above"
            )
        return json.loads(proc.stdout.strip().splitlines()[-1])

    # PAIRED rounds: each round runs lo then hi back-to-back in fresh
    # processes, and efficiency is computed WITHIN the round — the two
    # runs share (approximately) the same co-tenant load environment on
    # this shared box. Best-of-per-level across rounds would mix a
    # quiet-box lo with a busy-box hi (or vice versa) and bias the ratio
    # either way; the reported number is the best paired round, with
    # every round's efficiency listed for honesty.
    pairs = []
    for _ in range(rounds):
        pairs.append((one(lo), one(hi)))
    effs = [
        (p_hi["events_per_sec"] / p_lo["events_per_sec"]) / (hi / lo)
        for p_lo, p_hi in pairs
    ]
    best = max(range(len(pairs)), key=lambda i: effs[i])
    r_lo, r_hi = pairs[best]
    eff = effs[best]
    return {
        "metric": f"scaling_efficiency_{lo}_to_{hi}_cpus",
        "value": round(eff, 3),
        "unit": "ratio",
        "queries": {
            f"cdc_replay_{lo}cpu": r_lo["value"],
            f"cdc_replay_{hi}cpu": r_hi["value"],
        },
        "sf": SF_DIR,
        "num_cpus": hi,
        "events": r_hi["events"],
        f"events_per_sec_{lo}": r_lo["events_per_sec"],
        f"events_per_sec_{hi}": r_hi["events_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "all_round_efficiencies": [round(e, 3) for e in effs],
        "criterion": "eff >= 0.8 stands in for N->4N node scaling (BASELINE.md)",
        # per-round host conditions from the child runs (noise context)
        "round_hosts": [
            [p_lo.get("host"), p_hi.get("host")] for p_lo, p_hi in pairs
        ],
    }


def run_only(names: list[str]) -> dict:
    """Targeted re-measurement: warmup, then ONLY the named registry
    queries, min-of-BENCH_QUERY_RUNS each, interleaved round-robin so all
    targets see the same load environment (the paired-A/B method from
    BASELINE.md applied within one process)."""
    meter = _HostMeter()
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ray_cdc_lake import enable_self_contained_pickling, tune_data_context
    from ray_cdc_lake import queries as _q
    from ray_cdc_lake.pipeline import derive_event_log

    enable_self_contained_pickling()
    tune_data_context()
    _consume(derive_event_log(SF_DIR, epochs=1))  # warmup

    fixture_consumers = {
        "cdc_time_travel", "cdc_lake_diff", "cdc_delete_prefix",
        "cdc_incremental_view", "cdc_merge_into", "cdc_ingest_metrics",
        "cdc_table_stats", "cdc_change_feed",
    }
    if fixture_consumers & set(names):
        _q._two_txn_lake(SF_DIR, "twotxn")

    reg, _ = _q.registry()
    qruns = max(1, int(os.environ.get("BENCH_QUERY_RUNS", "3")))
    times: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(qruns):
        for name in names:  # interleaved: same co-tenant load per round
            t0 = time.perf_counter()
            _consume(reg[name](SF_DIR))
            times[name].append(round(time.perf_counter() - t0, 3))
    out = {
        "metric": "targeted_requery_min_sec",
        "value": min(times[names[0]]),
        "unit": "sec",
        "queries": {n: min(ts) for n, ts in times.items()},
        "all_runs": times,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "host": meter.snapshot(),
    }
    ray.shutdown()
    return out


def run_stress(replicate: int = 20, epochs: int = 8) -> dict:
    """Key-cardinality stress: the scaling axis that matters at 100 TB is
    LIVE KEYS (the merge output), not just events. Replicates the document
    corpus ``replicate``x with distinct key spaces (bench-only — no oracle),
    so the final state has ~replicate * 4.4k keys and the shuffle/reduce
    path handles a wide output instead of a tiny one."""
    import ray
    import pyarrow as pa

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ray_cdc_lake import enable_self_contained_pickling, tune_data_context
    from ray_cdc_lake.events import DeriveEvents, compile_changes
    from ray_cdc_lake.merge import lww_merge
    from ray_cdc_lake.sources import read_table
    from ray_cdc_lake.transforms import add_sha256, normalize_content

    enable_self_contained_pickling()
    tune_data_context()

    docs = read_table(
        SF_DIR, "documents", columns=["doc_id", "lang", "source", "text"]
    )

    def replicate_docs(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        parts = []
        for r in range(replicate):
            t = batch.set_column(
                batch.schema.get_field_index("source"),
                "source",
                pc.binary_join_element_wise(
                    pc.cast(batch["source"], pa.string()), f"-r{r}", ""
                ),
            )
            parts.append(t)
        return pa.concat_tables(parts)

    ds = docs.map_batches(replicate_docs, batch_format="pyarrow")
    ds = ds.map_batches(DeriveEvents(epochs), batch_format="pyarrow")
    ds = ds.map_batches(compile_changes, batch_format="pyarrow")
    ds = ds.map_batches(normalize_content, batch_format="pyarrow")
    t0 = time.perf_counter()
    out = lww_merge(ds).map_batches(add_sha256, batch_format="pyarrow")
    n_final = _consume(out)
    wall = time.perf_counter() - t0
    out_d = {
        "metric": "stress_replay_wall_sec",
        "value": round(wall, 3),
        "unit": "sec",
        "queries": {"stress_replay": round(wall, 3)},
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "replicate": replicate,
        "final_rows": n_final,
        "final_rows_per_sec": round(n_final / wall, 1),
    }
    ray.shutdown()
    return out_d


def run_stress_corpus(replicate: int = 20) -> dict:
    """Corpus-scale stress for the curation/text operators: replicate the
    documents table ``replicate``x (doc_ids offset per replica so keys
    stay unique; texts identical, making the corpus ~replicate-fold
    duplicate-heavy — the adversarial case for the recipe's dedup
    combiner). Reports docs/sec for the pure-map repetition filter and
    the full mixture->redact->dedup->split recipe."""
    import ray
    import pyarrow as pa

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ray_cdc_lake import enable_self_contained_pickling, tune_data_context
    from ray_cdc_lake.curation import mixture_filter, redact_text, split_assign
    from ray_cdc_lake.textstats import repetition_score
    from ray_cdc_lake.sources import read_table

    enable_self_contained_pickling()
    tune_data_context()

    ID_STRIDE = 100_000_000

    def replicate_docs(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        parts = []
        for r in range(replicate):
            parts.append(
                batch.set_column(
                    batch.schema.get_field_index("doc_id"),
                    "doc_id",
                    pc.add(batch["doc_id"], r * ID_STRIDE),
                )
            )
        return pa.concat_tables(parts)

    def docs():
        return read_table(
            SF_DIR, "documents", columns=["doc_id", "source", "text"]
        ).map_batches(replicate_docs, batch_format="pyarrow")

    n_docs = docs().count()
    out: dict = {
        "metric": "corpus_stress_docs_per_sec",
        "unit": "docs/sec",
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "replicate": replicate,
        "n_docs": n_docs,
        "queries": {},
    }

    t0 = time.perf_counter()
    n = _consume(docs().map_batches(repetition_score, batch_format="pyarrow"))
    wall = time.perf_counter() - t0
    out["queries"]["text_repetition"] = round(wall, 3)
    out["repetition_docs_per_sec"] = round(n / wall, 1)

    from ray_cdc_lake.queries import registry

    t0 = time.perf_counter()
    # recipe over the replicated corpus: inline the same stages as
    # q_corpus_recipe but over docs() (the registry fn reads the table
    # itself, so the stress drives the stage functions directly)
    import hashlib
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    def redact_keep(batch: pa.Table) -> pa.Table:
        t2, _ = redact_text(batch["text"])
        return pa.table(
            {"doc_id": batch["doc_id"], "source": batch["source"], "redacted": t2}
        )

    def partial(batch: pa.Table) -> pa.Table:
        md5s = pa.array(
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in batch["redacted"].to_pylist()
        )
        packed = pc.binary_join_element_wise(
            pc.utf8_lpad(pc.cast(batch["doc_id"], pa.string()), 20, "0"),
            batch["source"],
            "|",
        )
        return (
            pa.table({"h": md5s, "packed": packed})
            .group_by("h")
            .aggregate([("packed", "min")])
            .rename_columns(["h", "packed"])
        )

    deduped = (
        docs()
        .map_batches(mixture_filter, batch_format="pyarrow")
        .map_batches(redact_keep, batch_format="pyarrow")
        .map_batches(partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min("packed", alias_name="packed"))
    )
    n_kept = _consume(deduped)
    wall = time.perf_counter() - t0
    out["queries"]["corpus_recipe"] = round(wall, 3)
    out["recipe_docs_per_sec"] = round(n_docs / wall, 1)
    out["recipe_survivors"] = n_kept
    ray.shutdown()
    return out


def run_stats() -> None:
    """Print the flagship replay's per-stage Ray Data stats (operator wall
    / UDF time / rows / memory) — the profiling surface behind BASELINE.md."""
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ray_cdc_lake import enable_self_contained_pickling, tune_data_context
    from ray_cdc_lake.pipeline import cdc_final_state, derive_event_log

    enable_self_contained_pickling()
    tune_data_context()
    _consume(derive_event_log(SF_DIR, epochs=1))  # warmup
    ds = cdc_final_state(SF_DIR, epochs=BENCH_EPOCHS)
    _consume(ds)
    print(ds.stats())
    ray.shutdown()


def run_sustained() -> dict:
    """Sustained COMMITTED tail throughput — the north rule's metric
    (sustained change-events/sec upsert throughput on a long-running
    tail) measured through the exactly-once sink, not the uncommitted
    replay: the binlog is persisted UNTIMED (in a deployment the log
    already exists — it is the source), then SUSTAINED_WINDOWS
    consecutive LSN-window micro-batches are applied as exactly-once
    txns (stage -> commit -> watermark advance) and committed events/sec
    is reported over the whole tail.

    Phase 2 measures the SPARSE-delta regime — the steady-state tail
    moment where a micro-batch touches a handful of keys: per-apply wall
    must track the delta's bucket footprint, not lake size
    (touched-bucket pruning in checkpoint.apply_incremental); the
    rewritten-bucket count per txn is read back from the manifest as
    hard evidence."""
    meter = _HostMeter()
    import shutil

    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from ray_cdc_lake import enable_self_contained_pickling, tune_data_context
    from ray_cdc_lake.checkpoint import apply_incremental
    from ray_cdc_lake.pipeline import binlog_cuts, persist_binlog
    from ray_cdc_lake.schemas import COMPILED_SCHEMA
    from ray_cdc_lake.sink import read_lake, read_manifest

    enable_self_contained_pickling()
    tune_data_context()

    lake = "/tmp/ray_cdc_bench_sustained/lake"
    shutil.rmtree(lake, ignore_errors=True)
    windows = int(os.environ.get("SUSTAINED_WINDOWS", "16"))
    cuts = binlog_cuts(BENCH_EPOCHS, windows)
    binlog = persist_binlog(lake, SF_DIR, BENCH_EPOCHS, cuts)  # untimed

    # per-segment event counts from parquet footers (untimed, metadata only)
    segments = []
    for i in range(len(cuts)):
        seg_dir = os.path.join(binlog, f"segment={i}")
        if not os.path.isdir(seg_dir):
            continue
        files = [
            os.path.join(seg_dir, f)
            for f in sorted(os.listdir(seg_dir))
            if f.endswith(".parquet")
        ]
        if files:
            n = sum(pq.read_metadata(f).num_rows for f in files)
            segments.append((i, files, n))
    total_events = sum(n for _, _, n in segments)

    def drop_seg(t):
        return (
            t.drop_columns(["segment"]) if "segment" in t.column_names else t
        )

    # SUSTAINED_MODE=mor commits every window after the first as
    # merge-on-read deltas (O(window) writes, prior buckets never read),
    # with a bucket-local fold every SUSTAINED_FOLD_EVERY windows to
    # bound the scan-time chain length — the maintenance a mor tail
    # actually runs, timed inside the loop like the maintained bench.
    mode = os.environ.get("SUSTAINED_MODE", "cow")
    fold_every = int(os.environ.get("SUSTAINED_FOLD_EVERY", "8"))
    fold_wall = 0.0
    if mode == "mor":
        from ray_cdc_lake.checkpoint import compact_deltas

    t0 = time.perf_counter()
    for n_applied, (i, files, _n) in enumerate(segments, start=1):
        win = rd.read_parquet(files).map_batches(drop_seg, batch_format="pyarrow")
        apply_incremental(
            lake, f"tail-{i:04d}", win, events_schema=COMPILED_SCHEMA, mode=mode
        )
        if mode == "mor" and n_applied % fold_every == 0:
            f0 = time.perf_counter()
            compact_deltas(lake)
            fold_wall += time.perf_counter() - f0
    tail_wall = time.perf_counter() - t0

    # ---- phase 2: sparse-delta steady state ----
    m = read_manifest(lake)
    n_buckets_total = len(m.buckets)
    base_lsn = max(info["hwm_lsn"] for info in m.buckets.values()) + 1
    sparse_keys = int(os.environ.get("SUSTAINED_SPARSE_KEYS", "8"))
    keys = read_lake(lake, columns=["repo", "path"]).take(sparse_keys)
    applies = int(os.environ.get("SUSTAINED_SPARSE_APPLIES", "8"))
    sparse_walls, sparse_rewritten = [], []
    for j in range(applies):
        rows = [
            (base_lsn + j * sparse_keys + k, r["repo"], r["path"])
            for k, r in enumerate(keys)
        ]
        tbl = pa.Table.from_arrays(
            [
                pa.array([r[0] for r in rows], type=pa.int64()),
                pa.array(["update"] * len(rows), type=pa.string()),
                pa.array([r[1] for r in rows], type=pa.string()),
                pa.array([r[2] for r in rows], type=pa.string()),
                pa.array([f"c{r[0]:08d}" for r in rows], type=pa.string()),
                pa.array(["py"] * len(rows), type=pa.string()),
                pa.array([f"sparse-{j}-{r[0]}" for r in rows], type=pa.large_string()),
            ],
            schema=COMPILED_SCHEMA,
        )
        t0 = time.perf_counter()
        apply_incremental(
            lake, f"sparse-{j:04d}", rd.from_arrow(tbl),
            events_schema=COMPILED_SCHEMA, mode=mode,
        )
        sparse_walls.append(time.perf_counter() - t0)
        mj = read_manifest(lake)
        sparse_rewritten.append(
            sum(1 for info in mj.buckets.values() if info["txn_id"] == f"sparse-{j:04d}")
        )

    ray.shutdown()
    eps = total_events / tail_wall
    return {
        "metric": "sustained_committed_events_per_sec",
        "value": round(eps, 1),
        "unit": "events/sec",
        "queries": {
            "tail_wall_sec": round(tail_wall, 3),
            "tail_windows": len(segments),
            "mode": mode,
            "fold_wall_sec": round(fold_wall, 3),
            "sparse_apply_avg_sec": round(sum(sparse_walls) / len(sparse_walls), 3),
            "sparse_apply_min_sec": round(min(sparse_walls), 3),
            "sparse_buckets_rewritten_avg": round(
                sum(sparse_rewritten) / len(sparse_rewritten), 2
            ),
            "sparse_buckets_total": n_buckets_total,
        },
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "events": total_events,
        "events_per_sec": round(eps, 1),
        "host": meter.snapshot(),
    }


def run_mor() -> dict:
    """Merge-on-read vs copy-on-write SPARSE-apply cost on a FAT-bucket
    lake — the claim under test: a cow micro-batch apply reads + rewrites
    every touched bucket (cost grows with bucket size), a mor apply
    writes only its own winners (cost independent of bucket size).
    Build one committed lake per mode from the same BENCH_EPOCHS binlog
    at MOR_BUCKETS buckets (few buckets => fat buckets, the 100 TB shape
    in miniature), run MOR_APPLIES sparse 8-key applies in each mode, and
    report per-apply wall, per-txn committed bytes (from the manifest's
    recorded file stats — hard evidence of the write amplification), the
    full-scan read-back before/after (the mor read tax), and the fold."""
    meter = _HostMeter()
    import shutil

    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import pyarrow as pa
    import ray.data as rd

    from ray_cdc_lake import enable_self_contained_pickling, tune_data_context
    from ray_cdc_lake.checkpoint import apply_incremental, compact_deltas
    from ray_cdc_lake.pipeline import compiled_log
    from ray_cdc_lake.schemas import COMPILED_SCHEMA
    from ray_cdc_lake.sink import read_lake, read_manifest

    enable_self_contained_pickling()
    tune_data_context()

    n_buckets = int(os.environ.get("MOR_BUCKETS", "16"))
    applies = int(os.environ.get("MOR_APPLIES", "8"))
    sparse_keys = 8
    ev = compiled_log(SF_DIR, BENCH_EPOCHS).materialize()  # untimed source

    def scan_sec(lake: str) -> float:
        t0 = time.perf_counter()
        _consume(read_lake(lake))
        return time.perf_counter() - t0

    out_q: dict = {}
    for mode in ("cow", "mor"):
        lake = f"/tmp/ray_cdc_bench_mor/{mode}"
        shutil.rmtree(lake, ignore_errors=True)
        apply_incremental(
            lake, "base", ev, num_buckets=n_buckets,
            events_schema=COMPILED_SCHEMA,
        )  # untimed: both modes share an identical fat base
        m0 = read_manifest(lake)
        base_lsn = max(i["hwm_lsn"] for i in m0.buckets.values()) + 1
        keys = read_lake(lake, columns=["repo", "path"]).take(sparse_keys)
        out_q[f"{mode}_scan_before_sec"] = round(scan_sec(lake), 3)
        walls, txn_bytes = [], []
        for j in range(applies):
            rows = [
                (base_lsn + j * sparse_keys + k, r["repo"], r["path"])
                for k, r in enumerate(keys)
            ]
            tbl = pa.Table.from_arrays(
                [
                    pa.array([r[0] for r in rows], type=pa.int64()),
                    pa.array(["update"] * len(rows), type=pa.string()),
                    pa.array([r[1] for r in rows], type=pa.string()),
                    pa.array([r[2] for r in rows], type=pa.string()),
                    pa.array([f"c{r[0]:08d}" for r in rows], type=pa.string()),
                    pa.array(["py"] * len(rows), type=pa.string()),
                    pa.array(
                        [f"sparse-{j}-{r[0]}" for r in rows],
                        type=pa.large_string(),
                    ),
                ],
                schema=COMPILED_SCHEMA,
            )
            txn = f"sparse-{j:04d}"
            t0 = time.perf_counter()
            apply_incremental(
                lake, txn, rd.from_arrow(tbl),
                events_schema=COMPILED_SCHEMA, mode=mode,
            )
            walls.append(time.perf_counter() - t0)
            mj = read_manifest(lake)
            entries = [
                i for i in mj.buckets.values() if i["txn_id"] == txn
            ] + [e for es in mj.deltas.values() for e in es if e["txn_id"] == txn]
            txn_bytes.append(
                sum(f.get("bytes", 0) for e in entries for f in e.get("files", []))
            )
        out_q[f"{mode}_apply_min_sec"] = round(min(walls), 3)
        out_q[f"{mode}_apply_avg_sec"] = round(sum(walls) / len(walls), 3)
        out_q[f"{mode}_txn_bytes_avg"] = int(sum(txn_bytes) / len(txn_bytes))
        out_q[f"{mode}_scan_after_sec"] = round(scan_sec(lake), 3)
        if mode == "mor":
            t0 = time.perf_counter()
            compact_deltas(lake)
            out_q["mor_fold_sec"] = round(time.perf_counter() - t0, 3)
            out_q["mor_scan_after_fold_sec"] = round(scan_sec(lake), 3)

    ray.shutdown()
    speedup = out_q["cow_apply_avg_sec"] / max(out_q["mor_apply_avg_sec"], 1e-9)
    return {
        "metric": "mor_sparse_apply_speedup",
        "value": round(speedup, 2),
        "unit": "x (cow avg / mor avg, fat-bucket sparse applies)",
        "queries": out_q,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "mor_buckets": n_buckets,
        "applies": applies,
        "host": meter.snapshot(),
    }


def run_sustained_maintained() -> dict:
    """Sustained committed tail WITH LIVE MAINTENANCE — the regime a
    100 TB lake actually lives in: a long micro-batch chain (default 64
    exactly-once txns over >=10M events) with ``expire_snapshots`` and
    ``maybe_compact`` interleaved INSIDE the timed loop (every
    MAINT_EVERY txns), so the reported committed events/sec pays for its
    own storage reclaim. Also records manifest-size and metrics-retention
    behavior over the chain: both must stay bounded (the retention caps),
    not grow with txn count.

    Env knobs: SUSTAINED_WINDOWS (64), BENCH_EPOCHS (2048 here -> ~10.2M
    events at sf0.1), MAINT_EVERY (8), MAINT_KEEP_LAST (4),
    MAINT_MAX_TXNS (24)."""
    meter = _HostMeter()
    import shutil

    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import pyarrow.parquet as pq
    import ray.data as rd

    from ray_cdc_lake import enable_self_contained_pickling, tune_data_context
    from ray_cdc_lake.checkpoint import apply_incremental, maybe_compact
    from ray_cdc_lake.pipeline import binlog_cuts, persist_binlog
    from ray_cdc_lake.schemas import COMPILED_SCHEMA
    from ray_cdc_lake.sink import expire_snapshots, read_lake, read_manifest

    enable_self_contained_pickling()
    tune_data_context()

    lake = "/tmp/ray_cdc_bench_maintained/lake"
    shutil.rmtree(lake, ignore_errors=True)
    windows = int(os.environ.get("SUSTAINED_WINDOWS", "64"))
    epochs = int(os.environ.get("BENCH_EPOCHS", "2048"))
    maint_every = int(os.environ.get("MAINT_EVERY", "8"))
    keep_last = int(os.environ.get("MAINT_KEEP_LAST", "4"))
    max_txns = int(os.environ.get("MAINT_MAX_TXNS", "24"))
    cuts = binlog_cuts(epochs, windows)
    binlog = persist_binlog(lake, SF_DIR, epochs, cuts)  # untimed: the log IS the source

    segments = []
    for i in range(len(cuts)):
        seg_dir = os.path.join(binlog, f"segment={i}")
        if not os.path.isdir(seg_dir):
            continue
        files = [
            os.path.join(seg_dir, f)
            for f in sorted(os.listdir(seg_dir))
            if f.endswith(".parquet")
        ]
        if files:
            n = sum(pq.read_metadata(f).num_rows for f in files)
            segments.append((i, files, n))
    total_events = sum(n for _, _, n in segments)

    def drop_seg(t):
        return (
            t.drop_columns(["segment"]) if "segment" in t.column_names else t
        )

    def manifest_bytes() -> int:
        mdir = os.path.join(lake, "_manifests")
        return sum(
            os.path.getsize(os.path.join(mdir, f))
            for f in os.listdir(mdir)
            if f.startswith("manifest-")
        )

    compactions = expiries = 0
    maint_wall = 0.0
    manifest_bytes_max = 0
    txn_count_max = 0
    t0 = time.perf_counter()
    for j, (i, files, _n) in enumerate(segments, start=1):
        win = rd.read_parquet(files).map_batches(drop_seg, batch_format="pyarrow")
        apply_incremental(
            lake, f"tail-{i:04d}", win, events_schema=COMPILED_SCHEMA
        )
        if j % maint_every == 0:
            m0 = time.perf_counter()
            if maybe_compact(lake, max_txns=max_txns) is not None:
                compactions += 1
            out = expire_snapshots(lake, keep_last=keep_last)
            if out["manifests_removed"] or out["data_removed"]:
                expiries += 1
            maint_wall += time.perf_counter() - m0
        mj = read_manifest(lake)
        txn_count_max = max(txn_count_max, len(mj.txns))
        manifest_bytes_max = max(manifest_bytes_max, manifest_bytes())
    tail_wall = time.perf_counter() - t0

    m = read_manifest(lake)
    live_rows = read_lake(lake).count()
    # close the loop: the survivor of 64 txns of ingest + interleaved
    # compaction/expiry must pass its own integrity audit (untimed)
    from ray_cdc_lake.fsck import fsck as _fsck

    fsck_rows = _fsck(lake, data=True).to_pylist()
    fsck_fails = [r["check"] for r in fsck_rows if r["status"] == "fail"]
    ray.shutdown()
    eps = total_events / tail_wall
    return {
        "metric": "sustained_maintained_events_per_sec",
        "value": round(eps, 1),
        "unit": "events/sec",
        "queries": {
            "tail_wall_sec": round(tail_wall, 3),
            "maint_wall_sec": round(maint_wall, 3),
            "tail_windows": len(segments),
            "compactions": compactions,
            "expiries": expiries,
            "txn_count_max": txn_count_max,
            "txn_count_final": len(m.txns),
            "manifest_bytes_max": manifest_bytes_max,
            "manifest_bytes_final": manifest_bytes(),
            "metrics_entries_final": len(m.metrics),
            "manifest_version_final": m.version,
            "live_rows": live_rows,
            "fsck_checks": len(fsck_rows),
            "fsck_fails": fsck_fails,
        },
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "events": total_events,
        "events_per_sec": round(eps, 1),
        "host": meter.snapshot(),
    }


def run_index_frontier() -> dict:
    """Signature-index scale evidence: build the persisted LSH index
    over 1x / 4x / 16x replicas of the sf corpus (distinct doc_ids per
    replica), probe the SAME fixed batch each time, and report probe
    seconds per index size. The design claim under test: probe cost
    follows the PROBE's bucket partitions (per-bucket density), not the
    index's total breadth — growth should be strongly sublinear in
    index size. Env: INDEX_REPLICAS ("1,4,16")."""
    meter = _HostMeter()
    import shutil

    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import numpy as np
    import pyarrow as pa

    from ray_cdc_lake import enable_self_contained_pickling, tune_data_context
    from ray_cdc_lake.dedup import corpus_ds
    from ray_cdc_lake.nearindex import index_append, index_probe

    enable_self_contained_pickling()
    tune_data_context()

    replicas = [
        int(x)
        for x in os.environ.get("INDEX_REPLICAS", "1,4,16").split(",")
    ]
    corpus = corpus_ds(SF_DIR).materialize()
    n_docs = corpus.count()

    def replicate(k: int):
        # replica 0 is the corpus verbatim (the probe's true partners);
        # replicas j>0 rewrite every word with a j-tag so they are
        # textually UNRELATED filler — the index grows k-fold without
        # planting k-cliques of duplicates (that would measure the
        # verify kernel's worst case, not index growth)
        def fn(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            reps = [t]
            for j in range(1, k):
                tagged = pc.replace_substring_regex(
                    t["text"], r"(^| )", f"\\1r{j}x"
                )
                reps.append(
                    pa.Table.from_arrays(
                        [pa.array(ids + j * 10_000_000), tagged.combine_chunks()],
                        names=["doc_id", "text"],
                    )
                )
            return pa.concat_tables(reps)

        return corpus.map_batches(fn, batch_format="pyarrow")

    def probe_batch(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array((ids % 29) == 0))

    probe = corpus.map_batches(probe_batch, batch_format="pyarrow").materialize()
    n_probe = probe.count()

    out = {}
    for k in replicas:
        root = f"/tmp/ray_cdc_idx_frontier/{k}x"
        shutil.rmtree(root, ignore_errors=True)
        t0 = time.time()
        index_append(root, "base", replicate(k))
        build_s = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            n = _consume(index_probe(root, probe))
            times.append(round(time.time() - t0, 3))
        out[f"{k}x"] = {
            "indexed_docs": n_docs * k,
            "build_sec": round(build_s, 3),
            "probe_sec_min": min(times),
            "probe_runs": times,
            "verdicts": n,
        }
    ray.shutdown()
    return {
        "metric": "index_probe_frontier",
        "probe_docs": n_probe,
        "levels": out,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "host": meter.snapshot(),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--index-frontier" in sys.argv:
        print(json.dumps(run_index_frontier()))
    elif "--stress-corpus" in sys.argv:
        print(json.dumps(run_stress_corpus(
            replicate=int(os.environ.get("STRESS_REPLICATE", "20")))))
    elif "--stress" in sys.argv:
        print(json.dumps(run_stress()))
    elif "--stats" in sys.argv:
        run_stats()
    elif "--mor" in sys.argv:
        print(json.dumps(run_mor()))
    elif "--sustained-maintained" in sys.argv:
        print(json.dumps(run_sustained_maintained()))
    elif "--sustained" in sys.argv:
        print(json.dumps(run_sustained()))
    elif "--only" in sys.argv:
        names = sys.argv[sys.argv.index("--only") + 1].split(",")
        print(json.dumps(run_only(names)))
    elif "--one" in sys.argv:
        # single fresh-process run at $RAY_GRAFT_CPUS, flagship only
        print(json.dumps(run_suite(SF_DIR, NUM_CPUS, flagship_only=True)))
    else:
        print(json.dumps(run_suite(SF_DIR, NUM_CPUS)))
