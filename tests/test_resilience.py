"""Task-retry resilience (SURVEY.md §4 'Retries' row): a transiently
failing UDF must not corrupt or duplicate results — Ray re-executes the
failed task and the pipeline output equals the clean run (the engine-level
analog of NiFi's penalize-and-retry relationship routing,
Jhove.kt:539-549).
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa


def test_transient_udf_failure_retried_without_loss():
    import ray.data as rd

    from ray_cdc_lake.merge import lww_merge
    from ray_cdc_lake.schemas import COMPILED_SCHEMA

    n = 5_000
    ev = pa.Table.from_arrays(
        [
            pa.array(range(n), type=pa.int64()),
            pa.array(["insert"] * n, type=pa.string()),
            pa.array([f"r{i % 7}" for i in range(n)], type=pa.string()),
            pa.array([f"p{i % 900}" for i in range(n)], type=pa.string()),
            pa.array([f"c{i:08d}" for i in range(n)], type=pa.string()),
            pa.array(["py"] * n, type=pa.string()),
            pa.array([f"v{i}" for i in range(n)], type=pa.large_string()),
        ],
        schema=COMPILED_SCHEMA,
    )

    run_id = uuid.uuid4().hex

    def flaky(batch: pa.Table) -> pa.Table:
        # fail exactly once across the whole run (first task to find no
        # marker plants it and dies); the retry — wherever it lands —
        # succeeds. A transient-infrastructure-failure model.
        marker = f"/tmp/ray_cdc_flaky_{run_id}"
        if not os.path.exists(marker):
            open(marker, "w").close()
            raise RuntimeError("injected transient failure")
        return batch

    ds = rd.from_arrow(ev).repartition(8)
    # remote args go through as direct kwargs on map_batches
    ds = ds.map_batches(
        flaky, batch_format="pyarrow", retry_exceptions=True, max_retries=3
    )
    out = lww_merge(ds, num_buckets=8)
    df = out.to_pandas()
    # every distinct (repo, path) exactly once, winner = max lsn
    assert len(df) == len({(f"r{i % 7}", f"p{i % 900}") for i in range(n)})
    assert df["lsn"].max() == n - 1
    assert not df.duplicated(subset=["repo", "path"]).any()


def test_actor_stage_transient_failure_retried():
    """Same injection through a stateful actor-pool stage: enabled via
    DataContext.actor_task_retry_on_errors (actor tasks do not inherit
    map_batches retry kwargs)."""
    import ray.data as rd
    from ray.data import DataContext

    ctx = DataContext.get_current()
    prev = getattr(ctx, "actor_task_retry_on_errors", False)
    ctx.actor_task_retry_on_errors = [RuntimeError]
    run_id = uuid.uuid4().hex

    class Flaky:
        def __call__(self, batch: pa.Table) -> pa.Table:
            marker = f"/tmp/ray_cdc_flaky_a_{run_id}"
            if not os.path.exists(marker):
                open(marker, "w").close()
                raise RuntimeError("injected transient failure")
            return batch

    try:
        n = (
            rd.range(1_000)
            .repartition(4)
            .map_batches(Flaky, batch_format="pyarrow", concurrency=1)
            .count()
        )
        assert n == 1_000
    finally:
        ctx.actor_task_retry_on_errors = prev
