"""Routing policy (RoutedException/penalize analog) and dual-version
manifest serialization."""

from __future__ import annotations

import pyarrow as pa
import pytest

from ray_cdc_lake.routing import (
    DEFAULT_POLICY,
    RoutePolicy,
    RouteRule,
    apply_route_policy,
    route_with_retries,
    split_by_disposition,
)


def _batch(routes: list[str], attempts: list[int] | None = None) -> pa.Table:
    t = pa.table(
        {
            "doc_id": pa.array(range(len(routes)), type=pa.int64()),
            "route": pa.array(routes),
        }
    )
    if attempts is not None:
        t = t.append_column("attempt", pa.array(attempts, type=pa.int64()))
    return t


def test_dispositions_and_penalty():
    out = apply_route_policy(_batch(["ok", "malformed", "transient"]))
    assert out["disposition"].to_pylist() == ["pass", "quarantine", "retry"]
    assert out["attempt"].to_pylist() == [0, 0, 1]
    assert out["penalty_ms"].to_pylist() == [0, 0, 1000]


def test_backoff_grows_exponentially():
    for attempt, want in [(0, 1000), (1, 2000), (2, 4000)]:
        out = apply_route_policy(_batch(["transient"], [attempt]))
        assert out["penalty_ms"].to_pylist() == [want]


def test_retry_budget_exhausts_into_quarantine():
    out = apply_route_policy(_batch(["transient"], [3]))  # max_retries=3
    assert out["disposition"].to_pylist() == ["quarantine"]
    assert out["attempt"].to_pylist() == [3]  # not incremented further


def test_unmapped_route_gets_default():
    out = apply_route_policy(_batch(["never-seen"]))
    assert out["disposition"].to_pylist() == ["quarantine"]


def test_fail_disposition_poisons_batch():
    policy = RoutePolicy(rules={"bad": RouteRule("fail")})
    with pytest.raises(RuntimeError, match="poisoned"):
        apply_route_policy(_batch(["bad"]), policy)


def test_split_by_disposition_partitions_rows():
    out = apply_route_policy(_batch(["ok", "malformed", "transient", "ok"]))
    parts = split_by_disposition(out)
    assert parts["pass"].num_rows == 2
    assert parts["quarantine"].num_rows == 1
    assert parts["retry"].num_rows == 1


def test_route_with_retries_until_pass():
    """A stage that routes 'transient' until the attempt count reaches 2,
    then 'ok' — the retry loop must feed rows back with incremented
    attempts and land every row in pass."""

    def stage(batch: pa.Table) -> pa.Table:
        if "attempt" in batch.column_names:
            att = batch["attempt"].to_pylist()
        else:
            att = [0] * batch.num_rows
        routes = ["ok" if a >= 2 else "transient" for a in att]
        out = batch
        if "route" in out.column_names:
            out = out.drop_columns(["route"])
        return out.append_column("route", pa.array(routes))

    passed, quarantined = route_with_retries(_batch(["x", "x"]), stage)
    assert passed.num_rows == 2
    assert quarantined.num_rows == 0
    assert passed["attempt"].to_pylist() == [2, 2]


def test_route_with_retries_exhaustion_quarantines():
    """A stage that never recovers: rows must exhaust max_retries and end
    in quarantine, not loop forever."""

    def stage(batch: pa.Table) -> pa.Table:
        out = batch
        if "route" in out.column_names:
            out = out.drop_columns(["route"])
        return out.append_column(
            "route", pa.array(["transient"] * out.num_rows)
        )

    passed, quarantined = route_with_retries(_batch(["x"]), stage)
    assert passed.num_rows == 0
    assert quarantined.num_rows == 1


def test_manifest_two_versions_byte_exact():
    from ray_cdc_lake.manifests import build_manifest_model, serialize_manifest

    model = build_manifest_model("repo-a", ["b.txt", "a.txt"], ["h2", "h1"])
    v1 = serialize_manifest(model, 1)
    v2 = serialize_manifest(model, 2)
    # files sorted by path in the MODEL, independent of input order
    assert v1 == (
        '{"repo":"repo-a","n_files":2,"files":['
        '{"path":"a.txt","sha256":"h1"},{"path":"b.txt","sha256":"h2"}]}'
    )
    assert v2 == (
        '{"manifest_version":2,"object":{"id":"repo-a","file_count":2},'
        '"files":[{"href":"a.txt","checksum":"sha256:h1"},'
        '{"href":"b.txt","checksum":"sha256:h2"}]}'
    )
    with pytest.raises(ValueError):
        serialize_manifest(model, 3)


def test_route_with_retries_schema_stable_on_empty_and_exhausted():
    """Both outputs always carry the routed schema — empty input, empty
    side, and max_rounds exhaustion included — so per-batch results
    concat without schema drift."""

    def stage(batch: pa.Table) -> pa.Table:
        out = batch
        if "route" in out.column_names:
            out = out.drop_columns(["route"])
        return out.append_column(
            "route", pa.array(["transient"] * out.num_rows, type=pa.string())
        )

    empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "route": pa.array([], type=pa.string())})
    p0, q0 = route_with_retries(empty, stage)
    full = pa.table({"doc_id": pa.array([1], type=pa.int64()),
                     "route": pa.array(["x"], type=pa.string())})
    p1, q1 = route_with_retries(full, stage, max_rounds=2)
    assert p0.schema.names == p1.schema.names == q0.schema.names == q1.schema.names
    assert "disposition" in p0.schema.names and "penalty_ms" in q1.schema.names
    # cross-batch concat must not raise
    pa.concat_tables([p0, p1], promote_options="permissive")
    pa.concat_tables([q0, q1], promote_options="permissive")
    assert q1.num_rows == 1  # exhausted row quarantined, nothing lost
