"""Pipeline-step registry (SURVEY.md §2.10 user-extension surface)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from ray_cdc_lake.steps import PipelineSpec, available_steps, register_step


def test_declared_pipeline_applies_steps_in_order():
    import ray.data as rd

    t = pa.table(
        {
            "content": ["a\r\nb", "x"],
            "path": ["ok.txt", "../evil"],
        }
    )
    spec = PipelineSpec(
        steps=[
            ("normalize_content", {}),
            ("sha256", {"column": "content", "out": "sha"}),
            ("path_safety", {}),
        ]
    )
    out = spec.apply(rd.from_arrow(t)).to_pandas()
    assert list(out["content"]) == ["a\nb", "x"]
    assert out["sha"].str.len().eq(64).all()
    assert list(out["is_safe"]) == [True, False]


def test_custom_step_registration_and_unknown_step():
    @register_step("test_upper")
    def upper_step(column: str):
        import pyarrow.compute as pc

        return lambda b: b.set_column(
            b.schema.get_field_index(column), column, pc.utf8_upper(b[column])
        )

    assert "test_upper" in available_steps()
    import ray.data as rd

    out = (
        PipelineSpec([("test_upper", {"column": "content"})])
        .apply(rd.from_arrow(pa.table({"content": ["ab"]})))
        .to_pandas()
    )
    assert out["content"][0] == "AB"

    with pytest.raises(KeyError):
        PipelineSpec([("nope", {})]).apply(rd.from_arrow(pa.table({"a": [1]})))
    with pytest.raises(ValueError):
        register_step("test_upper")(upper_step)


def test_route_filter_step():
    import ray.data as rd

    t = pa.table({"route": ["ok", "bad", "ok"], "v": [1, 2, 3]})
    out = (
        PipelineSpec([("filter_route", {"column": "route", "keep": "ok"})])
        .apply(rd.from_arrow(t))
        .to_pandas()
    )
    assert list(out["v"]) == [1, 3]


# ---------------------------------------------------------------------------
# per-record parameterization ('${col}' — evaluateAttributeExpressions analog)
# ---------------------------------------------------------------------------


def test_zero_pad_per_record_width():
    from ray_cdc_lake.steps import _REGISTRY

    b = pa.table(
        {
            "seq": pa.array([7, 42, 7, 123], type=pa.int64()),
            "w": pa.array([3, 5, 6, 2], type=pa.int64()),
        }
    )
    fn = _REGISTRY["zero_pad"](column="seq", width="${w}", out="padded")
    got = fn(b)["padded"].to_pylist()
    # pyarrow lpad never truncates: width 2 on '123' keeps '123'
    assert got == ["007", "00042", "000007", "123"]
    # literal width still works
    fn2 = _REGISTRY["zero_pad"](column="seq", width=4)
    assert fn2(b)["seq"].to_pylist() == ["0007", "0042", "0007", "0123"]


def test_route_threshold_per_record():
    from ray_cdc_lake.steps import _REGISTRY

    b = pa.table(
        {
            "score": pa.array([0.9, 0.2, 0.5], type=pa.float64()),
            "cutoff": pa.array([0.5, 0.5, 0.9], type=pa.float64()),
        }
    )
    fn = _REGISTRY["route_threshold"](column="score", threshold="${cutoff}")
    assert fn(b)["route"].to_pylist() == ["over", "under", "under"]
    fn2 = _REGISTRY["route_threshold"](column="score", threshold=0.4)
    assert fn2(b)["route"].to_pylist() == ["over", "under", "over"]


def test_filter_route_per_record_keep():
    from ray_cdc_lake.steps import _REGISTRY

    b = pa.table(
        {
            "route": pa.array(["ok", "retry", "ok"]),
            "expected": pa.array(["ok", "ok", "retry"]),
        }
    )
    fn = _REGISTRY["filter_route"](column="route", keep="${expected}")
    assert fn(b)["route"].to_pylist() == ["ok"]


def test_param_resolution_errors_loudly():
    import pytest

    from ray_cdc_lake.steps import resolve_param

    b = pa.table({"x": pa.array([1])})
    with pytest.raises(KeyError, match="missing column 'nope'"):
        resolve_param("${nope}", b)
    # non-EL strings pass through as literals
    assert resolve_param("plain", b) == "plain"
