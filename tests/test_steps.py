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
