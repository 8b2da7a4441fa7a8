"""Shared test helpers: normalize a query result (Dataset / DataFrame /
Table) and compare against a DuckDB oracle the way the driver does —
row-count + schema-agnostic, order-insensitive value comparison with
columns sorted by name."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    # ray.data.Dataset
    return result.to_pandas()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object or str(df[c].dtype).startswith("string"):
            df[c] = df[c].astype("string")
    df = df.sort_values(by=list(df.columns), ignore_index=True, na_position="last")
    return df


def assert_matches_oracle(ray_result, duck, sql: str, name: str = "") -> None:
    got = canon(to_pandas(ray_result))
    want = canon(duck.sql(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    # value compare with numeric tolerance-free equality
    for c in got.columns:
        g, w = got[c], want[c]
        if str(g.dtype).startswith(("float", "Float")) or str(w.dtype).startswith(
            ("float", "Float")
        ):
            pd.testing.assert_series_equal(
                g.astype("float64"),
                w.astype("float64"),
                check_names=False,
                check_exact=False,
                rtol=1e-12,
                atol=1e-12,
            )
        else:
            assert g.astype("string").fillna("<NULL>").tolist() == w.astype(
                "string"
            ).fillna("<NULL>").tolist(), f"{name}: column {c} differs"
