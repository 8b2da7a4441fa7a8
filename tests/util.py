"""Shared test helpers: normalize a query result (Dataset / DataFrame /
Table) and compare against a DuckDB oracle EXACTLY the way the driver
does — columns sorted by name, every column stringified, then an
order-insensitive row compare. Driver-faithful on purpose: a dtype
drift (e.g. DuckDB's windowed sum(BIGINT) -> HUGEINT -> float64 ->
"3.0" vs "3") must fail HERE, not first in CORRECTNESS_r{N}.json."""

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
    """The driver's canonicalization, verbatim: sort columns by name,
    stringify every column, sort rows by all columns."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype("string")
    return df.sort_values(by=list(df.columns), ignore_index=True, na_position="last")


def assert_matches_oracle(ray_result, duck, sql: str, name: str = "") -> None:
    got = canon(to_pandas(ray_result))
    want = canon(duck.sql(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    g = got.fillna("<NULL>")
    w = want.fillna("<NULL>")
    if not g.equals(w):
        diff = (g != w).any(axis=1)
        sample = pd.concat(
            [g[diff].head(5).add_suffix("_got"), w[diff].head(5).add_suffix("_want")],
            axis=1,
        )
        raise AssertionError(
            f"{name}: {int(diff.sum())} rows differ after canon; first:\n{sample}"
        )
