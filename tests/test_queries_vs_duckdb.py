"""Every queries() entry that has an oracle_sql() entry must match DuckDB
on sf0.001 — the same comparison the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from ray_cdc_lake.queries import registry
from tests.util import assert_matches_oracle

QUERIES, SQL = registry()
WITH_ORACLE = sorted(k for k in QUERIES if k in SQL)
NO_ORACLE = sorted(k for k in QUERIES if k not in SQL)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(name, sf_tiny, duck):
    assert_matches_oracle(QUERIES[name](sf_tiny), duck, SQL[name], name)


@pytest.mark.parametrize("name", NO_ORACLE)
def test_query_runs(name, sf_tiny):
    from tests.util import to_pandas

    df = to_pandas(QUERIES[name](sf_tiny))
    assert len(df) >= 0 and len(df.columns) > 0
