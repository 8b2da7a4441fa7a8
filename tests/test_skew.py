"""Hot-key skew: salted sub-partitioning + merge-back must equal the
unsalted reduce on a pathologically skewed event set (SURVEY.md §7 step 9;
§4 'Skew / stragglers' row).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from ray_cdc_lake.merge import lww_merge
from ray_cdc_lake.schemas import COMPILED_SCHEMA


def _skewed_events(n: int, seed: int = 5) -> pa.Table:
    """90% of events hit ONE key (the hot repo), the rest spread thin;
    includes deletes and duplicate deliveries."""
    rng = np.random.default_rng(seed)
    hot = rng.random(n) < 0.9
    repo = np.where(hot, "hot-repo", "cold")
    path = np.where(
        hot,
        "hot.py",
        np.char.add("p", rng.integers(0, 50, n).astype(str)),
    )
    lsn = rng.integers(0, 5 * n, n)
    op = np.where(rng.random(n) < 0.05, "delete", "update")
    content = np.char.add("v", lsn.astype(str))
    return pa.Table.from_arrays(
        [
            pa.array(lsn, type=pa.int64()),
            pa.array(op.tolist(), type=pa.string()),
            pa.array(repo.tolist(), type=pa.string()),
            pa.array(path.tolist(), type=pa.string()),
            pa.array([f"c{x:09d}" for x in lsn], type=pa.string()),
            pa.array(["py"] * n, type=pa.string()),
            pa.array(content.tolist(), type=pa.large_string()),
        ],
        schema=COMPILED_SCHEMA,
    )


def _canon(ds) -> list:
    return sorted(
        map(tuple, ds.to_pandas().astype(str).values.tolist())
    )


@pytest.mark.parametrize("salt_mod", [2, 8])
def test_salted_equals_unsalted_on_hot_key(salt_mod):
    import ray.data as rd

    ev = _skewed_events(20_000)
    plain = lww_merge(rd.from_arrow(ev), num_buckets=8, salt_mod=0)
    salted = lww_merge(rd.from_arrow(ev), num_buckets=8, salt_mod=salt_mod)
    a, b = _canon(plain), _canon(salted)
    assert len(a) > 0
    assert a == b
