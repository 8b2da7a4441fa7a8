"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in ray_cdc_lake) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import ray_cdc_lake

ray_cdc_lake.enable_self_contained_pickling()
ray_cdc_lake.tune_data_context()

from ray_cdc_lake import queries as _q


def entry() -> Any:
    """Flagship pipeline: full CDC replay of the derived binlog over
    sf0.001 documents into the final lake state (content_sha256 per row)."""
    from ray_cdc_lake.pipeline import cdc_final_state

    return cdc_final_state("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return _q.registry()[0]


def oracle_sql() -> dict[str, str]:
    return _q.registry()[1]
