"""Source readers (SURVEY.md §2.1 S1 analog).

``ray.data.read_parquet`` already does listing, column pruning, sharding
and retries (the distributed rebirth of
``DownloadMultipleS3FilesByPrefix.kt:45-259``). One sandbox-specific wrinkle
is handled here: the driver's test tables are SINGLE-row-group parquet
files, which Ray cannot split below one block — so a read→map pipeline
would run its map stage on ONE task no matter how many CPUs exist. At
real scale the input is thousands of files/row-groups and the splitting
branch never triggers (``input_files()`` >= parallelism → no-op).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:
    import ray.data


def target_parallelism(factor: int = 2) -> int:
    import ray

    return factor * int(ray.cluster_resources().get("CPU", 8))


def actor_pool_size(max_actors: int = 8) -> int:
    """Actor-pool ``concurrency`` sized to leave CPUs for the rest of the
    pipeline: half the cluster CPUs, at least 1, at most ``max_actors``
    (a pool equal to num_cpus starves every other stage — observed as a
    hang at num_cpus=4)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(1, min(max_actors, cpus // 2))


_BCAST_CACHE: dict[str, object] = {}  # insertion-ordered (py3.7+): FIFO evict
_BCAST_CACHE_MAX = 8


def get_broadcast(ref):
    """Worker-local cache around ``ray.get`` for ``ray.put`` broadcast
    objects: the object is shipped to a node's plasma store once and
    deserialized once per WORKER PROCESS, not per task/batch — the
    broadcast-small-side pattern without paying actor-pool startup.
    Bounded (FIFO, 8 entries) so long-lived workers running many queries
    don't pin every broadcast value forever."""
    key = ref.hex() if hasattr(ref, "hex") else str(ref)
    v = _BCAST_CACHE.get(key)
    if v is None:
        import ray

        v = ray.get(ref)
        while len(_BCAST_CACHE) >= _BCAST_CACHE_MAX:
            _BCAST_CACHE.pop(next(iter(_BCAST_CACHE)))
        _BCAST_CACHE[key] = v
    return v


def read_table(
    sf_dir: str,
    name: str,
    columns: list[str] | None = None,
    parallelism: int = -1,
) -> "ray.data.Dataset":
    """Read ``<sf_dir>/<name>.parquet`` with column pruning; ensure enough
    blocks that downstream map stages can use the whole cluster."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)
    if parallelism <= 0:
        parallelism = target_parallelism()
    try:
        n_files = len(ds.input_files())
    except Exception:
        n_files = 1
    if n_files < parallelism:
        ds = ds.repartition(parallelism)
    return ds
