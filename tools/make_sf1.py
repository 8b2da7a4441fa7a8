"""Synthesize an sf1 dataset (10x sf0.1) deterministically, for the
one-off scaling-drift bench (BASELINE.md "sf1" section).

No external data and no RNG: sf1 is K=10 key-shifted copies of the
driver-generated sf0.1 tables.  Every copy shifts its join keys by a
copy-sized constant so join cardinalities, group sizes and value
distributions are preserved EXACTLY (10 disjoint replicas of the same
star schema); dimension leaves (region, nation) and low-cardinality
attributes stay shared.  Event ids/users shift per copy; timestamps are
kept, so time windows densify 10x (same window count, 10x rows per
window) — the interesting regime for the window/groupby queries.

Usage: python tools/make_sf1.py [out_dir]   (default /tmp/sf1)
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
K = 10

# per-copy shift constants, comfortably above each key's sf0.1 range.
# doc_id must stay <= 6 digits: build_jhove_xml's uri facet is
# docs/xx/doc_\d{6}.txt (lpad never truncates), so a 7+-digit id would
# make the xsd/xml-validate queries disagree with their modulo-only SQL
# oracles. 100k per copy -> max 904,999; the in-query planted-dup ids
# (+1M/+2M) stay disjoint from every shifted table id.
SHIFTS = {
    "doc_id": 100_000,
    "vec_id": 10_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "l_orderkey": 10_000_000,
    "o_orderkey": 10_000_000,
    "o_custkey": 1_000_000,
    "c_custkey": 1_000_000,
    "l_partkey": 1_000_000,
    "p_partkey": 1_000_000,
    "l_suppkey": 1_000_000,
    "s_suppkey": 1_000_000,
}

COPIED = [
    "documents",
    "embeddings",
    "events",
    "lineitem",
    "orders",
    "customer",
    "part",
    "supplier",
]
SHARED = ["nation", "region"]


def shifted(t: pa.Table, k: int) -> pa.Table:
    for name, step in SHIFTS.items():
        if name in t.column_names:
            i = t.schema.get_field_index(name)
            col = t[name]
            t = t.set_column(
                i, name, pc.add(col, pa.scalar(k * step, type=col.type))
            )
    return t


def main(out_dir: str = "/tmp/sf1") -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name in SHARED:
        pq.write_table(
            pq.read_table(f"{SRC}/{name}.parquet"),
            f"{out_dir}/{name}.parquet",
        )
    for name in COPIED:
        base = pq.read_table(f"{SRC}/{name}.parquet")
        parts = [shifted(base, k) for k in range(K)]
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{out_dir}/{name}.parquet", compression="zstd")
        print(f"{name}: {base.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1")
