"""Simulate the graft driver: ray.init BEFORE import, entry() smoke,
queries() vs oracle_sql() at sf0.01 via DuckDB, like CORRECTNESS_r{N}.json."""

import sys
import time

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

sys.path.insert(0, "/root/repo")
import __ray_entry__ as e

import duckdb
import pandas as pd

import os

# default = the real driver's sf0.01; override for deeper one-off soaks
# (e.g. GRAFT_SIM_SF=/root/testdata/sf0.1). SIM_SLICE="k/n" runs the
# k-th of n alphabetical query chunks so a big-sf soak fits timeouts.
SF = os.environ.get("GRAFT_SIM_SF", "/root/testdata/sf0.01")
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")


def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype("string")
    return df.sort_values(by=list(df.columns), ignore_index=True, na_position="last")


t0 = time.time()
res = e.entry()
df = res.to_pandas() if hasattr(res, "to_pandas") else res
print(f"entry(): {len(df)} rows, cols={list(df.columns)} in {time.time()-t0:.1f}s")
assert len(df) > 0

Q = e.queries()
S = e.oracle_sql()
items = sorted(Q.items())
slc = os.environ.get("SIM_SLICE")
if slc:
    try:
        k, n = (int(x) for x in slc.split("/"))
    except ValueError:
        sys.exit(f"SIM_SLICE must be 'k/n' (got {slc!r})")
    if not (1 <= k <= n):
        sys.exit(f"SIM_SLICE k out of range: {slc!r} (need 1 <= k <= n)")
    items = items[(k - 1) * len(Q) // n : k * len(Q) // n]
    if not items:
        sys.exit(f"SIM_SLICE {slc!r} selected zero queries — refusing a vacuous pass")
print(f"{len(Q)} queries ({len(items)} in this slice), {len(S)} with oracle")
fails = []
for name, fn in items:
    t0 = time.time()
    try:
        got = fn(SF)
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
        if name in S:
            want = con.sql(S[name]).df()
            g, w = canon(got), canon(want)
            if len(g) == 0 and len(w) == 0:
                # both sides agree on ZERO rows. An all-empty Ray result
                # can lose its schema at to_pandas (union of 0-row
                # datasets) — only then is the column check waived;
                # when the Ray frame DOES carry columns they must match
                ok = len(g.columns) == 0 or list(g.columns) == list(w.columns)
            else:
                ok = (
                    list(g.columns) == list(w.columns)
                    and len(g) == len(w)
                    and g.fillna("<N>").equals(w.fillna("<N>"))
                )
            status = "MATCH" if ok else "MISMATCH"
            if not ok:
                fails.append(name)
        else:
            status = f"rows-only ({len(got)})"
        print(f"  {name}: {status} [{len(got)} rows, {time.time()-t0:.1f}s]")
    except Exception as ex:
        fails.append(name)
        print(f"  {name}: ERROR {type(ex).__name__}: {ex}")

print("FAILS:", fails if fails else "none")
ray.shutdown()
sys.exit(1 if fails else 0)
