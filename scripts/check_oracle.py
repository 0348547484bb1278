"""Side-by-side Ray-vs-DuckDB oracle check (mirrors the driver's compare):
``python scripts/check_oracle.py [sf_dir] q1 q2 ...`` (no args = all oracled
queries). Sorts columns by name, rows by all columns, compares row count,
schema, and a value hash."""

import hashlib
import os
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def vhash(df: pd.DataFrame) -> str:
    parts = []
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            s = s.round(6)
        parts.append(s.astype(str).str.cat(sep="|"))
    return hashlib.sha256("||".join(parts).encode()).hexdigest()[:16]


def main():
    args = sys.argv[1:]
    sf = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = [a for a in args if not os.path.isdir(a)]

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 log_to_driver=False)
    import __ray_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    if not names:
        names = [n for n in qs if n in oracles]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    fails = 0
    for n in names:
        if n not in oracles:
            r = qs[n](sf)
            if hasattr(r, "to_pandas"):
                r = r.to_pandas()
            print(f"{n}: rows-only, {len(r)} rows")
            continue
        r = qs[n](sf)
        if hasattr(r, "to_pandas"):
            r = r.to_pandas()
        elif not isinstance(r, pd.DataFrame):
            r = r.to_pandas() if hasattr(r, "to_pandas") else pd.DataFrame(r)
        o = con.execute(oracles[n]).df()
        r, o = norm(pd.DataFrame(r)), norm(o)
        ok_rows = len(r) == len(o)
        ok_schema = list(r.columns) == list(o.columns)
        ok_hash = ok_rows and ok_schema and vhash(r) == vhash(o)
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            fails += 1
        print(f"{n}: {status} rows={len(r)}/{len(o)} schema={ok_schema} hash={ok_hash}")
        if status == "FAIL" and len(r) and len(o):
            print("  ray:", r.head(3).to_dict("records"))
            print("  ora:", o.head(3).to_dict("records"))
    ray.shutdown()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
