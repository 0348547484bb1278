"""Local mirror of the driver's correctness gate: run each queries() pipeline
and its oracle_sql() in DuckDB over the same sf dir, compare row count, schema
and order-insensitive values. Usage:

    env PYTHONPATH=/root/repo python scripts/check_correctness.py [qname ...]
    SF_DIR=/root/testdata/sf0.01 ... (default)
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    wanted = sys.argv[1:] or list(qs)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name in wanted:
        t0 = time.time()
        try:
            mine = normalize(to_pandas(qs[name](sf_dir)))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: pipeline raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(mine)} rows, {dt:.1f}s)")
            continue
        try:
            ref = normalize(con.sql(oracles[name]).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle SQL raised {e}")
            failures += 1
            continue
        ok_rows = len(mine) == len(ref)
        ok_cols = list(mine.columns) == list(ref.columns)
        ok_vals = False
        msg = f"row-count mismatch {len(mine)} vs {len(ref)}" if not ok_rows else ""
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(mine, ref, check_dtype=False,
                                              check_exact=False, rtol=1e-6)
                ok_vals = True
            except AssertionError as e:
                msg = str(e).splitlines()[0]
        if ok_rows and ok_cols and ok_vals:
            print(f"PASS  {name} ({len(mine)} rows, {dt:.1f}s)")
        else:
            failures += 1
            print(f"FAIL  {name}: rows {len(mine)}vs{len(ref)} cols ok={ok_cols} "
                  f"vals ok={ok_vals}")
            if not ok_cols:
                print(f"      mine={list(mine.columns)} ref={list(ref.columns)}")
            elif not ok_vals:
                print(f"      {msg}")
                merged = mine.compare(ref) if ok_rows else None
                if merged is not None and len(merged):
                    print(merged.head(5))
    print(f"\n{len(wanted) - failures}/{len(wanted)} ok")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
