"""Local replica of the driver's correctness gate: run every queries()
entry at a given sf_dir, run its oracle_sql() through DuckDB with the
tables registered as views, and compare row count + sorted-column
values. Usage: python tools/verify_oracle.py [sf_dir] [query ...]"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as mod

    qs, oracles = mod.queries(), mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = canon(to_df(fn(sf_dir)))
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows, cols={list(got.columns)}")
            continue
        try:
            exp = canon(con.execute(oracles[name]).df())
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: oracle raised {type(e).__name__}: {e}")
            failures += 1
            continue
        ok_rows = len(got) == len(exp)
        ok_cols = list(got.columns) == list(exp.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
                ok_vals = True
            except AssertionError as e:
                msg = str(e).splitlines()[0]
        if ok_rows and ok_cols and ok_vals:
            print(f"[OK]   {name}: {len(got)} rows")
        else:
            failures += 1
            print(f"[FAIL] {name}: rows {len(got)}/{len(exp)} cols_ok={ok_cols} ray={list(got.columns)} sql={list(exp.columns)}")
            if ok_rows and ok_cols:
                print("       first diff:", msg)
                merged = got.compare(exp) if got.shape == exp.shape else None
                if merged is not None and len(merged):
                    print(merged.head(5))
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
