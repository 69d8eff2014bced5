"""Local replica of the driver's query-vs-DuckDB-oracle comparison."""

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    if not isinstance(df, pd.DataFrame):
        df = df.to_pandas()
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_unsigned_integer_dtype(df[c]):
            df[c] = df[c].astype("float64").round(0)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(ray_df, oracle_df) -> tuple[bool, str]:
    a, b = normalize(ray_df), normalize(oracle_df)
    if list(a.columns) != list(b.columns):
        return False, f"schema mismatch: {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return False, f"row count mismatch: {len(a)} vs {len(b)}"
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                      check_exact=False, rtol=1e-6, atol=1e-6)
    except AssertionError as exc:
        return False, str(exc)[:500]
    return True, "ok"
