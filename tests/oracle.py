"""Local replica of the driver's DuckDB-oracle comparison: run the
Spark query and the oracle SQL on the same parquet tables, canonicalize
(sorted columns, sorted rows, rounded floats), and compare."""

from __future__ import annotations

import math
import os

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_value(v, ndigits: int = 4):
    if v is None:
        return None
    # numpy scalars → Python scalars so the float/int tags below apply
    if type(v).__module__ == "numpy" and hasattr(v, "item"):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # tag the type: the driver hashes pandas-rendered values where
        # int64 1 != float64 1.0 (the round-1 a3/a13/w4 failure mode);
        # Python's 1.0 == 1 would otherwise mask exactly that mismatch
        return ("f", round(v, ndigits))
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_canon_value(x, ndigits) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def canonicalize(rows: list[dict], ndigits: int = 4) -> list[tuple]:
    if not rows:
        return []
    cols = sorted(rows[0].keys())
    out = [tuple(_canon_value(r[c], ndigits) for c in cols) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def compare(spark_df, con, sql: str, ndigits: int = 4) -> tuple[bool, str]:
    spark_rows = [r.asDict(recursive=True) for r in spark_df.collect()]
    oracle_df = con.execute(sql).fetchdf()
    oracle_rows = oracle_df.to_dict(orient="records")

    if spark_rows and oracle_rows:
        s_cols = sorted(spark_rows[0].keys())
        o_cols = sorted(oracle_rows[0].keys())
        if s_cols != o_cols:
            return False, f"column mismatch: spark={s_cols} oracle={o_cols}"
    if len(spark_rows) != len(oracle_rows):
        return False, f"row count: spark={len(spark_rows)} oracle={len(oracle_rows)}"

    s_canon = canonicalize(spark_rows, ndigits)
    o_canon = canonicalize(oracle_rows, ndigits)
    if s_canon != o_canon:
        diffs = [
            f"  spark={s} oracle={o}"
            for s, o in zip(s_canon, o_canon)
            if s != o
        ][:5]
        return False, "value mismatch:\n" + "\n".join(diffs)
    return True, "ok"
