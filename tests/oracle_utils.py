"""Local replica of the driver's oracle comparison: run the Spark query
and the DuckDB SQL on the same parquet tables, compare row count +
column names + order-insensitive values."""

from __future__ import annotations

import math

import duckdb

from location_summary_etl_spark.sources.registry import TABLES, table_path


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{table_path(sf_dir, name)}'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # absorb -0.0 and representation noise below hash granularity
        return f"{v:.9g}"
    return str(v)


def _keyset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm(r[i]) for i in order) for r in rows)


def compare(spark_df, con, sql: str) -> None:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    assert sorted(s_cols) == sorted(d_cols), (
        f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sk, dk = _keyset(s_cols, s_rows), _keyset(d_cols, d_rows)
    mism = [(a, b) for a, b in zip(sk, dk) if a != b]
    assert not mism, f"value mismatch ({len(mism)} rows), first: {mism[0]}"
