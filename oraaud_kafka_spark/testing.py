"""Spark-vs-DuckDB parity harness mirroring the driver's correctness gate
(row-count + column set + order-insensitive value comparison)."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

from .tables import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb_connect(sf_dir)
    try:
        return con.execute(sql).df()
    finally:
        con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple, np.ndarray)) else v,
                na_action="ignore",
            )
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def _cell_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_cell_equal(x, y) for x, y in zip(a, b))
    return a == b


def _dtype_class(dtype) -> str:
    """Collapse a pandas dtype to the class the driver's value hash is
    sensitive to: the hash stringifies cells, so int64 26 vs float64 26.0
    mismatch while int32 vs int64 don't."""
    kind = getattr(dtype, "kind", "O")
    return {"i": "int", "u": "int", "f": "float", "b": "bool", "M": "datetime"}.get(
        kind, "object"
    )


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    scols, ocols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if scols != ocols:
        return [f"column mismatch: spark={scols} oracle={ocols}"]
    for c in scols:
        sc, oc = _dtype_class(spark_pdf[c].dtype), _dtype_class(oracle_pdf[c].dtype)
        if sc != oc:
            problems.append(f"dtype class mismatch col {c}: spark={sc} oracle={oc}")
    if problems:
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
        return problems
    s = _normalize(spark_pdf)
    o = _normalize(oracle_pdf)
    n_bad = 0
    for i in range(len(s)):
        for c in s.columns:
            a, b = s[c].iloc[i], o[c].iloc[i]
            if not _cell_equal(a, b):
                n_bad += 1
                if n_bad <= 5:
                    problems.append(f"row {i} col {c}: spark={a!r} oracle={b!r}")
    if n_bad > 5:
        problems.append(f"... {n_bad} mismatched cells total")
    return problems
