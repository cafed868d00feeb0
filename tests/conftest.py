"""Shared fixtures: one SparkSession per test run + the oracle differential
harness that mimics the driver's check (row count + schema + order-insensitive
value comparison against DuckDB)."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from airflow_cms_inpatient_etl_spark.session import get_spark
from airflow_cms_inpatient_etl_spark.sources.registry import TESTDATA_TABLES

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="engine-tests")
    yield s


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'")
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize dtypes, sort rows — order-insensitive
    exact comparison (floats compared bit-for-bit after normalization)."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("object").where(s.notna(), None)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
    sort_cols = list(df.columns)
    df = df.sort_values(by=sort_cols, kind="mergesort", na_position="last").reset_index(drop=True)
    return df


def _dtype_family(s: pd.Series) -> str:
    """Driver-equivalence dtype class.  Round-1 driver evidence: integer WIDTH
    (int32 vs int64) and datetime UNIT (ns vs us) differences hash equal, but
    cross-family differences (int64 vs float64 — e.g. DuckDB HUGEINT sums
    surfacing as float64) hash UNEQUAL.  So families are strict, widths not."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "object"


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    )
    for c in sorted(spark_pdf.columns):
        fa, fb = _dtype_family(spark_pdf[c]), _dtype_family(oracle_pdf[c])
        assert fa == fb, (
            f"{name}: dtype family mismatch on {c!r}: spark {spark_pdf[c].dtype} ({fa}) "
            f"vs oracle {oracle_pdf[c].dtype} ({fb}) — the driver hashes these differently; "
            f"CAST the oracle (or the Spark side) so families agree"
        )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(oracle_pdf)}"
    )
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            ok = np.allclose(av.fillna(math.nan), bv.fillna(math.nan), rtol=0, atol=0, equal_nan=True)
            if not ok:
                diff = (av - bv).abs()
                raise AssertionError(
                    f"{name}: float column {c!r} differs; max abs diff "
                    f"{diff.max()} at row {diff.idxmax()}: {av[diff.idxmax()]} vs {bv[diff.idxmax()]}"
                )
        else:
            same = av.where(av.notna(), None).tolist() == bv.where(bv.notna(), None).tolist()
            if not same:
                mism = [
                    (i, x, y)
                    for i, (x, y) in enumerate(zip(av.tolist(), bv.tolist()))
                    if (x != y and not (pd.isna(x) and pd.isna(y)))
                ][:5]
                raise AssertionError(f"{name}: column {c!r} differs, first mismatches: {mism}")


def run_differential(spark, ddb, name: str, fn, oracle: str, sf_dir: str = SF_ORACLE) -> None:
    spark_pdf = fn(spark, sf_dir).toPandas()
    oracle_pdf = ddb.execute(oracle).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)
