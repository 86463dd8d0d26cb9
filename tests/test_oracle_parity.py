"""Mirror of the driver's correctness gate: every ``queries()`` entry with an
``oracle_sql()`` twin must match DuckDB on the same parquet tables —
row count, column names, and values (order-insensitive, float-exact).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from inf_553_datamining_mapreduce_spark.schemas import TESTDATA_TABLES


def _duckdb_result(sql: str, sf_dir: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    spark_df = QUERIES[name](spark, sf_dir).toPandas()
    oracle_df = _duckdb_result(ORACLES[name], sf_dir)

    assert sorted(spark_df.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch {sorted(spark_df.columns)} vs {sorted(oracle_df.columns)}"
    )
    assert len(spark_df) == len(oracle_df), (
        f"{name}: row count {len(spark_df)} vs {len(oracle_df)}"
    )

    # The driver's value hash is dtype-sensitive: DuckDB HUGEINT arrives as
    # float64 and hashes differently from Spark's int64 even when every value
    # matches (round-1 failure mode). Catch int-vs-float skew here.
    for col in spark_df.columns:
        sk, ok = spark_df[col].dtype.kind, oracle_df[col].dtype.kind
        if {sk, ok} <= {"i", "u", "f"} and (sk == "f") != (ok == "f"):
            raise AssertionError(
                f"{name}.{col}: dtype kind mismatch {spark_df[col].dtype} vs "
                f"{oracle_df[col].dtype} — driver hash would fail; add a cast "
                "to the oracle SQL or the Spark query"
            )

    s = _canonical(spark_df)
    o = _canonical(oracle_df)
    for col in s.columns:
        sv, ov = s[col].to_numpy(), o[col].to_numpy()
        if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(ov.dtype, np.floating):
            sv = sv.astype(np.float64)
            ov = ov.astype(np.float64)
            if not np.array_equal(sv, ov):
                diff = np.abs(sv - ov)
                bad = int(np.sum(diff > 0))
                raise AssertionError(
                    f"{name}.{col}: {bad} float cells differ, max abs diff {diff.max()}"
                )
        else:
            mism = sv != ov
            assert not mism.any(), (
                f"{name}.{col}: {int(mism.sum())} cells differ, e.g. "
                f"{sv[mism][:3]} vs {ov[mism][:3]}"
            )


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_query_without_oracle_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert len(df.schema.fields) > 0
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and len(df.schema.fields) > 0
