"""Debug helper: run a registered query on Spark and its DuckDB oracle
side-by-side at a given sf dir and print both canonical frames.

Usage: python tools/diff_oracle.py <query_name> [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    df = df[cols]
    df = df.sort_values(by=cols).reset_index(drop=True)
    return df


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession
    from training_datawarehouse_spark.plans import QUERIES

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("diff")
        .getOrCreate()
    )
    q = QUERIES[name]
    sdf = q.builder(spark, sf_dir).toPandas()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    odf = con.execute(q.oracle).df()

    s, o = canon(sdf), canon(odf)
    print("spark dtypes:\n", s.dtypes)
    print("oracle dtypes:\n", o.dtypes)
    pd.set_option("display.width", 200)
    pd.set_option("display.max_rows", 100)
    print("=== spark ===")
    print(s.head(50))
    print("=== oracle ===")
    print(o.head(50))
    if s.shape == o.shape:
        sv = s.astype(str)
        ov = o.astype(str)
        neq = (sv != ov).any(axis=1)
        print(f"mismatching rows (str-compare): {int(neq.sum())}")
        if neq.any():
            print("--- spark side ---")
            print(s[neq].head(20))
            print("--- oracle side ---")
            print(o[neq].head(20))
    spark.stop()


if __name__ == "__main__":
    main()
