"""Driver-replica correctness sweep: run EVERY registered query on Spark
and (when present) its DuckDB oracle at sf0.01, canonicalize the way the
driver does (sort columns by name, sort rows, stringify), and report
match status per query. Also flags harness-hostile output shapes
(array/map columns that break pandas sorting).

Usage: python tools/check_all.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from training_datawarehouse_spark.canon import (
    canon, duck_describe, dtype_drift, values_repr,
)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession
    from training_datawarehouse_spark.plans import QUERIES
    from training_datawarehouse_spark.session import tune_for_queries

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "24g")
        .appName("check_all")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    tune_for_queries(spark)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    results: dict[str, dict] = {}
    n_bad = 0
    for name, q in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        row: dict = {}
        try:
            built = q.builder(spark, sf_dir)
            spark_fields = [(f.name, f.dataType.simpleString())
                            for f in built.schema.fields]
            sdf = built.toPandas()
            s = canon(sdf)
            row["spark_rows"] = len(s)
        except Exception as e:  # noqa: BLE001
            row["err"] = f"spark: {type(e).__name__}: {e}"
            results[name] = row
            n_bad += 1
            print(f"FAIL {name}: {row['err'][:200]}")
            continue
        if q.oracle is None:
            # rows-only: still verify the canonicalizer survives the shape
            try:
                values_repr(s)
                row["status"] = "rows-only-ok"
            except Exception as e:  # noqa: BLE001
                row["status"] = f"rows-only-canon-crash: {e}"
                n_bad += 1
        else:
            try:
                odf = con.execute(q.oracle).df()
                o = canon(odf)
            except Exception as e:  # noqa: BLE001
                row["err"] = f"oracle: {type(e).__name__}: {e}"
                results[name] = row
                n_bad += 1
                print(f"FAIL {name}: {row['err'][:200]}")
                continue
            try:
                drift = dtype_drift(
                    spark_fields, duck_describe(con, q.oracle))
            except Exception as e:  # noqa: BLE001 — DESCRIBE binder
                drift = [f"describe-failed: {type(e).__name__}: {e}"]
            if drift:
                row["dtype_drift"] = drift
                n_bad += 1
                print(f"DTYPE-DRIFT {name}: " + "; ".join(drift))
            row["oracle_rows"] = len(o)
            row["rows_match"] = len(s) == len(o)
            row["schema_match"] = list(s.columns) == list(o.columns)
            row["hash_match"] = (
                row["rows_match"]
                and row["schema_match"]
                and values_repr(s) == values_repr(o)
            )
            if not row["hash_match"]:
                n_bad += 1
                print(f"MISMATCH {name}: rows={row['rows_match']} "
                      f"schema={row['schema_match']} "
                      f"(spark {len(s)} vs oracle {len(o)} rows)")
                if row["rows_match"] and row["schema_match"]:
                    sv, ov = values_repr(s), values_repr(o)
                    for i, (a, b) in enumerate(zip(sv, ov)):
                        if a != b:
                            print(f"  first diff row {i}:\n   spark  {a}\n   oracle {b}")
                            break
        row["sec"] = round(time.time() - t0, 2)
        results[name] = row
        tag = ("ok" if (row.get("hash_match") or row.get("status") == "rows-only-ok")
               and not row.get("dtype_drift") else "??")
        print(f"{tag:2s} {name}: {row}")

    print(f"\n{len(results)} queries, {n_bad} problems")
    with open("/tmp/check_all.json", "w") as f:
        json.dump(results, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
