"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, compares row count, column names, and
order-insensitive values (sorted by all columns, compared cell-wise
with exact match for non-floats and tiny-epsilon for floats — stricter
than a value-hash, so passing here implies passing the driver hash
unless the driver hashes raw float bits, which our rounding discipline
also covers).

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from training_datawarehouse_spark.session import get_spark  # noqa: E402
from training_datawarehouse_spark.sources.tables import TABLE_NAMES  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(rows: list[tuple]) -> list[tuple]:
    def cell(v):
        if isinstance(v, float):
            return round(v, 9)
        return v

    return sorted(
        [tuple(cell(v) for v in r) for r in rows],
        key=lambda r: tuple((x is None, str(x)) for x in r),
    )


def compare(name: str, spark_rows, spark_cols, duck_rows, duck_cols) -> list[str]:
    problems = []
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count {len(spark_rows)} != {len(duck_rows)}")
    if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in duck_cols):
        problems.append(f"columns {sorted(spark_cols)} != {sorted(duck_cols)}")
    if problems:
        return problems
    # align column order by name
    duck_idx = [duck_cols.index(c) for c in spark_cols]
    duck_rows = [tuple(r[i] for i in duck_idx) for r in duck_rows]
    a, b = normalize(spark_rows), normalize(duck_rows)
    n_bad = 0
    for ra, rb in zip(a, b):
        for va, vb in zip(ra, rb):
            same = (
                (va is None and vb is None)
                or (isinstance(va, float) and isinstance(vb, float)
                    and (va == vb or math.isclose(va, vb, rel_tol=1e-9, abs_tol=1e-9)))
                or str(va) == str(vb)
            )
            if not same:
                n_bad += 1
                if n_bad <= 3:
                    problems.append(f"value mismatch: spark={ra!r} duck={rb!r}")
                break
    if n_bad > 3:
        problems.append(f"... {n_bad} mismatched rows total")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("verify-local")
    con = duck_connection(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    failed = []
    for name, builder in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = builder(spark, sf_dir)
            spark_rows = [tuple(r) for r in sdf.collect()]
            spark_cols = sdf.columns
        except Exception:
            print(f"FAIL {name}: spark error\n{traceback.format_exc()}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(spark_rows)} rows, {time.time()-t0:.1f}s)")
            if len(spark_rows) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception:
            print(f"FAIL {name}: duckdb error\n{traceback.format_exc()}")
            failed.append(name)
            continue
        problems = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"ok   {name}: {len(spark_rows)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(qs) - len(failed)}/{len(qs)} green")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
