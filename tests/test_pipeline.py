"""End-to-end diary pipeline test (E1→E4) with the property-based
lattice invariants from SURVEY §5.4."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from training_datawarehouse_spark.pipeline import (
    CELL_KEYS,
    run_e1_ingest,
    run_e2_tsb,
    run_e3_strain,
    run_e4_rollup,
)


@pytest.fixture(scope="module")
def facts(spark, diary_path):
    df = run_e1_ingest(spark, diary_path)
    df = run_e2_tsb(df)
    df = run_e3_strain(df)
    df.cache()
    yield df
    df.unpersist()


def test_every_cell_has_every_date(facts):
    span = facts.agg(F.min("date"), F.max("date")).collect()[0]
    n_days = (span[1] - span[0]).days + 1
    per_cell = facts.groupBy(*CELL_KEYS).agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("date").alias("nd")
    ).collect()
    assert all(r["n"] == n_days and r["nd"] == n_days for r in per_cell)


def test_tsb_identity(facts):
    bad = facts.filter(
        F.abs(F.col("tsb") - (F.col("ctl") - F.col("atl"))) > 1e-9
    ).count()
    assert bad == 0


def test_booleans_are_01(facts):
    for c in ("is_race", "brick", "watts_estimated"):
        vals = {r[0] for r in facts.select(c).distinct().collect()}
        assert vals <= {0, 1}


def test_all_cell_sum_invariant(facts):
    """All/All/All SUM(km) == Σ over activity-partition cells (the
    activity dimension has no Not-Set exclusion)."""
    total = facts.filter(
        (F.col("activity") == "All") & (F.col("activity_type") == "All")
        & (F.col("equipment") == "All")
    ).agg(F.sum("km")).collect()[0][0]
    parts = facts.filter(
        (F.col("activity") != "All") & (F.col("activity_type") == "All")
        & (F.col("equipment") == "All")
    ).agg(F.sum("km")).collect()[0][0]
    assert parts == pytest.approx(total, rel=1e-9)


def test_ctl_positive_where_load_exists(facts):
    row = facts.filter(
        (F.col("activity") == "All") & (F.col("activity_type") == "All")
        & (F.col("equipment") == "All")
    ).orderBy(F.col("date").desc()).first()
    assert row["ctl"] > 0


def test_interpolated_physiology_attached(facts):
    # kg interpolated onto every cell-date within the weights span
    some = facts.filter((F.col("kg") > 0)).count()
    assert some > 0
    # lbs = bround(kg·2.20462, 1) wherever kg present
    bad = facts.filter(
        (F.col("kg") > 0)
        & (F.abs(F.col("lbs") - F.bround(F.col("kg") * 2.20462, 1)) > 1e-9)
    ).count()
    assert bad == 0


def test_weekly_rollup_shapes(spark, facts):
    weekly = run_e4_rollup(facts, "year_week")
    cols = set(weekly.columns)
    # Mean columns present, no-AggMethod columns dropped (§2.3.6)
    assert "rpe" in cols and "km" in cols and "date" in cols
    assert "type" not in cols and "sleep_quality" not in cols
    # calculated columns roll up with plain AVG (reference agg-list
    # generator includes the calculated map; only type/sleep_quality/
    # physiology are dropped)
    for c in ("ctl", "atl", "tsb", "monotony", "strain"):
        assert c in cols, c
    assert "kg" not in cols and "resting_hr" not in cols
    # one row per (cell, week)
    dup = weekly.groupBy(*CELL_KEYS, "year_week").count().filter("count > 1").count()
    assert dup == 0


def test_weekly_rollup_calculated_and_sleep_semantics(spark, facts):
    """ctl rolls up as the plain AVG of the daily ctl values; sleep_hours
    rolls up as the SUM (the reference's day_map tags sleep as Sum)."""
    cell = (
        (F.col("activity") == "All") & (F.col("activity_type") == "All")
        & (F.col("equipment") == "All")
    )
    weekly = run_e4_rollup(facts, "year_week")
    some_week = weekly.filter(cell).orderBy("year_week").first()["year_week"]
    daily = facts.filter(cell & (F.col("year_week") == some_week))
    got = weekly.filter(cell & (F.col("year_week") == some_week)).first()
    exp = daily.agg(
        F.avg("ctl").alias("ctl"), F.sum("sleep_hours").alias("sleep_hours")
    ).first()
    assert got["ctl"] == pytest.approx(exp["ctl"], rel=1e-9)
    assert got["sleep_hours"] == pytest.approx(exp["sleep_hours"], rel=1e-9)


def test_monthly_rollup_sum_matches_daily(spark, facts):
    monthly = run_e4_rollup(facts, "year_month")
    m = monthly.filter(
        (F.col("activity") == "All") & (F.col("activity_type") == "All")
        & (F.col("equipment") == "All")
    ).agg(F.sum("km")).collect()[0][0]
    d = facts.filter(
        (F.col("activity") == "All") & (F.col("activity_type") == "All")
        & (F.col("equipment") == "All")
    ).agg(F.sum("km")).collect()[0][0]
    assert m == pytest.approx(d, rel=1e-9)


def test_warehouse_write_prune_and_idempotent_append(spark, facts, tmp_path):
    from training_datawarehouse_spark.pipeline import append_days, write_warehouse

    wh = str(tmp_path / "warehouse")
    write_warehouse(facts, wh)
    back = spark.read.parquet(wh)
    assert back.count() == facts.count()

    # cell-key filter must become a partition filter, not a data filter:
    # only that cell's files are scanned
    one = back.filter(
        (F.col("activity") == "Run") & (F.col("activity_type") == "Road")
        & (F.col("equipment") == "ShoesA")
    )
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "activity" in plan.split("PartitionFilters")[1][:200]

    # re-appending the same facts is a no-op (first-writer-wins on
    # (date, cell)); appending genuinely new dates lands exactly once
    n0 = back.count()
    after_dup = append_days(spark, wh, facts)
    assert after_dup.count() == n0
    shifted = facts.withColumn("date", F.date_add("date", 10000))
    after_new = append_days(spark, wh, shifted)
    assert after_new.count() == 2 * n0


def test_delete_rows_rewrites_only_affected_partitions(spark, facts, tmp_path):
    import glob
    import os

    from training_datawarehouse_spark.pipeline import delete_rows, write_warehouse

    wh = str(tmp_path / "wh_del")
    write_warehouse(facts, wh)
    n0 = spark.read.parquet(wh).count()

    # snapshot file mtimes per partition directory
    def mtimes():
        return {
            p: os.path.getmtime(p)
            for p in glob.glob(f"{wh}/activity=*/activity_type=*/equipment=*/*.parquet")
        }

    before = mtimes()
    target_cell = (F.col("activity") == "Run") & (F.col("activity_type") == "Road")
    victim_dates = (
        spark.read.parquet(wh).filter(target_cell).select("date").limit(5).collect()
    )
    dates = [r["date"] for r in victim_dates]
    pred = target_cell & F.col("date").isin(dates)
    n_match = spark.read.parquet(wh).filter(pred).count()
    assert n_match > 0

    after_df = delete_rows(spark, wh, pred)
    assert after_df.count() == n0 - n_match
    assert after_df.filter(pred).count() == 0

    after = mtimes()
    untouched = [p for p in before if "activity=Run/activity_type=Road" not in p]
    changed = [p for p in untouched if p not in after or after[p] != before[p]]
    assert changed == []  # only Run/Road partitions rewritten


def test_delete_rows_removes_fully_emptied_partitions(spark, facts, tmp_path):
    """Deleting EVERY row of a cell must remove the partition directory —
    dynamic partition overwrite alone would silently leave the old files
    (no survivor rows → no output partition → no rewrite)."""
    import glob

    from training_datawarehouse_spark.pipeline import delete_rows, write_warehouse

    wh = str(tmp_path / "wh_del_all")
    write_warehouse(facts, wh)
    n0 = spark.read.parquet(wh).count()

    target_cell = (F.col("activity") == "Run") & (F.col("activity_type") == "Road")
    n_match = spark.read.parquet(wh).filter(target_cell).count()
    assert n_match > 0

    after_df = delete_rows(spark, wh, target_cell)
    assert after_df.count() == n0 - n_match
    assert after_df.filter(target_cell).count() == 0
    # the on-disk partition directories are gone, not just unreferenced
    assert glob.glob(f"{wh}/activity=Run/activity_type=Road/*") == []


def test_delete_rows_handles_escaped_and_default_partitions(spark, tmp_path):
    """Partition values that Hive-escape on disk ('' and null →
    __HIVE_DEFAULT_PARTITION__; ':', '%', '/' → %XX) must still be
    deletable when their cell is fully emptied — path string-building
    misses exactly these directories (round-2 ADVICE)."""
    import glob

    from training_datawarehouse_spark.pipeline import delete_rows, write_warehouse

    rows = []
    for eq in ["", "a:b", "x%y", "Run/Road", "plain"]:
        for d in ["2020-01-01", "2020-01-02"]:
            rows.append(("Run", "Road", eq, d, 1.0))
    df = spark.createDataFrame(
        rows, "activity string, activity_type string, equipment string, date string, tss double"
    ).withColumn("date", F.to_date("date"))
    wh = str(tmp_path / "wh_escaped")
    write_warehouse(df, wh)
    # '' is stored as the default-partition token and reads back as null
    back = spark.read.parquet(wh)
    assert back.count() == 10

    # empty the null ('') cell and every escaped-value cell entirely
    pred = F.col("equipment").isNull() | F.col("equipment").isin(
        "a:b", "x%y", "Run/Road"
    )
    after = delete_rows(spark, wh, pred)
    assert after.count() == 2
    assert [r["equipment"] for r in after.collect()] == ["plain", "plain"]
    # the escaped directories are gone from disk, not just unreferenced
    leaf_dirs = glob.glob(f"{wh}/activity=*/activity_type=*/equipment=*")
    assert len(leaf_dirs) == 1 and leaf_dirs[0].endswith("equipment=plain")


def test_compact_warehouse_single_file_per_partition(spark, facts, tmp_path):
    import glob

    from training_datawarehouse_spark.pipeline import (
        append_days,
        compact_warehouse,
        write_warehouse,
    )

    wh = str(tmp_path / "wh_compact")
    write_warehouse(facts, wh)
    # fragment: append a disjoint copy, creating extra files per dir
    shifted = facts.withColumn("date", F.date_add("date", 20000))
    append_days(spark, wh, shifted)
    n0 = spark.read.parquet(wh).count()

    compact_warehouse(spark, wh, n_tasks=8)
    assert spark.read.parquet(wh).count() == n0
    dirs = glob.glob(f"{wh}/activity=*/activity_type=*/equipment=*")
    for d in dirs:
        files = glob.glob(f"{d}/*.parquet")
        assert len(files) == 1, d


def test_cli_main_end_to_end(diary_path, tmp_path):
    """`python -m training_datawarehouse_spark DIARY OUT` writes the
    partitioned warehouse + rollups (reference parity: one command)."""
    from training_datawarehouse_spark.__main__ import main

    out = str(tmp_path / "wh_cli")
    main([diary_path, out, "--cpus", "4"])
    import glob

    assert glob.glob(f"{out}/facts/activity=*/activity_type=*/equipment=*/*.parquet")
    assert glob.glob(f"{out}/weekly/*.parquet")
    assert glob.glob(f"{out}/monthly/*.parquet")


def test_scd2_merge_two_batches_vs_duckdb(spark):
    """SCD2 emulation (close + version + passthrough) across two update
    batches, differentially checked against a DuckDB reimplementation
    of the same semantics, plus the point-in-time snapshot view."""
    import duckdb

    from training_datawarehouse_spark.operators.scd import (
        scd2_merge, scd2_snapshot_at,
    )

    dim0 = spark.createDataFrame(
        [(1, "Shoes A", "Run", "2020-01-01", None, True),
         (2, "Bike One", "Bike", "2020-01-01", None, True),
         (3, "Old Fins", "Swim", "2019-06-01", "2020-01-01", False),
         (3, "New Fins", "Swim", "2020-01-01", None, True)],
        "eq_id long, name string, sport string, effective_from string, "
        "effective_to string, is_current boolean",
    ).selectExpr(
        "eq_id", "name", "sport",
        "CAST(effective_from AS TIMESTAMP) AS effective_from",
        "CAST(effective_to AS TIMESTAMP) AS effective_to", "is_current",
    )
    b1 = spark.createDataFrame(
        [(1, "Shoes A v2", "Run"),   # changed -> close + version
         (2, "Bike One", "Bike"),    # no-op -> ignored
         (4, "Trainer", "Bike")],    # new key
        "eq_id long, name string, sport string",
    )
    b2 = spark.createDataFrame(
        [(1, "Shoes A v3", "Run"),   # changes again
         (4, "Trainer", "Ride")],    # tracked attr changes
        "eq_id long, name string, sport string",
    )
    t1, t2 = "2021-03-01 00:00:00", "2022-07-15 00:00:00"
    after1 = scd2_merge(dim0, b1, ["eq_id"], ["name", "sport"], t1)
    after2 = scd2_merge(after1, b2, ["eq_id"], ["name", "sport"], t2)
    got = sorted(
        (r["eq_id"], r["name"], r["sport"], str(r["effective_from"]),
         str(r["effective_to"]), r["is_current"])
        for r in after2.collect()
    )

    con = duckdb.connect()
    con.execute("""
        CREATE TABLE dim(eq_id BIGINT, name VARCHAR, sport VARCHAR,
                         effective_from TIMESTAMP, effective_to TIMESTAMP,
                         is_current BOOLEAN);
        INSERT INTO dim VALUES
          (1,'Shoes A','Run','2020-01-01',NULL,true),
          (2,'Bike One','Bike','2020-01-01',NULL,true),
          (3,'Old Fins','Swim','2019-06-01','2020-01-01',false),
          (3,'New Fins','Swim','2020-01-01',NULL,true);
    """)
    for ts, batch in [
        (t1, [(1, "Shoes A v2", "Run"), (2, "Bike One", "Bike"),
              (4, "Trainer", "Bike")]),
        (t2, [(1, "Shoes A v3", "Run"), (4, "Trainer", "Ride")]),
    ]:
        con.execute("CREATE OR REPLACE TABLE upd(eq_id BIGINT, name VARCHAR, sport VARCHAR)")
        con.executemany("INSERT INTO upd VALUES (?,?,?)", batch)
        con.execute(f"""
            CREATE OR REPLACE TABLE dim AS
            SELECT * FROM dim WHERE NOT is_current
            UNION ALL
            SELECT d.eq_id, d.name, d.sport, d.effective_from,
                   CASE WHEN u.eq_id IS NOT NULL AND
                        (d.name IS DISTINCT FROM u.name OR d.sport IS DISTINCT FROM u.sport)
                        THEN TIMESTAMP '{ts}' ELSE d.effective_to END,
                   NOT (u.eq_id IS NOT NULL AND
                        (d.name IS DISTINCT FROM u.name OR d.sport IS DISTINCT FROM u.sport))
            FROM dim d LEFT JOIN upd u USING (eq_id) WHERE d.is_current
            UNION ALL
            SELECT u.eq_id, u.name, u.sport, TIMESTAMP '{ts}', NULL, true
            FROM upd u LEFT JOIN (SELECT * FROM dim WHERE is_current) d USING (eq_id)
            WHERE d.eq_id IS NULL
               OR d.name IS DISTINCT FROM u.name OR d.sport IS DISTINCT FROM u.sport
        """)
    want = sorted(
        (r[0], r[1], r[2], str(r[3]), str(r[4]), r[5])
        for r in con.execute("SELECT * FROM dim").fetchall()
    )
    assert got == want

    # point-in-time: between the two batches, key 1 shows v2
    snap = {r["eq_id"]: r["name"]
            for r in scd2_snapshot_at(after2, "2021-06-01 00:00:00").collect()}
    assert snap[1] == "Shoes A v2" and snap[4] == "Trainer"
    # exactly one open row per live key, no overlapping intervals
    cur = after2.filter("is_current").groupBy("eq_id").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_load_any_csv_jsonl_match_parquet(spark, tmp_path):
    """The format-dispatching loader reads CSV and JSONL copies of a
    table back byte-identical to the parquet original (explicit schema
    path — the production one)."""
    from training_datawarehouse_spark.sources.tables import load_any, load_table

    nation = load_table(spark, "/root/testdata/sf0.001", "nation")
    rows = sorted(map(tuple, nation.collect()))

    csv_dir = str(tmp_path / "nation_csv")
    nation.coalesce(1).write.option("header", "true").csv(csv_dir)
    import glob
    import os
    csv_file = next(p for p in glob.glob(csv_dir + "/*") if p.endswith(".csv"))
    got_csv = sorted(map(tuple, load_any(spark, csv_file, nation.schema).collect()))
    assert got_csv == rows

    jl_dir = str(tmp_path / "nation_jsonl")
    nation.coalesce(1).write.json(jl_dir)
    jl_file = next(p for p in glob.glob(jl_dir + "/*") if p.endswith(".json"))
    os.rename(jl_file, jl_file + "l")  # .jsonl extension path
    got_jl = sorted(map(tuple, load_any(spark, jl_file + "l", nation.schema).collect()))
    assert got_jl == rows

    orc_dir = str(tmp_path / "nation_orc")
    nation.write.orc(orc_dir)
    got_orc = sorted(map(tuple, load_any(spark, orc_dir).collect()))
    assert got_orc == rows


def test_scd2_merge_rejects_bad_batches(spark):
    """Empty tracked_cols fails fast; a batch with two rows for one key
    fails at action time naming the key (a silent merge would open two
    current versions at once) — round-3 advice."""
    from training_datawarehouse_spark.operators.scd import scd2_merge

    dim = spark.createDataFrame(
        [(1, "a", "2020-01-01", None, True)],
        "k long, v string, effective_from string, effective_to string, "
        "is_current boolean",
    ).selectExpr(
        "k", "v", "CAST(effective_from AS TIMESTAMP) effective_from",
        "CAST(effective_to AS TIMESTAMP) effective_to", "is_current",
    )
    with pytest.raises(ValueError, match="tracked_cols"):
        scd2_merge(dim, dim.select("k", "v"), ["k"], [], "2021-01-01")
    dup = spark.createDataFrame([(1, "b"), (1, "c")], "k long, v string")
    with pytest.raises(Exception, match="duplicate key"):
        scd2_merge(dim, dup, ["k"], ["v"], "2021-01-01").collect()


def test_load_quarantined_routes_bad_rows(spark, tmp_path):
    """Malformed-row quarantine (PERMISSIVE + corrupt column): broken
    lines in a json/csv source neither kill the job (FAILFAST) nor
    vanish (DROPMALFORMED) — they land in the bad frame with the raw
    line preserved for replay, while every parseable row flows through
    the good frame. Also covers Spark's corrupt-column-only-scan
    rejection: the bad frame must carry parsed columns alongside
    raw_record (which a quarantine sink wants anyway)."""
    from pyspark.sql import types as T

    from training_datawarehouse_spark.sources.tables import load_quarantined

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
    ])
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        '{"id": 2, "name": "also ok"}\n'
        '{"id": oops not json\n'
        '{"id": 3}\n'
        "garbage line\n"
    )
    good, bad = load_quarantined(spark, str(p), schema, fmt="json")
    assert sorted((r["id"], r["name"]) for r in good.collect()) == [
        (1, "ok"), (2, "also ok"), (3, None),
    ]
    assert sorted(r["raw_record"] for r in bad.collect()) == [
        "garbage line", '{"id": oops not json',
    ]
    assert bad.columns == ["raw_record", "id", "name"]

    pc = tmp_path / "in.csv"
    pc.write_text("id,name\n1,ok\nnotanumber,bad\n3,fine\n")
    goodc, badc = load_quarantined(spark, str(pc), schema, fmt="csv")
    assert sorted((r["id"], r["name"]) for r in goodc.collect()) == [
        (1, "ok"), (3, "fine"),
    ]
    assert [r["raw_record"] for r in badc.collect()] == ["notanumber,bad"]

    with pytest.raises(ValueError, match="json/csv"):
        load_quarantined(spark, str(p), schema, fmt="orc")


def test_load_quarantined_single_pass_one_scan(spark, tmp_path):
    """The remote-source variant must produce IDENTICAL splits to the
    two-pass loader while scanning the source once: after the persist
    is materialized, both splits' executed plans read the cache
    (InMemoryTableScan), not the files (no FileScan/Scan json)."""
    from pyspark.sql import types as T

    from training_datawarehouse_spark.sources.tables import (
        load_quarantined, load_quarantined_single_pass,
    )

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
    ])
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        '{"id": oops not json\n'
        '{"id": 3, "name": "fine"}\n'
        "garbage line\n"
    )
    g2, b2 = load_quarantined(spark, str(p), schema, fmt="json")
    g1, b1, release = load_quarantined_single_pass(
        spark, str(p), schema, fmt="json"
    )
    try:
        assert sorted(map(tuple, g1.collect())) == sorted(
            map(tuple, g2.collect())
        )
        assert sorted(map(tuple, b1.collect())) == sorted(
            map(tuple, b2.collect())
        )
        for split in (g1, b1):
            plan = split._jdf.queryExecution().executedPlan().toString()
            # the executing part of the plan reads the cache; a FileScan
            # may appear BELOW InMemoryRelation (that's the cache's
            # build recipe, already materialized), never above it
            executing = plan.split("InMemoryRelation")[0]
            assert "InMemoryTableScan" in executing
            assert "FileScan" not in executing
    finally:
        release()


def test_load_quarantined_remote_path_delegates(monkeypatch):
    """A remote-shaped path (object store / HDFS / HTTP scheme) must
    route through the single-pass loader — on remote storage the
    two-pass variant's second scan is a second egress bill. Local and
    ``file:`` paths keep the two-scan path (OS page cache makes it
    cheap). Routing only — no I/O, so no Spark session needed."""
    from training_datawarehouse_spark.sources import tables as tb

    calls = []
    monkeypatch.setattr(
        tb, "load_quarantined_single_pass",
        lambda spark, path, schema, fmt, corrupt_col: (
            calls.append(path) or ("GOOD", "BAD", lambda: None)
        ),
    )
    two_pass = []
    monkeypatch.setattr(
        tb, "_read_permissive",
        lambda *a: two_pass.append(a[1]) or None,
    )
    monkeypatch.setattr(tb, "_split_quarantine", lambda df, s, c: ("g", "b"))

    for remote in ("s3a://bucket/in.jsonl", "gs://b/x.json",
                   "hdfs://nn/path", "HTTPS://host/x.json"):
        assert tb.load_quarantined(None, remote, None) == ("GOOD", "BAD")
    assert calls == ["s3a://bucket/in.jsonl", "gs://b/x.json",
                     "hdfs://nn/path", "HTTPS://host/x.json"]
    for local in ("/data/in.jsonl", "file:///data/in.jsonl", "rel/p.json"):
        assert tb.load_quarantined(None, local, None) == ("g", "b")
    assert two_pass == ["/data/in.jsonl", "file:///data/in.jsonl",
                       "rel/p.json"]
