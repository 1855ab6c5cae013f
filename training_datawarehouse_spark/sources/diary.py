"""Nested-JSON training-diary source (OP-SRC-1).

The reference loads one nested JSON document and iterates it in Python
(reference ``populate_from_json.py:111-113,126,156-157,194-195``). Here:
``spark.read.schema(...).json`` with an explicit ``StructType`` (never
schema inference at scale), then ``explode`` for the nested
``days[].workouts[]`` array.

The document shape (FIXTURES.md §A): four top-level arrays — ``days``
(each optionally nesting ``workouts``), ``weights``, ``physiologicals``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def workout_struct() -> T.StructType:
    return T.StructType([
        T.StructField("activityString", T.StringType()),
        T.StructField("activityTypeString", T.StringType()),
        T.StructField("equipmentName", T.StringType()),
        T.StructField("km", T.DoubleType()),
        T.StructField("tss", T.DoubleType()),
        T.StructField("rpe", T.DoubleType()),
        T.StructField("hr", T.DoubleType()),
        T.StructField("watts", T.DoubleType()),
        T.StructField("seconds", T.DoubleType()),
        T.StructField("ascentMetres", T.DoubleType()),
        T.StructField("kj", T.DoubleType()),
        T.StructField("reps", T.DoubleType()),
        T.StructField("isRace", T.LongType()),
        T.StructField("brick", T.LongType()),
        T.StructField("wattsEstimated", T.LongType()),
        T.StructField("cadence", T.DoubleType()),
    ])


def diary_schema() -> T.StructType:
    return T.StructType([
        T.StructField("days", T.ArrayType(T.StructType([
            T.StructField("iso8061DateString", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("fatigue", T.DoubleType()),
            T.StructField("motivation", T.DoubleType()),
            T.StructField("sleep", T.DoubleType()),
            T.StructField("sleepQuality", T.StringType()),
            T.StructField("workouts", T.ArrayType(workout_struct())),
        ]))),
        T.StructField("weights", T.ArrayType(T.StructType([
            T.StructField("iso8061DateString", T.StringType()),
            T.StructField("kg", T.DoubleType()),
            T.StructField("fatPercent", T.DoubleType()),
        ]))),
        T.StructField("physiologicals", T.ArrayType(T.StructType([
            T.StructField("iso8061DateString", T.StringType()),
            T.StructField("restingHR", T.DoubleType()),
            T.StructField("restingSDNN", T.DoubleType()),
            T.StructField("restingRMSSD", T.DoubleType()),
        ]))),
    ])


def read_diary(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """Return the four normalized frames: days, workouts, weights, physio.

    Dates parsed with ``to_date`` on the ISO-8601 string (OP-FN-1;
    Spark parses ISO natively — the reference used ``dateutil``,
    reference :119-120).
    """
    doc = spark.read.schema(diary_schema()).option("multiLine", "true").json(path)

    days = doc.select(F.explode("days").alias("d")).select(
        F.to_date("d.iso8061DateString").alias("date"),
        F.coalesce("d.type", F.lit("Normal")).alias("type"),
        F.col("d.fatigue").alias("fatigue"),
        F.col("d.motivation").alias("motivation"),
        F.col("d.sleep").alias("sleep"),
        F.coalesce("d.sleepQuality", F.lit("Average")).alias("sleepQuality"),
        F.col("d.workouts").alias("workouts"),
    )

    workouts = days.filter(F.size("workouts") > 0).select(
        "date", F.explode("workouts").alias("w")
    ).select(
        "date",
        F.col("w.activityString").alias("activity"),
        F.col("w.activityTypeString").alias("activity_type"),
        F.col("w.equipmentName").alias("equipment"),
        "w.*",
    ).drop("activityString", "activityTypeString", "equipmentName")

    weights = doc.select(F.explode("weights").alias("x")).select(
        F.to_date("x.iso8061DateString").alias("date"),
        F.col("x.kg").alias("kg"),
        F.col("x.fatPercent").alias("fatPercent"),
    )

    physio = doc.select(F.explode("physiologicals").alias("x")).select(
        F.to_date("x.iso8061DateString").alias("date"),
        F.col("x.restingHR").alias("restingHR"),
        F.col("x.restingSDNN").alias("restingSDNN"),
        F.col("x.restingRMSSD").alias("restingRMSSD"),
    )

    return {"days": days.drop("workouts"), "workouts": workouts,
            "weights": weights, "physio": physio}
