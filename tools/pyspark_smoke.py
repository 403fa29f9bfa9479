#!/usr/bin/env python3
"""Smoke-test the docs/pyspark-migration.md `spark._jvm` recipe: drive the
compiled graft LinearKalmanFilter from PySpark with no Python bindings and
assert it produces state estimates. Driver-side tooling (like
local_verify.py) — the library itself stays Scala-only.

Usage: python3 tools/pyspark_smoke.py
"""
import glob
import os
import sys

CLASSES = os.path.join(os.path.dirname(__file__), "..", "target", "scala-2.13", "classes")
if not glob.glob(os.path.join(CLASSES, "graft", "filter", "LinearKalmanFilter*.class")):
    sys.exit("compile first: sbt compile")

from pyspark.sql import SparkSession, DataFrame, functions as F

spark = (SparkSession.builder.master("local[4]")
         .config("spark.driver.extraClassPath", os.path.abspath(CLASSES))
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .appName("graft-pyspark-smoke").getOrCreate())
spark.sparkContext.setLogLevel("WARN")

df = spark.createDataFrame(
    [(k, i, float(i) + k) for k in range(3) for i in range(20)],
    "key int, idx int, z double"
).select(
    F.col("key").cast("string").alias("key"),
    F.timestamp_seconds(F.lit(1700000000) + F.col("idx") * 60).alias("ts"),
    F.array(F.col("z")).alias("meas"))

jvm = spark._jvm
dmat = getattr(jvm.graft.linalg, "DMat$").__getattr__("MODULE$")

def mat(rows, cols, *vals):
    arr = spark._sc._gateway.new_array(jvm.double, len(vals))
    for i, v in enumerate(vals):
        arr[i] = float(v)
    return dmat.apply(rows, cols, arr)

lkf = (jvm.graft.filter.LinearKalmanFilter(1, 1)
       .setStateKeyCol("key").setEventTimeCol("ts").setMeasurementCol("meas")
       .setInitialStateCovariance(mat(1, 1, 10.0))
       .setProcessNoise(mat(1, 1, 1.0))
       .setMeasurementNoise(mat(1, 1, 4.0)))

out = DataFrame(lkf.transform(df._jdf), spark)
rows = (out.groupBy("key")
        .agg(F.max("stateIndex").alias("n"),
             F.max_by(F.col("stateMean")[0], F.col("stateIndex")).alias("level"))
        .orderBy("key").collect())

assert len(rows) == 3, rows
for r in rows:
    assert r.n == 20, r
    # local-level filter tracking z = idx + key converges near the tail value
    expect = 19.0 + int(r.key)
    assert abs(r.level - expect) < 2.5, (r, expect)
print("PASS: graft LKF driven from PySpark via spark._jvm —",
      [(r.key, r.n, round(r.level, 2)) for r in rows])
spark.stop()
