#!/usr/bin/env python3
"""Streaming local linear trend filtering with graft.ml.LinearKalmanFilter.

A rate source feeds noisy linearly-increasing measurements for `num_states`
parallel series; the filter runs in Structured Streaming append mode and
prints per-key (level, slope) estimates per micro-batch — the python twin of
graft.examples.LKFRateSourceLLT (port of the reference's
examples/src/main/python/streaming/lkf_rate_source_llt.py scenario).

Usage: python3 lkf_rate_source_llt.py [num_states] [rows_per_sec] [seconds]
"""
import glob
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
CLASSES = os.path.abspath(os.path.join(HERE, "..", "..", "..",
                                       "target", "scala-2.13", "classes"))
if not glob.glob(os.path.join(CLASSES, "graft", "ml", "*.class")):
    sys.exit("compile first: sbt compile")
sys.path.insert(0, os.path.abspath(os.path.join(HERE, "..", "..")))

from pyspark.ml.linalg import Matrices, Vectors
from pyspark.sql import SparkSession, functions as F

from graft.ml import LinearKalmanFilter

if __name__ == "__main__":
    num_states = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    mps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    seconds = int(sys.argv[3]) if len(sys.argv) > 3 else 15

    spark = (SparkSession.builder
             .master(os.environ.get("SPARK_MASTER", "local[4]"))
             .config("spark.driver.extraClassPath", CLASSES)
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false")
             .appName("RateSourceLKF").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    noise_param = 1.0

    measurements = (spark.readStream.format("rate")
                    .option("rowsPerSecond", mps).load()
                    .withColumn("mod", F.col("value") % num_states)
                    .withColumn("stateKey", F.col("mod").cast("string"))
                    .withColumn("trend",
                                (F.col("value") / num_states).cast("integer")
                                + F.randn() * noise_param)
                    .withColumn("measurement", F.array("trend")))

    lkf = (LinearKalmanFilter(2, 1)
           .setStateKeyCol("stateKey")
           .setEventTimeCol("timestamp")
           .setMeasurementCol("measurement")
           .setInitialStateMean(Vectors.dense([0.0, 0.0]))
           .setInitialStateCovariance(
               Matrices.dense(2, 2, [10000.0, 0.0, 0.0, 10000.0]))
           # column-major: F = [[1, 1], [0, 1]] (local linear trend)
           .setProcessModel(Matrices.dense(2, 2, [1.0, 0.0, 1.0, 1.0]))
           .setProcessNoise(Matrices.dense(2, 2, [0.0001, 0.0, 0.0, 0.0001]))
           .setMeasurementNoise(Matrices.dense(1, 1, [noise_param]))
           .setMeasurementModel(Matrices.dense(1, 2, [1.0, 0.0])))

    query = (lkf.transform(measurements)
             .select("stateKey", "stateIndex",
                     F.round(F.col("stateMean")[0], 3).alias("level"),
                     F.round(F.col("stateMean")[1], 3).alias("slope"))
             .writeStream
             .queryName("RateSourceLKF")
             .outputMode("append")
             .format("console")
             .option("truncate", "false").option("numRows", "8")
             .start())

    query.awaitTermination(seconds)  # pyspark: SECONDS (Scala twin takes ms)
    query.stop()
    spark.stop()
