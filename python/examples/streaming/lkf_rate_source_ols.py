#!/usr/bin/env python3
"""Streaming OLS via graft.ml.LinearKalmanFilter with a PER-ROW measurement
model: z = a*x + b*y + c + w recovered online as the 3-state vector
(a, b, c), the measurement model column carrying [x, y, 1] per row — the
python twin of the reference's lkf_rate_source_ols.py scenario.

graft's per-row matrix columns are (numRows, numCols, values) structs
(row-major), built with plain SQL functions — no UDF.

Usage: python3 lkf_rate_source_ols.py [num_states] [rows_per_sec] [seconds]
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
             .appName("LKFRateSourceOLS").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    # states to estimate: a, b, c in z = a*x + b*y + c + w, w ~ N(0, 1)
    a, b, c = 0.5, 0.2, 1.2
    noise_param = 1.0

    features = (spark.readStream.format("rate")
                .option("rowsPerSecond", mps).load()
                .withColumn("mod", F.col("value") % num_states)
                .withColumn("stateKey", F.col("mod").cast("string"))
                .withColumn("x", (F.col("value") / num_states)
                            .cast("integer").cast("double"))
                .withColumn("y", F.sqrt("x"))
                .withColumn("w", F.randn(0) * noise_param)
                .withColumn("label",
                            F.array(F.col("x") * a + F.col("y") * b + c
                                    + F.col("w")))
                # per-row H = [x, y, 1] as a (1 x 3) row-major matrix struct
                .withColumn("features", F.struct(
                    F.lit(1).alias("numRows"),
                    F.lit(3).alias("numCols"),
                    F.array("x", "y", F.lit(1.0)).alias("values"))))

    lkf = (LinearKalmanFilter(3, 1)
           .setStateKeyCol("stateKey")
           .setEventTimeCol("timestamp")
           .setMeasurementCol("label")
           .setMeasurementModelCol("features")
           .setInitialStateMean(Vectors.dense([0.0, 0.0, 0.0]))
           .setInitialStateCovariance(
               Matrices.dense(3, 3, [10.0, 0, 0, 0, 10.0, 0, 0, 0, 10.0]))
           .setProcessModel(
               Matrices.dense(3, 3, [1.0, 0, 0, 0, 1.0, 0, 0, 0, 1.0]))
           .setProcessNoise(Matrices.dense(3, 3, [0.0] * 9))
           .setMeasurementNoise(Matrices.dense(1, 1, [1.0])))

    query = (lkf.transform(features)
             .select("stateKey", "stateIndex",
                     F.format_string(
                         "[%.2f, %.2f, %.2f]",
                         F.col("stateMean")[0], F.col("stateMean")[1],
                         F.col("stateMean")[2]).alias("modelParameters"))
             .writeStream
             .queryName("LKFRateSourceOLS")
             .outputMode("append")
             .format("console")
             .option("truncate", "false").option("numRows", "8")
             .start())

    query.awaitTermination(seconds)  # pyspark: SECONDS (Scala twin takes ms)
    query.stop()
    spark.stop()
