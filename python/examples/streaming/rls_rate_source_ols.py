#!/usr/bin/env python3
"""Streaming OLS via graft.ml.RecursiveLeastSquaresFilter: the same
z = a*x + b*y + c + w recovery as lkf_rate_source_ols.py, but through the
RLS estimator with exponential forgetting, features assembled with the
stock pyspark VectorAssembler (Pipeline-style composition) — the python
twin of the reference's rls_rate_source_ols.py scenario.

Usage: python3 rls_rate_source_ols.py [num_states] [rows_per_sec] [seconds]
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

from pyspark.ml.feature import VectorAssembler
from pyspark.ml.linalg import Vectors
from pyspark.sql import SparkSession, functions as F

from graft.ml import RecursiveLeastSquaresFilter

if __name__ == "__main__":
    num_states = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    mps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    seconds = int(sys.argv[3]) if len(sys.argv) > 3 else 15

    spark = (SparkSession.builder
             .master(os.environ.get("SPARK_MASTER", "local[4]"))
             .config("spark.driver.extraClassPath", CLASSES)
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false")
             .appName("RLSRateSourceOLS").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    a, b, c = 0.5, 0.2, 1.2
    noise_param = 1.0
    label_expression = F.col("x") * a + F.col("y") * b + c + F.col("w")

    input_df = (spark.readStream.format("rate")
                .option("rowsPerSecond", mps).load()
                .withColumn("mod", F.col("value") % num_states)
                .withColumn("stateKey", F.col("mod").cast("string"))
                .withColumn("x", (F.col("value") / num_states)
                            .cast("integer").cast("double"))
                .withColumn("y", F.sqrt("x"))
                .withColumn("bias", F.lit(1.0))
                .withColumn("w", F.randn(0) * noise_param)
                .withColumn("label", label_expression))

    rls = (RecursiveLeastSquaresFilter(3)
           .setStateKeyCol("stateKey")
           .setEventTimeCol("timestamp")
           .setLabelCol("label")
           .setFeaturesCol("features")
           .setInitialEstimate(Vectors.dense([0.0, 0.0, 0.0]))
           .setRegularizationMatrixFactor(10e6)
           .setForgettingFactor(0.99))

    assembler = VectorAssembler(inputCols=["x", "y", "bias"],
                                outputCol="features")

    measurements = assembler.transform(input_df)
    query = (rls.transform(measurements)
             .select("stateKey", "stateIndex",
                     F.format_string(
                         "[%.2f, %.2f, %.2f]",
                         F.col("stateMean")[0], F.col("stateMean")[1],
                         F.col("stateMean")[2]).alias("modelParameters"))
             .writeStream
             .queryName("RLSRateSourceOLS")
             .outputMode("append")
             .format("console")
             .option("truncate", "false").option("numRows", "8")
             .start())

    query.awaitTermination(seconds)  # pyspark: SECONDS (Scala twin takes ms)
    query.stop()
    spark.stop()
