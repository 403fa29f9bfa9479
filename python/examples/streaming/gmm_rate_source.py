#!/usr/bin/env python3
"""Streaming online gaussian mixture estimation with
graft.ml.MultivariateGaussianMixture: a rate source samples from three
2-d gaussians; the stochastic-EM mixture tracks the component means and
weights per key in append mode — the python twin of the reference's
gmm_rate_source.py scenario.

Usage: python3 gmm_rate_source.py [num_states] [rows_per_sec] [seconds]
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

from pyspark.sql import SparkSession, functions as F

from graft.ml import MultivariateGaussianMixture

if __name__ == "__main__":
    num_states = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    mps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    seconds = int(sys.argv[3]) if len(sys.argv) > 3 else 15

    spark = (SparkSession.builder
             .master(os.environ.get("SPARK_MASTER", "local[4]"))
             .config("spark.driver.extraClassPath", CLASSES)
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false")
             .appName("GMMRateSource").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    # three 2-d components (unit-ish covariance, distinct means), mixed
    # 0.2 / 0.3 / 0.5 — all with stock SQL randn, no numpy needed
    def gauss(mx, my, seed):
        return F.array(F.randn(seed) + mx, F.randn(seed + 100) + my)

    weight = F.rand(seed=0)
    mixture = (F.when(weight < 0.2, gauss(1.0, 2.0, 0))
               .when(weight < 0.5, gauss(10.0, 5.0, 1))
               .otherwise(gauss(4.0, 4.0, 2)))

    input_df = (spark.readStream.format("rate")
                .option("rowsPerSecond", mps).load()
                .withColumn("mod", F.col("value") % num_states)
                .withColumn("stateKey", F.col("mod").cast("string"))
                .withColumn("sample", mixture))

    initial_means = [[3.0, 5.0], [6.0, 6.0], [7.0, 1.0]]
    eye = [1.0, 0.0, 0.0, 1.0]
    gmm = (MultivariateGaussianMixture(3, 2)
           .setStateKeyCol("stateKey")
           .setEventTimeCol("timestamp")
           .setSampleCol("sample")
           .setInitialWeights([0.33, 0.33, 0.33])
           .setInitialMeans(initial_means)
           .setInitialCovariances([eye, eye, eye])
           .setStepSize(0.01)
           .setMinibatchSize(1))

    # graft mixture output: weights array<double>, params array<array<double>>
    # (per component: mean ++ row-major covariance)
    query = (gmm.transform(input_df)
             .select("stateKey", "stateIndex",
                     F.format_string("[%.2f, %.2f, %.2f]",
                                     F.col("weights")[0], F.col("weights")[1],
                                     F.col("weights")[2]).alias("weights"),
                     F.format_string("[%.2f, %.2f]",
                                     F.col("params")[0][0],
                                     F.col("params")[0][1]).alias("dist1_mean"),
                     F.format_string("[%.2f, %.2f]",
                                     F.col("params")[1][0],
                                     F.col("params")[1][1]).alias("dist2_mean"),
                     F.format_string("[%.2f, %.2f]",
                                     F.col("params")[2][0],
                                     F.col("params")[2][1]).alias("dist3_mean"))
             .writeStream
             .queryName("GMMRateSource")
             .outputMode("append")
             .format("console")
             .option("truncate", "false").option("numRows", "8")
             .start())

    query.awaitTermination(seconds)  # pyspark: SECONDS (Scala twin takes ms)
    query.stop()
    spark.stop()
