#!/usr/bin/env python3
"""Smoke-test the round-12 python wrappers (JPEG/mosaic payloads + the
CJK-aware tokenizer + the k-scaled ANN path) end-to-end from PySpark.
Driver-side tooling — the library stays Scala-only.
Usage: python3 tools/pyspark_r12_smoke.py"""
import glob
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
CLASSES = os.path.join(HERE, "..", "target", "scala-2.13", "classes")
if not glob.glob(os.path.join(CLASSES, "graft", "multimodal", "Multimodal*.class")):
    sys.exit("compile first: sbt compile")
sys.path.insert(0, os.path.join(HERE, "..", "python"))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (SparkSession.builder.master("local[4]")
         .config("spark.driver.extraClassPath", CLASSES)
         .config("spark.sql.shuffle.partitions", 4)
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import graft

# CJK per-codepoint tokenization (round 12): a Han sentence is one token
# per codepoint, not one run-token; Thai stays a run
df = spark.createDataFrame(
    [(1, "世界模型"), (2, "สวัสดีชาวโลก"), (3, "hello world")], ["doc_id", "text"])
out = {r[0]: r[1] for r in
       df.select("doc_id", F.size(graft.u_tokens(F.col("text"))).alias("n")).collect()}
assert out == {1: 4, 2: 1, 3: 2}, out

# cross-format BMP <-> JPEG dedup: same mosaic raster, different container,
# one dHash cluster per doc
docs = spark.createDataFrame(
    [(1, "a deterministic document body for the mosaic raster"),
     (2, "another, different document body with other bytes")],
    ["doc_id", "text"])
bmp = graft.with_mosaic_bmp_payload(docs, "text")
jpg = graft.with_jpeg_payload(
    docs.select((F.col("doc_id") + 100).alias("doc_id"), "text"), "text")
ph = graft.perceptual_hash(bmp.select("doc_id", "payload")
                           .unionAll(jpg.select("doc_id", "payload")),
                           "doc_id", "payload").collect()
h = {r[0]: r[1] for r in ph}
assert h[1] == h[101] and h[2] == h[102] and h[1] != h[2], h

# k-scaled incremental ANN returns a clean per-query rank ladder
emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
hist = emb.where(F.col("vec_id") % 3 != 0)
batch = emb.where(F.col("vec_id") % 3 == 0).select(
    F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
r = graft.ann_incremental_kscaled(hist, batch, "vec_id", "embedding",
                                  "qid", "qv", k=3, num_centroids=21, iters=1)
rows = r.collect()
assert rows and all(1 <= x["rank"] <= 3 for x in rows), rows[:5]

print("pyspark r12 smoke OK")
spark.stop()
