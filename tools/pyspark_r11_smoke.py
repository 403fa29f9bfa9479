#!/usr/bin/env python3
"""Smoke-test the round-11 python wrappers (Unicode text path, indel fuzzy
join, incremental ANN) end-to-end from PySpark. Driver-side tooling — the
library stays Scala-only. Usage: python3 tools/pyspark_r11_smoke.py"""
import glob
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
CLASSES = os.path.join(HERE, "..", "target", "scala-2.13", "classes")
if not glob.glob(os.path.join(CLASSES, "graft", "text", "UnicodeText*.class")):
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

# NFC: the NFD spelling (e + U+0301) must fold onto the composed bytes
nfd = "résumé data"
nfc = "résumé data"
df = spark.createDataFrame(
    [(1, nfd), (2, nfc), (3, "Привет мир")],
    ["doc_id", "text"])
out = df.select("doc_id",
                F.length(graft.nfc_normalize(F.col("text"))).alias("n"),
                graft.dominant_script(graft.script_counts(F.col("text"))).alias("s"),
                F.size(graft.u_tokens(F.col("text"))).alias("t")).collect()
m = {r[0]: (r[1], r[2], r[3]) for r in out}
assert m[1] == m[2] == (11, "latn", 2), m
assert m[3][1] == "cyrl" and m[3][2] == 2, m

fz = spark.createDataFrame(
    [(1, "alpha bravo charlie delta echo foxtrot"),
     (2, "alpxha bravo charlie delta echo foxtrot")], ["doc_id", "text"])
pairs = graft.fuzzy_pairs_indel(fz, "doc_id", "text").collect()
assert len(pairs) == 1 and pairs[0]["a"] == 1 and pairs[0]["b"] == 2, pairs

emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
hist = emb.where(F.col("vec_id") % 3 != 0)
batch = emb.where(F.col("vec_id") % 3 == 0).select(
    F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
r1 = graft.ann_incremental(hist, batch, "vec_id", "embedding", "qid", "qv",
                           k=3, nprobe=2, num_centroids=8, iters=1)
assert r1.count() > 0
r2 = graft.ann_incremental_kscaled(hist, batch, "vec_id", "embedding",
                                   "qid", "qv", k=3, num_centroids=16, iters=1)
assert r2.count() > 0
print("R11 PYTHON SMOKE PASS")
spark.stop()
