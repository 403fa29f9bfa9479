package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.HashExpressions
import graft.text.TextFunctions

/**
 * The LLM-training-data operators in STREAMING mode: a rate source emits
 * synthetic documents; the stream is language-gated, quality-gated,
 * repetition-filtered (all plain column expressions — they run identically
 * in batch and streaming because they are stateless projections), then
 * exact-deduplicated ONLINE with `dropDuplicatesWithinWatermark` on the
 * content hash (state bounded by the watermark window instead of growing
 * with all-time distinct content). Prints accepted docs + per-batch rates.
 *
 * Usage: sbt "runMain graft.examples.StreamingDocPipeline [seconds]"
 */
object StreamingDocPipeline {
  def main(args: Array[String]): Unit = {
    val seconds = args.headOption.map(_.toInt).getOrElse(15)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("StreamingDocPipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // synthetic docs: ~25% duplicates (value div 4 collapses), ~25% low-quality
    val docs = spark.readStream.format("rate").option("rowsPerSecond", "40").load()
      .withColumn("doc_id", col("value"))
      .withColumn("ts", col("timestamp"))
      .withColumn("text",
        when(pmod(col("value"), lit(4)) === 0, lit("spam spam spam spam spam spam spam"))
          .otherwise(concat(lit("the quick document number "),
            expr("cast(value div 4 as string)"),
            lit(" talks about data systems and the streams that feed them"))))

    val st = HashExpressions.ngramStats(col("text"))
    val gated = docs
      .withColumn("lang", TextFunctions.langId(col("text")))
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .withColumn("dup2", when(st.getField("n2") > 0,
        (st.getField("n2") - st.getField("d2")).cast("double") / st.getField("n2")).otherwise(0.0))
      .where(col("lang") === "en" && col("quality") > 0.3 && col("dup2") < 0.5)
      .withColumn("content_hash", md5(col("text")))
      // online exact dedup: one state row per distinct hash inside the
      // watermark window — bounded state, unlike dropDuplicates alone
      .withWatermark("ts", "30 seconds")
      .dropDuplicatesWithinWatermark("content_hash")

    val q = gated
      .select(col("doc_id"), col("quality"), substring(col("text"), 1, 40).as("preview"))
      .writeStream.format("console").outputMode("append")
      .option("truncate", "false").option("numRows", "6")
      .start()
    q.awaitTermination(seconds * 1000L)
    for (p <- Option(q.lastProgress); so <- p.stateOperators.headOption)
      println(s"""{"dedupStateRows":${so.numRowsTotal},"dropped":${so.numRowsDroppedByWatermark}}""")
    q.stop()
    spark.stop()
  }
}
