package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.operators.{CorpusStats, DatasetSplit, TrainingOrder}

/**
 * The full curation → assembly path as ONE runnable program: raw docs →
 * near-dup removal (star LSH pipeline, longest copy kept) → NB quality
 * gate (corpus-trained, broadcast-scored) → temperature-scaled source
 * mixing → exact upsampling → proportional interleave → sliding-window
 * chunking. Every step is an operator the DuckDB gate verifies
 * value-exact; this example just chains them on real testdata and prints
 * the funnel.
 *
 * Usage: sbt "runMain graft.examples.TrainingAssemblyExample [sfDir]"
 */
object TrainingAssemblyExample {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("TrainingAssemblyExample").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"[assembly] raw docs: ${docs.count()}")

    // 1. near-dup removal: keep the longest member of each duplicate group
    val kept = Dedup.pipeline(docs, "doc_id", "text", 0.4)
      .select(col("kept_id").as("doc_id"))
      .join(docs, Seq("doc_id"))
    println(s"[assembly] after near-dup removal: ${kept.count()}")

    // 2. quality gate: Gopher ruleset (the synthetic corpus's lang column
    // is uncorrelated with its text, so a trained classifier has nothing
    // to separate here — on real data swap in TextClassifiers.naiveBayes*
    // exactly as q_nb_classifier wires it)
    val gated = graft.text.QualityRules.gopherFlags(kept, "doc_id", "text")
      .where(col("pass_all")).select(col("doc_id"))
      .join(kept, Seq("doc_id"))
    println(s"[assembly] after quality gate: ${gated.count()}")

    // 3. mixture: sqrt-temperature allocation, upsample, interleave
    val alloc = DatasetSplit.mixAllocation(gated, "source", totalTarget = 2000L)
    val ups = TrainingOrder.upsampleToAllocation(gated, "doc_id", "source", alloc)
    val order = TrainingOrder.interleave(ups, "doc_id", "source")
    println(s"[assembly] interleaved training rows: ${order.count()}")

    // 4. chunk the ordered stream for training windows
    val chunks = CorpusStats.chunkDocuments(
      order.join(gated, Seq("doc_id")), "doc_id", "text", size = 64, stride = 48)
    println(s"[assembly] training chunks: ${chunks.count()}")

    order.orderBy(col("pos_key"), col("source"), col("rank_in_group"))
      .show(10, truncate = false)
    spark.stop()
  }
}
