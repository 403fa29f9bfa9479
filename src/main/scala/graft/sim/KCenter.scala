package graft.sim

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/**
 * Greedy farthest-first k-center selection over an embedding column — the
 * diversity-coreset complement to GraphRank's centrality: the k selected
 * vectors maximize pairwise dissimilarity, covering the corpus's modes
 * (Gonzalez's classic 2-approximation to the k-center objective). The
 * standard pick for seeding diverse few-shot pools, eval panels, and
 * anchor sets for stratified pruning.
 *
 * Seed = the minimum id; each round selects the vector whose maximum
 * similarity to the already-chosen set is SMALLEST (ties id-asc).
 *
 * Scale shape: the corpus rides persisted with ONE running max-sim column,
 * updated map-side each round against the single newly-chosen center (a
 * literal vector in the plan — never a join, never a re-scan of the chosen
 * set); selection is a TakeOrderedAndProject fetching 1 row. k rounds of
 * one scan each — O(k·N) with per-round materialization keeping lineage
 * O(1), exactly the distributed form of the textbook sequential algorithm.
 *
 * Determinism: similarities round to `roundTo` decimals before any
 * comparison and ties break id-asc, so the whole selection trajectory is
 * replayable in any engine (the DuckDB oracle unrolls the same k stages).
 */
object KCenter {

  /** Returns (rank, idCol, sel_sim): rank 1..k in selection order, sel_sim
    * = the center's max similarity to the previously chosen set at the
    * moment of selection (the seed reports 1.0). Ids must be integral. */
  def farthestFirst(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, roundTo: Int = 6): DataFrame = {
    require(k >= 1, "k must be positive")
    val spark = corpus.sparkSession
    var cur = corpus
      .select(col(idCol).cast("long").as("_id"),
        col(vecCol).cast("array<double>").as("_v"),
        lit(-1.0).as("_maxsim"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      cur.count()
      val seed = cur.orderBy(col("_id").asc).limit(1).collect()(0)
      var chosen =
        Vector[(Long, Seq[Double], Double)]((seed.getLong(0), seed.getSeq[Double](1), 1.0))
      var exhausted = false
      while (chosen.size < k && !exhausted) {
        val cvec = chosen.last._2
        val next = cur
          .withColumn("_maxsim",
            greatest(col("_maxsim"),
              round(Similarity.cosine(col("_v"), typedLit(cvec)), roundTo)))
          .persist(StorageLevel.MEMORY_AND_DISK)
        next.count()
        cur.unpersist()
        cur = next
        val sel = cur.where(!col("_id").isInCollection(chosen.map(_._1)))
          .orderBy(col("_maxsim").asc, col("_id").asc)
          .limit(1).collect()
        if (sel.isEmpty) exhausted = true
        else chosen :+= ((sel(0).getLong(0), sel(0).getSeq[Double](1), sel(0).getDouble(2)))
      }
      val schema = StructType(Seq(
        StructField("rank", LongType, nullable = false),
        StructField(idCol, LongType, nullable = false),
        StructField("sel_sim", DoubleType, nullable = false)))
      val rows = chosen.zipWithIndex.map { case ((id, _, s), i) =>
        Row((i + 1).toLong, id, s)
      }
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    } finally cur.unpersist()
  }
}
