package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Line-level corpus deduplication: removes lines that occur in at least
 * `minDocFreq` distinct documents — the boilerplate-stripping step
 * (navigation headers, cookie banners, footers) of web-corpus pipelines.
 * Blank lines are never treated as boilerplate.
 *
 * Scale shape: pass 1 shuffles (line, id) once to build the distinct-doc
 * frequency table; the FREQUENT subset is small by definition (its size is
 * bounded by total-line-occurrences / minDocFreq), so it broadcasts into a
 * map-side anti-join; pass 2 re-aggregates the surviving lines per doc to
 * rebuild the text in original order. No all-pairs work anywhere.
 */
object LineDedup {

  /**
   * Returns (id, n_lines, n_removed, text_clean): per input doc, the line
   * count, how many lines were removed as boilerplate, and the text
   * rebuilt (in original line order) without them.
   */
  def removeBoilerplate(
      df: DataFrame, idCol: String, textCol: String, minDocFreq: Long): DataFrame = {
    // null text behaves as empty: one blank line, nothing removable
    val text = coalesce(col(textCol), lit(""))
    val lines = df.select(col(idCol),
      posexplode(split(text, "\n")).as(Seq("pos", "line")))
    val frequent = lines.where(trim(col("line")) =!= "")
      .groupBy(col("line"))
      .agg(countDistinct(col(idCol)).as("df_count"))
      .where(col("df_count") >= minDocFreq)
      .select(col("line"))
    val kept = lines.join(broadcast(frequent), Seq("line"), "left_anti")
    val rebuilt = kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws("\n", transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line"))).as("_clean"))
    df.select(col(idCol), size(split(text, "\n")).cast("long").as("n_lines"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_lines"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("_clean"), lit("")).as("text_clean"))
  }
}
