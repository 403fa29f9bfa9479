package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface: graft's native expressions registered via
  * SparkSessionExtensions must be callable from spark.sql(). Uses its own
  * session (extensions bind at session build time). */
class GraftExtensionsSpec extends AnyFunSuite {

  test("registered functions work from SQL and match the Column API") {
    // getOrCreate would silently reuse the suite-shared session (built
    // WITHOUT the extensions), so detach any existing session first and
    // restore it afterwards.
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .appName("graft-ext").getOrCreate()
    try {
      import spark.implicits._
      Seq((1L, "the quick brown fox jumps the quick brown fox")).toDF("id", "text")
        .createOrReplaceTempView("docs")
      val row = spark.sql(
        """SELECT size(shingle_hash_set(text, 3)) AS n_shingles,
          |       size(token_hash_array(text, 60)) AS n_toks,
          |       size(minhash_signature(shingle_hash_set(text, 3), 32)) AS sig_len,
          |       simhash_fingerprint(token_hash_array(text, 60), 60) AS sh,
          |       word_ngrams(text, 2) AS grams,
          |       ngram_stats(text).n1 AS n1,
          |       rolling_hash(token_hash_array(text, 31)) AS rh
          |FROM docs""".stripMargin).head()
      assert(row.getInt(0) == 5) // 7 shingles, 2 duplicates
      assert(row.getInt(1) == 9)
      assert(row.getInt(2) == 32)
      assert(row.getSeq[String](4).length == 8 && row.getSeq[String](4).head == "the quick")
      assert(row.getLong(5) == 9L)
      assert(row.getLong(6) != 0L)
      val viaColumn = Seq("the quick brown fox jumps the quick brown fox").toDF("text")
        .select(graft.dedup.SimHash.simhash(org.apache.spark.sql.functions.col("text")))
        .head().getLong(0)
      assert(row.getLong(3) == viaColumn)
      val redacted = spark.sql(
        "SELECT redact_pii('mail a@b.com ref 12345678 end') AS r").head().getString(0)
      assert(redacted == "mail <EMAIL> ref <ID> end")
    } finally {
      // Do NOT spark.stop(): the JVM has ONE SparkContext, shared with the
      // suite session — stopping it here killed whichever suites were
      // running concurrently (a rare-loss lottery until the suite count
      // grew). The extra SparkSession is harmless; just restore the
      // previous session bindings.
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
