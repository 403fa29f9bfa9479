package graft

/**
 * Dev tool: print the executed physical plan of named SparkEntry queries at
 * sf0.001 — the `.explain` audit loop behind PlanQualitySpec's pins.
 * Usage: sbt "runMain graft.PlanDump q_bm25 q_fuzzy_join"
 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for (q <- args) {
      println(s"########## $q")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString.take(6000))
    }
    spark.stop()
  }
}
