package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicLong
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cpu = new AtomicLong(); val gc = new AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        cpu.addAndGet(sc.stageInfo.taskMetrics.executorRunTime); gc.addAndGet(sc.stageInfo.taskMetrics.jvmGCTime)
      }
    })
    def time[A](n: String)(f: => A): A = {
      cpu.set(0); gc.set(0); val t0=System.nanoTime(); val r=f; Thread.sleep(300)
      println(s"TIMER $n: wall=${(System.nanoTime()-t0)/1e9} run=${cpu.get/1000.0}s gc=${gc.get/1000.0}s"); r }
    time("simhash COLD")(PipelineQueries.queries("q_dedup_simhash")(spark, "/root/testdata/sf0.1").count())
    time("simhash warm")(PipelineQueries.queries("q_dedup_simhash")(spark, "/root/testdata/sf0.1").count())
    spark.stop()
  }
}
