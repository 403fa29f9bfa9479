package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/**
 * Dev measurement tool (optimization guide §1): per-stage attribution for
 * named SparkEntry queries. For each query: one discarded warm-up pass, then
 * one measured pass with a SparkListener capturing every completed stage's
 * wall duration, task count, executor run/CPU time, shuffle read/write bytes
 * and records, input bytes, and spill. Prints stages sorted by duration plus
 * job count (actions) per query so multi-action iterative operators are
 * visible. Timed action = queryExecution.toRdd.count(), the Bench contract.
 *
 * Usage:
 *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
 *     sbt "runMain graft.Profile q_jaccard_collapsed q_dedup_pipeline"
 */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same steady-state warm-up as Bench
    spark.range(1 << 20).selectExpr("sum(id)").collect()

    case class StageRow(id: Int, name: String, wallMs: Long, tasks: Int,
      runMs: Long, cpuMs: Long, shufReadMB: Double, shufWriteMB: Double,
      shufReadRec: Long, shufWriteRec: Long, inputMB: Double, spillMB: Double)

    val stages = scala.collection.mutable.ArrayBuffer[StageRow]()
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = synchronized { jobs += 1 }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = synchronized {
        val si = sc.stageInfo
        val tm = si.taskMetrics
        val wall = (for (a <- si.submissionTime; b <- si.completionTime) yield b - a).getOrElse(-1L)
        stages += StageRow(si.stageId, si.name.takeWhile(_ != '\n').take(90), wall,
          si.numTasks, tm.executorRunTime, tm.executorCpuTime / 1000000,
          tm.shuffleReadMetrics.totalBytesRead / 1e6,
          tm.shuffleWriteMetrics.bytesWritten / 1e6,
          tm.shuffleReadMetrics.recordsRead, tm.shuffleWriteMetrics.recordsWritten,
          tm.inputMetrics.bytesRead / 1e6,
          (tm.memoryBytesSpilled + tm.diskBytesSpilled) / 1e6)
      }
    }

    for (q <- args) {
      def exec(): Long = SparkEntry.queries(q)(spark, sfDir).queryExecution.toRdd.count()
      try { exec() } catch { case e: Throwable =>
        println(s"########## $q WARMUP-FAILED ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
      }
      stages.clear(); jobs = 0
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = try exec() catch { case _: Throwable => -1L }
      val wallS = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400) // listener bus flush (no public waitUntilEmpty)
      spark.sparkContext.removeSparkListener(listener)
      val rows = stages.sortBy(-_.wallMs)
      println(f"########## $q wall=${wallS}%.3fs jobs=$jobs stages=${rows.size} rows=$n " +
        f"sum_stage_wall=${rows.map(_.wallMs).sum / 1e3}%.3fs sum_run=${rows.map(_.runMs).sum / 1e3}%.3fs sum_cpu=${rows.map(_.cpuMs).sum / 1e3}%.3fs")
      println("  wall_ms tasks  run_ms  cpu_ms  sRdMB  sWrMB    sRdRec   sWrRec   inMB spillMB  stage")
      for (r <- rows.take(25))
        println(f"  ${r.wallMs}%7d ${r.tasks}%5d ${r.runMs}%7d ${r.cpuMs}%7d ${r.shufReadMB}%6.1f ${r.shufWriteMB}%6.1f ${r.shufReadRec}%9d ${r.shufWriteRec}%8d ${r.inputMB}%6.1f ${r.spillMB}%7.1f  [${r.id}] ${r.name}")
      // SPARK_GRAFT_PROFILE_PLAN=1: print the POST-EXECUTION plan (AQE
      // final stages resolved) to map stage ids back to operators
      if (sys.env.get("SPARK_GRAFT_PROFILE_PLAN").contains("1")) {
        val qe = SparkEntry.queries(q)(spark, sfDir).queryExecution
        qe.toRdd.count()
        println(qe.executedPlan.toString.take(12000))
      }
    }
    spark.stop()
  }
}
