package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only profiler: run named SparkEntry queries (one warm-up first)
  * with a listener that prints every job's wall time and every stage's
  * task-time/shuffle totals — the local-mode stand-in for the Spark UI
  * stage page (guide §1.1/§7.1). Usage:
  * `sbt "runMain graft.Profile q_pagerank"`.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries("q_indicators")(spark, sfDir).count() // warm-up

    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    @volatile var collecting = false
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobStart.put(j.jobId, System.nanoTime())
      override def onJobEnd(j: SparkListenerJobEnd): Unit = if (collecting) {
        val t0 = Option(jobStart.get(j.jobId)).getOrElse(0L)
        val ms = (System.nanoTime() - t0) / 1e6
        println(f"[job] id=${j.jobId}%4d wall=${ms}%8.1f ms")
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        if (collecting) {
          val i = s.stageInfo
          val m = i.taskMetrics
          println(f"[stage] id=${i.stageId}%4d tasks=${i.numTasks}%4d " +
            f"taskTime=${m.executorRunTime}%7d ms " +
            f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1024}%8d KiB " +
            f"shufR=${m.shuffleReadMetrics.totalBytesRead / 1024}%8d KiB  " +
            i.name.takeWhile(_ != '\n').take(90))
        }
    }
    spark.sparkContext.addSparkListener(listener)
    for (name <- args) {
      println(s"==== $name ====")
      collecting = true
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      // let straggler listener events drain before the summary line
      Thread.sleep(300)
      collecting = false
      println(f"==== $name total ${secs}%.2f s ====")
    }
    spark.stop()
  }
}
