package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump the executed (AQE-final) formatted plan of each named query to
  * `<outDir>/<name>.txt` — the per-query before/after artifact for the
  * optimization rounds (plans/r09/...). Usage:
  * `runMain graft.PlanDump <sfDir> <outDir> <suffix> <q1,q2,...>`
  * writes `<outDir>/<q>_<suffix>.txt` per query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, names) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    // r10 (VERDICT #7): eager-inside-fn operators (Sinkhorn, PCA,
    // CC/Graph/Greedy/SA local tails, IvfIndex.materialize collects)
    // execute Spark sub-jobs at DataFrame-CONSTRUCTION time and return
    // a LocalTableScan — invisible to the returned frame's plan. A
    // listener records every SQL execution's physical plan fired while
    // the query builds and runs, so the sub-job plans stay auditable
    // (written to <name>_<suffix>_eager.txt when any fire before the
    // final count).
    val subPlans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(
          event: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        event match {
          case e: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            subPlans.add(e.physicalPlanDescription)
          case _ => ()
        }
    }
    spark.sparkContext.addSparkListener(listener)
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      subPlans.clear()
      val df = SparkEntry.queries(name)(spark, sfDir)
      // executions fired DURING construction are the eager sub-jobs
      // (listener events are async — give the bus a moment to drain)
      Thread.sleep(300)
      val eager = new java.util.ArrayList(subPlans)
      df.count() // finalize AQE
      val plan = df.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
      println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
      if (!eager.isEmpty) {
        val sb = new StringBuilder
        var i = 0
        eager.forEach { p =>
          i += 1
          sb.append(s"==== eager sub-job $i (construction-time) ====\n")
          sb.append(p).append("\n\n")
        }
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_${suffix}_eager.txt"),
          sb.toString)
        println(s"[plandump] wrote $outDir/${name}_${suffix}_eager.txt" +
          s" ($i sub-jobs)")
      }
    }
    spark.stop()
  }
}
