package graft

import org.apache.spark.sql.SparkSession

/** Dev-only probe: time named SparkEntry queries standalone (one warm-up
  * first), optionally printing the formatted plan (`SCRATCH_EXPLAIN=1`).
  * Bench numbers on this VM show transient multi-x swings — before
  * optimizing a "slow" query, re-measure it here in isolation.
  *
  * `sbt "runMain graft.Scratch q_minhash_pairs q_minhash_pairs"`
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up
    SparkEntry.queries("q_indicators")(spark, sfDir).count()
    for (name <- args) name match {
      // streaming benches, runnable in isolation (the per-round bench
      // runs them after 120+ batch queries in the same JVM — replay here
      // to separate real regressions from shared-JVM noise)
      case "stream_indicators" =>
        println(f"[scratch] stream_indicators: ${Bench.streamReplay(spark, sfDir)}%.2f s")
      case "stream_indicators_bulk" =>
        println(f"[scratch] stream_indicators_bulk: ${Bench.streamReplay(spark, sfDir, batches = 4)}%.2f s")
      case "stream_docs" =>
        println(f"[scratch] stream_docs: ${Bench.docStreamReplay(spark, sfDir)}%.2f s")
      case _ =>
        // time construction + count, like Bench: iterative operators
        // (PageRank, MMR, BPE) execute eagerly during construction
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val n = df.count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[scratch] $name: $n rows in $secs%.2f s")
        if (sys.env.contains("SCRATCH_EXPLAIN")) df.explain("formatted")
    }
    spark.stop()
  }
}
