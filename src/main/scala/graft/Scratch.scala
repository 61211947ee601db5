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
      // ANN quality at scale (VERDICT r6 item 4): IVF-PQ recall@10 vs
      // exact brute-force cosine on a sampled query set, at whatever
      // corpus SPARK_GRAFT_SF_DIR points to (.sfdata/emb128k for the
      // n=128k record). Production params (nprobe=4) plus widened probes
      // — on the near-random synthetic embeddings recall tracks the
      // scanned fraction (no cluster structure to exploit; see
      // IvfRecallSpec), so the sweep shows the recall/scan trade-off.
      case "ann_recall" =>
        annRecall(spark, sfDir)
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

  /** Measure IVF-PQ recall@10 against exact brute force. One index
    * build, then a probe-width sweep; prints recall + scanned-fraction
    * per nprobe (BASELINE.md records the result).
    */
  private def annRecall(spark: org.apache.spark.sql.SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import graft.functions.VecOps
    import graft.ops.{IvfPq, Pq}

    val raw = graft.model.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val norm = raw.select(col("vec_id"),
      Pq.normalized(col("embedding")).as("embedding"))
    val n = raw.count()
    val nQ = 32
    val topK = 10
    val qPred = col("vec_id") < nQ

    // exact truth: broadcast the 32 queries, one corpus scan, top-10
    val q = raw.filter(qPred)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("c_id"))
    val truth = raw
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      .crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cosine", VecOps.cosine(col("q_emb"), col("c_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("q_id", "c_id").collect()
      .groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    println(s"[scratch] ann_recall: n=$n, ${truth.size} queries, exact truth done")

    val t0 = System.nanoTime()
    val idx = IvfPq.build(raw, norm)
    val cells = idx.coarse.count()
    println(f"[scratch] ann_recall: index built (cells=$cells) in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val t1 = System.nanoTime()
    // residual twin shares the coarse chain (the expensive Lloyd)
    val ridx = IvfPq.buildResidual(raw, norm,
      reuse = Some((idx.coarse, idx.cells)))
    ridx.cellCodes.count() // force the residual codebook build inside the timer
    println(f"[scratch] ann_recall: residual index built in ${(System.nanoTime() - t1) / 1e9}%.1f s")

    def measure(tag: String, nprobe: Int, shortlist: Int,
        run: (Int, Int) => org.apache.spark.sql.DataFrame): Unit = {
      val got = run(nprobe, shortlist)
        .select("q_id", "c_id").collect()
        .groupBy(_.getLong(0))
        .map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
      val recall = truth.keys.toSeq
        .map(qid => (truth(qid) & got.getOrElse(qid, Set.empty)).size.toDouble / topK)
        .sum / truth.size
      println(f"[scratch] ann_recall[$tag]: nprobe=$nprobe%2d shortlist=$shortlist%4d (scan ~${100.0 * nprobe / cells}%.1f%%) recall@10 = $recall%.3f")
    }
    for (shortlist <- Seq(8 * topK, 64 * topK); nprobe <- Seq(4, 16, 64)) {
      measure("plain", nprobe, shortlist, (np, sl) =>
        IvfPq.search(idx, raw, Pq.M, qPred, nprobe = np, topK = topK, shortlist = sl))
      measure("resid", nprobe, shortlist, (np, sl) =>
        IvfPq.searchResidual(ridx, raw, Pq.M, qPred, nprobe = np, topK = topK, shortlist = sl))
    }
  }
}
