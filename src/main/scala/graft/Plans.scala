package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump the executed (AQE-final) formatted plans of the headline queries —
  * the artifact behind "explain, then iterate until it's the plan you'd
  * want". Usage: `runMain graft.Plans <sfDir> [out.md]`.
  */
object Plans {

  val headline: Seq[String] = Seq(
    "q_indicators", // 1 shuffle, 3 cascaded windows, codegen
    "q1_pricing", // scan -> partial agg -> exchange -> final agg
    "q5_local_supplier", // all dims broadcast, fact never re-shuffled
    "q_agg_avg", // pushdown + column pruning at the scan
    "q_knn_lsh", // broadcast probes, bucket-equality join
    "q_minhash_pairs", // ReusedExchange on the signature subtree
    "q_simhash_pairs", // band LSH join, no nested-loop
    "q_top_orders", // TakeOrderedAndProject, no global sort
    "q_media_frames", // codegen'd binary slicing + posexplode
    "q_minmax_norm", // grouped stats + broadcast join, NO whole-partition window
    "q_histogram", // same two-pass shape
    "q_knn_ivf", // k-means codebook broadcast, single corpus pass
    "q_dedup_embedding", // banded-LSH equality join, linear candidates
    "q_quantize_embeddings", // row-local quantize, corpus never shuffled
    "q_sample_per_group", // threshold prune, window on survivors only
    "q_pattern_match", // distributed TakeOrdered top-k, rank on 10 rows
    "q_knn_ivfpq", // cell-keyed codes stream vs broadcast probes + ADC table
    "q_knn_classify_ann", // IVF-PQ search -> partial-aggregable vote
    "q_rollup_incremental", // batch-sized delta aggs, keys-sized merge
    "q_expectations", // one-scan conditional counts + broadcast FK anti join
    "q_nb_classify", // vocab-bounded model joins, argmax as agg (no window)
    "q_countmin", // O(d*w) sketch broadcast into the estimate join
    "q_triangles", // degree-ordered wedge join + closing-edge semi join
    "q_phrase_search", // positional adjacency equi joins, broadcast queries
    "q_scd2_history", // two windows share ONE (user_id) exchange
    "q_perceptron", // broadcast d-row model, partial-aggregable margins/update
    "q_pca_power", // row-local d^2 terms, ONE d^2-key exchange, broadcast proj
    "q_hard_negatives", // broadcast anchors, one corpus scan, top-4 window
    "q_dbscan_grid", // cell-grid aggs + CC on core cells, no point pairs
    "q_holt", // one symbol-key exchange, typed O(1)-state fold
    "q_dist_drift", // one tokenize pass, conditional aggs, TakeOrdered(30)
    "q_para_dedup", // paragraph hash agg + keep-join, ordered reassembly
    "q_lttb", // checkpointed candidates x two broadcast frames per round
    "q_moving_median", // symbol-key exchange, bounded 7-row frames
    "q_conformal", // per-type aggs, rank window PARTITIONED by type
    "q_t_closeness", // shrinking cascade aggs + broadcast 1-row global
    "q_scc", // log n doubling joins, epilogue checkpointed in-width
    "q_isotonic", // <=21-row bin frame: bounded minimax joins only
    "q_cdc_chunks", // ONE doc_id exchange: explode + 2 window sums + chunk agg
    "q_kaplan_meier", // corpus-sized subject agg, life-table-sized fold
    "q_link_pred", // capped wedge self-join, ReusedExchange both probes
    "q_stress", // frontier-sized grouped joins, pinned edge partitioning
    "q_psi", // grid windows + 9-row broadcast bin assignment
    "q_graph_embed", // walk argmin rounds, then metadata-only PPMI iteration
    "q_kmv", // WindowGroupLimit partial top-k before the shuffle
    "q_winnow_pairs", // fingerprint equi-join + df cap, no all-pairs
    "q_skew_profile", // fan-out histogram window, never a corpus rank
    "q_kn_score", // partial-aggregable counts, 1-row broadcast total
    "q_katz", // materialized symmetric edges, 1 join + groupBy sum per round
    "q_theta_intersect", // K-row sketches via WindowGroupLimit, pairwise on <=K*types rows
    "q_skip_stats", // shared quantize frame, two bounded file aggs, broadcast stats
    "q_lsh_scurve", // band join + rare-shingle blocking, both linear in postings
    "q_knn_mplsh", // Hamming-1 probe fan-out stays on the broadcast side
    "q_robust_scaler", // ONE type exchange, broadcast quartiles back
    "q_table_checksum", // commutative mod-sum, pure scan+agg
    "q_croston", // part-key exchange, typed O(1)-state fold
    "q_fdr", // one partial-agg data pass, BH on the hypothesis grid
    "q_did", // one partial-agg pass + 1-row cutoff broadcast
    "q_interleave", // broadcast query batch, rank windows, per-query fold
    "q_bowtie", // Scc doubling + 1-row largest-cycle argmax broadcast
    "q_repeated_spans", // SA + distributed lead + row-local bounded LCP
    "q_dup_coverage", // span intervals, DISTINCT + per-doc island windows
    "q_emd_drift", // type-partitioned CDF windows, no global sort
    "q_pacf", // one symbol exchange + lag windows, DL on the 5-row frame
    "q_sa_dedup", // shared SA spans, per-doc islands, ordered reassembly
    "q_neg_samples", // bucketed equi-join searchsorted, vocab-only window
    "q_phrase_segment", // 3 inventory aggs + equi-joins, O(1)/doc fold
    "q_good_turing", // vocab agg -> spectrum agg -> spectrum self-join
    "q_bleu", // one gram explode/side, (pair,n,gram) equi-join, pivot agg
    "q_rouge_l", // pair equi-join, row-local codegen LCS, no DP shuffle
    "q_ams_f2", // one scan partial-agged on 16 estimator keys
    "q_mmd_drift", // one outer-product explode, (h,idx) agg, d^2-bounded diff
    "q_shapley", // user_id journey windows, 2^C lattice on broadcast frames
    "q_ipw", // one user agg, 4-row bin table, broadcast scalars
    "q_linkage_em", // blocked pair equi-join, EM on the 8-row pattern frame
    "q_priority_sample", // TakeOrdered(k+1), 101-row rank window, broadcast tau
    "q_wordpiece", // vocab-bounded bestLen join + log-rounds pointer doubling
    "q_sinkhorn_ot", // 15 materialized scaling rounds, bin-grid-sized joins only
    "q_token_f1", // pair equi-join on tokens, partial-aggregable overlap counts
    "q_brier_decomp" // one partial-agg pass, decomposition on the bin frame
  )

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) Some(args(1)) else None
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sb = new StringBuilder
    sb.append("# Physical plans (AQE-final, formatted) — headline queries\n\n")
    sb.append(s"Scale dir: `$sfDir`. Regenerate: " +
      "`sbt 'runMain graft.Plans <sfDir> PLANS.md'`.\n")
    headline.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // finalize AQE
      val plan = df.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      sb.append(s"\n## $name\n\n```\n$plan```\n")
    }
    out match {
      case Some(path) =>
        java.nio.file.Files.writeString(java.nio.file.Paths.get(path), sb.toString)
        println(s"[plans] wrote $path")
      case None => println(sb.toString)
    }
    spark.stop()
  }
}
