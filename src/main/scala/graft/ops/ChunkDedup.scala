package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chunk-fingerprint substring dedup — the SA-free incremental tier of
  * the ExactSubstr family: instead of a generalized suffix array over
  * corpus ∪ incoming (a full rebuild per ingest batch,
  * [[SuffixArray]]), the corpus's content-defined chunks
  * ([[CdcChunk]]) are indexed ONCE by exact fingerprint, and each
  * incoming document is chunked the same way and probed against the
  * index — a verbatim span ≥ one chunk (expected `mask` chars)
  * re-aligns to identical boundaries within one rolling-hash window of
  * its start (the CDC property), so long copied substrings surface as
  * matched chunks regardless of their offset in the new document. The
  * per-doc verdict is duplication COVERAGE (matched chars / chunked
  * chars), the Lee et al. 2022 duplication-coverage signal at chunk
  * granularity; `q_dup_coverage` is the exact batch twin at suffix
  * granularity, and the resolution trade is what buys the O(batch)
  * incremental cost.
  *
  * Scale shape: the index is one row per DISTINCT chunk fingerprint
  * (min corpus doc id as the witness) — persist it bucketed by
  * fingerprint and an ingest batch probes only its buckets; the probe
  * is |batch chunks| rows against that equi-key, never corpus×corpus,
  * and never a suffix-array rebuild. The streaming twin
  * ([[graft.streaming.SubstrDedupGate]]) runs the identical math
  * per micro-batch with the row-local chunker.
  */
object ChunkDedup {

  /** is_dup threshold on the 1e6-fixed-point duplicated-char fraction:
    * ≥ half the chunked characters appear verbatim in the corpus.
    */
  val DupFracFpThreshold = 500000L

  /** Fingerprint index over a corpus chunk-fingerprint frame
    * ([[CdcChunk.fingerprints]]): one row per distinct
    * (chunk_len, s0, fp1, fp2) with the min corpus doc id as witness —
    * the frame to persist bucketed by the fingerprint columns.
    */
  def indexOf(corpusFps: DataFrame): DataFrame =
    corpusFps
      .groupBy(col("chunk_len"), col("s0"), col("fp1"), col("fp2"))
      .agg(min(col("doc_id")).as("corpus_id"))

  /** Per-doc substring-duplication verdicts for an incoming
    * chunk-fingerprint frame probed against [[indexOf]]'s index:
    * (doc_id, n_chunks, n_dup_chunks, dup_chars, n_chars_chunked,
    * dup_frac_fp, matched_corpus_id, is_dup). One left equi-join on the
    * fingerprint plus one doc-keyed agg — both linear in the incoming
    * chunk count.
    */
  def verdicts(incomingFps: DataFrame, index: DataFrame): DataFrame =
    incomingFps
      .join(index, Seq("chunk_len", "s0", "fp1", "fp2"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        count(col("corpus_id")).as("n_dup_chunks"),
        coalesce(sum(when(col("corpus_id").isNotNull, col("chunk_len"))),
          lit(0L)).as("dup_chars"),
        sum(col("chunk_len")).as("n_chars_chunked"),
        min(col("corpus_id")).as("matched_corpus_id"))
      .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
        col("dup_chars"), col("n_chars_chunked"),
        expr("dup_chars * 1000000 div n_chars_chunked").as("dup_frac_fp"),
        col("matched_corpus_id"),
        expr(s"dup_chars * 1000000 div n_chars_chunked " +
          s">= $DupFracFpThreshold").as("is_dup"))
}
