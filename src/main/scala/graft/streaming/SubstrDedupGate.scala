package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.{CdcChunk, ChunkDedup}

/** Streaming SUBSTRING-dedup gate — the SA-free incremental twin of the
  * batch ExactSubstr tier ([[graft.ops.SaDedup]] rebuilds a generalized
  * suffix array per corpus; no streaming shape of that exists anywhere):
  * each arriving document is content-defined-chunked ROW-LOCALLY
  * ([[CdcChunk.withChunkStructs]] — the window-free chunker, legal on a
  * stream and spec-pinned equal to the batch chain), its chunk
  * fingerprints are probed against a STATIC corpus chunk index
  * ([[ChunkDedup.indexOf]]), and one verdict row per document reports
  * duplication coverage: how many of its characters sit in chunks that
  * appear verbatim in the corpus.
  *
  * Shape: row-local chunk explode → stream-static left equi-join on the
  * fingerprint → per-doc reassembly via flatMapGroupsWithState with NO
  * retained state (all chunks of a doc arrive in its own micro-batch,
  * so the group fold emits on arrival and stores nothing — the
  * [[StreamingIndicators]] dedup-gate precedent). Restart cost nil; at
  * 100 TB the index is a persisted table bucketed by fingerprint,
  * refreshed by a periodic batch job, exactly like
  * [[CrossDedupGate]]'s band index.
  *
  * Documents with EMPTY text produce no chunks and no verdict (the
  * batch twin chunks nothing for them either); filter upstream.
  * [[ChunkDedup.verdicts]] is the batch twin; the parity spec pins the
  * two equal doc-for-doc across micro-batch splits.
  */
object SubstrDedupGate {

  /** One probed chunk of an in-flight document. */
  final case class ChunkProbe(
      doc_id: Long, ingest_ts: Timestamp, chunk_len: Long,
      corpus_id: Option[Long])

  /** Per-document verdict — the [[ChunkDedup.verdicts]] columns plus
    * the arrival timestamp.
    */
  final case class Verdict(
      doc_id: Long, ingest_ts: Timestamp, n_chunks: Long,
      n_dup_chunks: Long, dup_chars: Long, n_chars_chunked: Long,
      dup_frac_fp: Long, matched_corpus_id: Option[Long], is_dup: Boolean)

  /** Build the static corpus chunk-fingerprint index the gate probes
    * (one row per distinct fingerprint, min corpus doc id as witness).
    */
  def corpusIndex(
      corpusDocs: DataFrame, w: Int = 16, mask: Long = 64L): DataFrame =
    ChunkDedup.indexOf(CdcChunk.fingerprints(
      corpusDocs.select(col("doc_id"), col("text")), w, mask))

  private def fold(
      docId: Long, rows: Iterator[ChunkProbe],
      state: GroupState[Long]): Iterator[Verdict] = {
    val cs = rows.toSeq
    if (cs.isEmpty) Iterator.empty
    else {
      val dup = cs.filter(_.corpus_id.isDefined)
      val dupChars = dup.map(_.chunk_len).sum
      val total = cs.map(_.chunk_len).sum
      val fracFp = dupChars * 1000000L / total
      Iterator.single(Verdict(
        docId, cs.head.ingest_ts, cs.size.toLong, dup.size.toLong,
        dupChars, total, fracFp,
        if (dup.isEmpty) None else Some(dup.flatMap(_.corpus_id).min),
        fracFp >= ChunkDedup.DupFracFpThreshold))
    }
  }

  /** Gate a document stream against a static chunk index built by
    * [[corpusIndex]]: append-mode, one [[Verdict]] per document with at
    * least one chunk, emitted in its arrival micro-batch.
    */
  def gate(
      docs: Dataset[DocStream.DocEvent],
      index: DataFrame,
      w: Int = 16,
      mask: Long = 64L): Dataset[Verdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val chunked = CdcChunk
      .withChunkStructs(docs.toDF(), "text", "__chunks", w, mask)
      .select(col("doc_id"), col("ingest_ts"),
        explode(col("__chunks")).as("c"))
      .select(col("doc_id"), col("ingest_ts"),
        col("c.chunk_len").as("chunk_len"), col("c.s0").as("s0"),
        col("c.fp1").as("fp1"), col("c.fp2").as("fp2"))
    val probed = chunked
      .join(index, Seq("chunk_len", "s0", "fp1", "fp2"), "left")
      .select(col("doc_id"), col("ingest_ts"), col("chunk_len"),
        col("corpus_id"))
      .as[ChunkProbe]
    probed
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState[Long, Verdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(fold)
  }
}
