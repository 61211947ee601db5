package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Suffix-array-driven repeated-span REMOVAL — the apply step that turns
  * [[RepeatedSpans]]'s detection report into cleaned documents, i.e. the
  * full ExactSubstr dedup of Lee et al. 2021 ("Deduplicating Training
  * Data Makes Language Models Better") at character granularity, next to
  * [[SpanDedup]]'s token-shingle approximation.
  *
  * Semantics (keep-earliest per adjacent pair): every adjacent suffix
  * pair with a common prefix >= minLen marks ONE victim — the occurrence
  * with the LARGER (doc_id, pos) — for removal of exactly the common
  * prefix (capped at `cap`, the [[RepeatedSpans]] report contract). The
  * doc-order-FIRST occurrence within any run of equal prefixes is never
  * that run's victim, so a canonical copy of every repeated span
  * survives its own run's removals (it may still be trimmed by a
  * different overlapping repeat — the same caveat as the reference
  * implementation). Victim intervals are DISTINCTed (two pairs can mark
  * the same interval; see q_dup_coverage's nondeterministic-island
  * lesson), merged per document with the standard gaps-and-islands
  * windows, and the surviving segments are reassembled in position
  * order.
  *
  * Scale shape: [[RepeatedSpans.find]] (suffix sort + neighbor scan —
  * no all-pairs work) plus per-DOCUMENT windows and one per-document
  * aggregation; nothing global. Segment reassembly buffers only a
  * document's own O(#islands) segments.
  */
object SaDedup {

  /** Clean `docs` (columns: id, text). Returns one row per input doc:
    * (doc_id, n_chars, n_removed, clean_text) — untouched docs pass
    * through whole; fully-repeated docs come back as the empty string.
    *
    * (r8 had a `shareKey` opting into a module-level memo of the spans
    * frame shared with q_dup_coverage — removed in r9: a cross-query
    * result memo keyed on the input identity is exactly the
    * precomputation the bench contract forbids. Every invocation now
    * computes its own spans from the inputs.)
    */
  def clean(
      docs: DataFrame,
      minLen: Int = 16,
      cap: Int = 64): DataFrame = {
    val spans = RepeatedSpans.find(docs, minLen, cap)

    // one victim interval per pair: the doc-order-later occurrence,
    // covering [st, en) in 1-based character positions
    val victims = spans
      .select(
        when(col("doc_a") > col("doc_b")
            || (col("doc_a") === col("doc_b") && col("pos_a") > col("pos_b")),
          struct(col("doc_a").as("doc_id"), col("pos_a").as("st")))
          .otherwise(
            struct(col("doc_b").as("doc_id"), col("pos_b").as("st")))
          .as("v"),
        col("span_len"))
      .select(col("v.doc_id").as("doc_id"), col("v.st").as("st"),
        (col("v.st") + col("span_len")).as("en"))
      .distinct() // load-bearing: tied (st, en) rows break island totality

    val wPrev = Window.partitionBy(col("doc_id"))
      .orderBy(col("st"), col("en"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy(col("doc_id"))
      .orderBy(col("st"), col("en"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val islands = victims
      .withColumn("b",
        when(col("st") > coalesce(max(col("en")).over(wPrev), lit(-1L)),
          1L).otherwise(0L))
      .withColumn("island", sum(col("b")).over(wCum))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("st")).as("mn"), max(col("en")).as("mx"))

    // kept segments: the gap before each island + one terminal segment
    // from the last island's end to end-of-doc (len + 1 exclusive)
    val wIsl = Window.partitionBy(col("doc_id")).orderBy(col("mn"))
    val gaps = islands
      .select(col("doc_id"),
        coalesce(lag(col("mx"), 1).over(wIsl), lit(1L)).as("s"),
        col("mn").as("e"))
    val docLen = docs.select(col("id").as("doc_id"),
      col("text"), length(col("text")).cast("long").as("len"))
    val terminal = islands
      .groupBy(col("doc_id"))
      .agg(max(col("mx")).as("s"), sum(col("mx") - col("mn")).as("n_removed"))
      .join(docLen.select(col("doc_id"), col("len")), Seq("doc_id"))
      .select(col("doc_id"), col("s"), (col("len") + 1L).as("e"),
        col("n_removed"))

    val segs = gaps.unionByName(terminal.drop("n_removed"))
      .filter(col("e") > col("s"))
    val reassembled = segs
      .join(docLen.select(col("doc_id"), col("text")), Seq("doc_id"))
      .select(col("doc_id"), col("s"),
        expr("substring(text, CAST(s AS INT), CAST(e - s AS INT))").as("seg"))
      .groupBy(col("doc_id"))
      .agg(expr(
        "array_join(transform(array_sort(collect_list(struct(s, seg)))," +
          " x -> x.seg), '')").as("ct"))

    docLen
      .join(terminal.select(col("doc_id"), col("n_removed")),
        Seq("doc_id"), "left")
      .join(reassembled, Seq("doc_id"), "left")
      .select(col("doc_id"), col("len").as("n_chars"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        when(col("n_removed").isNull, col("text"))
          .otherwise(coalesce(col("ct"), lit(""))).as("clean_text"))
  }
}
