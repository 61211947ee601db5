package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Paragraph-level dedup — the granularity between document-level
  * ([[NearDup]], exact hash) and token-span-level ([[SpanDedup]]) dedup:
  * split each document on a paragraph separator, drop every exact
  * paragraph occurrence EXCEPT the globally first one (min (doc_id,
  * position)), and reassemble the surviving paragraphs in order.
  *
  * This is the standard treatment for boilerplate that repeats as whole
  * paragraphs across a crawl (license headers, navigation blocks,
  * templated intros — the dolma "paragraph dedup" stage): span-level
  * dedup would shred them into n-gram islands, document-level dedup
  * misses them entirely because the surrounding text differs.
  *
  * Scale shape (linear in corpus paragraph count):
  *   1. positioned paragraphs: one `posexplode` row per paragraph — no
  *      pairwise work;
  *   2. global-first occurrence: ONE hash aggregation keyed by the
  *      paragraph text (map-side partial `min` of the encoded
  *      (doc, pos) key). At 100 TB you would key the shuffle by a
  *      128-bit paragraph hash to cut shuffle bytes — kept as the exact
  *      string here so the oracle gate is collision-free by
  *      construction;
  *   3. keep-filter via an equi-join back on the paragraph text (AQE
  *      splits hot boilerplate keys);
  *   4. reassembly: one ordered hash aggregation per document.
  * No windows over unbounded input, no driver-side state.
  */
object ParaDedup {

  /** Encodes (doc_id, pos) as one orderable BIGINT so the global-first
    * occurrence travels through a partial-aggregable `min()`. Positions
    * fit 2^20 (a million-paragraph document) with ids up to 2^43 — the
    * same packing contract as [[SpanDedup]].
    */
  private val PosBits = 20

  /** Per-document dedup result: (doc_id, n_paras, n_kept, clean_text).
    * Every input document comes back — untouched docs pass through
    * whole; docs whose every paragraph already occurred earlier come
    * back as the empty string.
    *
    * @param docs frame with an id column and a text column whose
    *             paragraphs are separated by `sep`
    * @param sep  paragraph separator, treated literally (default: one
    *             blank line)
    */
  def dedupParagraphs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sep: String = "\n\n"): DataFrame = {
    val src = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))

    val paras = src.select(
      col("doc_id"),
      posexplode(split(col("text"), java.util.regex.Pattern.quote(sep)))
        .as(Seq("pos", "para")))

    val firsts = paras
      .groupBy(col("para"))
      .agg(min(shiftleft(col("doc_id"), PosBits) + col("pos")).as("first_key"))

    val kept = paras
      .join(firsts, "para")
      .filter(shiftleft(col("doc_id"), PosBits) + col("pos") === col("first_key"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("para")))),
            x => x.getField("para")),
          sep).as("clean_text"))

    src
      .select(col("doc_id"),
        size(split(col("text"), java.util.regex.Pattern.quote(sep)))
          .cast("long").as("n_paras"))
      .join(kept, Seq("doc_id"), "left")
      .select(
        col("doc_id").as(idCol), col("n_paras"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
