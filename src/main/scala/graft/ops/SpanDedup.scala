package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Repeated-span removal — substring-level dedup in the style of
  * "Deduplicating Training Data Makes Language Models Better" (Lee et al.,
  * 2022), approximated at token n-gram granularity (the Bloom-free exact
  * variant of what dolma/bff do): any n-token span whose exact text occurs
  * more than once in the corpus is removed from every occurrence EXCEPT the
  * globally first one (min (doc_id, start)), and overlapping/adjacent
  * removal spans are merged per document.
  *
  * Document-level dedup (exact, MinHash, SimHash — [[NearDup]]) misses
  * boilerplate duplicated INSIDE otherwise-distinct documents (headers,
  * license blocks, templated paragraphs); this operator is the standard
  * complement that removes those while keeping one canonical copy.
  *
  * Scale shape (everything linear in corpus token count):
  *   1. positioned n-grams: explode ~1 row per token — no pairwise work;
  *   2. occurrence counts + global-first occurrence: ONE hash aggregation
  *      keyed by the gram text (partial map-side combine; the argmin
  *      travels as a partial-aggregable `min(encoded key)`). At 100 TB
  *      you'd key the shuffle by a 128-bit gram hash instead of the text
  *      to cut shuffle bytes — kept as the exact string here so the gate
  *      is collision-free by construction;
  *   3. mark non-first occurrences via an equi-join back on the gram;
  *   4. merge spans per doc: classic gaps-and-islands — running max of
  *      span end over a window partitioned by doc_id (bounded state,
  *      O(1)/row);
  *   5. (apply) removal positions explode to at most one row per corpus
  *      token, anti-joined against token positions — linear, no range
  *      join.
  *
  * Hot-gram skew (a boilerplate block repeated millions of times) lands on
  * single aggregation keys: counts stay cheap (partial aggregation), and
  * the mark join is a shuffle join AQE splits on skew.
  */
object SpanDedup {

  /** Encodes (doc_id, start) as one orderable BIGINT so the global-first
    * occurrence travels through `min()`. Token positions fit 2^20 (a 1M-
    * token document) with doc ids up to 2^43.
    */
  private val PosBits = 20

  /** Merged removal spans, one row per (doc_id, island):
    * (doc_id, span_start, span_end, span_len) — token positions, 0-based
    * inclusive.
    *
    * @param docs frame with an id column and a whitespace-tokenized text
    *             column
    * @param n    span granularity in tokens (8 is the Lee-et-al.-ish
    *             sweet spot: long enough to be rarely coincidental, short
    *             enough to catch templated boilerplate)
    */
  def removalSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    require(n >= 2, s"span length must be >= 2 tokens, got $n")
    val occ = positionedGrams(docs, idCol, textCol, n)

    val stats = occ
      .groupBy(col("gram"))
      .agg(
        count(lit(1)).as("n_occ"),
        min(shiftleft(col("doc_id"), PosBits) + col("start")).as("first_key"))
      .filter(col("n_occ") >= 2)

    val marked = occ
      .join(stats, "gram")
      .filter(shiftleft(col("doc_id"), PosBits) + col("start") =!= col("first_key"))
      .select(col("doc_id"), col("start"), (col("start") + n - 1).as("end"))

    // gaps-and-islands: a span opens a new island iff it starts beyond
    // the running max end + 1 (merging overlapping AND adjacent spans)
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("start"))
    val prevMax =
      max(col("end")).over(wOrd.rowsBetween(Window.unboundedPreceding, -1))
    marked
      .withColumn("is_new",
        when(prevMax.isNull || col("start") > prevMax + 1, 1L).otherwise(0L))
      .withColumn("island",
        sum(col("is_new")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("island"))
      .agg(
        min(col("start")).as("span_start"),
        max(col("end")).as("span_end"),
        (max(col("end")) - min(col("start")) + 1).as("span_len"))
      .drop("island")
  }

  /** Applies removal spans: deletes the marked token ranges and reassembles
    * each document. Returns (doc_id, n_toks, n_kept, clean_text) for EVERY
    * input document — untouched docs pass through whole; fully-duplicated
    * docs come back as the empty string.
    */
  def removeSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    val spans = removalSpans(docs, idCol, textCol, n)

    // removal positions: at most one row per corpus token — linear, and
    // the span containment check becomes an equi anti-join on (doc, pos)
    val removedPos = spans.select(
      col("doc_id").as("r_doc"),
      explode(sequence(col("span_start"), col("span_end"))).as("r_pos"))

    val positions = docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))

    val kept = positions
      .join(removedPos,
        col("doc_id") === col("r_doc") && col("pos") === col("r_pos"),
        "left_anti")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok")),
          " ").as("clean_text"))

    docs
      .select(col(idCol).as("doc_id"),
        size(split(col(textCol), " ")).as("n_toks"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_toks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** (doc_id, start, gram): every n-token span with its 0-based start. */
  private def positionedGrams(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("toks"))
      .withColumn("n_toks", size(col("toks")))
      .filter(col("n_toks") >= n)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), col("n_toks") - n)).as("start"))
      .select(col("doc_id"), col("start"),
        array_join(slice(col("toks"), col("start") + 1, lit(n)), " ").as("gram"))
}
