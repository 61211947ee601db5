package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer training — the vocabulary-
  * construction pass of an LLM data pipeline, run where the data is
  * instead of funneling word counts to one machine.
  *
  * Standard character-level BPE over a word-frequency table (the
  * Sennrich et al. 2016 formulation): start from single characters,
  * repeatedly merge the most frequent adjacent symbol pair, greedy
  * left-to-right within words. Fully deterministic: ties on pair count
  * break to the lexicographically smallest (left, right) pair.
  *
  * Scale shape per iteration (k iterations for k merges):
  *   - adjacent-pair counts: explode ~1 row per symbol position of each
  *     DISTINCT word (weighted by word count — the corpus itself is never
  *     re-scanned after the initial word count), ONE hash agg with
  *     map-side combine;
  *   - winner selection: TakeOrdered(1) — a 1-row driver fetch per round,
  *     the merge RULE is driver state exactly like a k-means codebook;
  *   - merge application: per-row greedy fold over the symbol array
  *     (SQL `aggregate` HOF, codegen-friendly, no UDF).
  *
  * The word table stays cached between rounds; only its symbol arrays
  * change. (A delta optimization — re-folding only words that contain
  * the merged pair — drops per-round cost further; omitted for clarity
  * since the pair-count agg dominates.)
  */
object BpeTrainer {

  /** One learned merge: rank 0 is the first (most frequent) merge. */
  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** Greedy left-to-right application of one merge to the symbol-array
    * expression `in`, as a SQL fold: append each symbol, but if the
    * accumulator ends with `left` and the incoming symbol is `right`,
    * replace the tail with the merged symbol. Overlapping runs resolve
    * left-first ("aaa" under (a,a) -> ["aa", "a"]), matching the serial
    * reference.
    */
  private def applyMergeExpr(in: String, left: String, right: String): String = {
    def q(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
    s"""aggregate($in, CAST(array() AS ARRAY<STRING>),
       |  (acc, x) -> CASE
       |    WHEN size(acc) > 0 AND element_at(acc, -1) = '${q(left)}'
       |         AND x = '${q(right)}'
       |    THEN concat(slice(acc, 1, size(acc) - 1),
       |                array('${q(left)}${q(right)}'))
       |    ELSE concat(acc, array(x)) END)""".stripMargin
  }

  /** Distinct words of a whitespace-tokenized text column with corpus
    * frequencies, split into single-character symbol arrays.
    */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .withColumn("syms", split(col("word"), ""))

  /** Learns `k` merges. Returns the ordered merge table.
    *
    * Each round `localCheckpoint`s the (small, distinct-word) table: the
    * nested `aggregate` fold expressions would otherwise accumulate
    * across rounds into one arbitrarily deep tree after project-collapse
    * — analysis and codegen blow up long before the data does. The
    * checkpoint truncates lineage so every round plans O(1) expressions.
    */
  def train(words: DataFrame, k: Int): Seq[Merge] = {
    var cur = words.select(col("word"), col("n"), col("syms"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < k && !done) {
      val top = pairCounts(cur)
        .orderBy(col("cnt").desc, col("left"), col("right"))
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val row = top.head
        val (l, r, c) =
          (row.getString(0), row.getString(1), row.getLong(2))
        merges += Merge(rank, l, r, c)
        val next = cur
          .withColumn("syms", expr(applyMergeExpr("syms", l, r)))
          .localCheckpoint(true)
        cur.unpersist()
        cur = next
        rank += 1
      }
    }
    cur.unpersist()
    merges.result()
  }

  /** How many merge folds to chain before cutting lineage: deep enough to
    * amortize the materialization, shallow enough that the collapsed
    * nested-`aggregate` expression stays cheap to analyze and codegen.
    */
  private val MergeChunk = 6

  /** Tokenizes `docs` with an already-learned merge sequence. The folds
    * run over the DISTINCT-word table only (merges never cross word
    * boundaries, so a word's tokenization is context-free); the corpus
    * itself is tokenized by ONE broadcast join word -> tokens and a
    * per-doc reassembly — at 100 TB the expensive fold touches merely
    * the vocabulary, never the corpus. Returns (idCol, original
    * columns..., tokens array).
    */
  def tokenize(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val words = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .distinct()
      .withColumn("syms", split(col("word"), ""))
    val folded = merges.sortBy(_.rank).grouped(MergeChunk)
      .foldLeft(words) { (df, chunk) =>
        chunk.foldLeft(df) { (d, m) =>
          d.withColumn("syms", expr(applyMergeExpr("syms", m.left, m.right)))
        }.localCheckpoint(true)
      }
    val positioned = docs
      .select(col(idCol),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "word")))
      .filter(length(col("word")) > 0)
    val perDoc = positioned
      .join(broadcast(folded), "word")
      .groupBy(col(idCol))
      .agg(
        flatten(transform(
          array_sort(collect_list(struct(col("pos"), col("syms")))),
          x => x.getField("syms"))).as("tokens"))
    docs
      .join(perDoc, Seq(idCol), "left")
      .withColumn("tokens",
        coalesce(col("tokens"), expr("CAST(array() AS ARRAY<STRING>)")))
  }

  /** Weighted adjacent-pair counts over the current symbol arrays. */
  private def pairCounts(cur: DataFrame): DataFrame =
    cur
      .filter(size(col("syms")) >= 2)
      .select(col("n"),
        explode(expr(
          """transform(sequence(1, size(syms) - 1),
            |  i -> struct(element_at(syms, i) AS left,
            |              element_at(syms, i + 1) AS right))""".stripMargin))
          .as("p"))
      .groupBy(col("p.left").as("left"), col("p.right").as("right"))
      .agg(sum(col("n")).as("cnt"))

  /** The merge table as a DataFrame (for the oracle surface). */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF()
  }
}
