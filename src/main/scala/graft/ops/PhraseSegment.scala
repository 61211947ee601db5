package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Optimal phrase segmentation under a unigram-LM piece inventory — the
  * Viterbi step of SentencePiece's unigram tokenizer (Kudo 2018) at
  * token granularity: the piece inventory is every corpus unigram plus
  * every bigram/trigram occurring >= 2 times, piece cost is the
  * 1e6-quantized negative log unigram-LM probability, and each document
  * is segmented into the piece sequence minimizing total cost by the
  * classical lattice DP
  * {{{
  *   v(i) = min over L in 1..3, piece(i-L+1..i) in inventory:
  *            v(i-L) + cost(piece)
  * }}}
  * The corpus diagnostic this yields — optimal segment count and cost
  * per document — is the "how much does a phrase inventory compress
  * this text" measurement behind tokenizer-fertility and
  * phrase-mining decisions (q_token_fertility, q_pmi_phrases).
  *
  * Exactness: piece costs are integers (floor(-ln(c/T)·1e6), the one
  * identical-op-order double, the q_lm_score convention); the DP state
  * is a single packed int64 `total_cost_fp * 2^20 + n_pieces`, so one
  * integer `min` is simultaneously the cost minimum and the
  * piece-count tiebreak (lexicographic, deterministic at any
  * parallelism). Bounds: cost <= ~28e6/piece, docs <= 2^20 tokens,
  * packed <= ~3e15 — no overflow; INF = 2^63/4 spelled identically on
  * both engines.
  *
  * Scale shape: gram counting is three hash aggs (inventory-bounded
  * outputs); per-position piece costs are three equi-joins (broadcast
  * while the inventory is small, shuffled hash otherwise — never
  * all-pairs); then ONE shuffle on doc_id and an O(1)-state ordered
  * fold per document (the [[Holt]]/[[Viterbi]] plane — only the last
  * three packed values are carried). The oracle replays the fold as a
  * recursive CTE carrying (v1, v2, v3) columns over a MATERIALIZED
  * per-position cost table (the round-8 CTE-inlining lesson).
  */
object PhraseSegment {

  val Inf = 2305843009213693951L // 2^63 / 4, same literal in the oracle

  /** Fold row (public for the Catalyst deserializer); pcN = -1 when the
    * N-gram ending at rn is not in the inventory.
    */
  case class PosRow(doc_id: Long, rn: Long, pc1: Long, pc2: Long, pc3: Long)

  /** Segment `docs` (columns: doc_id, text). Output one row per
    * non-empty doc: (doc_id, n_toks, cost_fp, n_pieces).
    */
  def segment(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("p0"))
    val positions = docs
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("p0", "tok")))
      .filter(col("tok") =!= "")
      .withColumn("rn", row_number().over(wDoc).cast("long"))
      .withColumn("g2",
        concat_ws(" ", lag(col("tok"), 1).over(wDoc), col("tok")))
      .withColumn("g3",
        concat_ws(" ", lag(col("tok"), 2).over(wDoc),
          lag(col("tok"), 1).over(wDoc), col("tok")))
      .select(col("doc_id"), col("rn"), col("tok"),
        when(col("rn") >= 2, col("g2")).as("g2"),
        when(col("rn") >= 3, col("g3")).as("g3"))

    val u = positions.groupBy(col("tok").as("g"))
      .agg(count(lit(1)).as("c"))
    val b2 = positions.filter(col("rn") >= 2).groupBy(col("g2").as("g"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
    val b3 = positions.filter(col("rn") >= 3).groupBy(col("g3").as("g"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
    val inventory = u.unionByName(b2).unionByName(b3)
    val tot = inventory.agg(sum(col("c")).as("t"))
    val costs = inventory.crossJoin(broadcast(tot))
      .select(col("g"),
        expr("CAST(floor(-ln(c * 1e0 / t) * 1e6) AS BIGINT)").as("cost"))

    def probe(gram: String, out: String) = {
      val c = costs.select(col("g").as(s"${out}_g"), col("cost").as(out))
      (df: DataFrame) => df
        .join(c, col(gram) === col(s"${out}_g"), "left")
        .drop(s"${out}_g")
    }
    val mat = probe("tok", "c1")(probe("g2", "c2")(probe("g3", "c3")(
        positions)))
      .select(col("doc_id"), col("rn"),
        coalesce(col("c1"), lit(-1L)).as("pc1"),
        coalesce(col("c2"), lit(-1L)).as("pc2"),
        coalesce(col("c3"), lit(-1L)).as("pc3"))

    mat.as[PosRow]
      .groupByKey(_.doc_id)
      .flatMapSortedGroups($"rn") { (id, it) =>
        var v1 = 0L // v(i-1); before the first row, v(0) = 0
        var v2 = Inf
        var v3 = Inf
        var n = 0L
        var last = 0L
        it.foreach { r =>
          val c1 = if (r.pc1 >= 0) v1 + r.pc1 * 1048576L + 1L else Inf
          val c2 = if (r.pc2 >= 0) v2 + r.pc2 * 1048576L + 1L else Inf
          val c3 = if (r.pc3 >= 0) v3 + r.pc3 * 1048576L + 1L else Inf
          val v = math.min(c1, math.min(c2, c3))
          v3 = v2; v2 = v1; v1 = v
          n += 1
          last = v
        }
        Iterator.single((id, n, last / 1048576L, last % 1048576L))
      }
      .toDF("doc_id", "n_toks", "cost_fp", "n_pieces")
  }

  /** The identical DP as DuckDB CTEs over a `graft_seg_pos`
    * (doc_id, rn, pc1, pc2, pc3) relation (costs -1 when absent) —
    * ends selecting (doc_id, n_toks, cost_fp, n_pieces). Callers must
    * declare `graft_seg_pos` AS MATERIALIZED.
    */
  def oracleSql: String =
    s"""seg(doc_id, rn, v1, v2, v3) AS (
       |  SELECT doc_id, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
       |    CAST($Inf AS BIGINT), CAST($Inf AS BIGINT)
       |  FROM (SELECT DISTINCT doc_id FROM graft_seg_pos)
       |  UNION ALL
       |  SELECT m.doc_id, m.rn,
       |    least(
       |      CASE WHEN m.pc1 >= 0 THEN s.v1 + m.pc1 * 1048576 + 1
       |           ELSE $Inf END,
       |      CASE WHEN m.pc2 >= 0 THEN s.v2 + m.pc2 * 1048576 + 1
       |           ELSE $Inf END,
       |      CASE WHEN m.pc3 >= 0 THEN s.v3 + m.pc3 * 1048576 + 1
       |           ELSE $Inf END),
       |    s.v1, s.v2
       |  FROM seg s JOIN graft_seg_pos m
       |    ON m.doc_id = s.doc_id AND m.rn = s.rn + 1
       |), segm AS MATERIALIZED (
       |  SELECT * FROM seg
       |), mx AS (
       |  SELECT doc_id, max(rn) AS t FROM segm GROUP BY doc_id
       |)
       |SELECT s.doc_id, mx.t AS n_toks,
       |  s.v1 // 1048576 AS cost_fp, s.v1 % 1048576 AS n_pieces
       |FROM segm s JOIN mx ON mx.doc_id = s.doc_id AND s.rn = mx.t
       |WHERE mx.t >= 1""".stripMargin
}
