package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) — the storage/dedup primitive behind
  * rsync, LBFS, and every deduplicating object store: cut each document
  * where a rolling hash of the trailing `w` characters satisfies
  * `hash % mask == 0`, so chunk boundaries move WITH the content. An
  * insertion early in a document shifts every byte after it, but the
  * boundaries re-align within one window — unlike fixed-size blocks,
  * where one inserted byte invalidates every later block. Chunk-level
  * dedup across a 100 TB corpus then reduces to a hash agg on the chunk
  * fingerprints.
  *
  * The rolling hash is the polynomial window hash, made POSITION-FREE
  * (that is the content-defined part) with precomputed power tables:
  * {{{
  *   Q(i)  = Σ_(j<=i) c_j·p^j  mod M        (one cumulative window sum)
  *   C(i)  = (Q(i) − Q(i−w)) · p^(−(i−w+1)) mod M
  *         = Σ_(t=0..w−1) c_(i−w+1+t)·p^t   mod M   — content only
  * }}}
  * with p = 69069, M = 2^31 − 1 (prime, so p is invertible;
  * p^(−1) = 567364253). `p^j mod M` and `p^(−j) mod M` are constant
  * metadata tables (one row per text position, built once and broadcast
  * — the [[IvfIndex]] codebook pattern). All arithmetic stays in int64:
  * terms < 256·M, the 16-term window sum < 16·256·M, the inverse
  * multiply < M² < 2^62.
  *
  * Published caveat, embraced: plain CDC (no min/max chunk bounds) is
  * what keeps every stage window-expressible — one exchange on doc_id
  * carries the explode, both window sums and the chunk reduction.
  * Min/max bounds make boundary(i) depend on the previous boundary
  * (inherently sequential); FastCDC applies them in a per-doc pass —
  * if needed, fold chunks per doc afterwards (they are already
  * ordered), merging runt chunks locally.
  *
  * Chunk fingerprints are position-rebased exact moments
  * (`Σc`, `Σc·(j−start+1)`, `Σc·(j−start+1)²`), computed from global
  * moments by the binomial shift — identical chunk CONTENT gives
  * identical fingerprints at any offset. Headroom: Σc·j² < 256·L³/3 —
  * safe to L ≈ 3e5-char documents; split longer docs upstream.
  */
object CdcChunk {

  val P: Long = 69069L
  val M: Long = 2147483647L // 2^31 - 1
  val PInv: Long = 567364253L // P * PInv ≡ 1 (mod M)

  /** Power tables (j, pw = p^j mod M, ipw = p^(-j) mod M) for
    * j = 1..maxLen — constant mechanism metadata.
    */
  def powerRows(maxLen: Int): IndexedSeq[(Long, Long, Long)] = {
    val b = Vector.newBuilder[(Long, Long, Long)]
    var pw = 1L
    var ipw = 1L
    var j = 1
    while (j <= maxLen) {
      pw = pw * P % M
      ipw = ipw * PInv % M
      b += ((j.toLong, pw, ipw))
      j += 1
    }
    b.result()
  }

  /** Chunk fingerprints only — [[chunks]] without the corpus-wide
    * `n_same` count join: (doc_id, chunk_id, start_pos, chunk_len, s0,
    * fp1, fp2). The frame the chunk-level dedup index
    * ([[ChunkDedup]]) and the streaming substring gate build on.
    */
  def fingerprints(docs: DataFrame, w: Int = 16, mask: Long = 64L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // max text length: 1-row metadata fetch (the BpeTrainer convention)
    // sizing the constant power tables
    val maxLen = docs.agg(max(length(col("text")))).as[Int].head()
    val pw = spark.createDataFrame(powerRows(maxLen))
      .toDF("j", "pw", "ipw")
    val ch = docs
      .select(col("doc_id"), posexplode(split(col("text"), "")))
      .filter(col("col") =!= "") // Spark's split keeps a trailing empty
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("j"),
        (ascii(col("col")) % 256).cast("long").as("cc"))
      .join(broadcast(pw), "j")
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("j"))
    val wTrail = wOrd.rowsBetween(-(w - 1), 0)
    val wPrior = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val hashed = ch
      .withColumn("qdiff", sum(col("cc") * col("pw") % lit(M)).over(wTrail))
      // rebase by p^(-(i-w+1)): ipw of the window's first position,
      // carried on the current row via lag-free arithmetic — ipw(i-w+1)
      // = ipw(i) * pw(w-1) mod M (constant pw^(w-1) folds the shift)
      .withColumn("chash",
        col("qdiff") % lit(M) * (col("ipw") * lit(powConst(w - 1)) % lit(M))
          % lit(M))
      .withColumn("boundary",
        (col("j") >= w && col("chash") % mask === 0L).cast("int"))
    val withChunk = hashed
      .withColumn("chunk_id",
        coalesce(sum(col("boundary")).over(wPrior), lit(0L)))
    withChunk
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(min(col("j")).as("start_pos"),
        count(lit(1)).as("chunk_len"),
        sum(col("cc")).as("s0"),
        sum(col("cc") * col("j")).as("s1"),
        sum(col("cc") * col("j") * col("j")).as("s2"))
      .select(col("doc_id"), col("chunk_id"), col("start_pos"),
        col("chunk_len"), col("s0"),
        (col("s1") - (col("start_pos") - 1) * col("s0")).as("fp1"),
        (col("s2") - lit(2) * (col("start_pos") - 1) * col("s1")
          + (col("start_pos") - 1) * (col("start_pos") - 1) * col("s0"))
          .as("fp2"))
  }

  /** Chunk `docs` (columns: doc_id, text) with window `w` and boundary
    * condition `contentHash % mask == 0` (expected chunk size ≈ mask).
    * Output: (doc_id, chunk_id, start_pos, chunk_len, fp1, fp2, n_same)
    * — n_same = corpus-wide count of chunks with identical
    * (chunk_len, Σc, fp1, fp2), the dedup signal.
    */
  def chunks(docs: DataFrame, w: Int = 16, mask: Long = 64L): DataFrame = {
    val agg = fingerprints(docs, w, mask)
    val cnt = agg.groupBy(
        col("chunk_len").as("g_len"), col("s0").as("g_s0"),
        col("fp1").as("g_fp1"), col("fp2").as("g_fp2"))
      .agg(count(lit(1)).as("n_same"))
    agg.join(cnt,
        col("chunk_len") === col("g_len") && col("s0") === col("g_s0") &&
          col("fp1") === col("g_fp1") && col("fp2") === col("g_fp2"))
      .select(col("doc_id"), col("chunk_id"), col("start_pos"),
        col("chunk_len"), col("s0"), col("fp1"), col("fp2"), col("n_same"))
  }

  /** p^e mod M for small constant e (table-free). */
  def powConst(e: Int): Long = {
    var r = 1L
    var i = 0
    while (i < e) { r = r * P % M; i += 1 }
    r
  }

  /** The [[fingerprints]] chain as DuckDB CTEs (through `agg`) — shared
    * by [[oracleSql]] and the chunk-gate oracle (`q_substr_gate`).
    * Positions come from the power CTE itself (a range join on
    * j <= length — DuckDB's range() cannot take correlated arguments,
    * NOTES.md); power tables from a recursive CTE.
    */
  def oracleFingerprintCtes(w: Int = 16, mask: Long = 64L): String =
    s"""mx AS (SELECT max(length(text)) AS m FROM documents),
       |pw(j, v, iv) AS (
       |  SELECT CAST(1 AS BIGINT), CAST($P AS BIGINT), CAST($PInv AS BIGINT)
       |  UNION ALL SELECT j + 1, (v * $P) % $M, (iv * $PInv) % $M
       |  FROM pw WHERE j < (SELECT m FROM mx)
       |), ch AS (
       |  SELECT doc_id, pw.j,
       |    ascii(substr(text, CAST(pw.j AS INTEGER), 1)) % 256 AS cc,
       |    pw.v, pw.iv
       |  FROM documents JOIN pw ON pw.j <= length(text)
       |), hashed AS (
       |  SELECT doc_id, j, cc,
       |    CAST(sum(cc * v % $M) OVER wt AS BIGINT) % $M
       |      * (iv * ${powConst(w - 1)} % $M) % $M AS chash
       |  FROM ch
       |  WINDOW wt AS (PARTITION BY doc_id ORDER BY j
       |                ROWS BETWEEN ${w - 1} PRECEDING AND CURRENT ROW)
       |), flagged AS (
       |  SELECT doc_id, j, cc,
       |    CASE WHEN j >= $w AND chash % $mask = 0 THEN 1 ELSE 0 END
       |      AS boundary
       |  FROM hashed
       |), wc AS (
       |  SELECT doc_id, j, cc,
       |    CAST(COALESCE(sum(boundary) OVER (PARTITION BY doc_id
       |      ORDER BY j ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |      0) AS BIGINT) AS chunk_id
       |  FROM flagged
       |), agg AS (
       |  SELECT doc_id, chunk_id, min(j) AS start_pos,
       |    CAST(count(*) AS BIGINT) AS chunk_len,
       |    CAST(sum(cc) AS BIGINT) AS s0,
       |    CAST(sum(cc * j) AS BIGINT)
       |      - (min(j) - 1) * CAST(sum(cc) AS BIGINT) AS fp1,
       |    CAST(sum(cc * j * j) AS BIGINT)
       |      - 2 * (min(j) - 1) * CAST(sum(cc * j) AS BIGINT)
       |      + (min(j) - 1) * (min(j) - 1) * CAST(sum(cc) AS BIGINT) AS fp2
       |  FROM wc GROUP BY doc_id, chunk_id
       |)""".stripMargin

  /** The identical [[chunks]] pipeline as DuckDB SQL over a `documents`
    * relation (doc_id, text).
    */
  def oracleSql(w: Int = 16, mask: Long = 64L): String =
    s"""${oracleFingerprintCtes(w, mask)}, cnt AS (
       |  SELECT chunk_len AS g_len, s0 AS g_s0, fp1 AS g_fp1, fp2 AS g_fp2,
       |    CAST(count(*) AS BIGINT) AS n_same
       |  FROM agg GROUP BY 1, 2, 3, 4
       |)
       |SELECT doc_id, chunk_id, start_pos, chunk_len, s0, fp1, fp2, n_same
       |FROM agg JOIN cnt ON chunk_len = g_len AND s0 = g_s0
       |  AND fp1 = g_fp1 AND fp2 = g_fp2""".stripMargin

  /** ROW-LOCAL chunker: the same boundaries and fingerprints as
    * [[fingerprints]], computed entirely inside one row as an
    * array<struct> column `chunksCol` — no window, no metadata action —
    * so it is legal on a STREAMING DataFrame (the batch chain needs a
    * whole-partition window and a max-length head(), both disallowed on
    * streams). Cost is O(w·L) per doc for the rolling hashes plus O(L)
    * for the moments, vs the batch chain's O(L) rows through one
    * exchange — the row-local form trades w× arithmetic for zero
    * shuffle, the right trade inside a micro-batch.
    * [[graft.ops.CdcChunkSpec]] pins the two chunkers equal row-for-row.
    *
    * Struct fields: (chunk_id, start_pos, chunk_len, s0, fp1, fp2) —
    * chunk_id 0-based in document order, exactly the batch columns.
    * Empty text yields an empty array (the batch chain emits no rows).
    */
  def withChunkStructs(
      df: DataFrame,
      text: String = "text",
      chunksCol: String = "__chunks",
      w: Int = 16,
      mask: Long = 64L): DataFrame = {
    // p^t mod M for t = 0..w-1 as one literal array (constant-folded):
    // chash(i) = sum_t cc(i-w+1+t)·p^t mod M — the position-free window
    // hash the batch chain reaches via the qdiff·p^(-(i-w+1)) rebase
    val pwLit = (0 until w).map(powConst).mkString("array(", "L, ", "L)")
    // GOTCHA (measured, not theoretical): binding the intermediate
    // arrays as COLUMNS hangs — CollapseProject inlines each alias into
    // every reference site, and element_at(<inlined transform>, j)
    // inside a lambda then rebuilds the whole O(L) array PER ACCESS
    // (CSE does not reach inside lambda bodies — the NearDup lesson),
    // turning the chunker into O(w·L²)/doc. The let-binding idiom
    // `element_at(transform(array(x), v -> body), 1)` evaluates x ONCE
    // and gives body a cheap lambda-variable reference instead.
    def let(valueExpr: String, varName: String, body: String): String =
      s"element_at(transform(array($valueExpr), $varName -> $body), 1)"
    val cs =
      s"CASE WHEN length($text) >= 1 THEN " +
        s"transform(sequence(1, length($text)), " +
        s"j -> CAST(ascii(substr($text, j, 1)) % 256 AS BIGINT)) " +
        "ELSE CAST(array() AS ARRAY<BIGINT>) END"
    val bp =
      s"CASE WHEN size(cs) >= $w THEN " +
        s"filter(sequence($w, size(cs)), i -> " +
        s"aggregate(sequence(0, ${w - 1}), CAST(0 AS BIGINT), " +
        s"(acc, t) -> (acc + element_at(cs, i - ${w - 1} + t) " +
        s"* element_at($pwLit, t + 1)) % ${M}L) % ${mask}L = 0) " +
        "ELSE CAST(array() AS ARRAY<INT>) END"
    val st =
      s"filter(concat(array(1), transform($bp, i -> i + 1)), " +
        "s -> s <= size(cs))"
    val en =
      "transform(sequence(1, size(st)), k -> " +
        "CASE WHEN k < size(st) THEN element_at(st, k + 1) - 1 " +
        "ELSE size(cs) END)"
    val chunksFromEn =
      "transform(sequence(1, size(st)), k -> named_struct(" +
        "'chunk_id', CAST(k - 1 AS BIGINT), " +
        "'start_pos', CAST(element_at(st, k) AS BIGINT), " +
        "'chunk_len', CAST(element_at(en, k) - element_at(st, k) + 1 AS BIGINT), " +
        "'s0', aggregate(sequence(element_at(st, k), element_at(en, k)), " +
        "CAST(0 AS BIGINT), (a, j) -> a + element_at(cs, j)), " +
        "'fp1', aggregate(sequence(element_at(st, k), element_at(en, k)), " +
        "CAST(0 AS BIGINT), (a, j) -> a + element_at(cs, j) " +
        "* (j - element_at(st, k) + 1)), " +
        "'fp2', aggregate(sequence(element_at(st, k), element_at(en, k)), " +
        "CAST(0 AS BIGINT), (a, j) -> a + element_at(cs, j) " +
        "* (j - element_at(st, k) + 1) * (j - element_at(st, k) + 1))))"
    val emptyChunks =
      "CAST(array() AS ARRAY<STRUCT<chunk_id: BIGINT, start_pos: BIGINT, " +
        "chunk_len: BIGINT, s0: BIGINT, fp1: BIGINT, fp2: BIGINT>>)"
    val body = // st in scope: guard sequence(1, size(st)) against size 0
      s"CASE WHEN size(st) >= 1 THEN ${let(en, "en", chunksFromEn)} " +
        s"ELSE $emptyChunks END"
    df.withColumn(chunksCol,
      expr(let(cs, "cs", let(st, "st", body))))
  }
}
