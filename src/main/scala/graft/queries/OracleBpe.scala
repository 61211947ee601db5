package graft.queries

/** DuckDB oracle for the BPE trainer ([[graft.ops.BpeTrainer]]) — the
  * k merge rounds unrolled into per-round CTEs, the same construction as
  * [[OracleKmeans]]'s Lloyd unroll.
  *
  * DuckDB's `list_reduce` cannot carry an array accumulator, so the
  * greedy left-to-right merge fold is replayed RELATIONALLY instead:
  * explode every word into (position, symbol) rows, mark positions where
  * (sym[i], sym[i+1]) equals the round's winning pair, and resolve
  * overlapping matches by the gaps-and-islands parity rule — within a
  * run of consecutive matching positions (which can only happen when
  * left = right), exactly the even offsets merge. That is provably the
  * same outcome as the serial fold: a merged symbol `left||right` can
  * never re-match as `left` within the pass (it would need an empty
  * `right`), so the only intra-pass interaction is the equal-symbol run
  * the parity rule resolves.
  *
  * Every CTE is MATERIALIZED: `w{r}` and `m{r}` are each referenced
  * twice, and without the hint DuckDB inlines the chain into a tree that
  * grows 2^k scans of the documents table.
  */
private[queries] object OracleBpe {

  /** WITH-body CTEs `w0 .. w{k}` (the evolving symbol table) and
    * `pc{r}` / `m{r}` (pair counts / winning merge) per round. After k
    * rounds `w{k}.syms` IS the trained tokenization of every distinct
    * word, and `m0..m{k-1}` are the learned merges.
    */
  def trainCtes(k: Int): String = {
    val b = new StringBuilder
    b ++= """w0 AS MATERIALIZED (
      |  SELECT word, CAST(count(*) AS BIGINT) AS n, string_split(word, '') AS syms
      |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |  WHERE length(word) > 0 GROUP BY word
      |)""".stripMargin
    for (r <- 0 until k) {
      b ++= s""",
        |pc$r AS MATERIALIZED (
        |  SELECT syms[i] AS "left", syms[i + 1] AS "right",
        |    CAST(sum(n) AS BIGINT) AS cnt
        |  FROM w$r, unnest(range(1, len(syms))) t(i)
        |  GROUP BY 1, 2
        |),
        |m$r AS MATERIALIZED (
        |  SELECT "left", "right", cnt FROM pc$r
        |  ORDER BY cnt DESC, "left", "right" LIMIT 1
        |),
        |w${r + 1} AS MATERIALIZED (
        |  SELECT word, min(n) AS n,
        |    list(CASE WHEN taken = 1 THEN sym2 ELSE sym END ORDER BY i) AS syms
        |  FROM (
        |    SELECT word, n, i, sym, sym2, taken,
        |      coalesce(lag(taken) OVER (PARTITION BY word ORDER BY i), 0)
        |        AS prev_taken
        |    FROM (
        |      SELECT word, n, i, sym, sym2,
        |        CASE WHEN hit = 1
        |             AND (i - min(i) OVER (PARTITION BY word, isl)) % 2 = 0
        |             THEN 1 ELSE 0 END AS taken
        |      FROM (
        |        SELECT word, n, i, sym, sym2, hit,
        |          CASE WHEN hit = 1
        |               THEN i - row_number() OVER (PARTITION BY word, hit ORDER BY i)
        |          END AS isl
        |        FROM (
        |          SELECT w.word, w.n, t.i, w.syms[t.i] AS sym,
        |            w.syms[t.i] || coalesce(w.syms[t.i + 1], '') AS sym2,
        |            CASE WHEN t.i < len(w.syms) AND w.syms[t.i] = m."left"
        |                 AND w.syms[t.i + 1] = m."right" THEN 1 ELSE 0 END AS hit
        |          FROM w$r w CROSS JOIN m$r m, unnest(range(1, len(w.syms) + 1)) t(i)
        |        )
        |      )
        |    )
        |  ) WHERE prev_taken = 0 GROUP BY word
        |)""".stripMargin
    }
    b.toString
  }

  /** Final select for the merge table: (rank, left, right, count). */
  def mergesSelect(k: Int): String =
    (0 until k)
      .map(r =>
        s"""SELECT CAST($r AS INTEGER) AS "rank", "left", "right",
           |  CAST(cnt AS BIGINT) AS "count" FROM m$r""".stripMargin)
      .mkString("\nUNION ALL\n")

  /** Final CTEs + select for corpus tokenization with the k trained
    * merges: (doc_id, n_tokens, tokens_joined) — per-doc reassembly of
    * `w{k}.syms` in word-position order.
    */
  def tokenizeSelect(k: Int): String =
    s""",
       |docw AS (
       |  SELECT doc_id, u.i AS pos, ss[u.i] AS word
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ss FROM documents),
       |       unnest(range(1, len(ss) + 1)) u(i)
       |  WHERE length(ss[u.i]) > 0
       |),
       |tok AS (
       |  SELECT d.doc_id, flatten(list(w.syms ORDER BY d.pos)) AS tokens
       |  FROM docw d JOIN w$k w USING (word)
       |  GROUP BY d.doc_id
       |)
       |SELECT doc.doc_id, CAST(coalesce(len(t.tokens), 0) AS INTEGER) AS n_tokens,
       |  coalesce(array_to_string(t.tokens, ' '), '') AS tokens_joined
       |FROM documents doc LEFT JOIN tok t USING (doc_id)""".stripMargin
}
