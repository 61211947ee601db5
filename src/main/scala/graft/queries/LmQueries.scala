package graft.queries

import org.apache.spark.sql.functions._

import graft.model.Tables

/** Distribution-based corpus scoring: n-gram language-model perplexity
  * (the classic "KenLM quality filter" shape — train a smoothed bigram
  * model on the corpus, score every document by average negative log
  * likelihood) and DSIR-style importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling":
  * hashed n-gram features, importance weight = log-ratio of target vs
  * raw feature distributions, keep the top-weighted documents).
  *
  * Cross-engine exactness: every `ln` term is quantized to an integer
  * (`floor(x * 1e6)`) BEFORE any order-dependent summation — per-doc
  * and per-corpus scores are exact integer sums of per-feature
  * integers (the `Num` scheme; the only float risk is a 1-ulp `ln`
  * divergence landing exactly on the 1e-6 grid).
  *
  * Scale shape (100 TB audit): model training is one groupBy over
  * exploded n-grams (output bounded by vocab^2, not corpus size);
  * scoring joins per-doc n-gram counts against the model — a
  * broadcast join while the model is vocab-bounded, degrading to a
  * plain shuffled hash join (never all-pairs) if the vocabulary is
  * open. No driver collect anywhere; document scores are
  * partial-aggregable integer sums.
  */
object LmQueries {

  private val B = 64L // DSIR feature-hash buckets

  val all: Seq[QueryDef] = Seq(

    // ---- PPMI spectral word embedding ([[graft.ops.PpmiEmbed]]):
    //      windowed (±2) co-occurrence counts → positive-PMI weighting
    //      → dominant spectral direction by fixed-point power iteration
    //      — the count-based word-vector construction (Levy & Goldberg:
    //      PPMI-SVD ≈ implicit word2vec), trained entirely on-engine.
    //      Corpus-sized work = one pair explode + one hash agg;
    //      iteration runs on the top-150 vocab (M ≤ 150² metadata) ----
    QueryDef.sql(
      "q_ppmi_embed",
      s"WITH ${graft.ops.PpmiEmbed.oracleSql()}"
    ) { (s, d) =>
      graft.ops.PpmiEmbed.run(
        Tables.documents(s, d).select(col("doc_id"), col("text")))
      // no plan-intent declaration: the iteration frames are
      // IvfIndex.materialize local relations (metadata-bounded), so no
      // nested-loop join survives into the final plan
    },

    // ---- bigram LM with add-one smoothing, trained on the corpus,
    //      scoring every doc: nll_fp = sum over bigram occurrences of
    //      floor(-ln((c2+1)/(c1+V)) * 1e6); avg_nll = nll_fp/n_bg.
    //      Bigrams are formed row-locally from the token array (zero
    //      shuffle until the count aggregations) ----
    QueryDef.sql(
      "q_lm_score",
      """WITH docs AS (
        |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2
        |), bg AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(2, len(l) + 1),
        |      i -> l[i - 1] || ' ' || l[i])) AS bigram
        |  FROM docs
        |), dbg AS (
        |  SELECT doc_id, bigram, count(*) AS cnt FROM bg
        |  GROUP BY doc_id, bigram
        |), c2 AS (
        |  SELECT bigram, CAST(sum(cnt) AS BIGINT) AS c2 FROM dbg GROUP BY bigram
        |), c1 AS (
        |  SELECT string_split(bigram, ' ')[1] AS w1,
        |    CAST(sum(c2) AS BIGINT) AS c1
        |  FROM c2 GROUP BY string_split(bigram, ' ')[1]
        |), vocab AS (
        |  SELECT count(DISTINCT term) AS v FROM (
        |    SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |), model AS (
        |  SELECT c2.bigram,
        |    CAST(floor(-ln((c2.c2 + 1e0) / (c1.c1 + vocab.v)) * 1e6)
        |      AS BIGINT) AS nll1m
        |  FROM c2 JOIN c1 ON string_split(c2.bigram, ' ')[1] = c1.w1
        |  CROSS JOIN vocab
        |)
        |SELECT dbg.doc_id,
        |  CAST(sum(dbg.cnt) AS BIGINT) AS n_bg,
        |  CAST(sum(dbg.cnt * model.nll1m) AS BIGINT) AS nll_fp,
        |  CAST(sum(dbg.cnt * model.nll1m) AS BIGINT)
        |    / (CAST(sum(dbg.cnt) AS BIGINT) * 1e6) AS avg_nll
        |FROM dbg JOIN model USING (bigram)
        |GROUP BY dbg.doc_id""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("l"))
        .filter(size(col("l")) >= 2)
      val bg = docs.select(col("doc_id"),
        explode(expr(
          "transform(sequence(2, size(l)), i -> concat(element_at(l, i - 1), ' ', element_at(l, i)))"
        )).as("bigram"))
      val dbg = bg.groupBy(col("doc_id"), col("bigram"))
        .agg(count(lit(1)).as("cnt"))
      val c2 = dbg.groupBy(col("bigram")).agg(sum(col("cnt")).as("c2"))
      val c1 = c2.groupBy(expr("split(bigram, ' ')[0]").as("w1"))
        .agg(sum(col("c2")).as("c1"))
      val vocab = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("term"))
        .agg(countDistinct(col("term")).as("v"))
      val model = c2
        .join(c1, expr("split(bigram, ' ')[0]") === c1("w1"))
        .crossJoin(broadcast(vocab))
        .select(col("bigram"),
          floor(-log((col("c2") + lit(1.0)) / (col("c1") + col("v"))) * lit(1e6))
            .cast("long").as("nll1m"))
      dbg.join(model, Seq("bigram"))
        .groupBy(col("doc_id"))
        .agg(
          sum(col("cnt")).as("n_bg"),
          sum(col("cnt") * col("nll1m")).as("nll_fp"))
        .select(col("doc_id"), col("n_bg"), col("nll_fp"),
          (col("nll_fp") / (col("n_bg") * lit(1e6))).as("avg_nll"))
    }.intendsNestedLoop(
      "cross join against the broadcast 1-row vocabulary-size scalar frame"),

    // ---- DSIR importance resampling: features = md5-hashed unigrams
    //      into 64 buckets; target distribution = English docs, raw =
    //      whole corpus, add-one smoothing over the bucket space;
    //      doc weight = sum of per-token quantized log-ratios; keep
    //      the top-100 by (weight, doc_id) via TakeOrdered — no global
    //      window, no driver collect ----
    QueryDef.sql(
      "q_dsir_sample",
      s"""WITH tok AS (
         |  SELECT doc_id, lang,
         |    CAST(concat('0x', substr(md5(term), 1, 15)) AS BIGINT) % $B
         |      AS bucket
         |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
         |        FROM documents)
         |), raw AS (
         |  SELECT bucket, count(*) AS cr FROM tok GROUP BY bucket
         |), tgt AS (
         |  SELECT bucket, count(*) AS ct FROM tok WHERE lang = 'en'
         |  GROUP BY bucket
         |), tot AS (
         |  SELECT CAST(count(*) AS BIGINT) AS r_n,
         |    CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS t_n
         |  FROM tok
         |), lr AS (
         |  SELECT raw.bucket,
         |    CAST(floor(ln(((COALESCE(tgt.ct, 0) + 1e0) / (tot.t_n + $B))
         |      / ((raw.cr + 1e0) / (tot.r_n + $B))) * 1e6) AS BIGINT)
         |      AS lr1m
         |  FROM raw LEFT JOIN tgt ON raw.bucket = tgt.bucket CROSS JOIN tot
         |), dw AS (
         |  SELECT tok.doc_id, CAST(sum(lr.lr1m) AS BIGINT) AS w_fp
         |  FROM tok JOIN lr ON tok.bucket = lr.bucket
         |  GROUP BY tok.doc_id
         |)
         |SELECT doc_id, w_fp FROM dw
         |ORDER BY w_fp DESC, doc_id LIMIT 100""".stripMargin
    ) { (s, d) =>
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("term"))
        .withColumn("bucket", expr(s"md5p60(term) % $B"))
      val raw = tok.groupBy(col("bucket")).agg(count(lit(1)).as("cr"))
      val tgt = tok.filter(col("lang") === "en")
        .groupBy(col("bucket")).agg(count(lit(1)).as("ct"))
      val tot = tok.agg(
        count(lit(1)).as("r_n"),
        count(when(col("lang") === "en", 1)).as("t_n"))
      val lr = raw
        .join(tgt, Seq("bucket"), "left")
        .crossJoin(broadcast(tot))
        .select(col("bucket"),
          floor(log(((coalesce(col("ct"), lit(0)) + lit(1.0)) / (col("t_n") + lit(B)))
            / ((col("cr") + lit(1.0)) / (col("r_n") + lit(B)))) * lit(1e6))
            .cast("long").as("lr1m"))
      tok.join(broadcast(lr), Seq("bucket"))
        .groupBy(col("doc_id"))
        .agg(sum(col("lr1m")).as("w_fp"))
        .orderBy(col("w_fp").desc, col("doc_id"))
        .limit(100)
        .select("doc_id", "w_fp")
    }.intendsNestedLoop(
      "cross join against the broadcast 1-row token-total scalar frame")
  )
}
