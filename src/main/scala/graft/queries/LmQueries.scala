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
      "cross join against the broadcast 1-row token-total scalar frame"),

    // ---- Good-Turing frequency re-estimation over the corpus unigram
    //      distribution: counts-of-counts S(r), the Turing estimate
    //      r* = (r+1)·S(r+1)/S(r), per-count-class probability mass
    //      r·S(r)/N, and the unseen-event mass P0 = S(1)/N — the
    //      smoothing foundation under Katz backoff and the standard
    //      "how much probability should the LM reserve for words it
    //      has never seen" diagnostic next to q_kn_score's KN model.
    //      S(r+1) = 0 (a gap in the count-of-count spectrum) yields
    //      rstar_fp = 0, the classic raw-GT artifact smoothed variants
    //      interpolate over — reported raw, as the diagnostic should.
    //      All integer: counts, counts-of-counts, and 1e6-fp ratios by
    //      truncating division. Headroom: r·S(r) ≤ N, so the worst
    //      numerator is ~2N·1e6 — safe to ~4.6e12 corpus tokens.
    //      Scale shape: token explode → ONE hash agg (vocab-bounded
    //      output) → ONE hash agg (count-spectrum-bounded output, at
    //      most max-count rows) → a self equi-join on r+1 over that
    //      tiny spectrum + a broadcast 1-row total. Nothing after the
    //      first agg is corpus-sized ----
    QueryDef.sql(
      "q_good_turing",
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
        |), tc AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS r
        |  FROM toks WHERE tok <> '' GROUP BY tok
        |), coc AS (
        |  SELECT r, CAST(count(*) AS BIGINT) AS s_r FROM tc GROUP BY r
        |), tot AS (
        |  SELECT CAST(sum(r * s_r) AS BIGINT) AS n,
        |    CAST(COALESCE(sum(CASE WHEN r = 1 THEN s_r END), 0) AS BIGINT)
        |      AS s1
        |  FROM coc
        |)
        |SELECT a.r, a.s_r, COALESCE(b.s_r, 0) AS s_r1,
        |  ((a.r + 1) * COALESCE(b.s_r, 0) * 1000000) // a.s_r AS rstar_fp,
        |  (a.r * a.s_r * 1000000) // t.n AS mass_fp,
        |  (t.s1 * 1000000) // t.n AS p0_fp
        |FROM coc a LEFT JOIN coc b ON b.r = a.r + 1
        |CROSS JOIN tot t""".stripMargin
    ) { (s, d) =>
      val tc = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("tok")).agg(count(lit(1)).as("r"))
      val coc = tc.groupBy(col("r")).agg(count(lit(1)).as("s_r"))
      val tot = coc.agg(
        sum(col("r") * col("s_r")).as("n"),
        coalesce(sum(when(col("r") === 1, col("s_r"))), lit(0L)).as("s1"))
      coc
        .join(broadcast(coc.select(col("r").as("rn"), col("s_r").as("s_r1"))),
          col("rn") === col("r") + 1, "left")
        .crossJoin(broadcast(tot))
        .select(col("r"), col("s_r"),
          coalesce(col("s_r1"), lit(0L)).as("s_r1"),
          expr("((r + 1) * coalesce(s_r1, 0L) * 1000000L) div s_r")
            .as("rstar_fp"),
          expr("(r * s_r * 1000000L) div n").as("mass_fp"),
          expr("(s1 * 1000000L) div n").as("p0_fp"))
    }.intendsNestedLoop(
      "cross join against the broadcast 1-row corpus-total scalar frame"),

    // ---- Negative-sampling table (word2vec/SGNS training-data prep):
    //      k deterministic negatives per sampled center-token
    //      occurrence, drawn from the unigram^(3/4) distribution
    //      (Mikolov et al. 2013's noise distribution). EXACT integer
    //      weights: w = floor((c^3)^(1/4)) computed as a float-pow
    //      first guess corrected over ±2 by exact int64 fourth-power
    //      compares — identical cross-engine even when pow() differs by
    //      an ulp; counts clamped at 2e6 for the weight (the frequent-
    //      word damping role of word2vec's subsampling; keeps c^3 and
    //      (r+2)^4 inside int64). Draw u = md5p60(doc:pos:slot:try) %
    //      W inverted against the cumulative weight ranges by a
    //      BUCKETED EQUI-JOIN searchsorted: ranges explode to the
    //      ~(V + B) bucket rows they overlap, probes join on their
    //      single bucket — never a range/nested-loop join, no global
    //      probe-side window. A draw landing on its own center is
    //      re-drawn once (try 1, kept either way — the word2vec
    //      resample loop truncated at one deterministic retry).
    //      Scale shape: vocab agg (bounded), cumulative window over
    //      the VOCAB only, probe explode is (sampled centers × k × 2)
    //      rows — linear, equi-join only ----
    QueryDef.sql(
      "q_neg_samples",
      """WITH tc AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok
        |        FROM documents) WHERE tok <> '' GROUP BY tok
        |), wt AS (
        |  SELECT tok,
        |    CASE
        |      WHEN (r0+2)*(r0+2)*(r0+2)*(r0+2) <= cc*cc*cc THEN r0+2
        |      WHEN (r0+1)*(r0+1)*(r0+1)*(r0+1) <= cc*cc*cc THEN r0+1
        |      WHEN r0*r0*r0*r0 <= cc*cc*cc THEN r0
        |      WHEN (r0-1)*(r0-1)*(r0-1)*(r0-1) <= cc*cc*cc THEN r0-1
        |      ELSE r0-2 END AS w
        |  FROM (SELECT tok, least(c, 2000000) AS cc,
        |          CAST(floor(pow(CAST(least(c, 2000000) AS DOUBLE), 75e-2))
        |            AS BIGINT) AS r0
        |        FROM tc)
        |), cum AS (
        |  SELECT tok, w,
        |    CAST(COALESCE(sum(w) OVER (ORDER BY tok
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS lo
        |  FROM wt
        |), tot AS (
        |  SELECT CAST(sum(w) AS BIGINT) AS bigw FROM wt
        |), centers AS (
        |  SELECT doc_id, pos, tok AS center
        |  FROM (SELECT doc_id,
        |          CAST(unnest(range(len(string_split(text, ' '))))
        |            AS BIGINT) AS pos,
        |          unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  WHERE tok <> ''
        |    AND CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)
        |      || ':' || CAST(pos AS VARCHAR)), 1, 15)) AS BIGINT) % 64 = 0
        |), draws AS (
        |  SELECT c.doc_id, c.pos, c.center,
        |    CAST(s.slot AS BIGINT) AS slot, CAST(t.tr AS BIGINT) AS tr,
        |    CAST(concat('0x', substr(md5(
        |      CAST(c.doc_id AS VARCHAR) || ':' || CAST(c.pos AS VARCHAR)
        |      || ':' || CAST(s.slot AS VARCHAR) || ':'
        |      || CAST(t.tr AS VARCHAR)), 1, 15)) AS BIGINT)
        |      % tot.bigw AS u
        |  FROM centers c
        |  CROSS JOIN range(0, 4) s(slot)
        |  CROSS JOIN range(0, 2) t(tr)
        |  CROSS JOIN tot
        |), hit AS (
        |  SELECT d.doc_id, d.pos, d.center, d.slot, d.tr, m.tok AS neg
        |  FROM draws d JOIN cum m ON d.u >= m.lo AND d.u < m.lo + m.w
        |)
        |SELECT a.doc_id, a.pos, a.center, a.slot,
        |  CASE WHEN a.neg = a.center THEN b.neg ELSE a.neg END AS neg_tok
        |FROM hit a JOIN hit b
        |  ON b.doc_id = a.doc_id AND b.pos = a.pos AND b.slot = a.slot
        | AND a.tr = 0 AND b.tr = 1""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val B = 1024L // searchsorted buckets
      val tc = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      val wt = tc
        .select(col("tok"), least(col("c"), lit(2000000L)).as("cc"))
        .withColumn("r0",
          expr("CAST(floor(pow(CAST(cc AS DOUBLE), 75e-2)) AS BIGINT)"))
        .withColumn("w", expr(
          """CASE
            |  WHEN (r0+2)*(r0+2)*(r0+2)*(r0+2) <= cc*cc*cc THEN r0+2
            |  WHEN (r0+1)*(r0+1)*(r0+1)*(r0+1) <= cc*cc*cc THEN r0+1
            |  WHEN r0*r0*r0*r0 <= cc*cc*cc THEN r0
            |  WHEN (r0-1)*(r0-1)*(r0-1)*(r0-1) <= cc*cc*cc THEN r0-1
            |  ELSE r0-2 END""".stripMargin))
        .select("tok", "w")
      val cum = wt
        .withColumn("lo", coalesce(
          sum(col("w")).over(Window.orderBy(col("tok"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val tot = wt.agg(sum(col("w")).as("bigw"))
      // each weight range covers contiguous buckets of width bw; the
      // total bucket-row expansion is <= V + B (metadata-sized)
      val ranges = cum.crossJoin(broadcast(tot))
        .withColumn("bw", expr(s"(bigw + ${B - 1}) div $B"))
        .select(col("tok").as("neg"), col("lo"), col("w"),
          explode(expr("sequence(lo div bw, (lo + w - 1) div bw)"))
            .as("bucket"))
      val centers = Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "center")))
        .filter(col("center") =!= "")
        .withColumn("pos", col("pos").cast("long"))
        .filter(expr(
          "md5p60(concat(CAST(doc_id AS STRING), ':', CAST(pos AS STRING)))" +
            " % 64 = 0"))
      val draws = centers
        .select(col("doc_id"), col("pos"), col("center"),
          explode(expr("sequence(0L, 3L)")).as("slot"))
        .select(col("*"), explode(expr("sequence(0L, 1L)")).as("tr"))
        .crossJoin(broadcast(tot))
        .withColumn("u", expr(
          "md5p60(concat(CAST(doc_id AS STRING), ':', CAST(pos AS STRING)," +
            " ':', CAST(slot AS STRING), ':', CAST(tr AS STRING))) % bigw"))
        .withColumn("bucket", expr(s"u div ((bigw + ${B - 1}) div $B)"))
      val hit = draws
        .join(ranges, Seq("bucket"))
        .filter(col("u") >= col("lo") && col("u") < col("lo") + col("w"))
        .select(col("doc_id"), col("pos"), col("center"), col("slot"),
          col("tr"), col("neg"))
      val a = hit.filter(col("tr") === 0)
        .select(col("doc_id"), col("pos"), col("center"), col("slot"),
          col("neg").as("neg0"))
      val b = hit.filter(col("tr") === 1)
        .select(col("doc_id").as("bd"), col("pos").as("bp"),
          col("slot").as("bs"), col("neg").as("neg1"))
      a.join(b, col("bd") === col("doc_id") && col("bp") === col("pos")
          && col("bs") === col("slot"))
        .select(col("doc_id"), col("pos"), col("center"), col("slot"),
          when(col("neg0") === col("center"), col("neg1"))
            .otherwise(col("neg0")).as("neg_tok"))
    }.intendsGlobalWindow(
      "the cumulative-weight window runs over the VOCABULARY frame " +
        "only — vocab-bounded, never the corpus")
      .intendsNestedLoop(
        "cross joins against broadcast 1-row scalar total frames"),

    // ---- Optimal phrase segmentation (see ops.PhraseSegment): the
    //      Viterbi step of SentencePiece's unigram tokenizer at token
    //      granularity — inventory = unigrams + (>= 2×) bi/trigrams,
    //      cost = 1e6-fp -ln(c/T), per-doc lattice DP minimizing total
    //      cost with the packed cost*2^20+pieces int64 (one integer min
    //      = cost minimum + deterministic piece-count tiebreak). One
    //      doc_id shuffle, O(1)/key fold state; oracle = recursive CTE
    //      over a MATERIALIZED per-position cost table ----
    QueryDef.sql(
      "q_phrase_segment",
      s"""WITH RECURSIVE p0 AS (
         |  SELECT doc_id,
         |    CAST(unnest(range(len(string_split(text, ' ')))) AS BIGINT)
         |      AS p0,
         |    unnest(string_split(text, ' ')) AS tok
         |  FROM documents
         |), p1 AS (
         |  SELECT doc_id, tok,
         |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY p0)
         |      AS BIGINT) AS rn,
         |    lag(tok, 1) OVER (PARTITION BY doc_id ORDER BY p0) AS t1,
         |    lag(tok, 2) OVER (PARTITION BY doc_id ORDER BY p0) AS t2
         |  FROM p0 WHERE tok <> ''
         |), pos AS (
         |  SELECT doc_id, rn, tok,
         |    CASE WHEN rn >= 2 THEN t1 || ' ' || tok END AS g2,
         |    CASE WHEN rn >= 3 THEN t2 || ' ' || t1 || ' ' || tok END AS g3
         |  FROM p1
         |), u AS (
         |  SELECT tok AS g, CAST(count(*) AS BIGINT) AS c
         |  FROM pos GROUP BY tok
         |), bg2 AS (
         |  SELECT g2 AS g, CAST(count(*) AS BIGINT) AS c
         |  FROM pos WHERE rn >= 2 GROUP BY g2 HAVING count(*) >= 2
         |), bg3 AS (
         |  SELECT g3 AS g, CAST(count(*) AS BIGINT) AS c
         |  FROM pos WHERE rn >= 3 GROUP BY g3 HAVING count(*) >= 2
         |), inv AS (
         |  SELECT * FROM u UNION ALL SELECT * FROM bg2
         |  UNION ALL SELECT * FROM bg3
         |), tot AS (
         |  SELECT CAST(sum(c) AS BIGINT) AS t FROM inv
         |), costs AS (
         |  SELECT g, CAST(floor(-ln(c * 1e0 / t) * 1e6) AS BIGINT) AS cost
         |  FROM inv, tot
         |), graft_seg_pos AS MATERIALIZED (
         |  SELECT p.doc_id, p.rn,
         |    COALESCE(c1.cost, -1) AS pc1,
         |    COALESCE(c2.cost, -1) AS pc2,
         |    COALESCE(c3.cost, -1) AS pc3
         |  FROM pos p
         |  LEFT JOIN costs c1 ON c1.g = p.tok
         |  LEFT JOIN costs c2 ON c2.g = p.g2
         |  LEFT JOIN costs c3 ON c3.g = p.g3
         |),
         |${graft.ops.PhraseSegment.oracleSql}""".stripMargin
    ) { (s, d) =>
      graft.ops.PhraseSegment.segment(
        Tables.documents(s, d).select(col("doc_id"), col("text")))
    }.intendsNestedLoop(
      "cross join against the broadcast 1-row inventory-total frame"),

    // ---- WordPiece greedy longest-match tokenization (see
    //      ops.WordPiece): the third tokenizer family — BPE applies
    //      merges in rank order (q_bpe_tokenize), unigram-LM Viterbi
    //      finds the global cost optimum (q_phrase_segment), WordPiece
    //      inference takes the LONGEST inventory piece at each position.
    //      Greedy choice is position-independent, so the per-word walk
    //      is pointer DOUBLING over next(p) = p + bestLen(p): bestLen
    //      for all positions = one explode + semi-join + argmax, path =
    //      O(log maxlen) vocabulary-bounded join rounds. Oracle walks
    //      the same rule by direct recursion (longest-first COALESCE
    //      over 4 left joins) — independent algorithms, agree
    //      path-for-path ----
    QueryDef.sql(
      "q_wordpiece",
      s"WITH RECURSIVE ${graft.ops.WordPiece.oracleSql()}"
    ) { (s, d) =>
      graft.ops.WordPiece.run(
        Tables.documents(s, d).select(col("doc_id"), col("text")))
    }
  )
}
