package graft.operators

import graft.{CkptOps, QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-admission filter batteries and data-selection scoring — the
  * published-pipeline operators (Gopher rule filters, DSIR importance
  * weighting, smoothing-grid model selection) that sit between raw
  * crawl and tokenizer in an LLM data pipeline. Complements the
  * dedup/decontamination family (Dedup.scala) and the per-doc quality
  * metrics (TextAnalysis.qualityMetrics): these are the SELECTION
  * operators — which docs enter, and with what weight.
  *
  * Scale design (100 TB):
  *  - every per-document metric is a codegen'd built-in expression
  *    over one scan; the only data-sized exchanges are
  *    partial-aggregable token collapses keyed by (doc, word/bucket);
  *  - model/profile frames are bounded (64 hash buckets, 5 grid
  *    points, |langs| rows) and broadcast;
  *  - determinism: integer counts, cross-multiplied floor-divs on
  *    non-negative numerators, and floored-per-term nano-nat logs
  *    before any sum (the q83/q181 contract).
  */
object PipelineFilters {

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  // Gopher-rule thresholds — shared by q306 (per-rule kill report) and
  // q330 (budget allocator quality signal) so the two can never
  // disagree on what "admitted" means.
  private val MIN_TOK = 25L; private val MAX_TOK = 90L
  private val MIN_MWL = 4000L; private val MAX_MWL = 5100L
  private val MIN_STOP = 2L
  private val MAX_TOPW_PPM = 125000L

  /** q306 — Gopher-style document-admission rules (Rae et al. 2021,
    * "Scaling Language Models", Table A1): word-count bounds, mean
    * word length bounds, minimum stopword evidence, and a top-word
    * repetition cap, reported per language as NON-exclusive per-rule
    * kill counts plus the surviving-document count — the rule-level
    * diagnostic a pipeline owner reads before enabling a filter
    * (which rule does the killing, and does it differ by language?).
    * Thresholds are corpus-tuned config (the published bounds target
    * web crawl; this corpus is synthetic), not constants of the
    * operator.
    *
    * Exactness: all counts integer; mean word length rides the
    * (1000·chars) div n_tok cross-multiplied floor (chars = text
    * minus spaces — exact under single-space tokenization); the
    * repetition ratio is (10⁶·max word count) div n_tok.
    *
    * Scale design (100 TB): the doc-metric pass is one scan of
    * codegen'd string built-ins; the top-word count is the only
    * shuffle — partial-aggregable (doc, word) collapse, then a
    * (doc)-keyed max — joined back equi on doc_id. Output |langs|
    * rows. */
  val q306GopherRules: QueryDef = {
    QueryDef(
      "q306_gopher_rules",
      s"""WITH m AS (
         |  SELECT doc_id, lang,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |    CAST(len(replace(text, ' ', '')) AS BIGINT) AS n_chr,
         |    CAST(len(list_filter(string_split(text, ' '),
         |      t -> t IN ('the','a','of','and','to','in','is'))) AS BIGINT)
         |      AS n_stop
         |  FROM documents),
         |tw AS (
         |  SELECT doc_id, max(c) AS topw FROM (
         |    SELECT doc_id, x, CAST(count(*) AS BIGINT) AS c
         |    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS x
         |          FROM documents) GROUP BY 1, 2) GROUP BY doc_id),
         |f AS (
         |  SELECT m.lang,
         |    CASE WHEN m.n_tok < $MIN_TOK OR m.n_tok > $MAX_TOK
         |      THEN 1 ELSE 0 END AS f_len,
         |    CASE WHEN (1000 * m.n_chr) // m.n_tok < $MIN_MWL
         |      OR (1000 * m.n_chr) // m.n_tok > $MAX_MWL
         |      THEN 1 ELSE 0 END AS f_mwl,
         |    CASE WHEN m.n_stop < $MIN_STOP THEN 1 ELSE 0 END AS f_stop,
         |    CASE WHEN (1000000 * tw.topw) // m.n_tok > $MAX_TOPW_PPM
         |      THEN 1 ELSE 0 END AS f_rep
         |  FROM m JOIN tw ON m.doc_id = tw.doc_id)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(f_len) AS BIGINT) AS kill_len,
         |  CAST(sum(f_mwl) AS BIGINT) AS kill_mwl,
         |  CAST(sum(f_stop) AS BIGINT) AS kill_stop,
         |  CAST(sum(f_rep) AS BIGINT) AS kill_rep,
         |  CAST(sum(CASE WHEN f_len + f_mwl + f_stop + f_rep = 0
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
         |FROM f GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      val toks = split(col("text"), " ")
      val docs = Tables.documents(s, dir)
        .repartition(col("doc_id")) // single-file scan -> use every core
      val m = docs.select(
        col("doc_id"), col("lang"),
        size(toks).cast("bigint").as("n_tok"),
        length(regexp_replace(col("text"), " ", "")).cast("bigint")
          .as("n_chr"),
        size(filter(toks, t => t.isInCollection(stopwords))).cast("bigint")
          .as("n_stop"))
      val tw = docs
        .select(col("doc_id"), explode(toks).as("x"))
        .groupBy(col("doc_id"), col("x")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id")).agg(max(col("c")).as("topw"))
      m.join(tw, Seq("doc_id"))
        .select(col("lang"),
          when(col("n_tok") < MIN_TOK || col("n_tok") > MAX_TOK, 1L)
            .otherwise(0L).as("f_len"),
          when(expr("(1000 * n_chr) div n_tok") < MIN_MWL ||
            expr("(1000 * n_chr) div n_tok") > MAX_MWL, 1L)
            .otherwise(0L).as("f_mwl"),
          when(col("n_stop") < MIN_STOP, 1L).otherwise(0L).as("f_stop"),
          when(expr("(1000000 * topw) div n_tok") > MAX_TOPW_PPM, 1L)
            .otherwise(0L).as("f_rep"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("f_len")).as("kill_len"),
          sum(col("f_mwl")).as("kill_mwl"),
          sum(col("f_stop")).as("kill_stop"),
          sum(col("f_rep")).as("kill_rep"),
          sum(when(col("f_len") + col("f_mwl") + col("f_stop") +
            col("f_rep") === 0, 1L).otherwise(0L)).as("n_pass"))
        .orderBy("lang")
    }
  }

  /** q307 — DSIR importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * out-of-domain document by the log-likelihood ratio of a hashed
    * unigram model fit on the target domain vs one fit on the raw
    * pool, and surface the top raw documents — the ranking that
    * importance-resamples a web crawl toward a trusted domain without
    * training a classifier. Target = sources src0/src1; raw = the
    * other 18 sources (scored side).
    *
    * Exactness: tokens hash into 64 buckets via the md5-prefix mod
    * (portable coin contract — both engines hash identical bytes);
    * bucket log-ratios are add-one smoothed, computed as ONE shared
    * IEEE chain and floored to nano-nats per BUCKET (64 values —
    * possibly negative, so only floor, never div, touches them); a
    * doc's weight is the exact integer Σ count·ratio_nn, and the
    * per-token average is a single IEEE division of two exact int64s
    * (bit-portable). Top-20 slice ties break on doc_id.
    *
    * Scale design (100 TB): ONE token explode + (doc, side, bucket)
    * collapse is the only data-sized exchange; both sides' 64-row
    * bucket totals and the per-doc raw counts derive from that
    * checkpointed frame, the 64-row ratio frame is BROADCAST back
    * into it, and the top-20 is a TakeOrdered per-partition heap,
    * never a global sort. */
  val q307DsirWeights: QueryDef = {
    val B = 64
    // shared IEEE chain for the bucket log-ratio, nano-nats, floored.
    // e-notation keeps every literal DOUBLE in both parsers (bare
    // decimals are DECIMAL in Spark AND DuckDB).
    val ratioNn =
      s"CAST(floor(1e9 * ln((CAST(coalesce(tc, 0) + 1 AS DOUBLE) /" +
        s" CAST(tt + $B AS DOUBLE))" +
        s" / (CAST(rc + 1 AS DOUBLE) / CAST(rt + $B AS DOUBLE)))) AS BIGINT)"
    QueryDef(
      "q307_dsir_weights",
      s"""WITH tok AS (
         |  SELECT doc_id, source,
         |    ('0x' || substring(md5(x), 1, 15))::BIGINT % $B AS b
         |  FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS x
         |        FROM documents)),
         |tgt AS (SELECT b, CAST(count(*) AS BIGINT) AS tc FROM tok
         |        WHERE source IN ('src0', 'src1') GROUP BY b),
         |raw AS (SELECT b, CAST(count(*) AS BIGINT) AS rc FROM tok
         |        WHERE source NOT IN ('src0', 'src1') GROUP BY b),
         |tot AS (
         |  SELECT CAST(sum(tc) AS BIGINT) AS tt FROM tgt),
         |rot AS (
         |  SELECT CAST(sum(rc) AS BIGINT) AS rt FROM raw),
         |lr AS (
         |  SELECT r.b, $ratioNn AS rnn
         |  FROM (SELECT b, rc FROM raw) r
         |  LEFT JOIN tgt ON r.b = tgt.b, tot, rot),
         |dc AS (
         |  SELECT doc_id, b, CAST(count(*) AS BIGINT) AS c FROM tok
         |  WHERE source NOT IN ('src0', 'src1') GROUP BY doc_id, b),
         |w AS (
         |  SELECT dc.doc_id, CAST(sum(dc.c * lr.rnn) AS BIGINT) AS logw_nn,
         |    CAST(sum(dc.c) AS BIGINT) AS n_tok
         |  FROM dc JOIN lr ON dc.b = lr.b GROUP BY dc.doc_id)
         |SELECT d.doc_id, d.source, w.n_tok, w.logw_nn,
         |  CAST(w.logw_nn AS DOUBLE) / CAST(w.n_tok AS DOUBLE) AS avg_nn
         |FROM w JOIN documents d ON w.doc_id = d.doc_id
         |ORDER BY avg_nn DESC, d.doc_id LIMIT 20""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
        .repartition(col("doc_id")) // single-file scan -> use every core
      val isTgt = col("source").isin("src0", "src1")
      // ONE token explode + (doc, bucket) collapse feeds everything —
      // bucket totals per side and the per-doc raw counts all derive
      // from this ≤ |docs|·B frame (checkpointed: 3 consumers).
      val dcAll = docs
        .select(col("doc_id"), isTgt.as("tgt"),
          explode(split(col("text"), " ")).as("x"))
        .select(col("doc_id"), col("tgt"),
          (conv(substring(md5(col("x")), 1, 15), 16, 10).cast("bigint")
            % B).as("b"))
        .groupBy(col("doc_id"), col("tgt"), col("b"))
        .agg(count(lit(1)).as("c"))
        .ckpt()
      val tgt = dcAll.filter(col("tgt")).groupBy(col("b"))
        .agg(sum(col("c")).cast("bigint").as("tc"))
      val raw = dcAll.filter(!col("tgt")).groupBy(col("b"))
        .agg(sum(col("c")).cast("bigint").as("rc"))
      val tt = tgt.agg(sum(col("tc")).cast("bigint").as("tt"))
      val rt = raw.agg(sum(col("rc")).cast("bigint").as("rt"))
      val lr = broadcast(raw
        .join(tgt, Seq("b"), "left")
        .crossJoin(broadcast(tt)).crossJoin(broadcast(rt))
        .select(col("b"), expr(ratioNn).as("rnn")))
      val dc = dcAll.filter(!col("tgt"))
        .select(col("doc_id"), col("b"), col("c"))
      val w = dc.join(lr, Seq("b"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c") * col("rnn")).cast("bigint").as("logw_nn"),
          sum(col("c")).cast("bigint").as("n_tok"))
      w.join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .select(col("doc_id"), col("source"), col("n_tok"), col("logw_nn"),
          (col("logw_nn").cast("double") / col("n_tok").cast("double"))
            .as("avg_nn"))
        .orderBy(col("avg_nn").desc, col("doc_id"))
        .limit(20)
    }
  }

  /** q309 — Jelinek–Mercer interpolation grid: the held-out bigram
    * NLL of p = λ·p_ML(w₂|w₁) + (1−λ)·p_uni(w₂) across five λ values
    * — the classic smoothing-hyperparameter sweep (Chen & Goodman
    * 1998) that brackets where q215's Kneser–Ney and q181's add-one
    * land, run as ONE pass over the held-out bigrams (train even
    * doc_ids, test odd, the q181 split convention).
    *
    * Exactness: the interpolated probability is ONE shared IEEE chain
    * (e-notation literals keep every constant DOUBLE in both
    * parsers); p > 0 because the unigram leg is add-one floored, and
    * p ≤ 1 because both legs are ML probabilities — so the per-term
    * nano-nat NLL floor is non-negative and the final integer
    * floor-div is portable. Grid explode is a 5-literal array, CAST
    * BIGINT in output (driver hash is type-sensitive).
    *
    * Scale design (100 TB): identical shape to q181 — count collapses
    * are partial-aggregable, model lookups are equi-joins that
    * Spark's size-based planning broadcasts iff they fit, only the
    * 1-row vocab/total frame is unconditionally broadcast; the ×5
    * grid multiplies the ≤|distinct test bigram| frame AFTER the
    * joins, and collapses straight to 5 rows. */
  val q309JmGrid: QueryDef = {
    val lams = Seq(100, 300, 500, 700, 900)
    // shared IEEE chain: interpolated bigram probability -> -ln,
    // floored to nano-nats. All literals e-notation (DOUBLE in both).
    val nllNn =
      "CAST(floor(1e9 * (0e0 - ln(" +
        "(CAST(lam AS DOUBLE) / 1e3) * (CASE WHEN c2c IS NULL OR c1c IS NULL" +
        " THEN 0e0 ELSE CAST(c2c AS DOUBLE) / CAST(c1c AS DOUBLE) END)" +
        " + (1e0 - CAST(lam AS DOUBLE) / 1e3) *" +
        " (CAST(cu + 1 AS DOUBLE) / CAST(tot + vs AS DOUBLE))))) AS BIGINT)"
    QueryDef(
      "q309_jm_grid",
      s"""WITH tr AS (
         |  SELECT string_split(text, ' ') AS tk FROM documents
         |  WHERE doc_id % 2 = 0),
         |te AS (
         |  SELECT string_split(text, ' ') AS tk FROM documents
         |  WHERE doc_id % 2 = 1),
         |u AS (SELECT unnest(tk) AS x FROM tr),
         |v AS (SELECT CAST(count(DISTINCT x) AS BIGINT) AS vs,
         |             CAST(count(*) AS BIGINT) AS tot FROM u),
         |c1 AS (SELECT x, CAST(count(*) AS BIGINT) AS c1c FROM u GROUP BY x),
         |c2 AS (
         |  SELECT tk[CAST(i AS INT)] AS x, tk[CAST(i AS INT)+1] AS y,
         |    CAST(count(*) AS BIGINT) AS c2c
         |  FROM tr, unnest(range(1, len(tk))) AS r(i) GROUP BY 1, 2),
         |tb AS (
         |  SELECT tk[CAST(i AS INT)] AS x, tk[CAST(i AS INT)+1] AS y,
         |    CAST(count(*) AS BIGINT) AS m
         |  FROM te, unnest(range(1, len(tk))) AS r(i) GROUP BY 1, 2),
         |sc AS (
         |  SELECT tb.m, c2.c2c, uc.c1c, coalesce(u1.c1c, 0) AS cu, v.vs, v.tot
         |  FROM tb LEFT JOIN c2 ON tb.x = c2.x AND tb.y = c2.y
         |  LEFT JOIN c1 uc ON tb.x = uc.x
         |  LEFT JOIN c1 u1 ON tb.y = u1.x, v),
         |g AS (
         |  SELECT lam, m, $nllNn AS nll_nn
         |  FROM sc, unnest([${lams.mkString(", ")}]) AS l(lam))
         |SELECT CAST(lam AS BIGINT) AS lam_milli,
         |  CAST(sum(m) AS BIGINT) AS n_bigrams,
         |  CAST(sum(CAST(m AS HUGEINT) * nll_nn) //
         |       CAST(sum(m) AS HUGEINT) AS BIGINT) AS avg_nll_nn
         |FROM g GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val dec = (c: Column) => c.cast("decimal(38,0)")
      val tk = col("tk")
      def bigrams(df: DataFrame): DataFrame =
        df.filter(size(tk) >= 2)
          .select(explode(zip_with(
            slice(tk, lit(1), size(tk) - 1),
            slice(tk, lit(2), size(tk) - 1),
            (x, y) => struct(x.as("x"), y.as("y")))).as("p"))
          .select(col("p.x").as("x"), col("p.y").as("y"))
      val docs = Tables.documents(s, dir)
        .repartition(col("doc_id")) // single-file scan -> use every core
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
      val tr = docs.filter(col("doc_id") % 2 === 0)
      val te = docs.filter(col("doc_id") % 2 === 1)
      val uni = tr.select(explode(tk).as("x"))
      val v = uni.agg(count_distinct(col("x")).as("vs"),
        count(lit(1)).as("tot"))
      val c1 = uni.groupBy(col("x")).agg(count(lit(1)).as("c1c"))
      val c2 = bigrams(tr).groupBy(col("x"), col("y"))
        .agg(count(lit(1)).as("c2c"))
      val tb = bigrams(te).groupBy(col("x"), col("y"))
        .agg(count(lit(1)).as("m"))
      tb.join(c2, Seq("x", "y"), "left")
        .join(c1, Seq("x"), "left")
        .join(c1.select(col("x").as("y"), col("c1c").as("cuv")),
          Seq("y"), "left")
        .crossJoin(broadcast(v))
        .select(col("m"), col("c2c"), col("c1c"),
          coalesce(col("cuv"), lit(0L)).as("cu"), col("vs"), col("tot"))
        .select(col("m"), col("c2c"), col("c1c"), col("cu"), col("vs"),
          col("tot"), explode(array(lams.map(lit): _*)).as("lam"))
        .select(col("lam"), col("m"), expr(nllNn).as("nll_nn"))
        .groupBy(col("lam"))
        .agg(sum(col("m")).as("n_bigrams"),
          sum(dec(col("m")) * col("nll_nn")).as("swn"))
        .select(col("lam").cast("bigint").as("lam_milli"),
          col("n_bigrams"),
          expr("CAST(swn div n_bigrams AS BIGINT)").as("avg_nll_nn"))
        .orderBy("lam_milli")
    }
  }

  /** q330 — greedy token-budget allocation across sources: rank
    * sources by Gopher-rule pass rate (q306's thresholds verbatim),
    * then fill a budget of 60% of the corpus's admitted tokens
    * greedily — full allocation while the budget lasts, a partial
    * slice at the boundary source, zero after — the data-mix planning
    * table ("which feeds make the cut, and how much of the boundary
    * feed") behind every fixed-token-budget pretraining run
    * (DoReMi/SlimPajama-style mix curation, greedy-by-quality form).
    * Tokens are counted over ADMITTED docs only: paying for docs the
    * filter will drop is the classic mix-planning mistake.
    *
    * Exactness: pass flags and token counts are exact integers; the
    * budget is one integer floor-div of the 1-row total; the greedy
    * fill is an exclusive running sum over the ranked source frame
    * with integer clamp arithmetic.
    *
    * Scale design (100 TB): the doc-metric pass is q306's shape (one
    * scan + one (doc, word) collapse for the repetition rule); the
    * allocator then runs entirely on the |sources|-row aggregate
    * frame — its ranking window is unpartitioned by design and
    * bounded by the source domain (allowlisted). Output |sources|
    * rows. */
  val q330TokenBudget: QueryDef = {
    val BUDGET_PCT = 60
    QueryDef(
      "q330_token_budget",
      s"""WITH m AS (
         |  SELECT doc_id, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |    CAST(len(replace(text, ' ', '')) AS BIGINT) AS n_chr,
         |    CAST(len(list_filter(string_split(text, ' '),
         |      t -> t IN ('the','a','of','and','to','in','is'))) AS BIGINT)
         |      AS n_stop
         |  FROM documents),
         |tw AS (
         |  SELECT doc_id, max(c) AS topw FROM (
         |    SELECT doc_id, x, CAST(count(*) AS BIGINT) AS c
         |    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS x
         |          FROM documents) GROUP BY 1, 2) GROUP BY doc_id),
         |f AS (
         |  SELECT m.source, m.n_tok,
         |    CASE WHEN m.n_tok >= $MIN_TOK AND m.n_tok <= $MAX_TOK
         |      AND (1000 * m.n_chr) // m.n_tok >= $MIN_MWL
         |      AND (1000 * m.n_chr) // m.n_tok <= $MAX_MWL
         |      AND m.n_stop >= $MIN_STOP
         |      AND (1000000 * tw.topw) // m.n_tok <= $MAX_TOPW_PPM
         |      THEN 1 ELSE 0 END AS pass
         |  FROM m JOIN tw ON m.doc_id = tw.doc_id),
         |src AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(pass) AS BIGINT) AS n_pass,
         |    (1000000 * CAST(sum(pass) AS BIGINT)) // count(*)
         |      AS quality_ppm,
         |    CAST(sum(pass * n_tok) AS BIGINT) AS adm_tokens
         |  FROM f GROUP BY source),
         |bud AS (
         |  SELECT ($BUDGET_PCT * CAST(sum(adm_tokens) AS BIGINT)) // 100
         |    AS budget FROM src),
         |ranked AS (
         |  SELECT src.*, bud.budget,
         |    CAST(coalesce(sum(adm_tokens) OVER (
         |      ORDER BY quality_ppm DESC, source
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS before_me
         |  FROM src, bud)
         |SELECT source, n_docs, n_pass, quality_ppm, adm_tokens,
         |  CAST(least(adm_tokens, greatest(0, budget - before_me))
         |    AS BIGINT) AS alloc_tokens
         |FROM ranked ORDER BY source""".stripMargin) { (s, dir) =>
      val toks = split(col("text"), " ")
      val docs = Tables.documents(s, dir)
        .repartition(col("doc_id")) // single-file scan -> use every core
      val m = docs.select(
        col("doc_id"), col("source"),
        size(toks).cast("bigint").as("n_tok"),
        length(regexp_replace(col("text"), " ", "")).cast("bigint")
          .as("n_chr"),
        size(filter(toks, t => t.isInCollection(stopwords))).cast("bigint")
          .as("n_stop"))
      val tw = docs
        .select(col("doc_id"), explode(toks).as("x"))
        .groupBy(col("doc_id"), col("x")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id")).agg(max(col("c")).as("topw"))
      val f = m.join(tw, Seq("doc_id"))
        .select(col("source"), col("n_tok"),
          when(col("n_tok") >= MIN_TOK && col("n_tok") <= MAX_TOK &&
            expr("(1000 * n_chr) div n_tok") >= MIN_MWL &&
            expr("(1000 * n_chr) div n_tok") <= MAX_MWL &&
            col("n_stop") >= MIN_STOP &&
            expr("(1000000 * topw) div n_tok") <= MAX_TOPW_PPM,
            1L).otherwise(0L).as("pass"))
      val src = f.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("pass")).as("n_pass"),
          expr("(1000000 * CAST(sum(pass) AS BIGINT)) div count(*)")
            .as("quality_ppm"),
          sum(col("pass") * col("n_tok")).as("adm_tokens"))
      val bud = src.agg(
        expr(s"($BUDGET_PCT * CAST(sum(adm_tokens) AS BIGINT)) div 100")
          .as("budget"))
      val wFill = Window.orderBy(col("quality_ppm").desc, col("source"))
        .rowsBetween(Window.unboundedPreceding, -1)
      src.crossJoin(broadcast(bud))
        .withColumn("before_me",
          coalesce(sum(col("adm_tokens")).over(wFill), lit(0L))
            .cast("bigint"))
        .select(col("source"), col("n_docs"), col("n_pass"),
          col("quality_ppm"), col("adm_tokens"),
          least(col("adm_tokens"),
            greatest(lit(0L), col("budget") - col("before_me")))
            .cast("bigint").as("alloc_tokens"))
        .orderBy("source")
    }
  }

  /** q345 — optimal 0/1 source selection vs the greedy prefix: the
    * exact dynamic-programming knapsack over the 20 sources (value =
    * admitted docs, weight = admitted tokens in percent units of the
    * corpus) evaluated at budgets of 20/40/60 units, next to q330's
    * quality-ordered greedy prefix at the same budgets — the
    * optimality-gap report that says whether the cheap greedy mix
    * planner is leaving value on the table (gap = 0 certifies it; a
    * persistent gap justifies running the DP for real). The DP state
    * is the classic best-value-per-budget frontier, advanced one
    * source at a time.
    *
    * Exactness: values, weights, and every DP cell are exact
    * integers; source order is lexicographic; the greedy is the
    * take-while-it-fits PREFIX rule (stated — true greedy-with-skip
    * is sequential and belongs to the DP side of this comparison).
    *
    * Scale design (100 TB): the per-source stats are q306's one-scan
    * shape; the |sources|-row item frame is then fetched to the
    * driver to SEQUENCE the DP loop (the adjudicated bounded-frame
    * collect class — the loop ORDER is inherently sequential; the
    * data volume is the source domain, not the corpus), and the DP
    * itself runs on a 101-row budget frame × |sources| bounded
    * self-joins with lineage cut every 5 rounds (the q284
    * checkpoint-budget lesson). Output 3 rows. */
  val q345KnapsackMix: QueryDef = {
    val W = 100 // weight grid: percent of total admitted tokens
    val budgets = Seq(20L, 40L, 60L)
    QueryDef(
      "q345_knapsack_mix",
      {
        // oracle: unrolled DP — one MATERIALIZED CTE per item
        val dpCtes = (1 to 20).map { k =>
          s"""dp$k AS MATERIALIZED (
             |  SELECT d.w,
             |    greatest(d.best, CASE WHEN i.wu <= d.w
             |      THEN coalesce(p.best, 0) + i.v ELSE d.best END) AS best
             |  FROM dp${k - 1} d
             |  JOIN (SELECT wu, v FROM items WHERE rk = $k) i ON true
             |  LEFT JOIN dp${k - 1} p ON p.w = d.w - i.wu)""".stripMargin
        }.mkString(",\n")
        s"""WITH m AS (
           |  SELECT doc_id, source,
           |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
           |    CAST(len(replace(text, ' ', '')) AS BIGINT) AS n_chr,
           |    CAST(len(list_filter(string_split(text, ' '),
           |      t -> t IN ('the','a','of','and','to','in','is'))) AS BIGINT)
           |      AS n_stop
           |  FROM documents),
           |tw AS (
           |  SELECT doc_id, max(c) AS topw FROM (
           |    SELECT doc_id, x, CAST(count(*) AS BIGINT) AS c
           |    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS x
           |          FROM documents) GROUP BY 1, 2) GROUP BY doc_id),
           |f AS (
           |  SELECT m.source, m.n_tok,
           |    CASE WHEN m.n_tok >= $MIN_TOK AND m.n_tok <= $MAX_TOK
           |      AND (1000 * m.n_chr) // m.n_tok >= $MIN_MWL
           |      AND (1000 * m.n_chr) // m.n_tok <= $MAX_MWL
           |      AND m.n_stop >= $MIN_STOP
           |      AND (1000000 * tw.topw) // m.n_tok <= $MAX_TOPW_PPM
           |      THEN 1 ELSE 0 END AS pass
           |  FROM m JOIN tw ON m.doc_id = tw.doc_id),
           |src AS (
           |  SELECT source, CAST(sum(pass) AS BIGINT) AS v,
           |    CAST(sum(pass * n_tok) AS BIGINT) AS adm
           |  FROM f GROUP BY source),
           |tot AS (SELECT CAST(sum(adm) AS BIGINT) AS t FROM src),
           |items AS (
           |  SELECT source, v,
           |    greatest(1, ($W * adm) // greatest(1, t.t)) AS wu,
           |    row_number() OVER (ORDER BY source) AS rk,
           |    (1000000 * v) // greatest(1, ($W * adm) // greatest(1, t.t))
           |      AS density
           |  FROM src, tot t),
           |dp0 AS (
           |  SELECT CAST(unnest(range(0, ${W + 1})) AS BIGINT) AS w,
           |    CAST(0 AS BIGINT) AS best),
           |$dpCtes,
           |gr AS (
           |  SELECT i.*, CAST(coalesce(sum(wu) OVER (
           |      ORDER BY density DESC, source
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
           |      AS BIGINT) AS cumw
           |  FROM items i),
           |bud AS (SELECT CAST(unnest([${budgets.mkString(", ")}]) AS BIGINT)
           |        AS b),
           |greedy AS (
           |  SELECT bud.b, CAST(coalesce(sum(CASE WHEN gr.cumw <= bud.b
           |    THEN gr.v ELSE 0 END), 0) AS BIGINT) AS greedy_value
           |  FROM bud, gr GROUP BY bud.b)
           |SELECT g.b AS budget_units, d.best AS dp_value, g.greedy_value,
           |  d.best - g.greedy_value AS gap
           |FROM greedy g JOIN dp20 d ON d.w = g.b
           |ORDER BY g.b""".stripMargin
      }) { (s, dir) =>
      import s.implicits._
      val toks = split(col("text"), " ")
      val docs = Tables.documents(s, dir)
        .repartition(col("doc_id")) // single-file scan -> use every core
      val m = docs.select(
        col("doc_id"), col("source"),
        size(toks).cast("bigint").as("n_tok"),
        length(regexp_replace(col("text"), " ", "")).cast("bigint")
          .as("n_chr"),
        size(filter(toks, t => t.isInCollection(stopwords))).cast("bigint")
          .as("n_stop"))
      val tw = docs
        .select(col("doc_id"), explode(toks).as("x"))
        .groupBy(col("doc_id"), col("x")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id")).agg(max(col("c")).as("topw"))
      val f = m.join(tw, Seq("doc_id"))
        .select(col("source"), col("n_tok"),
          when(col("n_tok") >= MIN_TOK && col("n_tok") <= MAX_TOK &&
            expr("(1000 * n_chr) div n_tok") >= MIN_MWL &&
            expr("(1000 * n_chr) div n_tok") <= MAX_MWL &&
            col("n_stop") >= MIN_STOP &&
            expr("(1000000 * topw) div n_tok") <= MAX_TOPW_PPM,
            1L).otherwise(0L).as("pass"))
      val src = f.groupBy(col("source"))
        .agg(sum(col("pass")).as("v"),
          sum(col("pass") * col("n_tok")).as("adm"))
      val tot = src.agg(sum(col("adm")).cast("bigint").as("t"))
      val wItems = Window.orderBy(col("source"))
      // greatest(1, t): a value-domain redraw can admit ZERO tokens
      // from every source (t = 0), and ANSI integer div throws
      // DIVIDE_BY_ZERO — found by tools/fuzz_oracle.py seed 1; the
      // oracle text carries the identical guard so the degenerate
      // corpus hashes the same on both sides (wu = 1 everywhere)
      val items = src.crossJoin(broadcast(tot))
        .select(col("source"), col("v"),
          greatest(lit(1L), expr(s"($W * adm) div greatest(1L, t)"))
            .as("wu"))
        .withColumn("rk", row_number().over(wItems))
        .withColumn("density", expr("(1000000 * v) div wu"))
        .ckpt() // 20 rows; the DP loop and the greedy both read it
      // DP table: (W+1) x |sources| integer cells on a frame that is
      // ALREADY collected for loop control (bounded by the source
      // domain, the union-find class of adjudicated driver compute) —
      // 20 Spark joins of a 101-row frontier were pure scheduling
      // overhead (4.4 s -> corpus-pass cost only)
      val itemRows = items.select(col("rk"), col("wu"), col("v"))
        .collect().sortBy(_.getAs[Int]("rk"))
      val dpArr = new Array[Long](W + 1)
      for (it <- itemRows) {
        val (wu, v) = (it.getAs[Long]("wu"), it.getAs[Long]("v"))
        var w = W.toLong
        while (w >= wu) {
          val cand = dpArr((w - wu).toInt) + v
          if (cand > dpArr(w.toInt)) dpArr(w.toInt) = cand
          w -= 1
        }
      }
      val dp = budgets.map(b => (b, dpArr(b.toInt))).toDF("w", "best")
      val wGreedy = Window.orderBy(col("density").desc, col("source"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val gr = items.withColumn("cumw",
        coalesce(sum(col("wu")).over(wGreedy), lit(0L)).cast("bigint"))
      val bud = budgets.toDF("b")
      val greedy = broadcast(bud).crossJoin(gr)
        .groupBy(col("b"))
        .agg(coalesce(sum(when(col("cumw") <= col("b"), col("v"))
          .otherwise(lit(0L))), lit(0L)).cast("bigint").as("greedy_value"))
      greedy.join(dp.select(col("w"), col("best")), col("w") === col("b"))
        .select(col("b").as("budget_units"), col("best").as("dp_value"),
          col("greedy_value"), (col("best") - col("greedy_value")).as("gap"))
        .orderBy("budget_units")
    }
  }

  val all: Seq[QueryDef] = Seq(q306GopherRules, q307DsirWeights, q309JmGrid,
    q330TokenBudget, q345KnapsackMix)
}
