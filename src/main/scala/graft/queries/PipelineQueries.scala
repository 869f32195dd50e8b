package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Pipeline, TextOps}

/** Correctness-gate entries for corpus-assembly pipeline operators
  * (deterministic splits/sampling, token-budget curation, sequence
  * packing) plus delegated-surface coverage that earlier modules don't
  * exercise: exact interpolated percentiles, distribution window
  * functions (percent_rank/cume_dist/ntile), bivariate statistical
  * aggregates, pivot/unpivot, and the watermarked append-mode streaming
  * aggregation. Every entry is DuckDB-oracle-able: hash-based decisions
  * (md5 buckets) instead of RNG, rounded doubles, total ORDER BYs.
  */
object PipelineQueries {
  import Tables.t

  /** Shared corpus for the curation entries: documents plus EXACT copies
    * (doc_id+200000) of every fifth document, so the exact-dedup stage is
    * load-bearing in the end-to-end pipeline.
    */
  private def dupedDocs(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    docs.unionByName(docs.filter(col("doc_id") % 5 === 0)
      .withColumn("doc_id", col("doc_id") + 200000L))
  }

  private val dupedCorpusSql: String =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 200000, text FROM documents WHERE doc_id % 5 = 0)""".stripMargin

  val defs: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(

    // ---------------------------------------------------------------
    // Deterministic splitting & sampling
    // ---------------------------------------------------------------

    ("pipe_quantile_filter", (s: SparkSession, dir: String) => {
      // per-language median cut on n_chars (integer scores + q=0.5 keep
      // the interpolated threshold exact in doubles on both engines)
      Pipeline.quantileFilter(t(s, dir, "documents"),
          col("lang"), col("n_chars"), q = 0.5)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    }, """
      SELECT doc_id, lang, n_chars
      FROM documents d
      JOIN (SELECT lang AS l, quantile_cont(n_chars, 0.5) AS thr
            FROM documents GROUP BY lang) t
        ON d.lang IS NOT DISTINCT FROM t.l
      WHERE d.n_chars >= t.thr
      ORDER BY doc_id
    """),

    ("pipe_split_hash", (s: SparkSession, dir: String) => {
      t(s, dir, "documents")
        .withColumn("split", Pipeline.split3(col("doc_id")))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          min("doc_id").as("min_id"), max("doc_id").as("max_id"))
        .orderBy("split")
    }, """
      SELECT CASE WHEN substr(md5(doc_id::VARCHAR), 1, 2) <= 'e5' THEN 'train'
                  WHEN substr(md5(doc_id::VARCHAR), 1, 2) <= 'f2' THEN 'val'
                  ELSE 'test' END AS split,
        count(*) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        min(doc_id) AS min_id, max(doc_id) AS max_id
      FROM documents GROUP BY 1 ORDER BY 1
    """),

    ("pipe_stratified_sample", (s: SparkSession, dir: String) => {
      // downsample dominant 'en' to 32/256 (~12.5%), keep half of the rest
      Pipeline.stratifiedSample(t(s, dir, "documents"),
          col("lang"), col("doc_id"), Map("en" -> 32), defaultBuckets = 128)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    }, """
      SELECT doc_id, lang, n_chars FROM documents
      WHERE substr(md5(doc_id::VARCHAR), 1, 2) <=
        CASE WHEN lang = 'en' THEN '1f' ELSE '7f' END
      ORDER BY doc_id
    """),

    // ---------------------------------------------------------------
    // Weighted sampling (A-ES): inclusion ∝ n_chars per language — the
    // importance-sampling primitive for quality-score-weighted corpus
    // subsets. The md5→48-bit→ln(u)/w priority is reproduced nibble-by-
    // nibble in the oracle, so the EXACT sample membership is the gate.
    // ---------------------------------------------------------------

    ("pipe_weighted_sample", (s: SparkSession, dir: String) => {
      Pipeline.weightedSample(t(s, dir, "documents"),
          col("lang"), col("doc_id"), col("n_chars").cast("double"), k = 40)
        .select("lang", "doc_id", "n_chars")
        .orderBy("lang", "doc_id")
    }, {
      // 48-bit integer from the first 12 md5 hex nibbles, exactly as the
      // Scala side's conv(substring(md5, 1, 12), 16, 10)
      val nibbleSum = (1 to 12).map(i =>
        s"(strpos('0123456789abcdef', substr(h, $i, 1)) - 1) * ${math.pow(16, 12 - i).toLong}e0")
        .mkString(" + ")
      s"""
      WITH pri AS (
        SELECT lang, doc_id, n_chars,
          round(ln((($nibbleSum) + 1) / 281474976710656.0)
            / CAST(n_chars AS DOUBLE), 9) AS p
        FROM (SELECT lang, doc_id, n_chars, md5(CAST(doc_id AS VARCHAR)) AS h
              FROM documents)),
      ranked AS (
        SELECT lang, doc_id, n_chars,
          row_number() OVER (PARTITION BY lang ORDER BY p DESC, doc_id) AS rn
        FROM pri)
      SELECT lang, doc_id, n_chars FROM ranked WHERE rn <= 40
      ORDER BY lang, doc_id
    """
    }),

    // ---------------------------------------------------------------
    // Benchmark decontamination: train docs sharing a word 4-gram with
    // the (small, broadcast) eval split — the audit run before a corpus
    // release. Train side: scan + explode + broadcast semi lookup, no
    // shuffle of train grams.
    // ---------------------------------------------------------------

    ("pipe_decontaminate", (s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val evalSet = docs.filter(col("doc_id") % 17 === 0)
      val train = docs.filter(col("doc_id") % 17 =!= 0)
      Pipeline.contaminatedDocs(train, evalSet, "text", "doc_id", w = 4)
        .orderBy("doc_id")
    }, """
      WITH sh AS (
        SELECT doc_id, doc_id % 17 = 0 AS is_eval,
          CASE WHEN len(ws) < 4 THEN [array_to_string(ws, ' ')]
               ELSE list_distinct([array_to_string(ws[i:i+3], ' ')
                                   for i in range(1, len(ws) - 2)]) END AS gs
        FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
              FROM documents)),
      ex AS (SELECT doc_id, is_eval, unnest(gs) AS g FROM sh)
      SELECT t.doc_id, count(*) AS n_hit_grams
      FROM (SELECT doc_id, g FROM ex WHERE NOT is_eval) t
      JOIN (SELECT DISTINCT g FROM ex WHERE is_eval) e USING (g)
      GROUP BY t.doc_id ORDER BY t.doc_id
    """),

    // ---------------------------------------------------------------
    // Deterministic corpus shuffle + sharding: md5-derived shard and
    // within-shard rank — a reproducible pseudo-random permutation with
    // no RNG; per-shard parallel sort, no global ORDER BY
    // ---------------------------------------------------------------

    ("pipe_shard_shuffle", (s: SparkSession, dir: String) => {
      Pipeline.shardShuffle(t(s, dir, "documents")
          .select("doc_id", "lang", "n_chars"), col("doc_id"))
        .orderBy("shard", "pos")
    }, """
      SELECT doc_id, lang, n_chars,
        substr(md5(doc_id::VARCHAR), 1, 1) AS shard,
        CAST(row_number() OVER (PARTITION BY substr(md5(doc_id::VARCHAR), 1, 1)
          ORDER BY md5(doc_id::VARCHAR)) AS INT) AS pos
      FROM documents ORDER BY shard, pos
    """),

    // ---------------------------------------------------------------
    // Weighted corpus mixing: per-language epoch counts (upsample zh to
    // 2.25 copies, downsample en to a deterministic half), md5-gated
    // fractional membership — the mixture-weights step of a corpus build
    // ---------------------------------------------------------------

    ("pipe_mix_epochs", (s: SparkSession, dir: String) => {
      Pipeline.mixEpochs(t(s, dir, "documents"), col("lang"), col("doc_id"),
          Map("en" -> 0.5, "zh" -> 2.25))
        .select("doc_id", "lang", "epoch")
        .orderBy("doc_id", "epoch")
    }, """
      WITH e AS (
        SELECT doc_id, lang,
          CASE lang WHEN 'en' THEN 0.5 WHEN 'zh' THEN 2.25 ELSE 1.0 END AS ep
        FROM documents),
      x AS (
        SELECT doc_id, lang, ep,
          unnest(range(CAST(ceil(ep) AS BIGINT))) AS epoch
        FROM e)
      SELECT doc_id, lang, CAST(epoch AS INT) AS epoch
      FROM x
      WHERE epoch < floor(ep)
         OR substr(md5(doc_id::VARCHAR || ':' || epoch::VARCHAR), 1, 2) <=
            CASE lang WHEN 'en' THEN '7f' WHEN 'zh' THEN '3f' ELSE '' END
      ORDER BY doc_id, epoch
    """),

    // ---------------------------------------------------------------
    // Context-window chunking: 40-token chunks, 8-token overlap
    // ---------------------------------------------------------------

    ("txt_chunk", (s: SparkSession, dir: String) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(TextOps.chunks(col("text"), maxTok = 40, overlap = 8))
            .as(Seq("chunk_id", "chunk")))
        .select(col("doc_id"), col("chunk_id"),
          size(TextOps.tokens(col("chunk"))).as("n_tok"),
          md5(col("chunk")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_id")
    }, """
      WITH tk AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
        FROM documents),
      c AS (
        SELECT doc_id, ws,
          CASE WHEN len(ws) <= 40 THEN 1
               ELSE 1 + CAST(ceil((len(ws) - 40) / 32.0) AS INT) END AS nch
        FROM tk),
      x AS (SELECT doc_id, ws, unnest(range(nch)) AS chunk_id FROM c)
      SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
        CAST(len(ws[chunk_id*32 + 1 : chunk_id*32 + 40]) AS INT) AS n_tok,
        md5(array_to_string(ws[chunk_id*32 + 1 : chunk_id*32 + 40], ' ')) AS chunk_md5
      FROM x ORDER BY doc_id, chunk_id
    """),

    // ---------------------------------------------------------------
    // tf·idf keywords: top-3 characteristic terms per document, idf as
    // the exact rational (N+1)/(df+1) so ranking is bit-reproducible
    // ---------------------------------------------------------------

    ("txt_tfidf_keywords", (s: SparkSession, dir: String) => {
      TextOps.tfidfTopTerms(t(s, dir, "documents"), "text", "doc_id", k = 3)
        .orderBy("doc_id", "rank")
    }, """
      WITH tf AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        FROM documents),
      tfc AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY 1, 2),
      dfreq AS (SELECT term, count(*) AS df_t FROM tfc GROUP BY 1),
      n AS (SELECT count(*) AS nd FROM documents),
      scored AS (
        SELECT t.doc_id, t.term, t.tf, d.df_t,
          CAST(t.tf * (n.nd + 1) AS DOUBLE) / (d.df_t + 1) AS score
        FROM tfc t JOIN dfreq d USING (term) CROSS JOIN n),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY doc_id
          ORDER BY score DESC, term) AS rank
        FROM scored)
      SELECT doc_id, CAST(rank AS INT) AS rank, term, tf, df_t,
        round(score, 4) AS score
      FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank
    """),

    // ---------------------------------------------------------------
    // End-to-end curation: quality filter -> exact dedup -> budget cut
    // ---------------------------------------------------------------

    ("pipe_curation", (s: SparkSession, dir: String) => {
      // project the text away before any shuffle: quality/tokens/
      // fingerprint are computed in the scan stage, and only the narrow
      // (id, quality, n_tok, fp) rows flow into the dedup + prefix-sum
      // exchanges — at corpus scale the raw text never moves
      // generator boundary (the r9 trick, reapplied r16): filtering on a
      // plain `qualityScore(text) AS quality` alias lets
      // PushDownPredicates substitute the full scoring expression into
      // the filter condition, so every text was scored TWICE per row —
      // once in the pushed Filter, once in the Project (no
      // cross-operator subexpression elimination; StageAudit measured
      // the scan stage at 97% of the query's CPU). Predicates that
      // reference generator output cannot be pushed through the
      // Generate, so the explode(array(struct(...))) boundary pins ONE
      // scoring pass per row and the filter tests the struct field.
      val scored = dupedDocs(s, dir)
        .select(col("doc_id"),
          explode(array(struct(
            TextOps.qualityScore(col("text")).as("quality"),
            TextOps.bpeishTokenCount(col("text")).cast("long").as("n_tok"),
            TextOps.fingerprint(col("text")).as("__fp")))).as("__s"))
        .select(col("doc_id"), col("__s.quality").as("quality"),
          col("__s.n_tok").as("n_tok"), col("__s.__fp").as("__fp"))
        .filter(col("quality") >= 0.91)
      val dedup = scored
        .withColumn("__rn", row_number().over(
          Window.partitionBy("__fp").orderBy("doc_id")))
        .filter(col("__rn") === 1)
      val budgeted = Pipeline.prefixSum(dedup,
        Seq(col("quality").desc, col("doc_id")), col("n_tok"), "cum_tok")
      budgeted.filter(col("cum_tok") <= 8000L)
        .select("doc_id", "quality", "n_tok", "cum_tok")
        .orderBy("cum_tok")
    }, s"""
      WITH $dupedCorpusSql,
      scored AS (
        SELECT doc_id,
          round(
            (length(regexp_replace(lower(text), '[^a-z]', '', 'g')) / greatest(length(text), 1)) * 0.5
            + (1.0 - length(regexp_replace(text, '[^0-9]', '', 'g')) / greatest(length(text), 1)) * 0.2
            + (CASE WHEN n_tok0 > 0 AND alnum / n_tok0 BETWEEN 2 AND 12 THEN 1.0 ELSE 0.5 END) * 0.2
            + (CASE WHEN stops > 0 THEN 1.0 ELSE 0.7 END) * 0.1 + 0.000000001, 4) AS quality,
          CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> ''))
            + length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS BIGINT) AS n_tok,
          md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
        FROM (
          SELECT *,
            CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS DOUBLE) AS n_tok0,
            length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS alnum,
            len(regexp_extract_all(lower(text), '\\b(the|a|and|of|to|in|is)\\b')) AS stops
          FROM corpus)
        WHERE quality >= 0.91),
      dedup AS (
        SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
          FROM scored) WHERE rn = 1),
      budgeted AS (
        SELECT doc_id, quality, n_tok,
          CAST(sum(n_tok) OVER (ORDER BY quality DESC, doc_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
        FROM dedup)
      SELECT doc_id, quality, n_tok, cum_tok
      FROM budgeted WHERE cum_tok <= 8000 ORDER BY cum_tok
    """),

    ("pipe_pack_batches", (s: SparkSession, dir: String) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.bpeishTokenCount(col("text")).cast("long").as("n_tok"))
      Pipeline.packByBudget(toks, Seq(col("doc_id")), col("n_tok"),
          budget = 4000L, out = "batch_id")
        .groupBy("batch_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("batch_tokens"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .orderBy("batch_id")
    }, """
      WITH toks AS (
        SELECT doc_id,
          CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> ''))
            + length(regexp_replace(text, '[\w\s]', '', 'g')) AS BIGINT) AS n_tok
        FROM documents),
      packed AS (
        SELECT doc_id, n_tok,
          CAST(floor((sum(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
            - n_tok) / 4000.0) AS BIGINT) AS batch_id
        FROM toks)
      SELECT batch_id, count(*) AS n_docs,
        CAST(sum(n_tok) AS BIGINT) AS batch_tokens,
        min(doc_id) AS first_doc, max(doc_id) AS last_doc
      FROM packed GROUP BY 1 ORDER BY 1
    """),

    // ---------------------------------------------------------------
    // Exact interpolated percentiles (sort-based aggregate)
    // ---------------------------------------------------------------

    ("agg_quantiles", (s: SparkSession, dir: String) => {
      t(s, dir, "documents").groupBy("lang")
        .agg(count(lit(1)).as("n"),
          round(expr("percentile(n_chars, 0.25)"), 4).as("p25"),
          round(expr("percentile(n_chars, 0.5)"), 4).as("p50"),
          round(expr("percentile(n_chars, 0.9)"), 4).as("p90"),
          round(expr("percentile(n_chars, 0.99)"), 4).as("p99"))
        .orderBy("lang")
    }, """
      SELECT lang, count(*) AS n,
        round(quantile_cont(n_chars, 0.25), 4) AS p25,
        round(quantile_cont(n_chars, 0.5), 4) AS p50,
        round(quantile_cont(n_chars, 0.9), 4) AS p90,
        round(quantile_cont(n_chars, 0.99), 4) AS p99
      FROM documents GROUP BY lang ORDER BY lang
    """),

    // ---------------------------------------------------------------
    // Distribution window functions
    // ---------------------------------------------------------------

    ("w_distribution_funcs", (s: SparkSession, dir: String) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal"), col("c_custkey"))
      t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"),
          round(col("c_acctbal"), 2).as("acctbal"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"),
          ntile(10).over(w).as("decile"))
        .orderBy("c_mktsegment", "acctbal", "c_custkey")
    }, """
      SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS acctbal,
        round(percent_rank() OVER w, 6) AS pr,
        round(cume_dist() OVER w, 6) AS cd,
        CAST(ntile(10) OVER w AS INT) AS decile
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      ORDER BY c_mktsegment, acctbal, c_custkey
    """),

    // ---------------------------------------------------------------
    // Bivariate statistical aggregates
    // ---------------------------------------------------------------

    ("agg_stats_funcs", (s: SparkSession, dir: String) => {
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("cov_qty_disc"),
          round(covar_pop(col("l_quantity"), col("l_discount")), 6).as("covp_qty_disc"),
          round(stddev_samp(col("l_discount")), 6).as("sd_disc"),
          round(var_samp(col("l_tax")), 6).as("var_tax"),
          round(expr("regr_slope(l_discount, l_quantity)"), 6).as("slope_disc_qty"),
          round(expr("regr_intercept(l_discount, l_quantity)"), 6).as("icept_disc_qty"))
        .orderBy("l_returnflag")
    }, """
      SELECT l_returnflag, count(*) AS n,
        round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
        round(covar_samp(l_quantity, l_discount), 6) AS cov_qty_disc,
        round(covar_pop(l_quantity, l_discount), 6) AS covp_qty_disc,
        round(stddev_samp(l_discount), 6) AS sd_disc,
        round(var_samp(l_tax), 6) AS var_tax,
        round(regr_slope(l_discount, l_quantity), 6) AS slope_disc_qty,
        round(regr_intercept(l_discount, l_quantity), 6) AS icept_disc_qty
      FROM lineitem GROUP BY 1 ORDER BY 1
    """),

    // ---------------------------------------------------------------
    // Pivot / unpivot
    // ---------------------------------------------------------------

    ("ev_pivot_type", (s: SparkSession, dir: String) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val wide = t(s, dir, "events")
        .groupBy("user_id").pivot("event_type", types).agg(count(lit(1)))
      types.foldLeft(wide) { (df, ty) =>
          df.withColumn(s"n_$ty", coalesce(col(ty), lit(0L))).drop(ty)
        }
        .orderBy("user_id")
    }, """
      SELECT user_id,
        CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
        CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
        CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
        CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
        CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view
      FROM events GROUP BY user_id ORDER BY user_id
    """),

    ("ev_unpivot_type", (s: SparkSession, dir: String) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val wide = t(s, dir, "events")
        .groupBy("user_id").pivot("event_type", types).agg(count(lit(1)))
      wide.unpivot(Array(col("user_id")),
          types.map(ty => coalesce(col(ty), lit(0L)).as(ty)).toArray,
          "event_type", "n")
        .filter(col("n") > 0)
        .orderBy("user_id", "event_type")
    }, """
      SELECT user_id, event_type, count(*) AS n
      FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """),

    // ---------------------------------------------------------------
    // Approximate sketches, gated against exact values: the query emits
    // the EXACT aggregate (oracle-checkable) plus a boolean asserting the
    // sketch landed within its error bound — so the probabilistic
    // operator still hash-matches a deterministic oracle
    // ---------------------------------------------------------------

    ("agg_approx_distinct", (s: SparkSession, dir: String) => {
      t(s, dir, "events").groupBy("event_type")
        .agg(countDistinct("user_id").as("n_exact"),
          approx_count_distinct("user_id").as("__approx"))
        .select(col("event_type"), col("n_exact"),
          (abs(col("__approx") - col("n_exact")) <=
            col("n_exact") * 0.15).as("approx_ok"))
        .orderBy("event_type")
    }, """
      SELECT event_type, count(DISTINCT user_id) AS n_exact, true AS approx_ok
      FROM events GROUP BY 1 ORDER BY 1
    """),

    ("agg_approx_quantile", (s: SparkSession, dir: String) => {
      t(s, dir, "events").groupBy("event_type")
        .agg(round(expr("percentile(value, 0.5)"), 4).as("p50_exact"),
          expr("percentile_approx(value, 0.5, 10000)").as("__p50_approx"))
        .select(col("event_type"), col("p50_exact"),
          (abs(col("__p50_approx") - col("p50_exact")) <= 1.0).as("approx_ok"))
        .orderBy("event_type")
    }, """
      SELECT event_type, round(quantile_cont(value, 0.5), 4) AS p50_exact,
        true AS approx_ok
      FROM events GROUP BY 1 ORDER BY 1
    """),

    // ---------------------------------------------------------------
    // Time-series gap filling: generated hourly spine LEFT JOIN counts
    // ---------------------------------------------------------------

    ("ev_gapfill_hours", (s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events")
      // timestamp_ntz end-to-end: the spine and the counts key both carry
      // the naive type, so the gate's parquet schema can't be flipped by
      // session-level writer confs (and matches DuckDB's naive date_trunc)
      val spine = ev
        .agg(date_trunc("hour", min(col("ts"))).cast("timestamp_ntz").as("lo"),
          date_trunc("hour", max(col("ts"))).cast("timestamp_ntz").as("hi"))
        .select(explode(sequence(col("lo"), col("hi"),
          expr("interval 1 hour"))).as("hour"))
      val counts = ev.filter(col("event_type") === "purchase")
        .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      spine.join(counts, Seq("hour"), "left")
        .select(col("hour"), coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
        .orderBy("hour")
    }, """
      WITH bounds AS (
        SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
        FROM events),
      spine AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds),
      counts AS (
        SELECT date_trunc('hour', ts) AS hour, count(*) AS n,
          round(sum(value), 2) AS sum_value
        FROM events WHERE event_type = 'purchase' GROUP BY 1)
      SELECT s.hour, CAST(coalesce(c.n, 0) AS BIGINT) AS n,
        coalesce(c.sum_value, 0.0) AS sum_value
      FROM spine s LEFT JOIN counts c ON s.hour = c.hour ORDER BY 1
    """),

    // ---------------------------------------------------------------
    // Embedding mean pooling: per-label centroids, element-wise. The
    // posexplode → (label, pos) hash-agg shape is the scalable mean-pool:
    // one shuffle keyed on (label, dim), map-side partial sums, no
    // driver-side vectors — the same plan at 100 TB
    // ---------------------------------------------------------------

    ("emb_centroids", (s: SparkSession, dir: String) => {
      t(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("label", "pos")
        .agg(count(lit(1)).as("n"), round(avg("v"), 4).as("centroid"))
        .orderBy("label", "pos")
    }, """
      SELECT label, CAST(pos AS INT) AS pos, count(*) AS n,
        round(avg(v), 4) AS centroid
      FROM (
        SELECT label, unnest(embedding) AS v,
          unnest(range(len(embedding))) AS pos
        FROM embeddings)
      GROUP BY 1, 2 ORDER BY 1, 2
    """),

    // ---------------------------------------------------------------
    // Watermarked append-mode streaming
    // ---------------------------------------------------------------

    // ---------------------------------------------------------------
    // Bigram language-model quality scoring: self-trained add-1 model,
    // mean log-probability per document (perplexity-proxy filter)
    // ---------------------------------------------------------------

    ("txt_lm_score", (s: SparkSession, dir: String) => {
      TextOps.bigramLmScore(t(s, dir, "documents"), "text", "doc_id")
        .orderBy("doc_id")
    }, """
      WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
        FROM documents),
      pairs AS (
        SELECT doc_id, unnest(ws[1:len(ws)-1]) AS w1, unnest(ws[2:len(ws)]) AS w2
        FROM toks WHERE len(ws) >= 2),
      uni AS (SELECT unnest(ws) AS w1 FROM toks),
      ucnt AS (SELECT w1, count(*) AS uc FROM uni GROUP BY 1),
      v AS (SELECT count(DISTINCT w1) AS vv FROM uni),
      bi AS (SELECT w1, w2, count(*) AS bc FROM pairs GROUP BY 1, 2)
      SELECT doc_id, count(*) AS n_bigrams,
        round(avg(ln((bc + 1) / (uc + vv))) + 0.000000001, 4) AS lm_score
      FROM pairs JOIN bi USING (w1, w2) JOIN ucnt USING (w1) CROSS JOIN v
      GROUP BY doc_id ORDER BY doc_id
    """),

    // ---------------------------------------------------------------
    // Stream-stream interval join (watermarked attribution join) and
    // cross-batch streaming dedup — each hash-checked vs a batch oracle
    // ---------------------------------------------------------------

    ("stream_join_interval", (s: SparkSession, dir: String) => {
      graft.streaming.EventStream.purchaseClickJoin(s, dir)
    }, """
      SELECT p.event_id AS p_id, c.event_id AS c_id,
        epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
      FROM events p JOIN events c
        ON p.event_type = 'purchase' AND c.event_type = 'click'
       AND p.user_id = c.user_id
       AND epoch_us(c.ts) >= epoch_us(p.ts) - 1800000000
       AND epoch_us(c.ts) <= epoch_us(p.ts)
      ORDER BY p_id, c_id
    """),

    ("stream_incremental_dedup", (s: SparkSession, dir: String) => {
      graft.streaming.EventStream.incrementalDedup(s, dir)
    }, """
      WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 400),
      newb AS (
        SELECT doc_id + 200000 AS doc_id, text, n_chars
        FROM documents WHERE doc_id < 400 AND doc_id % 10 = 0
        UNION ALL
        SELECT doc_id, text, n_chars FROM documents WHERE doc_id >= 400)
      SELECT doc_id, n_chars FROM newb n
      WHERE NOT EXISTS (
        SELECT 1 FROM corpus c
        WHERE md5(trim(regexp_replace(lower(c.text), '[^a-z0-9]+', ' ', 'g')))
            = md5(trim(regexp_replace(lower(n.text), '[^a-z0-9]+', ' ', 'g'))))
      ORDER BY doc_id
    """),

    ("stream_dedup", (s: SparkSession, dir: String) => {
      graft.streaming.EventStream.dedupCounts(s, dir)
    }, """
      SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
      FROM events GROUP BY 1 ORDER BY 1
    """),

    ("stream_watermark_append", (s: SparkSession, dir: String) => {
      graft.streaming.EventStream.hourlyCountsAppend(s, dir)
    }, """
      SELECT date_trunc('hour', ts) AS hour, event_type,
        count(*) AS n, round(sum(value), 2) AS sum_value
      FROM events
      GROUP BY 1, 2
      HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR <=
        (SELECT max(ts) FROM events) - INTERVAL 1 HOUR
      ORDER BY 1, 2
    """)
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map { case (n, f, _) => n -> f }.toMap

  val oracle: Map[String, String] =
    defs.filter(_._3 != null)
      .map { case (n, _, o) => n -> o.stripMargin.trim.replaceAll("\\s+", " ") }.toMap
}
