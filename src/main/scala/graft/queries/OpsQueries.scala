package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Multimodal, Similarity, TextOps}

/** Correctness-gate entries for the training-data pipeline operators
  * (dedup / similarity / text analysis / multimodal). Where the operator's
  * math is portable (regex counts, md5, jaccard over grams, cosine) the
  * oracle recomputes it in DuckDB SQL; the xxhash64-based sketches
  * (MinHash/LSH, SimHash) are not DuckDB-expressible and are covered by
  * recall/precision specs instead (rows-only here).
  */
object OpsQueries {
  import Tables.t

  /** Perturbed twin corpus: every even doc_id gets a copy (id+100000) with
    * the first word replaced — the planted near-duplicate set used by the
    * dedup entries and specs.
    */
  def plantedDocs(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    docs.unionByName(docs
      .filter(col("doc_id") % 2 === 0)
      .withColumn("doc_id", col("doc_id") + 100000L)
      .withColumn("text", regexp_replace(col("text"), "^\\S+", "zz")))
  }

  /** The DuckDB-side mirror of [[plantedDocs]] (a WITH-clause body). */
  val plantedCorpusSql: String =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, regexp_replace(text, '^\S+', 'zz')
      |  FROM documents WHERE doc_id % 2 = 0)""".stripMargin

  val defs: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(

    ("txt_token_stats", (s: SparkSession, dir: String) => {
      t(s, dir, "documents").select(col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        TextOps.distinctTokenCount(col("text")).as("n_distinct_tokens"),
        TextOps.bpeishTokenCount(col("text")).as("n_bpeish"),
        length(col("text")).as("n_chars_actual"))
        .orderBy("doc_id")
    }, """
      SELECT doc_id,
        CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS INT) AS n_tokens,
        CAST(len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS INT) AS n_distinct_tokens,
        CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> ''))
          + length(regexp_replace(text, '[\w\s]', '', 'g')) AS INT) AS n_bpeish,
        CAST(length(text) AS INT) AS n_chars_actual
      FROM documents ORDER BY doc_id
    """),

    ("txt_quality", (s: SparkSession, dir: String) => {
      t(s, dir, "documents").select(col("doc_id"),
        round(TextOps.alphaRatio(col("text")), 4).as("alpha_ratio"),
        round(TextOps.digitRatio(col("text")), 4).as("digit_ratio"),
        TextOps.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    }, """
      SELECT doc_id,
        round(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
              / greatest(length(text), 1), 4) AS alpha_ratio,
        round(length(regexp_replace(text, '[^0-9]', '', 'g'))
              / greatest(length(text), 1), 4) AS digit_ratio,
        round(
          (length(regexp_replace(lower(text), '[^a-z]', '', 'g')) / greatest(length(text), 1)) * 0.5
          + (1.0 - length(regexp_replace(text, '[^0-9]', '', 'g')) / greatest(length(text), 1)) * 0.2
          + (CASE WHEN n_tok > 0 AND alnum / n_tok BETWEEN 2 AND 12 THEN 1.0 ELSE 0.5 END) * 0.2
          + (CASE WHEN stops > 0 THEN 1.0 ELSE 0.7 END) * 0.1 + 0.000000001, 4) AS quality
      FROM (
        SELECT *,
          CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS DOUBLE) AS n_tok,
          length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS alnum,
          len(regexp_extract_all(lower(text), '\b(the|a|and|of|to|in|is)\b')) AS stops
        FROM documents)
      ORDER BY doc_id
    """),

    ("txt_langid", (s: SparkSession, dir: String) => {
      t(s, dir, "documents").select(col("doc_id"), col("lang").as("lang_label"),
        TextOps.langId(col("text")).as("lang_pred"),
        TextOps.stopwordCount(col("text"), TextOps.langMarkers.head._2).as("score_en"))
        .orderBy("doc_id")
    }, """
      SELECT doc_id, lang AS lang_label,
        CASE WHEN greatest(s_en, s_de, s_es, s_fr) <= 0 THEN 'und'
             WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
             WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
             WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
             WHEN s_fr = greatest(s_en, s_de, s_es, s_fr) THEN 'fr'
             ELSE 'und' END AS lang_pred,
        s_en AS score_en
      FROM (
        SELECT doc_id, lang,
          len(regexp_extract_all(lower(text), '\b(the|and|of|to|is)\b')) AS s_en,
          len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist)\b')) AS s_de,
          len(regexp_extract_all(lower(text), '\b(el|los|las|una|es)\b')) AS s_es,
          len(regexp_extract_all(lower(text), '\b(le|la|les|des|et)\b')) AS s_fr
        FROM documents)
      ORDER BY doc_id
    """),

    ("txt_fingerprint", (s: SparkSession, dir: String) => {
      t(s, dir, "documents").select(col("doc_id"),
        TextOps.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }, """
      SELECT doc_id,
        md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
      FROM documents ORDER BY doc_id
    """),

    ("txt_redact", (s: SparkSession, dir: String) => {
      // PII scrub: plant deterministic emails/URLs/phones into the corpus
      // (identically in the oracle), then mask + count per family
      val planted = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          lit(" contact u"), col("doc_id"), lit("@example.com or "),
          lit("https://ex.org/d/"), col("doc_id"),
          lit(" tel +1 (555) 010-"), lpad(col("doc_id") % 10000, 4, "0")).as("text"))
      val (ne, nu, np) = TextOps.piiCounts(col("text"))
      planted.select(col("doc_id"),
        TextOps.redactPii(col("text")).as("clean"),
        ne.as("n_email"), nu.as("n_url"), np.as("n_phone"))
        .orderBy("doc_id")
    }, """
      WITH planted AS (
        SELECT doc_id,
          text || ' contact u' || doc_id || '@example.com or ' ||
            'https://ex.org/d/' || doc_id ||
            ' tel +1 (555) 010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
        FROM documents),
      masked AS (
        SELECT doc_id, text,
          regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS after_email
        FROM planted),
      masked2 AS (
        SELECT *, regexp_replace(after_email, 'https?://[^\s]+', '<URL>', 'g') AS after_url
        FROM masked)
      SELECT doc_id,
        regexp_replace(after_url, '\+?[0-9][0-9()\-. ]{7,}[0-9]', '<PHONE>', 'g') AS clean,
        CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
        CAST(len(regexp_extract_all(after_email, 'https?://[^\s]+')) AS INT) AS n_url,
        CAST(len(regexp_extract_all(after_url, '\+?[0-9][0-9()\-. ]{7,}[0-9]')) AS INT) AS n_phone
      FROM masked2 ORDER BY doc_id
    """),

    ("txt_repetition", (s: SparkSession, dir: String) => {
      // repetition-based quality signals (Gopher-style): the flat corpus
      // text has no newlines, so lines are planted deterministically —
      // 80-char chunks, with every third doc's first line repeated at the
      // end (a known-duplicated-line population for the metric to find)
      val docs = t(s, dir, "documents")
      val l1 = substring(col("text"), 1, 80)
      val lined0 = concat_ws("\n", l1, substring(col("text"), 81, 80),
        substring(col("text"), 161, 80), substring(col("text"), 241, 1000000))
      val lined = when(col("doc_id") % 3 === 0, concat(lined0, lit("\n"), l1))
        .otherwise(lined0)
      val lineMetrics = docs.select(col("doc_id"),
        size(TextOps.nonBlankLines(lined)).as("n_lines"),
        round(TextOps.dupLineFraction(lined), 4).as("dup_line_frac"),
        round(TextOps.dupLineCharFraction(lined), 4).as("dup_char_frac"))
      // most-frequent-token share: two hash aggregations keyed on doc_id
      // (map-side combined) — never a per-doc O(n^2) array scan
      val top = docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(round(max("c").cast("double") / sum("c"), 4).as("top_token_ratio"))
      lineMetrics.join(top, Seq("doc_id"), "left")
        .withColumn("top_token_ratio", coalesce(col("top_token_ratio"), lit(0.0)))
        .orderBy("doc_id")
    }, """
      WITH lined AS (
        SELECT doc_id, text,
          CASE WHEN doc_id % 3 = 0 THEN base || chr(10) || substr(text, 1, 80)
               ELSE base END AS ltext
        FROM (
          SELECT doc_id, text,
            concat_ws(chr(10), substr(text, 1, 80), substr(text, 81, 80),
              substr(text, 161, 80), substr(text, 241, 1000000)) AS base
          FROM documents)),
      lm AS (
        SELECT doc_id,
          CAST(len(ls) AS INT) AS n_lines,
          round(CASE WHEN len(ls) = 0 THEN 0.0
            ELSE (len(ls) - len(list_distinct(ls))) / CAST(len(ls) AS DOUBLE) END, 4)
            AS dup_line_frac,
          round(CASE WHEN tc = 0 THEN 0.0
            ELSE (tc - dc) / CAST(tc AS DOUBLE) END, 4) AS dup_char_frac
        FROM (
          SELECT doc_id, ls,
            coalesce(list_sum(list_transform(ls, x -> length(x))), 0) AS tc,
            coalesce(list_sum(list_transform(list_distinct(ls), x -> length(x))), 0) AS dc
          FROM (SELECT doc_id,
                  list_filter(string_split(ltext, chr(10)), x -> trim(x) <> '') AS ls
                FROM lined))),
      tw AS (
        SELECT doc_id, round(CAST(max(c) AS DOUBLE) / sum(c), 4) AS top_token_ratio
        FROM (SELECT doc_id, w, count(*) AS c
              FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
                    FROM documents) GROUP BY 1, 2)
        GROUP BY doc_id)
      SELECT l.doc_id, n_lines, dup_line_frac, dup_char_frac,
        coalesce(top_token_ratio, 0.0) AS top_token_ratio
      FROM lm l LEFT JOIN tw USING (doc_id) ORDER BY doc_id
    """),

    ("txt_boilerplate", (s: SparkSession, dir: String) => {
      // corpus-level boilerplate stripping: plant a shared header+footer
      // on every doc, strip lines appearing in >= 100 docs
      val planted = t(s, dir, "documents").select(col("doc_id"),
        concat(lit("SHARED HEADER\n"), col("text"),
          lit("\nCopyright Footer 2024")).as("text"))
      TextOps.stripBoilerplate(planted, "text", "doc_id", minRepeats = 100)
        .orderBy("doc_id")
    }, """
      WITH planted AS (
        SELECT doc_id,
          'SHARED HEADER' || chr(10) || text || chr(10) || 'Copyright Footer 2024' AS text
        FROM documents),
      lns AS (
        SELECT doc_id,
          unnest(generate_series(1, len(string_split(text, chr(10))))) AS pos,
          unnest(string_split(text, chr(10))) AS line
        FROM planted),
      freq AS (
        SELECT line FROM (
          SELECT line, count(DISTINCT doc_id) AS d FROM lns GROUP BY line)
        WHERE d >= 100)
      SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text
      FROM lns WHERE line NOT IN (SELECT line FROM freq)
      GROUP BY doc_id ORDER BY doc_id
    """),

    ("dedup_exact", (s: SparkSession, dir: String) => {
      // corpus with planted EXACT duplicates (same text, higher id):
      val docs = t(s, dir, "documents")
      val corpus = docs.unionByName(
        docs.filter(col("doc_id") % 5 === 0).withColumn("doc_id", col("doc_id") + 100000L))
      Dedup.exactDedup(corpus, "text", "doc_id")
        .select("doc_id", "lang").orderBy("doc_id")
    }, """
      SELECT doc_id, lang FROM documents ORDER BY doc_id
    """),

    ("dedup_keep_latest", (s: SparkSession, dir: String) => {
      // snapshot compaction: one row per (user, event_type), newest wins
      Dedup.keepLatest(t(s, dir, "events"),
          Seq(col("user_id"), col("event_type")),
          Seq(unix_micros(col("ts").cast("timestamp")).as("ts_us"), col("event_id")))
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"), round(col("value"), 2).as("value"))
        .orderBy("user_id", "event_type")
    }, """
      SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
        round(value, 2) AS value
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
              ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
            FROM events)
      WHERE rn = 1 ORDER BY user_id, event_type
    """),

    ("dedup_ngram_jaccard", (s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") < 100)
      val twins = docs.select(col("doc_id"),
        Dedup.jaccard(
          Dedup.shingles(col("text")),
          Dedup.shingles(regexp_replace(col("text"), "^\\S+", "zz"))).as("j"))
      twins.select(col("doc_id"), round(col("j"), 4).as("jaccard")).orderBy("doc_id")
    }, """
      SELECT doc_id,
        round(CAST(len(list_intersect(g1, g2)) AS DOUBLE)
              / len(list_distinct(g1 || g2)), 4) AS jaccard
      FROM (
        SELECT doc_id,
          list_distinct([array_to_string(w1[i:i+2], ' ') for i in range(1, len(w1) - 1)]) AS g1,
          list_distinct([array_to_string(w2[i:i+2], ' ') for i in range(1, len(w2) - 1)]) AS g2
        FROM (
          SELECT doc_id,
            regexp_extract_all(lower(text), '[a-z0-9]+') AS w1,
            regexp_extract_all(lower(regexp_replace(text, '^\S+', 'zz')), '[a-z0-9]+') AS w2
          FROM documents WHERE doc_id < 100))
      ORDER BY doc_id
    """),

    ("txt_top_ngrams", (s: SparkSession, dir: String) => {
      TextOps.topNgrams(t(s, dir, "documents"), "text", "doc_id", w = 3, k = 20)
    }, """
      WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
        FROM documents
      ), grams AS (
        SELECT doc_id,
          CASE WHEN len(ts) >= 3
            THEN [array_to_string(ts[i:i+2], ' ') for i in range(1, len(ts) - 1)]
            ELSE [array_to_string(ts, ' ')] END AS gs
        FROM toks
      ), g AS (
        SELECT doc_id, unnest(gs) AS ngram FROM grams
      ), per AS (
        SELECT ngram, doc_id, count(*) AS occ FROM g GROUP BY 1, 2
      )
      SELECT ngram, count(*) AS doc_freq, CAST(sum(occ) AS BIGINT) AS occurrences
      FROM per GROUP BY ngram
      ORDER BY doc_freq DESC, occurrences DESC, ngram
      LIMIT 20
    """),

    ("dedup_span_coverage", (s: SparkSession, dir: String) => {
      // corpus with planted cross-document SPAN duplication: every 5th
      // doc gets a half-copy (the first n_chars/2 characters) under a
      // new id — the copy's shingles all exist in the original, so the
      // copy measures ~full duplicate coverage and the original partial
      // coverage; natural cross-doc shingle overlap in the corpus also
      // counts (both engines see the same corpus, so exact parity)
      val docs = t(s, dir, "documents")
      val corpus = docs.select(col("doc_id"), col("text")).unionByName(
        docs.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 100000L).as("doc_id"),
            // integer division on BOTH sides: DuckDB CAST(double AS INT)
            // rounds half-up while Spark's cast truncates — n_chars/2 on
            // odd lengths would shift the copy by one character
            expr("substring(text, 1, cast(n_chars div 2 as int))").as("text")))
      Dedup.duplicateSpanCoverage(corpus, "text", "doc_id", w = 5)
        .select(col("doc_id"), col("n_shingles"), col("dup_shingles"),
          round(col("dup_coverage"), 4).as("dup_coverage"))
        .orderBy("doc_id")
    }, """
      WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000, substr(text, 1, CAST(n_chars // 2 AS INT))
        FROM documents WHERE doc_id % 5 = 0
      ), toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
        FROM corpus WHERE text IS NOT NULL
      ), grams AS (
        SELECT doc_id,
          CASE WHEN len(ts) >= 5
            THEN [md5(array_to_string(ts[i:i+4], ' ')) for i in range(1, len(ts) - 3)]
            ELSE [md5(array_to_string(ts, ' '))] END AS hs
        FROM toks
      ), sh AS (
        SELECT doc_id, unnest(hs) AS h FROM grams
      ), dup AS (
        SELECT h FROM sh GROUP BY h HAVING count(DISTINCT doc_id) > 1
      )
      SELECT s.doc_id, count(*) AS n_shingles, count(d.h) AS dup_shingles,
        round(count(d.h) * 1.0 / count(*), 4) AS dup_coverage
      FROM sh s LEFT JOIN dup d USING (h)
      GROUP BY s.doc_id ORDER BY s.doc_id
    """),

    ("dedup_incremental", (s: SparkSession, dir: String) => {
      // corpus = docs < 400; new batch = exact copies (every 50th doc,
      // +200000), perturbed near-copies (every 40th doc, first word ->
      // 'zz', +300000), and genuinely new docs (400-499, unmatched
      // unless naturally near-duplicated — deterministic both engines)
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val corpus = docs.filter(col("doc_id") < 400)
      val newBatch = corpus.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 200000L).as("doc_id"), col("text"))
        .unionByName(corpus.filter(col("doc_id") % 40 === 0)
          .select((col("doc_id") + 300000L).as("doc_id"),
            regexp_replace(col("text"), "^\\S+", "zz").as("text")))
        .unionByName(docs.filter(col("doc_id") >= 400))
      Dedup.incrementalDuplicates(newBatch, corpus, "text", "doc_id",
          threshold = 0.5)
        .orderBy("id_a", "id_b", "reason")
    }, s"""
      WITH docs AS (SELECT doc_id, text FROM documents),
      corpus AS (SELECT doc_id, text FROM docs WHERE doc_id < 400),
      newb AS (
        SELECT doc_id + 200000 AS doc_id, text FROM corpus WHERE doc_id % 50 = 0
        UNION ALL
        SELECT doc_id + 300000, regexp_replace(text, '^\\S+', 'zz')
        FROM corpus WHERE doc_id % 40 = 0
        UNION ALL
        SELECT doc_id, text FROM docs WHERE doc_id >= 400),
      alld AS (SELECT * FROM corpus UNION ALL SELECT * FROM newb),
      fp_n AS (SELECT doc_id AS id_a,
          md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
        FROM newb),
      fp_c AS (SELECT doc_id AS id_b,
          md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
        FROM corpus),
      exact AS (SELECT id_a, id_b FROM fp_n JOIN fp_c USING (fp)),
      toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        FROM alld),
      grams AS (SELECT doc_id, list_distinct(
          CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
               ELSE [array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)] END) AS g
        FROM toks),
      sig AS (SELECT doc_id,
          [list_min([md5(CAST(i AS VARCHAR) || ':' || s) for s in g]) for i in range(0, 16)] AS sg
        FROM grams),
      bnd AS (SELECT doc_id, bd,
          md5(CAST(bd AS VARCHAR) || '|' || array_to_string(sg[bd*4+1 : bd*4+4], ',')) AS bucket
        FROM sig, range(0, 4) t(bd)),
      nb AS (SELECT doc_id AS id_a, bd, bucket FROM bnd
        WHERE doc_id IN (SELECT doc_id FROM newb)),
      cbr AS (SELECT doc_id AS id_b, bd, bucket,
          row_number() OVER (PARTITION BY bd, bucket ORDER BY doc_id) AS rn
        FROM bnd WHERE doc_id IN (SELECT doc_id FROM corpus)),
      cand AS (SELECT DISTINCT id_a, id_b
        FROM nb JOIN cbr USING (bd, bucket)
        WHERE rn <= ${Dedup.DefaultHotBucketThreshold}),
      ver AS (SELECT id_a, id_b,
          CAST(len(list_intersect(ga.g, gb.g)) AS DOUBLE)
            / (len(ga.g) + len(gb.g) - len(list_intersect(ga.g, gb.g))) AS j
        FROM cand JOIN grams ga ON ga.doc_id = id_a JOIN grams gb ON gb.doc_id = id_b),
      near AS (SELECT id_a, id_b, round(j, 4) AS j FROM ver
        WHERE j >= 0.5
          AND NOT EXISTS (SELECT 1 FROM exact e
                          WHERE e.id_a = ver.id_a AND e.id_b = ver.id_b))
      SELECT id_a, id_b, 'exact' AS reason, CAST(1.0 AS DOUBLE) AS jaccard FROM exact
      UNION ALL
      SELECT id_a, id_b, 'near', j FROM near
      ORDER BY id_a, id_b, reason
    """),

    // MinHash+LSH and SimHash sketches: xxhash64 is not expressible in
    // the DuckDB oracle, so these gates emit DETERMINISTIC recall
    // summaries (the sim_lsh_topk pattern). The eligible planted-pair
    // set is exact portable math the oracle reproduces; the only
    // sketch-dependent part is the recall bound, verified with margin at
    // sf0.001/0.01 by RecallMeasureSpec (measured 0.996+/0.88+).
    // Full hash-equality coverage lives in the *_md5 twins below.
    ("dedup_minhash", (s: SparkSession, dir: String) => {
      val corpus = plantedDocs(s, dir)
      val cands = Dedup.minhashCandidates(corpus, "text", "doc_id")
      val found = Dedup.verifyJaccard(cands, corpus, "text", "doc_id", threshold = 0.5)
      val planted = t(s, dir, "documents").filter(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 100000L).as("id_b"))
      val eligible = Dedup.verifyJaccard(planted, corpus, "text", "doc_id", threshold = 0.5)
      // one pass over the eligible subtree (r16): the former
      // eligible.agg ⨯ (eligible ⋉ found).agg shape instantiated the
      // whole verifyJaccard(planted, corpus) pipeline TWICE (Catalyst
      // re-computes per reference). found's pairs are unique (verify
      // ends in a groupBy(id_a, id_b)), so a left join preserves
      // eligible's row count and count(__hit) equals the semi-join
      // count — bit-identical output, one corpus gram pass saved.
      val recoveredFlag = eligible.join(
        found.select(col("id_a"), col("id_b"), lit(1).as("__hit")),
        Seq("id_a", "id_b"), "left")
      corpus.agg(count(lit(1)).cast("int").as("n_docs"))
        .crossJoin(recoveredFlag
          .agg(count(lit(1)).as("__ne"), count(col("__hit")).as("__nr"))
          .select(col("__ne").cast("int").as("n_eligible"),
            (col("__nr") >= ceil(col("__ne") * 0.9)).as("recall_ok")))
    }, s"""
      WITH $plantedCorpusSql,
      toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM corpus),
      grams AS (SELECT doc_id, list_distinct(
          CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
               ELSE [array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)] END) AS g
        FROM toks),
      planted AS (
        SELECT doc_id AS id_a, doc_id + 100000 AS id_b
        FROM documents WHERE doc_id % 2 = 0),
      elig AS (
        SELECT id_a FROM planted
        JOIN grams ga ON ga.doc_id = id_a JOIN grams gb ON gb.doc_id = id_b
        WHERE CAST(len(list_intersect(ga.g, gb.g)) AS DOUBLE)
          / (len(ga.g) + len(gb.g) - len(list_intersect(ga.g, gb.g))) >= 0.5)
      SELECT CAST((SELECT count(*) FROM corpus) AS INT) AS n_docs,
        CAST((SELECT count(*) FROM elig) AS INT) AS n_eligible,
        true AS recall_ok
    """),

    ("dedup_simhash", (s: SparkSession, dir: String) => {
      val corpus = plantedDocs(s, dir)
      val fps = Dedup.simhash64(corpus, "text", "doc_id")
      val pairs = Dedup.simhashPairs(fps, "doc_id", maxHamming = 8)
      val planted = t(s, dir, "documents").filter(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 100000L).as("id_b"))
      val recovered = planted.join(pairs, Seq("id_a", "id_b"), "left_semi")
      corpus.agg(count(lit(1)).cast("int").as("n_docs"))
        .crossJoin(planted.agg(count(lit(1)).as("__np"))
          .crossJoin(recovered.agg(count(lit(1)).as("__nr")))
          .select(col("__np").cast("int").as("n_planted"),
            (col("__nr") >= ceil(col("__np") * 0.8)).as("recall_ok")))
    }, s"""
      WITH $plantedCorpusSql
      SELECT CAST((SELECT count(*) FROM corpus) AS INT) AS n_docs,
        CAST((SELECT count(*) FROM documents WHERE doc_id % 2 = 0) AS INT) AS n_planted,
        true AS recall_ok
    """),

    // Same sketches with the engine-portable md5 hash family: every stage
    // (signature, banding, candidate pairs, verification) is reproduced in
    // the DuckDB oracle, so the LSH pipelines get full hash-equality
    // checks, not just recall specs.
    ("dedup_minhash_md5", (s: SparkSession, dir: String) => {
      val corpus = plantedDocs(s, dir)
      val cands = Dedup.minhashCandidatesMd5(corpus, "text", "doc_id")
      Dedup.verifyJaccardStrings(cands, corpus, "text", "doc_id", threshold = 0.5)
        .orderBy("id_a", "id_b")
    }, s"""
      WITH $plantedCorpusSql,
      toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM corpus),
      grams AS (SELECT doc_id, list_distinct(
          CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
               ELSE [array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)] END) AS g
        FROM toks),
      sig AS (SELECT doc_id,
          [list_min([md5(CAST(i AS VARCHAR) || ':' || s) for s in g]) for i in range(0, 16)] AS sg
        FROM grams),
      /* full band-bucket array per doc: the exact-collapse partition key
         (r15: sketch-identical docs collapse to a representative before
         banding; members link by consecutive-id chains) */
      barr AS (SELECT doc_id,
          [md5(CAST(b AS VARCHAR) || '|' || array_to_string(sg[b*4+1 : b*4+4], ',')) for b in range(0, 4)] AS ba
        FROM sig),
      grp AS (SELECT doc_id, ba,
          lag(doc_id) OVER (PARTITION BY array_to_string(ba, ',') ORDER BY doc_id) AS prev
        FROM barr),
      chains AS (SELECT prev AS id_a, doc_id AS id_b FROM grp WHERE prev IS NOT NULL),
      bands AS (SELECT doc_id, b, ba[b+1] AS bucket
        FROM grp, range(0, 4) t(b) WHERE prev IS NULL),
      ranked AS (SELECT doc_id, b, bucket,
          row_number() OVER (PARTITION BY b, bucket ORDER BY doc_id) AS rn,
          count(*) OVER (PARTITION BY b, bucket) AS bsz
        FROM bands),
      cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM ranked a JOIN ranked b ON a.b = b.b AND a.bucket = b.bucket
          AND b.rn > a.rn AND (a.bsz <= ${Dedup.DefaultHotBucketThreshold} OR b.rn <= a.rn + ${Dedup.DefaultChainK})
        UNION
        SELECT id_a, id_b FROM chains),
      ver AS (
        SELECT id_a, id_b,
          CAST(len(list_intersect(ga.g, gb.g)) AS DOUBLE)
            / (len(ga.g) + len(gb.g) - len(list_intersect(ga.g, gb.g))) AS j
        FROM cand JOIN grams ga ON ga.doc_id = id_a JOIN grams gb ON gb.doc_id = id_b)
      SELECT id_a, id_b, round(j, 4) AS jaccard FROM ver WHERE j >= 0.5
      ORDER BY id_a, id_b
    """),

    ("dedup_simhash_md5", (s: SparkSession, dir: String) => {
      val corpus = plantedDocs(s, dir)
      Dedup.simhashPairsMd5(corpus, "text", "doc_id", maxHamming = 8)
        .orderBy("id_a", "id_b")
    }, {
      val votes = (0 until 64).map(b =>
        s"sum(CASE WHEN ((strpos('0123456789abcdef', h[${b / 4 + 1}:${b / 4 + 1}]) - 1) >> ${b % 4}) & 1 = 1 THEN 1 ELSE -1 END) AS v$b")
        .mkString(",\n          ")
      val chunks = (0 until 4).map(c =>
        (0 until 16).map(j => s"(CASE WHEN v${16 * c + j} > 0 THEN ${1 << j} ELSE 0 END)")
          .mkString(" + ") + s" AS c$c")
        .mkString(",\n          ")
      s"""
      WITH $plantedCorpusSql,
      tok AS (SELECT doc_id, md5(t) AS h FROM (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t FROM corpus)),
      votes AS (SELECT doc_id,
          $votes
        FROM tok GROUP BY doc_id),
      fp AS (SELECT doc_id,
          $chunks
        FROM votes),
      /* exact-collapse on the full fingerprint (r15): identical
         fingerprints chain at hamming 0; only representatives block */
      grp AS (SELECT doc_id, c0, c1, c2, c3,
          lag(doc_id) OVER (PARTITION BY c0, c1, c2, c3 ORDER BY doc_id) AS prev
        FROM fp),
      chains AS (SELECT prev AS id_a, doc_id AS id_b FROM grp WHERE prev IS NOT NULL),
      blocked AS (SELECT doc_id, c0, c1, c2, c3, c,
          CASE c WHEN 0 THEN c0 WHEN 1 THEN c1 WHEN 2 THEN c2 ELSE c3 END AS key
        FROM grp, range(0, 4) t(c) WHERE prev IS NULL),
      ranked AS (SELECT doc_id, c0, c1, c2, c3, c, key,
          row_number() OVER (PARTITION BY c, key ORDER BY doc_id) AS rn,
          count(*) OVER (PARTITION BY c, key) AS bsz
        FROM blocked)
      SELECT DISTINCT id_a, id_b FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM ranked a JOIN ranked b ON a.c = b.c AND a.key = b.key
          AND b.rn > a.rn AND (a.bsz <= ${Dedup.DefaultHotBucketThreshold} OR b.rn <= a.rn + ${Dedup.DefaultChainK})
        WHERE bit_count(xor(a.c0, b.c0)) + bit_count(xor(a.c1, b.c1))
            + bit_count(xor(a.c2, b.c2)) + bit_count(xor(a.c3, b.c3)) <= 8
        UNION ALL
        SELECT id_a, id_b FROM chains)
      ORDER BY id_a, id_b
    """
    }),

    ("dedup_embedding", (s: SparkSession, dir: String) => {
      // Planted twins: a pure scale (cosine-invariant, sim = 1.0) plus a
      // small additive nudge so the pair lands just above—not exactly at—
      // the 0.9 gate. The r6 "+0.1 every dimension" twins never reached
      // 0.9 in high dim, leaving the gate green on an empty set.
      val base = t(s, dir, "embeddings").filter(col("vec_id") < 100)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val corpus = base.unionByName(base
        .withColumn("vec_id", col("vec_id") + 100000L)
        .withColumn("embedding", transform(col("embedding"), x => x * 1.01 + 0.005)))
      val a = corpus.select(col("vec_id").as("id_a"), col("embedding").as("__va"))
      val b = corpus.select(col("vec_id").as("id_b"), col("embedding").as("__vb"))
      a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .withColumn("sim", round(Similarity.cosine(col("__va"), col("__vb")), 4))
        .filter(col("sim") >= 0.9)
        .select("id_a", "id_b", "sim")
        .orderBy("id_a", "id_b")
    }, """
      WITH corpus AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings WHERE vec_id < 100
        UNION ALL
        SELECT vec_id + 100000, list_transform(embedding, x -> CAST(x AS DOUBLE) * 1.01 + 0.005)
        FROM embeddings WHERE vec_id < 100)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        round(list_cosine_similarity(a.v, b.v), 4) AS sim
      FROM corpus a, corpus b
      WHERE a.vec_id < b.vec_id
        AND round(list_cosine_similarity(a.v, b.v), 4) >= 0.9
      ORDER BY id_a, id_b
    """),

    ("sim_bruteforce_topk", (s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), "vec_id",
        "embedding", k = 3)
        .orderBy("query_id", "rnk")
    }, """
      SELECT query_id, neighbor_id, sim, rnk
      FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          round(list_cosine_similarity(
            list_transform(c.embedding, x -> CAST(x AS DOUBLE)),
            list_transform(q.embedding, x -> CAST(x AS DOUBLE))), 6) AS sim,
          CAST(row_number() OVER (PARTITION BY q.vec_id
            ORDER BY round(list_cosine_similarity(
              list_transform(c.embedding, x -> CAST(x AS DOUBLE)),
              list_transform(q.embedding, x -> CAST(x AS DOUBLE))), 6) DESC,
            c.vec_id) AS INT) AS rnk
        FROM embeddings q, embeddings c
        WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id)
      WHERE rnk <= 3
      ORDER BY query_id, rnk
    """),

    ("sim_lsh_topk", (s: SparkSession, dir: String) => {
      // Oracle-gated like agg_approx_*: the probabilistic operator emits a
      // DETERMINISTIC recall summary vs the exact brute-force baseline —
      // total recall@3 ≥ 60% and every query finds ≥1 true neighbor.
      // Hyperplanes are splitmix-derived (no RNG), so the counts are
      // reproducible; bounds verified at sf0.001/0.01/0.1 (10-13 of 15).
      val emb = t(s, dir, "embeddings")
      val qs = emb.filter(col("vec_id") < 5)
      val lsh = Similarity.lshTopK(emb, qs, "vec_id", "embedding",
        k = 3, dim = 64, nBits = 6, probeBits = 3)
      val bf = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", k = 3)
      val hits = bf.select("query_id", "neighbor_id")
        .join(lsh.select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("__hits"))
      qs.select(col("vec_id").as("query_id"))
        .join(hits, Seq("query_id"), "left")
        .agg(count(lit(1)).cast("int").as("n_queries"),
          (sum(coalesce(col("__hits"), lit(0L))) >=
            (count(lit(1)) * 3 * 0.6)).as("recall_ok"),
          (min(coalesce(col("__hits"), lit(0L))) >= 1).as("all_queries_found"))
        .select(col("n_queries"), lit(3).as("k"),
          col("recall_ok"), col("all_queries_found"))
    }, """
      SELECT CAST(count(*) AS INT) AS n_queries, 3 AS k,
        true AS recall_ok, true AS all_queries_found
      FROM embeddings WHERE vec_id < 5
    """),

    ("mm_decode_meta", (s: SparkSession, dir: String) => {
      val media = Multimodal.mediaFromDocuments(s, t(s, dir, "documents"))
      Multimodal.decodeMeta(media).toDF().orderBy("media_id")
    }, """
      SELECT doc_id AS media_id,
        (['image','audio','video'])[(doc_id % 3) + 1] AS media_type,
        CAST(64 + len % 577 AS INT) AS width,
        CAST(64 + (len + first) % 419 AS INT) AS height,
        CAST(CASE WHEN (['image','audio','video'])[(doc_id % 3) + 1] = 'audio' THEN 1 ELSE 3 END AS INT) AS n_channels,
        CAST(CASE WHEN (['image','audio','video'])[(doc_id % 3) + 1] = 'video' THEN len % 24 + 1 ELSE 1 END AS INT) AS n_frames,
        CAST(CASE WHEN (['image','audio','video'])[(doc_id % 3) + 1] = 'image' THEN 0 ELSE len % 60000 END AS BIGINT) AS duration_ms,
        len AS size_bytes
      FROM (SELECT doc_id, text, octet_length(encode(text)) AS len, ascii(text) AS first
            FROM documents)
      ORDER BY media_id
    """),

    ("mm_frame_sample", (s: SparkSession, dir: String) => {
      val media = Multimodal.mediaFromDocuments(s, t(s, dir, "documents"))
      Multimodal.sampleFrames(media, everyNth = 5)
        .orderBy("media_id", "frame_idx")
    }, """
      SELECT media_id, media_type, n_frames, CAST(unnest(range(0, greatest(n_frames, 1), 5)) AS BIGINT) AS frame_idx
      FROM (
        SELECT doc_id AS media_id,
          (['image','audio','video'])[(doc_id % 3) + 1] AS media_type,
          CAST(CASE WHEN (['image','audio','video'])[(doc_id % 3) + 1] = 'video'
               THEN octet_length(encode(text)) % 24 + 1 ELSE 1 END AS INT) AS n_frames
        FROM documents)
      ORDER BY media_id, frame_idx
    """),

    ("mm_features", (s: SparkSession, dir: String) => {
      // features are float32 in [0,1]; recover the exact 16-bit int each
      // was derived from so the oracle compare is integer-exact
      val media = Multimodal.mediaFromDocuments(s, t(s, dir, "documents"))
      Multimodal.extractFeatures(media).toDF()
        .select(col("media_id"),
          round(element_at(col("features"), 1) * 65535).cast("long").as("v0"),
          round(element_at(col("features"), 2) * 65535).cast("long").as("v1"))
        .orderBy("media_id")
    }, """
      SELECT doc_id AS media_id,
        ('0x' || substr(md5(text), 1, 4))::BIGINT AS v0,
        ('0x' || substr(md5(text), 5, 4))::BIGINT AS v1
      FROM documents ORDER BY media_id
    """),

    ("asof_purchase_click", (s: SparkSession, dir: String) => {
      // as-of join: each purchase matched to the user's latest click at or
      // before it (one shuffle, window-carried payload — Joins.asof).
      // clicks pre-deduped on (user, ts) so ties are deterministic.
      val e = t(s, dir, "events").select(col("event_id"), col("user_id"),
        col("event_type"), unix_micros(col("ts").cast("timestamp")).as("ts_us"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts_us"))
      val clicks = e.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts_us").as("click_us"))
        .agg(max("event_id").as("click_id"))
      graft.ops.Joins.asof(purchases, clicks, on = Seq("user_id"),
          leftTime = "ts_us", rightTime = "click_us")
        .select(col("purchase_id"), col("user_id"), col("click_id"),
          (col("ts_us") - col("click_us")).as("gap_us"))
        .orderBy("purchase_id")
    }, """
      WITH e AS (
        SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events),
      purchases AS (
        SELECT event_id AS purchase_id, user_id, ts_us FROM e
        WHERE event_type = 'purchase'),
      clicks AS (
        SELECT user_id, ts_us AS click_us, max(event_id) AS click_id
        FROM e WHERE event_type = 'click' GROUP BY user_id, ts_us)
      SELECT p.purchase_id, p.user_id, c.click_id, p.ts_us - c.click_us AS gap_us
      FROM purchases p ASOF LEFT JOIN clicks c
        ON p.user_id = c.user_id AND p.ts_us >= c.click_us
      ORDER BY p.purchase_id
    """),

    ("asof_nearest_click", (s: SparkSession, dir: String) => {
      // nearest-direction as-of: each purchase matched to the user's
      // closest click in EITHER direction (equal distance -> backward);
      // same one-shuffle union+window shape, both direction windows
      // evaluated over one hash exchange
      val e = t(s, dir, "events").select(col("event_id"), col("user_id"),
        col("event_type"), unix_micros(col("ts").cast("timestamp")).as("ts_us"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts_us"))
      val clicks = e.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts_us").as("click_us"))
        .agg(max("event_id").as("click_id"))
      graft.ops.Joins.asof(purchases, clicks, on = Seq("user_id"),
          leftTime = "ts_us", rightTime = "click_us", direction = "nearest")
        .select(col("purchase_id"), col("user_id"), col("click_id"),
          (col("ts_us") - col("click_us")).as("gap_us"))
        .orderBy("purchase_id")
    }, """
      WITH e AS (
        SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events),
      purchases AS (
        SELECT event_id AS purchase_id, user_id, ts_us FROM e
        WHERE event_type = 'purchase'),
      clicks AS (
        SELECT user_id, ts_us AS click_us, max(event_id) AS click_id
        FROM e WHERE event_type = 'click' GROUP BY user_id, ts_us),
      j AS (
        SELECT p.purchase_id, p.user_id, c.click_id,
          p.ts_us - c.click_us AS gap_us,
          row_number() OVER (PARTITION BY p.purchase_id
            ORDER BY abs(p.ts_us - c.click_us),
                     CASE WHEN c.click_us <= p.ts_us THEN 0 ELSE 1 END) AS rn
        FROM purchases p LEFT JOIN clicks c ON p.user_id = c.user_id)
      SELECT purchase_id, user_id, click_id, gap_us FROM j WHERE rn = 1
      ORDER BY purchase_id
    """),

    ("rj_order_shipweek", (s: SparkSession, dir: String) => {
      // interval join via bin-bucketed equi-join (Joins.pointInInterval):
      // lineitems shipped within 7 days of an urgent order's date — the
      // naive theta join plans as BroadcastNestedLoop and dies at scale
      val day = 86400000000L
      val o = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("lo_us"))
        .withColumn("hi_us", col("lo_us") + lit(7 * day - 1))
      val li = t(s, dir, "lineitem").select(col("l_quantity"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("ship_us"))
      graft.ops.Joins.pointInInterval(li, o, "ship_us", "lo_us", "hi_us",
          binWidth = 7 * day)
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_ship"), round(sum("l_quantity"), 2).as("qty"))
        .orderBy("o_orderkey")
    }, """
      SELECT o.o_orderkey, count(*) AS n_ship, round(sum(l.l_quantity), 2) AS qty
      FROM orders o JOIN lineitem l
        ON epoch_us(l.l_shipdate) >= epoch_us(o.o_orderdate)
       AND epoch_us(l.l_shipdate) < epoch_us(o.o_orderdate) + 604800000000
      WHERE o.o_orderpriority = '1-URGENT'
      GROUP BY o.o_orderkey ORDER BY o.o_orderkey
    """),

    ("dedup_semantic", (s: SparkSession, dir: String) => {
      // SemDeDup composition with an exact edge set (oracle-parity): a
      // corpus with planted near-identical twins (+0.01 on every dim),
      // cosine-0.95 edges -> connected components -> keep min id per
      // cluster. The production path (LSH-bucketed candidates) is
      // recall-tested in OpsSpec; the exact-edge variant hash-checks the
      // whole clustering + representative-selection machinery
      val base = t(s, dir, "embeddings").filter(col("vec_id") < 80)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
      val corpus = base.unionByName(base
        .withColumn("vec_id", col("vec_id") + 100000L)
        .withColumn("v", transform(col("v"), x => x + 0.01)))
      val a = corpus.select(col("vec_id").as("id_a"), col("v").as("__va"))
      val b = corpus.select(col("vec_id").as("id_b"), col("v").as("__vb"))
      val edges = a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .filter(round(graft.ops.Similarity.cosine(col("__va"), col("__vb")), 4) >= 0.95)
        .select("id_a", "id_b")
      Dedup.connectedComponents(edges, "id_a", "id_b",
          vertices = Some(corpus.select(col("vec_id"))))
        .filter(col("id") === col("component"))
        .select(col("id").as("vec_id"))
        .orderBy("vec_id")
    }, """
      WITH RECURSIVE
      corpus AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings WHERE vec_id < 80
        UNION ALL
        SELECT vec_id + 100000, list_transform(embedding, x -> CAST(x AS DOUBLE) + 0.01)
        FROM embeddings WHERE vec_id < 80),
      edges AS (
        SELECT a.vec_id AS src, b.vec_id AS dst
        FROM corpus a JOIN corpus b ON a.vec_id <> b.vec_id
        WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.95),
      walk(id, lbl) AS (
        SELECT vec_id, vec_id FROM corpus
        UNION
        SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.id)
      SELECT id AS vec_id
      FROM (SELECT id, min(lbl) AS component FROM walk GROUP BY id)
      WHERE id = component ORDER BY vec_id
    """),

    ("dedup_keep_best", (s: SparkSession, dir: String) => {
      // same near-length clusters as dedup_components, but the survivor
      // is the LONGEST doc per cluster (ties by id) instead of min id —
      // the quality-aware representative selection
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val pts = docs.select(col("doc_id").as("a_id"), col("lang"),
        col("n_chars").as("a_len"))
      val ivs = docs.select(col("doc_id").as("b_id"), col("lang"),
        (col("n_chars") - 1).as("lo"), (col("n_chars") + 1).as("hi"))
      val edges = graft.ops.Joins.pointInInterval(pts, ivs, "a_len", "lo", "hi",
          keys = Seq("lang"), binWidth = 2)
        .filter(col("a_id") =!= col("b_id"))
        .select(col("a_id").as("id_a"), col("b_id").as("id_b"))
      Dedup.keepBestPerCluster(edges, docs, "doc_id", col("n_chars"))
        .orderBy("doc_id")
    }, """
      WITH RECURSIVE
      edges AS (
        SELECT a.doc_id AS src, b.doc_id AS dst
        FROM documents a JOIN documents b
          ON a.lang = b.lang
         AND b.n_chars BETWEEN a.n_chars - 1 AND a.n_chars + 1
         AND a.doc_id <> b.doc_id),
      walk(id, lbl) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.id),
      comp AS (SELECT id, min(lbl) AS component FROM walk GROUP BY id),
      ranked AS (
        SELECT c.id, row_number() OVER (PARTITION BY c.component
            ORDER BY d.n_chars DESC, c.id) AS rn
        FROM comp c JOIN documents d ON d.doc_id = c.id)
      SELECT id AS doc_id FROM ranked WHERE rn = 1 ORDER BY doc_id
    """),

    ("dedup_components", (s: SparkSession, dir: String) => {
      // duplicate clustering: near-length doc pairs (same lang, n_chars
      // within ±1 — built with the interval join) → connected components
      // via distributed min-label propagation. Oracle recomputes the
      // transitive closure with a recursive CTE.
      val docs = t(s, dir, "documents").select(col("doc_id"), col("lang"), col("n_chars"))
      val pts = docs.select(col("doc_id").as("a_id"), col("lang"),
        col("n_chars").as("a_len"))
      val ivs = docs.select(col("doc_id").as("b_id"), col("lang"),
        (col("n_chars") - 1).as("lo"), (col("n_chars") + 1).as("hi"))
      val edges = graft.ops.Joins.pointInInterval(pts, ivs, "a_len", "lo", "hi",
          keys = Seq("lang"), binWidth = 2)
        .filter(col("a_id") =!= col("b_id"))
        .select(col("a_id").as("src"), col("b_id").as("dst"))
      Dedup.connectedComponents(edges, "src", "dst",
          vertices = Some(docs.select("doc_id")))
        .orderBy("id")
    }, """
      WITH RECURSIVE
      edges AS (
        SELECT a.doc_id AS src, b.doc_id AS dst
        FROM documents a JOIN documents b
          ON a.lang = b.lang
         AND b.n_chars BETWEEN a.n_chars - 1 AND a.n_chars + 1
         AND a.doc_id <> b.doc_id),
      walk(id, lbl) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.id)
      SELECT id, min(lbl) AS component FROM walk GROUP BY id ORDER BY id
    """)
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map { case (n, f, _) => n -> f }.toMap

  val oracle: Map[String, String] =
    defs.filter(_._3 != null)
      .map { case (n, _, o) => n -> o.stripMargin.trim.replaceAll("\\s+", " ") }.toMap
}
