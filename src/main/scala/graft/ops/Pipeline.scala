package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators for training-data pipelines: deterministic
  * splitting/sampling, exact scalable prefix sums, token-budget selection
  * and sequence packing. The reference has no counterpart (it is a lake
  * connector); these extend the engine the way `graft.ops.Dedup`/`TextOps`
  * do, with the same two design rules:
  *
  *  - **Determinism over RNG.** Every sampling/split decision is a pure
  *    function of a row key (md5 bucket), never `rand()`: reruns, retried
  *    tasks, and other engines (the DuckDB oracle) reproduce the exact
  *    same membership — the property you need for auditable 100 TB corpus
  *    builds (and what makes these gate-checkable at all).
  *  - **No single-task bottlenecks.** The global running totals that
  *    budget cuts and packing need are computed as a two-phase distributed
  *    prefix sum (per-range-partition window + broadcast offsets), not a
  *    global `Window.orderBy` — which Spark executes on ONE task and which
  *    is the classic 100 TB cliff.
  */
object Pipeline {

  /** 256-bucket deterministic hash of a key: the first two hex chars of
    * md5(key as string). Uniform, engine-portable (any SQL engine with
    * md5 computes the identical bucket), and stable across runs/retries —
    * the bucketing primitive under [[split3]] and [[stratifiedSample]].
    */
  def hashBucket(key: Column): Column = substring(md5(key.cast("string")), 1, 2)

  /** Largest bucket label included when keeping `buckets` of the 256. */
  private def hexThreshold(buckets: Int): String = f"${buckets - 1}%02x"

  /** Deterministic train/val/test assignment: `trainBuckets` + `valBuckets`
    * + rest of the 256 hash buckets (defaults 230/13/13 ≈ 90/5/5%). A
    * document's split never changes as the corpus grows — membership
    * depends only on its own key, so incremental corpus builds keep prior
    * assignments (unlike fraction-based `randomSplit`).
    */
  def split3(key: Column, trainBuckets: Int = 230, valBuckets: Int = 13): Column = {
    require(trainBuckets > 0 && valBuckets > 0 && trainBuckets + valBuckets < 256,
      "train/val bucket counts must each be >0 and sum below 256")
    val b = hashBucket(key)
    when(b <= lit(hexThreshold(trainBuckets)), lit("train"))
      .when(b <= lit(hexThreshold(trainBuckets + valBuckets)), lit("val"))
      .otherwise(lit("test"))
  }

  /** Deterministic stratified sampling: keep `buckets(stratum)` (default
    * `defaultBuckets`) of the 256 hash buckets within each stratum —
    * per-stratum rates in 256ths. One codegen'd filter, no shuffle, no
    * RNG; rates hold per stratum because the hash is independent of the
    * stratum column.
    */
  def stratifiedSample(df: DataFrame, strataCol: Column, keyCol: Column,
      buckets: Map[String, Int], defaultBuckets: Int): DataFrame = {
    val thr = buckets.foldLeft(lit(hexThreshold(defaultBuckets))) {
      case (acc, (stratum, n)) => when(strataCol === stratum, lit(hexThreshold(n))).otherwise(acc)
    }
    df.filter(hashBucket(keyCol) <= thr)
  }

  /** Deterministic weighted sampling WITHOUT replacement: the `k` rows
    * per stratum with the largest Efraimidis–Spirakis priorities
    * u^(1/w) — each row's inclusion probability is proportional to its
    * weight (importance sampling by a quality score is the canonical
    * use). u derives from md5(key): 12 hex nibbles → a 48-bit integer
    * (exact in a double) → u ∈ (0,1]; ranking uses the monotone
    * transform ln(u)/w ROUNDED to 9 decimals with the key as tiebreak,
    * so the DuckDB oracle — same md5, same nibble arithmetic —
    * reproduces the exact sample (the rounding absorbs last-ulp ln()
    * differences between libm implementations). One shuffle: the
    * per-stratum top-k window. No RNG state, stable across runs and
    * retries, and membership survives corpus growth only losing to
    * strictly-higher-priority newcomers.
    */
  def weightedSample(df: DataFrame, stratumCol: Column, keyCol: Column,
      weightCol: Column, k: Int): DataFrame = {
    require(k >= 1, "k must be at least 1")
    val v = conv(substring(md5(keyCol.cast("string")), 1, 12), 16, 10).cast("double")
    val u = (v + 1.0) / 281474976710656.0 // 2^48
    // PRECONDITION: weights strictly positive. w = 0 yields -Infinity
    // priorities (or NaN at u = 1) and w < 0 flips the ln(u)/w ordering —
    // both corrupt the sample silently and risk Spark/DuckDB NaN-ordering
    // divergence, so the guard fails the job instead (assert_true is
    // null-on-pass, so the when() wrapper forces its evaluation per row
    // without changing the priority value).
    val wChecked = when(
      assert_true(weightCol > lit(0.0),
        lit("weightedSample: weights must be strictly positive")).isNull,
      weightCol)
    val pri = round(log(u) / wChecked, 9)
    val w = Window.partitionBy(stratumCol).orderBy(pri.desc, keyCol.asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Exact running total of `value` over the total order `order` (which
    * must be total — include a unique tiebreaker), appended as column
    * `out` (LongType).
    *
    * Two-phase distributed prefix sum: range-partition by the sort key,
    * per-partition window cumsum, then add each partition's starting
    * offset (the scan of per-partition totals — one tiny driver-side
    * array, one broadcast join). The result is identical to
    * `sum(value).over(Window.orderBy(order))` but runs on all executors;
    * the single-partition global window that Spark would otherwise use is
    * the canonical scale cliff for running totals.
    */
  def prefixSum(df: DataFrame, order: Seq[Column], value: Column, out: String): DataFrame = {
    val parts = math.max(df.sparkSession.sparkContext.defaultParallelism, 1)
    val ranged = df.repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy("__pid").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("__local", sum(value.cast("long")).over(w))
    // partition starting offsets: per-partition totals (one row per
    // partition) prefix-summed by a window over __pid — that window runs
    // on #partitions rows, so the "global order" it needs is trivially
    // small at any data scale. Everything stays in ONE job: both branches
    // consume the same range exchange, which Catalyst's ReuseExchange
    // materializes once (a driver-side collect of the totals would run a
    // separate job and recompute the whole upstream).
    val wOff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy("__pid").agg(sum(value.cast("long")).as("__t"))
      .withColumn("__off", coalesce(sum("__t").over(wOff), lit(0L)))
      .select("__pid", "__off")
    local.join(broadcast(offsets), "__pid")
      .withColumn(out, col("__local") + col("__off"))
      .drop("__pid", "__local", "__off")
  }

  /** Benchmark decontamination: training documents that share at least one
    * word `w`-gram with any document of the (much smaller) evaluation set.
    * Returns one row per contaminated training document with the count of
    * distinct matching grams — the audit artifact a corpus build publishes
    * before releasing a training set.
    *
    * Scale shape: the eval side is distinct-reduced and **broadcast**, so
    * the 100 TB training side is a single scan + codegen'd explode with a
    * broadcast-hash semi lookup — no shuffle of training grams; the only
    * exchange is the final per-doc-id aggregation of hits (map-side
    * combined). Documents shorter than `w` tokens contribute their whole
    * text as one gram, matching [[Dedup.shingles]].
    */
  def contaminatedDocs(train: DataFrame, eval_ : DataFrame, textCol: String,
      idCol: String, w: Int = 5): DataFrame = {
    val evalGrams = eval_
      .select(explode(array_distinct(Dedup.shingles(col(textCol), w))).as("__g"))
      .distinct()
    train
      .select(col(idCol), explode(array_distinct(Dedup.shingles(col(textCol), w))).as("__g"))
      .join(broadcast(evalGrams), "__g")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_hit_grams"))
  }

  /** Deterministic corpus shuffle + sharding: `shard` = first hex nibble
    * of md5(key) (16 shards), `pos` = the document's rank within its shard
    * ordered by the full md5 — together a reproducible pseudo-random
    * permutation of the corpus with NO RNG: reruns, retried tasks, and
    * other engines produce byte-identical shard files. This is the
    * training-ingestion shuffle: readers stream shard s in pos order and
    * see a stable, well-mixed document sequence.
    *
    * Scale shape: one hash exchange on `shard` + a per-shard sort — every
    * shard sorts in parallel, there is no global ORDER BY. With the
    * default 16 shards a 100 TB corpus would raise `shards` (any power of
    * 16 via more hex chars); the plan shape is unchanged.
    */
  def shardShuffle(df: DataFrame, key: Column, shardCol: String = "shard",
      posCol: String = "pos"): DataFrame = {
    val h = md5(key.cast("string"))
    val w = Window.partitionBy(shardCol).orderBy("__h")
    df.withColumn("__h", h)
      .withColumn(shardCol, substring(col("__h"), 1, 1))
      .withColumn(posCol, row_number().over(w))
      .drop("__h")
  }

  /** Weighted corpus mixing by repetition count ("epochs"): each stratum
    * (source / language / domain) is up- or down-sampled to `epochs(s)`
    * copies — 2.0 duplicates every document twice, 0.5 keeps a
    * deterministic half, 2.25 keeps two full copies plus a quarter subset.
    * Adds an `epoch` column (0-based copy index) so downstream shuffling
    * can interleave copies. This is the mixture-weights step of a training
    * corpus build (e.g. upsample wiki, downsample common-crawl).
    *
    * Deterministic like everything here: the fractional copy keeps a key
    * iff `md5(key:epoch) < frac·256` — membership is a pure function of
    * (key, epoch), so reruns and other engines reproduce it exactly, and
    * a document's copies are stable as the corpus grows. Scale shape: one
    * codegen'd generator (`explode(sequence)`) + filter, no shuffle, no
    * RNG; the whole mixing plan is map-only.
    *
    * Weights must be < 256 and non-negative; fractions quantize to 256ths
    * (`round(frac·256)`).
    */
  def mixEpochs(df: DataFrame, stratumCol: Column, keyCol: Column,
      epochs: Map[String, Double], defaultEpochs: Double = 1.0,
      epochCol: String = "epoch"): DataFrame = {
    def parts(e: Double): (Int, Int) = { // (full copies, fractional buckets)
      require(e >= 0 && e < 256, s"epoch weight out of range: $e")
      val full = e.toInt
      (full, math.round((e - full) * 256).toInt)
    }
    val named = epochs.toSeq.sortBy(_._1).map { case (s, e) => (s, parts(e)) }
    val defParts = parts(defaultEpochs)
    def perStratum(f: ((Int, Int)) => Column): Column =
      named.foldRight(f(defParts)) { case ((s, p), acc) =>
        when(stratumCol === s, f(p)).otherwise(acc)
      }
    // candidate copy count: full copies + 1 when there is a fractional tail
    val copies = perStratum { case (full, frac) => lit(full + (if (frac > 0) 1 else 0)) }
    val fullCopies = perStratum { case (full, _) => lit(full) }
    // '' threshold = keep nothing (every 2-hex bucket compares above '')
    val fracThr = perStratum { case (_, frac) =>
      lit(if (frac > 0) hexThreshold(frac) else "") }
    val bucket = substring(
      md5(concat(keyCol.cast("string"), lit(":"), col(epochCol).cast("string"))), 1, 2)
    // empty sequence (weight 0) drops the row at the generator, and an
    // explicit empty-array branch keeps sequence() away from copies-1 < 0
    // (whose inferred negative step would yield [0, -1])
    df.withColumn(epochCol,
        explode(when(copies > 0, sequence(lit(0), copies - 1))
          .otherwise(array().cast("array<int>"))))
      .filter(col(epochCol) < fullCopies || bucket <= fracThr)
  }

  /** Greedy-by-offset sequence packing: in the total order `order`, assign
    * each document to training batch `floor(startOffset / budget)` where
    * startOffset is the running token total BEFORE the document. Batches
    * are contiguous ~budget-token spans (a straddling document belongs to
    * the batch it starts in) — the deterministic, shuffle-light packing
    * used to chunk a corpus into fixed-token training shards. Adds
    * `out` (batch id, LongType) and `outCum` (running total INCLUDING the
    * row).
    */
  def packByBudget(df: DataFrame, order: Seq[Column], tokens: Column,
      budget: Long, out: String, outCum: String = "__cum"): DataFrame = {
    require(budget > 0, "budget must be positive")
    prefixSum(df, order, tokens, outCum)
      .withColumn(out, floor((col(outCum) - tokens.cast("long")) / lit(budget)))
  }

  /** Per-stratum quantile floor: keep rows whose `scoreCol` is at or
    * above the exact `q`-quantile of their stratum — the standard
    * per-language (or per-source) quality cut that removes a fixed
    * fraction of the worst documents in every stratum instead of letting
    * one stratum's score scale dominate a global threshold.
    *
    * 100 TB shape: ONE aggregation shuffle produces the |strata|-row
    * threshold table (strata are categorical — languages, sources — so
    * it is tiny and AQE broadcasts the join back); the filter itself is
    * map-side. `percentile` is exact (per-group value buffers — fine for
    * categorical strata with bounded per-executor groups); for extreme
    * per-stratum cardinalities swap in `percentile_approx`, the same
    * shape with a sketch aggregate. Rows with NULL score fall below every
    * threshold (dropped), matching SQL comparison semantics. A NULL
    * stratum forms its own group (the threshold join is null-safe), so
    * unlabelled rows are cut against their own quantile rather than
    * silently dropped.
    */
  def quantileFilter(df: DataFrame, stratumCol: Column, scoreCol: Column,
      q: Double): DataFrame = {
    require(q >= 0.0 && q <= 1.0, "q must be in [0, 1]")
    val thr = df.groupBy(stratumCol.as("__st"))
      .agg(percentile(scoreCol, lit(q)).as("__thr"))
    df.join(thr, stratumCol <=> col("__st"))
      .filter(scoreCol >= col("__thr"))
      .drop("__st", "__thr")
  }
}
