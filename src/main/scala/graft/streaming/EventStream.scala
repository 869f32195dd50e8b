package graft.streaming

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface. The reference itself is batch-only (its
  * nearest feature is batch CDC over snapshot ranges, SURVEY.md §2.B), so
  * this module is the Spark-native extension: the same event analytics
  * expressed as streams, driven to completion over the testdata for
  * deterministic verification.
  *
  * Scale note: these are ordinary Structured Streaming jobs — state lives
  * in the state store keyed by (window, event_type) or user_id, watermarks
  * bound state size, and `maxFilesPerTrigger` paces backfills; the same
  * code runs continuous at cluster scale.
  */
object EventStream {

  /** Events schema after the ns→µs conversion done by the batch loader. */
  private def eventsDF(spark: SparkSession, dir: String): DataFrame =
    graft.queries.Tables.t(spark, dir, "events")

  /** Run a windowed streaming aggregation over the events table to
    * completion and return the result: hourly counts + value sums per
    * event_type — semantically identical to the batch `date_trunc('hour')`
    * rollup, so a SQL oracle can check a *streaming* pipeline.
    */
  def hourlyCounts(spark: SparkSession, dir: String): DataFrame = {
    val batch = eventsDF(spark, dir)
    val name = s"stream_hourly_${UUID.randomUUID().toString.take(8)}"
    val stream = spark.readStream
      .schema(batch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stagingPath(spark, batch, dir))
    val agg = stream
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
    val q = agg.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
      .select(col("w.start").as("hour"), col("event_type"), col("n"),
        round(col("sum_value"), 2).as("sum_value"))
      .orderBy("hour", "event_type")
  }

  private val staged = scala.collection.concurrent.TrieMap[String, String]()
  private val stagedOrdered = scala.collection.concurrent.TrieMap[String, String]()

  /** Watermarked hourly aggregation in APPEND mode: only windows the
    * 1-hour watermark has closed are ever emitted, which is the real
    * production shape (bounded state, rows finalized exactly once — a
    * downstream sink never sees a window twice). Driven to completion the
    * emitted set is exactly the windows with `end <= max(ts) - 1h`,
    * independent of micro-batch boundaries, so a batch SQL oracle can
    * hash-check a watermark semantics end-to-end.
    *
    * The source files are staged in event-time order (see
    * [[stagingPathTimeOrdered]]): the watermark is monotone in the maximum
    * seen event time, so time-ordered ingestion guarantees no row arrives
    * behind the watermark and nothing is dropped — the same contract a
    * time-ordered log (Kafka per-partition, CDC) gives at scale.
    */
  def hourlyCountsAppend(spark: SparkSession, dir: String): DataFrame = {
    val batch = eventsDF(spark, dir)
    val name = s"stream_wm_${UUID.randomUUID().toString.take(8)}"
    val stream = spark.readStream
      .schema(batch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stagingPathTimeOrdered(spark, batch, dir))
    // watermarks require TimestampType; session tz is UTC so the
    // ntz->tz->ntz round trip is value-preserving
    val agg = stream
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
    val q = agg.writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
      .select(col("w.start").cast("timestamp_ntz").as("hour"), col("event_type"),
        col("n"), round(col("sum_value"), 2).as("sum_value"))
      .orderBy("hour", "event_type")
  }

  /** Stage events as multiple parquet files in strictly increasing
    * event-time order (file N holds older events than file N+1, and has an
    * older modification time, which is the order FileStreamSource consumes
    * them in) — the deterministic stand-in for a time-ordered log.
    */
  private def stagingPathTimeOrdered(spark: SparkSession, batch: DataFrame,
      dir: String): String =
    stagedOrdered.getOrElseUpdate(dir, {
      val p = s"/tmp/graft-stream-ord-${UUID.randomUUID().toString.take(8)}"
      val bounds = batch.agg(min(col("ts")), max(col("ts"))).head()
      val cuts = {
        val loTs = bounds.getAs[java.time.LocalDateTime](0)
        val hiTs = bounds.getAs[java.time.LocalDateTime](1)
        val span = java.time.Duration.between(loTs, hiTs)
        (1 until 3).map(i => loTs.plus(span.dividedBy(3).multipliedBy(i)))
      }
      val chunks = Seq(
        batch.filter(col("ts") < lit(cuts(0))),
        batch.filter(col("ts") >= lit(cuts(0)) && col("ts") < lit(cuts(1))),
        batch.filter(col("ts") >= lit(cuts(1))))
      chunks.foreach { c =>
        c.coalesce(1).write.mode("append").parquet(p)
        Thread.sleep(30) // distinct mtimes => FileStreamSource keeps order
      }
      p
    })

  /** Stream-stream INTERVAL JOIN with watermarks: each purchase joins the
    * same user's clicks from the preceding 30 minutes. Both sides carry a
    * 2-hour watermark, so the join state Spark buffers is bounded by the
    * watermark + the 30-minute join window — the production attribution
    * join shape. Time-ordered ingestion (see [[stagingPathTimeOrdered]])
    * keeps the watermark behind every buffered row, so driving to
    * completion yields exactly the batch join — hash-checkable by a SQL
    * oracle.
    */
  def purchaseClickJoin(spark: SparkSession, dir: String): DataFrame = {
    val batch = eventsDF(spark, dir)
    val name = s"stream_join_${UUID.randomUUID().toString.take(8)}"
    val src = stagingPathTimeOrdered(spark, batch, dir)
    def side(t: String, a: String): DataFrame = spark.readStream
      .schema(batch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src)
      .filter(col("event_type") === t)
      .select(col("event_id").as(s"${a}_id"), col("user_id").as(s"${a}_user"),
        col("ts").cast("timestamp").as(s"${a}_ts"))
      .withWatermark(s"${a}_ts", "2 hours")
    val joined = side("purchase", "p").join(side("click", "c"), expr(
      """p_user = c_user AND
        |c_ts >= p_ts - interval 30 minutes AND c_ts <= p_ts""".stripMargin))
    val q = joined.writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
      .select(col("p_id"), col("c_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("lag_us"))
      .orderBy("p_id", "c_id")
  }

  /** Streaming deduplication: the source is staged TWICE (every event
    * arrives in two different micro-batches), `dropDuplicates(event_id)`
    * keeps state across batches, and the downstream aggregation sees each
    * event once — counts would double without the dedup state. The
    * standard exactly-once-per-key ingestion guard.
    */
  def dedupCounts(spark: SparkSession, dir: String): DataFrame = {
    val batch = eventsDF(spark, dir)
    val name = s"stream_dedup_${UUID.randomUUID().toString.take(8)}"
    val src = stagedDoubled.getOrElseUpdate(dir, {
      val p = s"/tmp/graft-stream-dup-${UUID.randomUUID().toString.take(8)}"
      batch.coalesce(1).write.mode("append").parquet(p)
      batch.coalesce(1).write.mode("append").parquet(p)
      p
    })
    val stream = spark.readStream
      .schema(batch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src)
    val agg = stream
      .dropDuplicates("event_id")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
    val q = agg.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
      .select(col("event_type"), col("n"), round(col("sum_value"), 2).as("sum_value"))
      .orderBy("event_type")
  }

  private val stagedDoubled = scala.collection.concurrent.TrieMap[String, String]()

  /** Streaming incremental dedup — the ingestion-time twin of
    * [[graft.ops.Dedup.incrementalDuplicates]]: a STREAM of incoming
    * documents is deduplicated against a STATIC corpus by normalized-text
    * fingerprint, emitting only genuinely-new documents. Exercises the
    * stream-static join surface (stream left + static right; anti
    * semantics via left outer + null filter, the streamed-supported
    * formulation). The static side is a tiny (id, fingerprint)
    * projection — broadcast into every micro-batch; state-free, so at
    * cluster scale the operator costs one map-side join per batch.
    *
    * Driven to completion over staged files (2 micro-batches via
    * maxFilesPerTrigger) and returned as a DataFrame so the DuckDB
    * oracle checks the whole streamed pipeline against batch NOT EXISTS.
    */
  def incrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.queries.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"))
    val corpus = docs.filter(col("doc_id") < 400)
    val newBatch = corpus.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 200000L).as("doc_id"), col("text"), col("n_chars"))
      .unionByName(docs.filter(col("doc_id") >= 400))
    val name = s"stream_incr_dedup_${UUID.randomUUID().toString.take(8)}"
    val src = stagedNewDocs.getOrElseUpdate(dir, {
      val p = s"/tmp/graft-stream-newdocs-${UUID.randomUUID().toString.take(8)}"
      // two files -> two micro-batches under maxFilesPerTrigger=1
      newBatch.filter(col("doc_id") % 2 === 0).coalesce(1)
        .write.mode("append").parquet(p)
      newBatch.filter(col("doc_id") % 2 =!= 0).coalesce(1)
        .write.mode("append").parquet(p)
      p
    })
    val corpusFp = corpus.select(
      graft.ops.TextOps.fingerprint(col("text")).as("__fp"),
      lit(true).as("__seen"))
    val stream = spark.readStream
      .schema(newBatch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src)
    val fresh = stream
      .withColumn("__fp", graft.ops.TextOps.fingerprint(col("text")))
      .join(corpusFp, Seq("__fp"), "left_outer")
      .filter(col("__seen").isNull)
      .select("doc_id", "n_chars")
    val q = fresh.writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name).orderBy("doc_id")
  }

  private val stagedNewDocs = scala.collection.concurrent.TrieMap[String, String]()

  final case class UserEvent(user_id: Long, event_id: Long, ts_us: Long)

  /** Per-user running state; carries the last-seen timestamp so session
    * splitting stays correct across micro-batch boundaries.
    */
  final case class UserRunning(user_id: Long, n_events: Long, n_sessions: Long,
      last_ts_us: Option[Long])

  /** Stateful streaming: per-user running event and session counts via
    * mapGroupsWithState (sessions split on >30 min gaps). Driven to
    * completion over the staged events; state is per-user and bounded.
    */
  def userSessions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val batch = eventsDF(spark, dir)
    val name = s"stream_sessions_${UUID.randomUUID().toString.take(8)}"
    val stagingDir = stagingPath(spark, batch, dir)
    val stream = spark.readStream
      .schema(batch.schema)
      .parquet(stagingDir)
    val typed = stream
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"))
      .as[UserEvent]
    val counted = typed
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (uid: Long, events: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0L, None))
          // events within a micro-batch arrive unsorted: order deterministically
          val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
          var n = prev.n_events
          var sessions = prev.n_sessions
          var lastTs = prev.last_ts_us
          sorted.foreach { e =>
            if (lastTs.forall(t => e.ts_us - t > 1800000000L)) sessions += 1
            lastTs = Some(e.ts_us)
            n += 1
          }
          val next = UserRunning(uid, n, sessions, lastTs)
          state.update(next)
          next
      }
    val q = counted.toDF().writeStream
      .outputMode(OutputMode.Update())
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    // last update per user is the final running count
    spark.table(name)
      .groupBy("user_id")
      .agg(max(col("n_events")).as("n_events"), max(col("n_sessions")).as("n_sessions"))
      .select("user_id", "n_events", "n_sessions")
      .orderBy("user_id")
  }

  /** Stage the batch events as a single-file parquet dir under /tmp for
    * use as a stream source; one copy per (JVM, dir).
    */
  def stagingPath(spark: SparkSession, batch: DataFrame, dir: String): String =
    staged.getOrElseUpdate(dir, {
      val p = s"/tmp/graft-stream-${UUID.randomUUID().toString.take(8)}"
      batch.coalesce(1).write.mode("overwrite").parquet(p)
      p
    })
}
