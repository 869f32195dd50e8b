package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided testdata tables (TESTDATA.md).
  * One parquet file per table under the given scale-factor dir.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Resolved-relation memo, per session. Every `spark.read.parquet`
    * call pays `ResolveDataSource` — a fresh file listing plus parquet
    * footer schema inference — measured at ~60 ms per query against the
    * 32-file bench layout, which dwarfs DuckDB's ~1 ms planning and is
    * pure waste for the immutable fixture tables every query reads. A
    * real engine resolves a table once and serves the cached schema
    * from its catalog (the lake catalog here does exactly that via its
    * planning cache); this memo is the same contract for the path-based
    * fixture tables.
    *
    * Leak discipline (r11/r12 verdict finding): a DataFrame strongly
    * references its SparkSession via `queryExecution.sparkSession` —
    * and so does every Spark-side plan object down to HadoopFsRelation
    * — so a WeakHashMap value holding a DataFrame pins its own key and
    * the entry is unreclaimable. The memo therefore holds only
    * [[java.lang.ref.WeakReference]]s to the resolved frames: a live
    * session serves cache hits between GCs, and a dropped session has
    * no strong path from the memo at all (TablesMemoSpec pins the
    * collectability). The expensive half of resolution — parquet footer
    * schema inference across the multi-file layout — is cached
    * SESSION-FREE in [[schemaCache]] (a StructType holds no session),
    * so even a post-GC rebuild pays only the directory listing.
    *
    * PRECONDITION: a (dir, table) path is immutable once first read —
    * true for /root/testdata and the staged bench/scale corpora, which
    * are written (fingerprint-guarded) before any query reads them.
    */
  private val memo =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[(String, String),
        java.lang.ref.WeakReference[DataFrame]]]()

  /** Inferred fixture schemas, keyed by (dir, table) — session-free. */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String), org.apache.spark.sql.types.StructType]()

  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = memo.synchronized {
      var m = memo.get(s)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[(String, String),
          java.lang.ref.WeakReference[DataFrame]]()
        memo.put(s, m)
      }
      m
    }
    val key = (dir, name)
    val hit = Option(perSession.get(key)).flatMap(r => Option(r.get()))
    hit.getOrElse {
      val df = load(s, dir, name)
      perSession.put(key, new java.lang.ref.WeakReference(df))
      df
    }
  }

  private def load(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(s, dir)
    else {
      val key = (dir, name)
      val known = schemaCache.get(key)
      if (known != null) s.read.schema(known).parquet(s"$dir/$name.parquet")
      else {
        val df = s.read.parquet(s"$dir/$name.parquet")
        schemaCache.put(key, df.schema)
        df
      }
    }

  /** events.ts has varied across driver testdata generations between
    * parquet TIMESTAMP(NANOS) (unreadable by Spark without nanosAsLong)
    * and TIMESTAMP(MICROS). Handle both: raw nanos convert with integer
    * `div` (`/` is double division and ns epochs exceed double's 2^53
    * integer precision — off-by-1-µs), native timestamps just cast NTZ.
    */
  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000"))
      case _ => org.apache.spark.sql.functions.col("ts")
    }
    raw.withColumn("ts", ts.cast("timestamp_ntz"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }
}
