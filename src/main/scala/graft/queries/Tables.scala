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
    * fixture tables. Keyed weakly by session so test suites' many
    * short-lived sessions can be collected. PRECONDITION: a (dir,
    * table) path is immutable once first read in a session — true for
    * /root/testdata and the staged bench/scale corpora, which are
    * written (fingerprint-guarded) before any query reads them.
    */
  private val memo =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]]()

  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = memo.synchronized {
      var m = memo.get(s)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()
        memo.put(s, m)
      }
      m
    }
    perSession.computeIfAbsent((dir, name), _ => load(s, dir, name))
  }

  private def load(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(s, dir) else s.read.parquet(s"$dir/$name.parquet")

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
