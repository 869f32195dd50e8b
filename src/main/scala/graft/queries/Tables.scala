package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided testdata tables (TESTDATA.md).
  * One parquet file per table under the given scale-factor dir.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(s, dir) else s.read.parquet(s"$dir/$name.parquet")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects by
    * default; read it as raw nanos and convert to a µs timestamp (NTZ, same
    * truncation DuckDB applies for µs arithmetic on ns values).
    */
  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    // `div`, not `/`: Spark's `/` is double division and ns epochs
    // (~1.7e18) exceed double's 2^53 integer precision — off-by-1-µs
    raw.withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")).cast("timestamp_ntz"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }
}
