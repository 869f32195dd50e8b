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
