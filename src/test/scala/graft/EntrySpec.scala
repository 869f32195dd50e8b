package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Driver-contract insurance: the `SparkEntry` maps must BUILD without
  * throwing (a single bad entry would zero the whole round's correctness
  * gate) and stay mutually consistent.
  */
class EntrySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.lake.connector.GraftSparkExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("queries and oracleSql maps build; oracles reference declared queries") {
    val qs = SparkEntry.queries
    val os = SparkEntry.oracleSql
    assert(qs.nonEmpty)
    assert(os.keySet.subsetOf(qs.keySet),
      s"orphan oracles: ${os.keySet.diff(qs.keySet)}")
    assert(os.values.forall(s => s != null && s.trim.nonEmpty))
    assert(qs.size >= 60)
  }

  test("Bench headline names all resolve") {
    assert(Bench.headline.toSet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry() flagship returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("Tables.t memoizes the resolved relation per (session, dir, table)") {
    import graft.queries.Tables
    val dir = "/root/testdata/sf0.001"
    // same session + path → the SAME DataFrame instance (no repeated
    // file listing / footer schema inference — the r11 ResolveDataSource
    // fix), and it still answers queries
    val a = Tables.t(spark, dir, "nation")
    val b = Tables.t(spark, dir, "nation")
    assert(a eq b)
    assert(a.count() > 0)
    // distinct dirs resolve independently
    assert(!(Tables.t(spark, dir, "region") eq a))
    // a different session gets its own resolution (conf isolation)
    val s2 = spark.newSession()
    assert(!(Tables.t(s2, dir, "nation") eq a))
  }
}
