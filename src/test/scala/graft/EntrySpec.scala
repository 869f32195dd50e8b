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
}
