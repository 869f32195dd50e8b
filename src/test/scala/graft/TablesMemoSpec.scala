package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pins the `Tables.t` memo's leak discipline (r11/r12 verdict finding):
  * a DataFrame strongly references its SparkSession, so memo values must
  * never hold a strong chain back to the weakly-held session key — or
  * the WeakHashMap entry (and the session) is unreclaimable forever.
  */
class TablesMemoSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.lake.connector.GraftSparkExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("memo serves the identical frame while strongly held") {
    val a = graft.queries.Tables.t(spark, sfDir, "nation")
    val b = graft.queries.Tables.t(spark, sfDir, "nation")
    assert(a eq b, "second lookup must be a cache hit while the frame is live")
    assert(a.count() > 0)
  }

  test("a rebuilt frame resolves with the cached schema and same data") {
    val first = graft.queries.Tables.t(spark, sfDir, "region")
    val viaSchemaCache = {
      // second session: its memo is empty, so this load exercises the
      // schema-cache path (user-specified schema, no footer inference)
      val s2 = spark.newSession()
      graft.queries.Tables.t(s2, sfDir, "region")
    }
    assert(viaSchemaCache.schema == first.schema)
    assert(viaSchemaCache.count() == first.count())
  }

  test("a dropped session's memo entry is collectable (no strong chain)") {
    // The leak shape under test: session (weak key) <- DataFrame value.
    // With WeakReference values the only strong path to the session is
    // the local variable below; dropping it must make BOTH the frame
    // and the session weakly unreachable.
    var s2 = spark.newSession()
    graft.queries.Tables.t(s2, sfDir, "nation")
    val sessionRef = new java.lang.ref.WeakReference[SparkSession](s2)
    // canary: an unreferenced object whose WeakReference clearing
    // proves the GC actually processed weak refs this round — without
    // it, a JVM that never bothered collecting would fail the test
    // spuriously (GC is advisory; r13 review finding)
    var canary = new Object
    val canaryRef = new java.lang.ref.WeakReference[Object](canary)
    canary = null
    s2 = null
    SparkSession.clearActiveSession()
    var tries = 0
    while (sessionRef.get() != null && tries < 40) {
      System.gc()
      // force some promotion churn so the weak refs actually process
      val junk = Array.fill(1 << 17)(new Array[Byte](128))
      assert(junk.length > 0)
      Thread.sleep(50)
      tries += 1
    }
    if (canaryRef.get() == null)
      // GC demonstrably cleared weak refs; a surviving session ref is a
      // genuine strong chain from the memo
      assert(sessionRef.get() == null,
        s"session still strongly reachable after $tries GC rounds while " +
          "the canary was collected — the Tables memo is pinning it")
    else
      cancel(s"GC never processed weak references in $tries rounds — inconclusive")
  }
}
