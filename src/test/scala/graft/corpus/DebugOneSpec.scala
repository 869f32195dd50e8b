package graft.corpus

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Throwaway triage harness: replay ONE corpus file with full output.
  * Pick the file via -DsltFile=<path under sql/>.
  */
class DebugOneSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.lake.connector.GraftSparkExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.timestampType", "TIMESTAMP_NTZ")
    .config("spark.sql.warehouse.dir",
      Files.createTempDirectory("slt-wh").toString)
    .config("spark.sql.leafNodeDefaultParallelism", "1")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("replay one corpus file") {
    val runner = new SqlLogicRunner(spark)
    sys.props.getOrElse("sltFile", "alter/rename_table.test")
      .split(",").foreach { rel =>
        val root = Paths.get("/root/reference/tests/sqllogictests/sql")
        val targets =
          if (Files.isDirectory(root.resolve(rel))) {
            import scala.jdk.CollectionConverters._
            Files.list(root.resolve(rel)).iterator().asScala
              .filter(_.toString.endsWith(".test")).toSeq.sortBy(_.toString)
          } else Seq(root.resolve(rel))
        targets.foreach { p =>
          assume(Files.isRegularFile(p), s"no such corpus file: $p")
          val r = runner.run(p)
          info(s"outcome: ${r.outcome}")
          println(s"[debug-one] ${r.file}: ${r.outcome}")
        }
      }
  }
}
