package graft.lake

import java.io.File
import java.net.URI
import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath, RawLocalFileSystem}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** A Hadoop FileSystem registered for the `s3a` scheme that stores
  * objects in a local directory — the offline stand-in for the
  * reference's MinIO-backed object-store integration suite
  * (tests/object_store_integration_test.rs:1-422). Everything above the
  * FileSystem API (the lake's write staging, rename publish, MOR delete
  * files, vacuum unlink, path resolution) runs exactly as it would
  * against S3, which is the surface this spec pins.
  */
class StubS3AFileSystem extends RawLocalFileSystem {
  import org.apache.hadoop.fs.FileStatus

  override def getScheme: String = "s3a"
  override def getUri: URI = URI.create(s"s3a://${StubS3AFileSystem.bucket}")
  // IDENTITY object-key → local-path mapping: RawLocalFileSystem rebuilds
  // Paths from java.io.File during listStatus, so any root-prefix mapping
  // double-prefixes on the round trip. The sandboxing instead lives in
  // the bucket KEY (the spec's data path embeds its temp dir).
  override def pathToFile(path: HPath): File = {
    val p = path.toUri.getPath
    new File(if (p.isEmpty) "/" else p)
  }
  // statuses must carry s3a-qualified paths AND eager (default)
  // permissions: the parent's lazy permission loader assumes a file:
  // URI and throws on any other scheme
  private def fix(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication,
      st.getBlockSize, st.getModificationTime, st.getAccessTime,
      null, null, null,
      new HPath("s3a", StubS3AFileSystem.bucket, st.getPath.toUri.getPath))
  override def getFileStatus(f: HPath): FileStatus = fix(super.getFileStatus(f))
  override def listStatus(f: HPath): Array[FileStatus] =
    super.listStatus(f).map(fix)
}

object StubS3AFileSystem {
  val bucket = "graft-test-bucket"
}

/** End-to-end-ish object-store coverage: a lake whose DATA PATH is an
  * `s3a://` URI, exercised across create/insert/MOR-delete/compact/
  * vacuum, plus PathResolver round-trips for object-store URIs. Closes
  * the branch the reference tests with MinIO and we previously never
  * executed.
  */
class S3APathSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.lake.connector.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val hc = s.sparkContext.hadoopConfiguration
    hc.set("fs.s3a.impl", classOf[StubS3AFileSystem].getName)
    hc.set("fs.s3a.impl.disable.cache", "true")
    s
  }

  private lazy val localRoot = Files.createTempDirectory("dl-s3a").toString
  private lazy val objectRoot = s"$localRoot/objects"
  private lazy val lake = {
    new File(objectRoot).mkdirs()
    // metadata stays on the local catalog backend (as with real S3);
    // only DATA lives behind the object-store scheme — the bucket key
    // embeds the temp dir so the identity-mapped stub stays sandboxed
    new DuckLake(spark, s"$localRoot/meta",
      s"s3a://${StubS3AFileSystem.bucket}$objectRoot/lake/data")
  }

  override def afterAll(): Unit = { lake.close(); spark.stop() }

  private def objectFiles(): Seq[File] = {
    def walk(d: File): Seq[File] =
      Option(d.listFiles()).toSeq.flatten
        .flatMap(f => if (f.isDirectory) walk(f) else Seq(f))
    walk(new File(objectRoot))
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
  }

  test("create + append + read back through s3a:// data path") {
    import spark.implicits._
    lake.createTableAs(
      (1L to 100L).map(i => (i, s"row$i")).toDF("id", "tag").coalesce(1),
      "main.s3t")
    lake.insertInto(
      (101L to 200L).map(i => (i, s"row$i")).toDF("id", "tag").coalesce(1),
      "main.s3t")
    assert(lake.table("main.s3t").count() == 200)
    assert(lake.table("main.s3t").agg(sum("id")).head().getLong(0) ==
      (1L to 200L).sum)
    // the data objects physically live under the stub bucket root
    assert(objectFiles().nonEmpty)
    // and the resolved file listing yields s3a URIs, not local paths
    val paths = lake.listFilesAt("s3t").collect().map(_.getString(0))
    assert(paths.nonEmpty && paths.forall(_.startsWith("s3a://")),
      s"catalog paths not object-store URIs: ${paths.take(2).mkString(",")}")
  }

  test("MOR delete writes its delete file behind s3a:// and reads merge it") {
    import spark.implicits._
    val _ = lake.table("main.s3t").count() // table from the previous test
    lake.deleteWhere("main.s3t", col("id") % 2 === 0)
    assert(lake.table("main.s3t").count() == 100)
    assert(lake.table("main.s3t").filter(col("id") % 2 === 0).count() == 0)
  }

  test("compact + vacuum unlink objects through the s3a filesystem") {
    val before = objectFiles().size
    lake.compact("main.s3t")
    assert(lake.table("main.s3t").count() == 100)
    lake.expireSnapshots(lake.currentSnapshot)
    lake.vacuum()
    val after = objectFiles().size
    assert(after < before + 2,
      s"vacuum left the pre-compaction objects behind ($before -> $after)")
    assert(lake.table("main.s3t").count() == 100)
  }

  test("PathResolver round-trips object-store URIs (absolute child wins, relative joins)") {
    val data = "s3a://bucket/lake/data"
    assert(PathResolver.join(data, "main/", childIsRelative = true) ==
      "s3a://bucket/lake/data/main/")
    val full = PathResolver.resolveFile(
      data, "main/", schemaRel = true, "t1/", tableRel = true,
      "part-0.parquet", fileRel = true)
    assert(full == "s3a://bucket/lake/data/main/t1/part-0.parquet")
    // an ABSOLUTE s3a child path replaces the base (cross-bucket add_files)
    assert(PathResolver.join(data, "s3a://other/x.parquet",
      childIsRelative = false) == "s3a://other/x.parquet")
    // traversal hardening applies unchanged to object-store paths
    intercept[InvalidConfigException](
      PathResolver.join(data, "../escape.parquet", childIsRelative = true))
    intercept[InvalidConfigException](
      PathResolver.join(data, "a/%2E%2E/b.parquet", childIsRelative = true))
    // Hadoop Path round-trip keeps scheme + authority
    val hp = new HPath(full)
    assert(hp.toUri.getScheme == "s3a" && hp.toUri.getAuthority == "bucket")
    assert(hp.toString == full)
  }
}
