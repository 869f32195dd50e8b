package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** End-to-end lake behavior, mirroring the reference's oracle fixtures
  * (reference: tests/common/mod.rs — `users` plain, `products` with MOR
  * deletes, rename tables) plus snapshot pinning, CDC and info-schema.
  */
class DuckLakeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.lake.connector.GraftSparkExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val root = Files.createTempDirectory("ducklake-spec").toString
  private lazy val lake = new DuckLake(spark, s"$root/meta", s"$root/data")

  override def afterAll(): Unit = { lake.close(); spark.stop() }

  import scala.jdk.CollectionConverters._

  test("users: ingest + read back (fixture A1)") {
    import spark.implicits._
    val users = Seq((1, "Alice", "alice@x.com"), (2, "Bob", "bob@x.com"),
      (3, "Charlie", "charlie@x.com"), (4, "Diana", "diana@x.com"))
      .toDF("id", "name", "email")
    lake.createTableAs(users.coalesce(1), "main.users")
    val got = lake.table("main.users").orderBy("id").collect()
    assert(got.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
    assert(got.map(_.getString(1)).toSeq == Seq("Alice", "Bob", "Charlie", "Diana"))
  }

  test("append creates a new snapshot; old snapshot still sees old data") {
    import spark.implicits._
    val snapBefore = lake.currentSnapshot
    lake.insertInto(Seq((5, "Eve", "eve@x.com")).toDF("id", "name", "email")
      .coalesce(1), "main.users")
    assert(lake.currentSnapshot == snapBefore + 1)
    assert(lake.table("main.users").count() == 5)
    assert(lake.table("main.users", Some(snapBefore)).count() == 4)
  }

  test("replace ends previous files (overwrite semantics)") {
    import spark.implicits._
    lake.createTableAs(Seq((10, "Zoe", "z@x.com")).toDF("id", "name", "email")
      .coalesce(1), "main.users_v2")
    val s1 = lake.currentSnapshot
    lake.insertInto(Seq((11, "Yan", "y@x.com")).toDF("id", "name", "email")
      .coalesce(1), "main.users_v2", WriteMode.Replace)
    assert(lake.table("main.users_v2").collect().map(_.getInt(0)).toSeq == Seq(11))
    assert(lake.table("main.users_v2", Some(s1)).collect().map(_.getInt(0)).toSeq == Seq(10))
  }

  test("products: MOR positional deletes (fixture A2: ids 2,4 deleted -> {1,3,5})") {
    import spark.implicits._
    val products = Seq(
      (1, "widget", 9.99, true), (2, "gadget", 19.99, true), (3, "gizmo", 4.99, false),
      (4, "doohickey", 2.49, true), (5, "thingamajig", 99.0, true))
      .toDF("id", "name", "price", "in_stock")
    lake.createTableAs(products.coalesce(1), "main.products")
    lake.deleteWhere("main.products", col("id").isin(2, 4))
    val visible = lake.table("main.products").orderBy("id")
    assert(visible.collect().map(_.getInt(0)).toSeq == Seq(1, 3, 5))
    // COUNT(*)-style zero-column aggregation still correct after deletes
    assert(lake.table("main.products").count() == 3)
    // aggregate over remaining rows
    val sumPrice = lake.table("main.products").agg(round(sum("price"), 2)).head.getDouble(0)
    assert(sumPrice == 113.98)
  }

  test("cumulative deletes: second delete keeps first delete's rows hidden") {
    val snapAfterFirst = lake.currentSnapshot
    lake.deleteWhere("main.products", col("id") === 5)
    assert(lake.table("main.products").collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 3))
    assert(lake.table("main.products", Some(snapAfterFirst))
      .collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 3, 5))
  }

  test("update = delete + insert across snapshots (fixture A3)") {
    import spark.implicits._
    lake.createTableAs(Seq((1, 100), (2, 200), (3, 300)).toDF("id", "qty")
      .coalesce(1), "main.inventory")
    // update ids 1,3: delete then re-insert new versions
    lake.deleteWhere("main.inventory", col("id").isin(1, 3))
    lake.insertInto(Seq((1, 101), (3, 303)).toDF("id", "qty").coalesce(1), "main.inventory")
    val got = lake.table("main.inventory").orderBy("id").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(got == Seq((1, 101), (2, 200), (3, 303)))
  }

  test("rename column on read: parquet keeps old name (fixture A4)") {
    import spark.implicits._
    lake.createTableAs(Seq((1L, "a"), (2L, "b")).toDF("user_id", "v")
      .coalesce(1), "main.renamed")
    lake.renameColumn("main.renamed", "user_id", "userId")
    val got = lake.table("main.renamed")
    assert(got.columns.toSeq == Seq("userId", "v"))
    assert(got.orderBy("userId").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // data written after the rename also reads fine (mixed epochs)
    lake.insertInto(Seq((3L, "c")).toDF("userId", "v").coalesce(1), "main.renamed")
    assert(lake.table("main.renamed").orderBy("userId").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  test("add nullable column via append; old files read as null") {
    import spark.implicits._
    lake.createTableAs(Seq((1, "x")).toDF("id", "a").coalesce(1), "main.evolved")
    lake.insertInto(Seq((2, "y", Option(5.0))).toDF("id", "a", "b").coalesce(1), "main.evolved")
    val got = lake.table("main.evolved").orderBy("id").collect()
    assert(got.length == 2)
    assert(got(0).isNullAt(2) && got(1).getDouble(2) == 5.0)
  }

  test("type promotion int32 -> int64 on append") {
    import spark.implicits._
    lake.createTableAs(Seq((1, 10)).toDF("id", "v").coalesce(1), "main.promoted")
    lake.insertInto(Seq((2, 20L)).toDF("id", "v").coalesce(1), "main.promoted")
    val got = lake.table("main.promoted").orderBy("id").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(10L, 20L))
    // narrowing is rejected
    assertThrows[UnsupportedTypeException] {
      lake.insertInto(Seq(("s", 1)).toDF("id", "v").coalesce(1), "main.promoted")
    }
  }

  test("non-nullable new column rejected on append (reference: metadata_writer_sqlite.rs:426-463)") {
    import spark.implicits._
    val df = spark.createDataFrame(
      Seq[(Int, String, Int)]((3, "z", 1)).toDF("id", "a", "c").rdd,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.IntegerType, true),
        org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.StringType, true),
        org.apache.spark.sql.types.StructField("c", org.apache.spark.sql.types.IntegerType, false))))
    assertThrows[UnsupportedException] {
      lake.insertInto(df.coalesce(1), "main.evolved")
    }
  }

  test("CDC: tableChanges returns inserts in range with snapshot_id + change_type") {
    import spark.implicits._
    lake.createTableAs(Seq((1, "a")).toDF("k", "v").coalesce(1), "main.cdc")
    val s1 = lake.currentSnapshot
    lake.insertInto(Seq((2, "b")).toDF("k", "v").coalesce(1), "main.cdc")
    val s2 = lake.currentSnapshot
    lake.insertInto(Seq((3, "c")).toDF("k", "v").coalesce(1), "main.cdc")
    val s3 = lake.currentSnapshot
    val ch = lake.tableChanges("main.cdc", s1, s3).orderBy("k").collect()
    assert(ch.map(_.getInt(0)).toSeq == Seq(2, 3))
    assert(ch.map(_.getLong(2)).toSeq == Seq(s2, s3))
    assert(ch.forall(_.getString(3) == "insert"))
    assert(lake.tableChanges("main.cdc", s3, s3).count() == 0)
    assertThrows[InvalidSnapshotException](lake.tableChanges("main.cdc", 5, 1))
  }

  test("CDC: tableDeletions returns position deltas incl. previous-delete handling") {
    import spark.implicits._
    lake.createTableAs(Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")).toDF("k", "v")
      .coalesce(1), "main.cdcdel")
    val s0 = lake.currentSnapshot
    lake.deleteWhere("main.cdcdel", col("k") === 2)
    val s1 = lake.currentSnapshot
    lake.deleteWhere("main.cdcdel", col("k") === 4)
    val s2 = lake.currentSnapshot
    // range (s0, s1]: only k=2
    assert(lake.tableDeletions("main.cdcdel", s0, s1).collect()
      .map(_.getInt(0)).toSeq == Seq(2))
    // range (s1, s2]: only the delta k=4 (k=2 was already deleted)
    assert(lake.tableDeletions("main.cdcdel", s1, s2).collect()
      .map(_.getInt(0)).toSeq == Seq(4))
    // full range: both
    assert(lake.tableDeletions("main.cdcdel", s0, s2).collect()
      .map(_.getInt(0)).sorted.toSeq == Seq(2, 4))
  }

  test("CDC: replace shows up as full-file deletions") {
    import spark.implicits._
    lake.createTableAs(Seq((1, "a"), (2, "b")).toDF("k", "v").coalesce(1), "main.cdcrep")
    val s0 = lake.currentSnapshot
    lake.insertInto(Seq((9, "z")).toDF("k", "v").coalesce(1), "main.cdcrep", WriteMode.Replace)
    val s1 = lake.currentSnapshot
    val dels = lake.tableDeletions("main.cdcrep", s0, s1).collect()
    assert(dels.map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
    assert(dels.forall(_.getString(3) == "delete"))
  }

  test("information_schema surfaces (A16-A19)") {
    val snaps = lake.informationSchema("snapshots")
    assert(snaps.count() >= 1)
    val tables = lake.informationSchema("tables")
    assert(tables.filter(col("table_name") === "users").count() == 1)
    val cols = lake.informationSchema("columns")
      .filter(col("table_name") === "products").orderBy("column_order").collect()
    assert(cols.map(_.getString(4)).toSeq == Seq("id", "name", "price", "in_stock"))
    assert(cols.map(_.getString(5)).toSeq == Seq("int32", "varchar", "float64", "boolean"))
    val info = lake.tableInfoDF.filter(col("table_name") === "products").head
    assert(info.getAs[Long]("file_count") == 1L)
    assert(info.getAs[Long]("delete_file_count") == 1L)
    val files = lake.listFilesDF.filter(col("table_name") === "products").collect()
    assert(files.length == 1 && files.head.getAs[String]("delete_file_path") != null)
    // format self-description (DuckLake spec ducklake_metadata keys)
    val meta = lake.informationSchema("metadata").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(meta.get("version").contains("0.2") && meta.contains("created_by"))
  }

  test("snapshots are monotonic and timestamped") {
    val snaps = lake.store.snapshots
    assert(snaps.map(_._1) == snaps.map(_._1).sorted)
    assert(snaps.head._1 == 0L)
  }

  test("errors: unknown table/schema") {
    assertThrows[TableNotFoundException](lake.table("main.nope"))
    assertThrows[SchemaNotFoundException](lake.table("noschema.t"))
  }

  test("all supported types round-trip through write+read (types/all_types parity)") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("b", BooleanType), StructField("i8", ByteType),
      StructField("i16", ShortType), StructField("i32", IntegerType),
      StructField("i64", LongType), StructField("f32", FloatType),
      StructField("f64", DoubleType), StructField("d", DateType),
      StructField("ts", TimestampNTZType), StructField("s", StringType),
      StructField("bin", BinaryType), StructField("dec", DecimalType(12, 3)),
      StructField("arr", ArrayType(LongType))))
    val row = org.apache.spark.sql.Row(
      true, 1.toByte, 2.toShort, 3, 4L, 1.5f, 2.5, java.sql.Date.valueOf("2024-06-01"),
      java.time.LocalDateTime.of(2024, 6, 1, 12, 30, 0), "héllo   world",
      Array[Byte](1, 2, 3), new java.math.BigDecimal("123.456"), Seq(1L, 2L, 3L))
    val df = spark.createDataFrame(java.util.List.of(row, row), schema)
    lake.createTableAs(df.coalesce(1), "main.all_types")
    val back = lake.table("main.all_types").collect()
    assert(back.length == 2)
    val r = back.head
    assert(r.getBoolean(0) && r.getByte(1) == 1 && r.getShort(2) == 2 &&
      r.getInt(3) == 3 && r.getLong(4) == 4L && r.getFloat(5) == 1.5f &&
      r.getDouble(6) == 2.5)
    assert(r.getAs[java.sql.Date](7).toString == "2024-06-01")
    assert(r.getAs[String](9) == "héllo   world")
    assert(r.getAs[Array[Byte]](10).toSeq == Seq[Byte](1, 2, 3))
    assert(r.getAs[java.math.BigDecimal](11).compareTo(new java.math.BigDecimal("123.456")) == 0)
    assert(r.getSeq[Long](12) == Seq(1L, 2L, 3L))
    // catalog recorded DuckLake type strings
    val types = lake.informationSchema("columns")
      .filter(col("table_name") === "all_types").orderBy("column_order")
      .collect().map(_.getString(5)).toSeq
    assert(types == Seq("boolean", "int8", "int16", "int32", "int64", "float32",
      "float64", "date", "timestamp", "varchar", "blob", "decimal(12,3)", "list<int64>"))
  }

  test("inf/nan floats round-trip with stats capture intact (types/floats parity)") {
    import spark.implicits._
    val df = Seq(
      (1L, Double.PositiveInfinity), (2L, Double.NegativeInfinity),
      (3L, Double.NaN), (4L, 1.5)).toDF("id", "x")
    lake.createTableAs(df.coalesce(1), "main.floats")
    val back = lake.table("main.floats").orderBy("id").collect()
    assert(back(0).getDouble(1).isPosInfinity)
    assert(back(1).getDouble(1).isNegInfinity)
    assert(back(2).getDouble(1).isNaN)
    assert(back(3).getDouble(1) == 1.5)
    // a filter on another column must not be broken by weird float stats
    import org.apache.spark.sql.sources.EqualTo
    assert(lake.table("main.floats", None, Seq(EqualTo("id", 3L))).count() == 4)
  }

  test("NUL bytes in string values round-trip and filter exactly (types/null_byte parity)") {
    import spark.implicits._
    val df = Seq((1L, "plain"), (2L, "embedded\u0000nul"), (3L, "\u0000leading"),
      (4L, "trailing\u0000")).toDF("id", "s")
    lake.createTableAs(df.coalesce(1), "main.nulbytes")
    val back = lake.table("main.nulbytes").orderBy("id").collect()
    assert(back(1).getString(1) == "embedded\u0000nul")
    assert(back(2).getString(1) == "\u0000leading")
    // equality filter on a NUL-containing literal (footer stats include
    // NUL strings; pruning must stay conservative, never drop the file)
    assert(lake.table("main.nulbytes").filter(col("s") === "embedded\u0000nul").count() == 1)
    // MOR delete keyed on a NUL-containing value
    lake.deleteWhere("main.nulbytes", col("s") === "\u0000leading")
    assert(lake.table("main.nulbytes").count() == 3)
  }

  test("encrypted lake: write+read+MOR-delete+CDC round-trip; raw file unreadable (A5)") {
    import spark.implicits._
    val eroot = Files.createTempDirectory("ducklake-enc").toString
    val enc = new DuckLake(spark, s"$eroot/meta", s"$eroot/data", encrypted = true)
    try {
      val df = (1 to 100).map(i => (i.toLong, s"row$i", i * 1.5)).toDF("id", "name", "v")
      enc.createTableAs(df.coalesce(1), "main.secret")
      val pre = enc.currentSnapshot
      enc.deleteWhere("main.secret", col("id") % 10 === 0)
      // read back through catalog keys: 90 rows, correct sum
      val got = enc.table("main.secret")
      assert(got.count() == 90)
      assert(got.agg(sum("id")).head.getLong(0) == (1 to 100).filter(_ % 10 != 0).sum)
      // CDC over encrypted files
      assert(enc.tableDeletions("main.secret", pre, enc.currentSnapshot).count() == 10)
      // file on disk is PME: footer magic PARE, plain read fails
      val fPath = enc.store.getMetadata("data_path").get + "/main/secret/" +
        enc.listFilesDF.filter(col("table_name") === "secret").head.getString(2)
      val tail = {
        val in = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(fPath))
        new String(in.takeRight(4), "ASCII")
      }
      assert(tail == "PARE", s"expected encrypted footer magic, got $tail")
      val ex = intercept[Exception] {
        spark.read.parquet(fPath).collect()
      }
      assert(ex.getMessage != null)
      // key is in the catalog, one per file
      assert(enc.store.getDataFiles(
        enc.store.getTableByName(0, "secret", enc.currentSnapshot).get.tableId,
        enc.currentSnapshot).forall(_.encryptionKey.isDefined))
    } finally enc.close()
  }

  test("struct/map columns round-trip (extension beyond types.rs:74-85 rejection)") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("s", StructType(Seq(
        StructField("x", IntegerType), StructField("tags", ArrayType(StringType))))),
      StructField("m", MapType(StringType, DoubleType))))
    val rows = java.util.List.of(
      org.apache.spark.sql.Row(1L, org.apache.spark.sql.Row(7, Seq("a", "b")),
        Map("p" -> 1.5)),
      org.apache.spark.sql.Row(2L, org.apache.spark.sql.Row(8, Seq("c")),
        Map("q" -> 2.5, "r" -> 3.5)))
    lake.createTableAs(spark.createDataFrame(rows, schema).coalesce(1), "main.nested_t")
    val got = lake.table("main.nested_t").orderBy("id").collect()
    assert(got(0).getStruct(1).getInt(0) == 7)
    assert(got(0).getStruct(1).getSeq[String](1) == Seq("a", "b"))
    assert(got(1).getMap[String, Double](2).toMap == Map("q" -> 2.5, "r" -> 3.5))
    // catalog records the nested type strings
    val types = lake.informationSchema("columns")
      .filter(col("table_name") === "nested_t").orderBy("column_order")
      .collect().map(_.getString(5)).toSeq
    assert(types == Seq("int64", "struct<x:int32,tags:list<varchar>>",
      "map<varchar,float64>"))
    // MOR delete over a nested-typed table
    lake.deleteWhere("main.nested_t", col("id") === 1L)
    assert(lake.table("main.nested_t").count() == 1)
  }

  test("data files carry parquet field_ids = catalog column ids (spec interop)") {
    import spark.implicits._
    lake.createTableAs(Seq((1L, "a", 1.5)).toDF("k", "v", "w").coalesce(1), "main.fid_t")
    lake.addColumn("main.fid_t", "z", "int32")
    lake.insertInto(Seq((2L, "b", 2.5, 9)).toDF("k", "v", "w", "z").coalesce(1), "main.fid_t")
    val snap = lake.currentSnapshot
    val sch = lake.store.getSchemaByName("main", snap).get
    val tbl = lake.store.getTableByName(sch.schemaId, "fid_t", snap).get
    val wantIds = lake.store.getTableColumns(tbl.tableId, snap)
      .map(c => c.name -> c.columnId).toMap
    val files = lake.store.getDataFiles(tbl.tableId, snap)
    assert(files.size == 2)
    files.foreach { f =>
      val path = s"$root/data/main/fid_t/${f.path}"
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(path),
        spark.sparkContext.hadoopConfiguration)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        import scala.jdk.CollectionConverters._
        val got = r.getFooter.getFileMetaData.getSchema.getFields.asScala
          .flatMap(fld => Option(fld.getId).map(id => fld.getName -> id.intValue.toLong))
          .toMap
        got.foreach { case (n, id) => assert(wantIds(n) == id,
          s"field $n: file id $id != catalog ${wantIds(n)}") }
        assert(got.nonEmpty)
      } finally r.close()
    }
  }
}
