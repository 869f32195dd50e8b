package graft.queries

import java.util.UUID

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.lake.{DuckLake, WriteMode}

/** Correctness-gate entries for the DuckLake layer itself: each query
  * ingests the driver testdata through the lake's write path (CTAS /
  * append / delete / rename), reads back through the snapshot-pinned scan,
  * and has a plain-SQL DuckDB oracle over the ORIGINAL parquet — so the
  * whole metadata+write+MOR-read pipeline is hash-verified end to end.
  */
object LakeQueries {
  import Tables.t

  /** One lake fixture per (JVM, sfDir): built on first use, reused by all
    * lake queries in the run.
    */
  private val lakes = TrieMap[String, (DuckLake, Map[String, Long])]()

  private def fixture(s: SparkSession, dir: String): (DuckLake, Map[String, Long]) =
    lakes.getOrElseUpdate(dir, {
      val root = s"/tmp/graft-lake-${UUID.randomUUID().toString.take(8)}"
      val lake = new DuckLake(s, s"$root/meta", s"$root/data")
      val marks = Map.newBuilder[String, Long]

      // lineitem: clean copy (multi-file to exercise batched multi-file scan)
      lake.createTableAs(t(s, dir, "lineitem").repartition(4), "main.lineitem")
      // lineitem_del: copy with MOR positional deletes (l_orderkey % 97 == 0)
      lake.createTableAs(t(s, dir, "lineitem").repartition(4), "main.lineitem_del")
      marks += "li_del_pre" -> lake.currentSnapshot
      lake.deleteWhere("main.lineitem_del", col("l_orderkey") % 97 === 0)
      // orders: snapshot pinning + CDC (append every 10th order again)
      lake.createTableAs(t(s, dir, "orders").coalesce(1), "main.orders")
      marks += "orders_v1" -> lake.currentSnapshot
      lake.insertInto(t(s, dir, "orders").filter(col("o_orderkey") % 10 === 0)
        .coalesce(1), "main.orders")
      marks += "orders_v2" -> lake.currentSnapshot
      // documents: rename n_chars -> num_chars after ingest
      lake.createTableAs(t(s, dir, "documents").coalesce(1), "main.docs")
      lake.renameColumn("main.docs", "n_chars", "num_chars")
      // part: type promotion int32 -> int64 via append
      lake.createTableAs(t(s, dir, "part").coalesce(1), "main.part_evolved")
      lake.insertInto(
        t(s, dir, "part").withColumn("p_size", col("p_size").cast("long")).coalesce(1),
        "main.part_evolved")
      // embeddings: list<float32> column through the type bridge
      lake.createTableAs(t(s, dir, "embeddings").coalesce(1), "main.embeddings")
      // orders_part: hive-partitioned by o_orderpriority — catalog
      // partition values drive file pruning with zero data IO
      lake.createTableAs(t(s, dir, "orders").repartition(2), "main.orders_part",
        partitionBy = Seq("o_orderpriority"))
      // supplier_part / customer_part: CO-partitioned on nation key for
      // the storage-partitioned join gate (zero-shuffle big-big join)
      lake.createTableAs(t(s, dir, "supplier").repartition(2), "main.supplier_part",
        partitionBy = Seq("s_nationkey"))
      lake.createTableAs(t(s, dir, "customer").repartition(2), "main.customer_part",
        partitionBy = Seq("c_nationkey"))
      lake.registerViews()
      // register the DSv2 catalog plugin against this fixture's lake so
      // `ducklake.main.*` resolves in spark.sql (lazily instantiated)
      s.conf.set("spark.sql.catalog.ducklake",
        classOf[graft.lake.connector.DuckLakeSparkCatalog].getName)
      s.conf.set("spark.sql.catalog.ducklake.metaDb", lake.metaDbPath)
      s.conf.set("spark.sql.catalog.ducklake.dataPath", lake.dataPath)
      (lake, marks.result())
    })

  /** Separate lake with Parquet Modular Encryption on (lake-level flag):
    * every data/delete file gets its own AES-128 key held in the catalog.
    * The oracle reads the PLAINTEXT originals — hash-match proves the
    * encrypt→catalog-key→decrypt cycle is lossless.
    */
  private val encLakes = TrieMap[String, DuckLake]()
  private def encFixture(s: SparkSession, dir: String): DuckLake =
    encLakes.getOrElseUpdate(dir, {
      val root = s"/tmp/graft-enclake-${UUID.randomUUID().toString.take(8)}"
      val lake = new DuckLake(s, s"$root/meta", s"$root/data", encrypted = true)
      lake.createTableAs(t(s, dir, "customer").coalesce(1), "main.customer")
      lake.deleteWhere("main.customer", col("c_custkey") % 11 === 0)
      lake
    })

  /** Separate lake with data inlining on: small appends live as catalog
    * rows (no parquet file) until flushed — the oracle reads the plain
    * originals, so a hash match proves the inline write+read+MOR cycle.
    */
  private val inlLakes = TrieMap[String, DuckLake]()
  private def inlFixture(s: SparkSession, dir: String): DuckLake =
    inlLakes.getOrElseUpdate(dir, {
      val root = s"/tmp/graft-inlake-${UUID.randomUUID().toString.take(8)}"
      val lake = new DuckLake(s, s"$root/meta", s"$root/data", inlineRowLimit = 64)
      lake.createTableAs(
        t(s, dir, "supplier").filter(col("s_suppkey") <= 80).coalesce(1), "main.supplier")
      lake.insertInto( // 20 rows -> inlined into the catalog
        t(s, dir, "supplier").filter(col("s_suppkey") > 80 && col("s_suppkey") <= 100),
        "main.supplier")
      lake.deleteWhere("main.supplier", col("s_suppkey") % 10 === 0)
      lake
    })

  /** Separate lake exercising file ADOPTION (`addFiles`): parquet written
    * OUTSIDE the lake — one file with reversed column order, one with a
    * missing column — registered without rewriting a byte. The oracle
    * reads the plain originals, so a hash match proves the name-mapping
    * projection end to end.
    */
  private val addLakes = TrieMap[String, DuckLake]()
  private def addFixture(s: SparkSession, dir: String): DuckLake =
    addLakes.getOrElseUpdate(dir, {
      val root = s"/tmp/graft-addlake-${UUID.randomUUID().toString.take(8)}"
      val lake = new DuckLake(s, s"$root/meta", s"$root/data")
      val supplier = t(s, dir, "supplier")
      lake.createTableAs(supplier.filter(col("s_suppkey") <= 40).coalesce(1),
        "main.supplier_adopt")
      // outside writer 1: same columns, REVERSED order (mapping is by name)
      supplier.filter(col("s_suppkey") > 40 && col("s_suppkey") <= 70)
        .select("s_acctbal", "s_nationkey", "s_name", "s_suppkey")
        .coalesce(1).write.mode("overwrite").parquet(s"$root/external/a")
      // outside writer 2: s_acctbal missing entirely (adopted with NULLs)
      supplier.filter(col("s_suppkey") > 70)
        .select("s_suppkey", "s_name", "s_nationkey")
        .coalesce(1).write.mode("overwrite").parquet(s"$root/external/b")
      lake.addFiles("main.supplier_adopt", Seq(s"$root/external/a"))
      lake.addFiles("main.supplier_adopt", Seq(s"$root/external/b"), allowMissing = true)
      lake
    })

  val defs: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(

    ("lake_add_files", (s: SparkSession, dir: String) => {
      // adopted-in-place external parquet (reversed column order + missing
      // column) unioned with natively written data through one scan
      addFixture(s, dir).table("main.supplier_adopt").orderBy("s_suppkey")
    }, """
      SELECT s_suppkey, s_name, s_nationkey, s_acctbal
      FROM supplier WHERE s_suppkey <= 70
      UNION ALL
      SELECT s_suppkey, s_name, s_nationkey, NULL AS s_acctbal
      FROM supplier WHERE s_suppkey > 70
      ORDER BY s_suppkey
    """),

    ("lake_inline", (s: SparkSession, dir: String) => {
      // inlined rows + file rows + MOR deletes through one scan
      inlFixture(s, dir).table("main.supplier")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    }, """
      SELECT s_suppkey, s_name, s_acctbal
      FROM supplier
      WHERE s_suppkey <= 100 AND NOT (s_suppkey % 10 = 0)
      ORDER BY s_suppkey
    """),

    ("lake_encrypted_scan", (s: SparkSession, dir: String) => {
      // PME-encrypted lake + MOR deletes, read back through catalog keys
      encFixture(s, dir).table("main.customer")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("sum_bal"))
        .orderBy("c_mktsegment")
    }, """
      SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS sum_bal
      FROM customer
      WHERE NOT (c_custkey % 11 = 0)
      GROUP BY 1 ORDER BY 1
    """),

    ("lake_scan_agg", (s: SparkSession, dir: String) => {
      val (lake, _) = fixture(s, dir)
      lake.table("main.lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    }, """
      SELECT l_returnflag, l_linestatus,
        round(sum(l_quantity), 2) AS sum_qty,
        round(sum(l_extendedprice), 2) AS sum_price,
        count(*) AS n
      FROM lineitem
      GROUP BY 1, 2 ORDER BY 1, 2
    """),

    ("lake_scan_rows", (s: SparkSession, dir: String) => {
      val (lake, _) = fixture(s, dir)
      lake.table("main.lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber")
    }, """
      SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
      FROM lineitem ORDER BY l_orderkey, l_linenumber
    """),

    ("lake_mor_deletes", (s: SparkSession, dir: String) => {
      val (lake, _) = fixture(s, dir)
      lake.table("main.lineitem_del")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy("l_returnflag")
    }, """
      SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem
      WHERE NOT (l_orderkey % 97 = 0)
      GROUP BY 1 ORDER BY 1
    """),

    ("lake_mor_delete_rows", (s: SparkSession, dir: String) => {
      val (lake, _) = fixture(s, dir)
      lake.table("main.lineitem_del")
        .filter(col("l_orderkey") % 97 === 1)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    }, """
      SELECT l_orderkey, l_linenumber, l_extendedprice
      FROM lineitem
      WHERE NOT (l_orderkey % 97 = 0) AND l_orderkey % 97 = 1
      ORDER BY l_orderkey, l_linenumber
    """),

    ("lake_time_travel", (s: SparkSession, dir: String) => {
      val (lake, marks) = fixture(s, dir)
      val v1 = lake.table("main.orders", Some(marks("orders_v1")))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n_v1"))
      val v2 = lake.table("main.orders")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n_v2"))
      v1.join(v2, "o_orderstatus").orderBy("o_orderstatus")
    }, """
      SELECT v1.o_orderstatus, n_v1, n_v2
      FROM (SELECT o_orderstatus, count(*) AS n_v1 FROM orders GROUP BY 1) v1
      JOIN (SELECT o_orderstatus, count(*) AS n_v2 FROM
              (SELECT * FROM orders UNION ALL
               SELECT * FROM orders WHERE o_orderkey % 10 = 0)
            GROUP BY 1) v2
      ON v1.o_orderstatus = v2.o_orderstatus
      ORDER BY 1
    """),

    ("lake_rename_read", (s: SparkSession, dir: String) => {
      val (lake, _) = fixture(s, dir)
      lake.table("main.docs")
        .select("doc_id", "num_chars", "lang")
        .orderBy("doc_id")
    }, """
      SELECT doc_id, n_chars AS num_chars, lang
      FROM documents ORDER BY doc_id
    """),

    ("lake_evolution_promote", (s: SparkSession, dir: String) => {
      val (lake, _) = fixture(s, dir)
      lake.table("main.part_evolved")
        .groupBy("p_brand")
        .agg(sum(col("p_size")).as("sum_size"), count(lit(1)).as("n"))
        .orderBy("p_brand")
    }, """
      SELECT p_brand, CAST(sum(p_size) AS BIGINT) AS sum_size, count(*) AS n
      FROM (SELECT * FROM part UNION ALL SELECT * FROM part)
      GROUP BY 1 ORDER BY 1
    """),

    ("lake_cdc_inserts", (s: SparkSession, dir: String) => {
      val (lake, marks) = fixture(s, dir)
      lake.tableChanges("main.orders", marks("orders_v1"), marks("orders_v2"))
        .select("o_orderkey", "o_totalprice", "change_type")
        .orderBy("o_orderkey")
    }, """
      SELECT o_orderkey, o_totalprice, 'insert' AS change_type
      FROM orders WHERE o_orderkey % 10 = 0
      ORDER BY o_orderkey
    """),

    ("lake_cdc_deletions", (s: SparkSession, dir: String) => {
      val (lake, marks) = fixture(s, dir)
      lake.tableDeletions("main.lineitem_del", marks("li_del_pre"), lake.currentSnapshot)
        .select("l_orderkey", "l_linenumber", "change_type")
        .orderBy("l_orderkey", "l_linenumber")
    }, """
      SELECT l_orderkey, l_linenumber, 'delete' AS change_type
      FROM lineitem WHERE l_orderkey % 97 = 0
      ORDER BY l_orderkey, l_linenumber
    """),

    ("lake_array_type", (s: SparkSession, dir: String) => {
      // list<float32> round-trip through the lake write+read paths
      val (lake, _) = fixture(s, dir)
      lake.table("main.embeddings")
        .select(col("vec_id"), size(col("embedding")).as("dim"),
          round(element_at(col("embedding"), 1).cast("double"), 6).as("e0"),
          col("label"))
        .orderBy("vec_id")
    }, """
      SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
        round(CAST(embedding[1] AS DOUBLE), 6) AS e0, label
      FROM embeddings ORDER BY vec_id
    """),

    ("lake_sql_surface", (s: SparkSession, dir: String) => {
      // spark.sql over snapshot-pinned lake views (MOR deletes included)
      val (lake, _) = fixture(s, dir)
      lake.sql("""
        SELECT l_returnflag, count(*) AS n,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lake_main_lineitem_del
        WHERE l_quantity > 10
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")
    }, """
      SELECT l_returnflag, count(*) AS n,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem
      WHERE NOT (l_orderkey % 97 = 0) AND l_quantity > 10
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """),

    ("lake_catalog_select", (s: SparkSession, dir: String) => {
      // full DSv2 catalog plugin path: spark.sql over ducklake.main.*
      // with filter pushdown -> min/max file skipping on the 4-file table
      fixture(s, dir)
      s.sql("""
        SELECT l_returnflag, count(*) AS n,
               round(sum(l_quantity), 2) AS sum_qty
        FROM ducklake.main.lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")
    }, """
      SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      GROUP BY l_returnflag ORDER BY l_returnflag
    """),

    ("lake_catalog_insert", (s: SparkSession, dir: String) => {
      // SQL INSERT INTO through the connector: re-create (Replace) then
      // append the top-5 suppliers -> deterministic under re-runs
      val (lake, _) = fixture(s, dir)
      lake.createTableAs(
        t(s, dir, "supplier").filter(col("s_suppkey") <= 5).coalesce(1),
        "main.ins_test")
      s.sql("""
        INSERT INTO ducklake.main.ins_test
        SELECT * FROM ducklake.main.ins_test WHERE s_suppkey <= 2""")
      s.sql("""
        SELECT s_suppkey, count(*) AS n FROM ducklake.main.ins_test
        GROUP BY s_suppkey ORDER BY s_suppkey""")
    }, """
      SELECT s_suppkey, count(*) AS n FROM (
        SELECT * FROM supplier WHERE s_suppkey <= 5
        UNION ALL
        SELECT * FROM supplier WHERE s_suppkey <= 2)
      GROUP BY s_suppkey ORDER BY s_suppkey
    """),

    ("lake_compaction", (s: SparkSession, dir: String) => {
      // multi-file table + deletes -> compact -> results identical, one file
      val (lake, _) = fixture(s, dir)
      lake.createTableAs(t(s, dir, "orders").repartition(3), "main.compact_t")
      lake.deleteWhere("main.compact_t", col("o_orderkey") % 13 === 0)
      lake.compact("main.compact_t")
      lake.table("main.compact_t")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("o_orderstatus")
    }, """
      SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
      FROM orders
      WHERE NOT (o_orderkey % 13 = 0)
      GROUP BY 1 ORDER BY 1
    """),

    ("lake_partition_prune", (s: SparkSession, dir: String) => {
      // the partition filter arrives via DSv2 pushdown → only the matching
      // partition's files are opened (pruned from catalog values alone)
      fixture(s, dir)
      s.sql("""
        SELECT o_orderstatus, count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM ducklake.main.orders_part
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus""")
    }, """
      SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
      FROM orders
      WHERE o_orderpriority = '1-URGENT'
      GROUP BY 1 ORDER BY 1
    """),

    ("lake_spj_join", (s: SparkSession, dir: String) => {
      // storage-partitioned join: both sides hive-partitioned on nation
      // key report KeyGroupedPartitioning, so the join runs with ZERO
      // exchange on its inputs (asserted in ConnectorSpec; here the gate
      // checks the shuffle-free plan computes the right answer). The
      // result is materialized under the conf so the SPJ plan is the one
      // that executes, then the conf is restored for the other gates.
      fixture(s, dir)
      val key = "spark.sql.sources.v2.bucketing.enabled"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "true")
      try {
        val df = s.sql("""
          SELECT s.s_nationkey AS nationkey, count(*) AS n_pairs,
                 round(sum(s.s_acctbal + c.c_acctbal), 2) AS bal
          FROM ducklake.main.supplier_part s
          JOIN ducklake.main.customer_part c ON s.s_nationkey = c.c_nationkey
          GROUP BY s.s_nationkey ORDER BY nationkey""")
        val rows = java.util.Arrays.asList(df.collect(): _*)
        s.createDataFrame(rows, df.schema)
      } finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None    => s.conf.unset(key)
      }
    }, """
      SELECT s_nationkey AS nationkey, count(*) AS n_pairs,
             round(sum(s_acctbal + c_acctbal), 2) AS bal
      FROM supplier s JOIN customer c ON s.s_nationkey = c.c_nationkey
      GROUP BY s_nationkey ORDER BY nationkey
    """),

    ("lake_sql_delete", (s: SparkSession, dir: String) => {
      // SQL DELETE FROM through the connector → MOR positional deletes
      val (lake, _) = fixture(s, dir)
      lake.createTableAs(t(s, dir, "customer").coalesce(1), "main.del_sql")
      s.sql("DELETE FROM ducklake.main.del_sql WHERE c_mktsegment = 'BUILDING' OR c_acctbal < 0")
      s.sql("""
        SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS bal
        FROM ducklake.main.del_sql
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    }, """
      SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS bal
      FROM customer
      WHERE NOT (c_mktsegment = 'BUILDING' OR c_acctbal < 0)
      GROUP BY 1 ORDER BY 1
    """),

    ("lake_sql_alter", (s: SparkSession, dir: String) => {
      // SQL ALTER TABLE: rename + add-nullable through the catalog; the
      // pre-alter file reads the renamed column via its column_id and the
      // added column as null
      val (lake, _) = fixture(s, dir)
      if (!lake.tableExists("main.alter_sql")) {
        lake.createTableAs(t(s, dir, "nation").coalesce(1), "main.alter_sql")
        s.sql("ALTER TABLE ducklake.main.alter_sql RENAME COLUMN n_name TO nation_name")
        s.sql("ALTER TABLE ducklake.main.alter_sql ADD COLUMN note STRING")
      }
      s.sql("""
        SELECT n_nationkey, nation_name, note
        FROM ducklake.main.alter_sql ORDER BY n_nationkey""")
    }, """
      SELECT n_nationkey, n_name AS nation_name, CAST(NULL AS VARCHAR) AS note
      FROM nation ORDER BY n_nationkey
    """),

    ("lake_bucket_join", (s: SparkSession, dir: String) => {
      // bucket SPJ: both sides bucket(8, custkey) — the join on the RAW
      // key runs shuffle-free (the catalog's bucket function lets Spark
      // match the partitionings); the gate checks that plan's answer
      val (lake, _) = fixture(s, dir)
      if (!lake.tableExists("main.orders_bkt")) {
        lake.createTableAs(t(s, dir, "orders").repartition(2),
          "main.orders_bkt", partitionBy = Seq("bucket(8, o_custkey)"))
        lake.createTableAs(t(s, dir, "customer").coalesce(1),
          "main.customer_bkt", partitionBy = Seq("bucket(8, c_custkey)"))
      }
      val key = "spark.sql.sources.v2.bucketing.enabled"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "true")
      try {
        val df = s.sql("""
          SELECT c.c_mktsegment, count(*) AS n,
                 round(sum(o.o_totalprice), 2) AS total
          FROM ducklake.main.orders_bkt o
          JOIN ducklake.main.customer_bkt c ON o.o_custkey = c.c_custkey
          GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""")
        val rows = java.util.Arrays.asList(df.collect(): _*)
        s.createDataFrame(rows, df.schema)
      } finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None    => s.conf.unset(key)
      }
    }, """
      SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
             round(sum(o_totalprice), 2) AS total
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment
    """),

    ("lake_transform_prune", (s: SparkSession, dir: String) => {
      // transform partitioning (month(o_orderdate)): the source column
      // stays in the data files, the month value lives in the catalog,
      // and a date-range predicate prunes to the matching months' files
      val (lake, _) = fixture(s, dir)
      if (!lake.tableExists("main.orders_month")) {
        lake.createTableAs(t(s, dir, "orders").repartition(2),
          "main.orders_month", partitionBy = Seq("month(o_orderdate)"))
      }
      s.sql("""
        SELECT o_orderpriority, count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM ducklake.main.orders_month
        WHERE o_orderdate >= DATE'1995-01-01' AND o_orderdate < DATE'1995-04-01'
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    }, """
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
             round(sum(o_totalprice), 2) AS total
      FROM orders
      WHERE o_orderdate >= DATE'1995-01-01' AND o_orderdate < DATE'1995-04-01'
      GROUP BY o_orderpriority ORDER BY o_orderpriority
    """),

    ("lake_default_column", (s: SparkSession, dir: String) => {
      // ADD COLUMN … DEFAULT (DuckLake spec initial_default): pre-ALTER
      // rows materialize the declared constant on read — through BOTH the
      // V1 epoch projection and the native row reader — while post-ALTER
      // inserts store real values
      val (lake, _) = fixture(s, dir)
      if (!lake.tableExists("main.defaults")) {
        lake.createTableAs(t(s, dir, "region").coalesce(1), "main.defaults")
        s.sql("ALTER TABLE ducklake.main.defaults ADD COLUMN status STRING DEFAULT 'pending'")
        s.sql("ALTER TABLE ducklake.main.defaults ADD COLUMN score INT DEFAULT 7")
        s.sql("INSERT INTO ducklake.main.defaults VALUES " +
          "(900, 'new region', 'active', 1)")
      }
      s.sql("""
        SELECT r_regionkey, r_name, status, score
        FROM ducklake.main.defaults ORDER BY r_regionkey""")
    }, """
      SELECT r_regionkey, r_name, 'pending' AS status, 7 AS score FROM region
      UNION ALL
      SELECT 900, 'new region', 'active', 1
      ORDER BY r_regionkey
    """),

    ("lake_update", (s: SparkSession, dir: String) => {
      // programmatic merge-on-read UPDATE: positional-delete + append of
      // the updated versions, no table rewrite
      val (lake, _) = fixture(s, dir)
      if (!lake.tableExists("main.upd_mor")) {
        lake.createTableAs(t(s, dir, "supplier").coalesce(1), "main.upd_mor")
        lake.update("main.upd_mor", col("s_suppkey") % 7 === 0,
          Map("s_acctbal" -> round(col("s_acctbal") + 1000, 2), "s_name" -> lit("updated")))
      }
      lake.table("main.upd_mor")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    }, """
      SELECT s_suppkey,
        CASE WHEN s_suppkey % 7 = 0 THEN 'updated' ELSE s_name END AS s_name,
        CASE WHEN s_suppkey % 7 = 0 THEN round(s_acctbal + 1000, 2) ELSE s_acctbal END AS s_acctbal
      FROM supplier ORDER BY s_suppkey
    """),

    ("lake_sql_update", (s: SparkSession, dir: String) => {
      // SQL UPDATE through the connector (group-based copy-on-write
      // rewrite via the native batch scan + write)
      val (lake, _) = fixture(s, dir)
      if (!lake.tableExists("main.upd_sql")) {
        lake.createTableAs(t(s, dir, "nation").coalesce(1), "main.upd_sql")
        s.sql("""UPDATE ducklake.main.upd_sql
                 SET n_name = 'redacted' WHERE n_regionkey = 2""")
      }
      lake.table("main.upd_sql")
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    }, """
      SELECT n_nationkey,
        CASE WHEN n_regionkey = 2 THEN 'redacted' ELSE n_name END AS n_name,
        n_regionkey
      FROM nation ORDER BY n_nationkey
    """),

    ("lake_sql_merge", (s: SparkSession, dir: String) => {
      // MERGE INTO: region rows matched by an upsert source — matched
      // rows get a new comment, unmatched source rows are inserted
      val (lake, _) = fixture(s, dir)
      if (!lake.tableExists("main.merge_sql")) {
        lake.createTableAs(t(s, dir, "region").coalesce(1), "main.merge_sql")
        t(s, dir, "region").filter(col("r_regionkey") < 2)
          .select(col("r_regionkey").as("k"))
          .unionByName(s.range(90, 92).select(col("id").cast("int").as("k")))
          .createOrReplaceTempView("merge_src")
        s.sql("""
          MERGE INTO ducklake.main.merge_sql r USING merge_src s ON r.r_regionkey = s.k
          WHEN MATCHED THEN UPDATE SET r_name = 'merged'
          WHEN NOT MATCHED THEN INSERT (r_regionkey, r_name)
            VALUES (s.k, 'inserted')""")
      }
      lake.table("main.merge_sql").orderBy("r_regionkey")
    }, """
      SELECT r_regionkey,
        CASE WHEN r_regionkey < 2 THEN 'merged' ELSE r_name END AS r_name
      FROM region
      UNION ALL
      SELECT k, 'inserted' FROM (SELECT 90 AS k UNION ALL SELECT 91)
      ORDER BY r_regionkey
    """),

    ("lake_sql_replace_table", (s: SparkSession, dir: String) => {
      // atomic RTAS through StagingTableCatalog: the second statement
      // replaces contents AND schema in one commit; the read must see
      // only the replacement (an append bug would double-count)
      val (lake, _) = fixture(s, dir)
      if (!lake.tableExists("main.rtas")) {
        s.sql("""CREATE TABLE ducklake.main.rtas AS
          SELECT l_orderkey, l_quantity FROM ducklake.main.lineitem
          WHERE l_linenumber = 1""")
        s.sql("""CREATE OR REPLACE TABLE ducklake.main.rtas AS
          SELECT l_orderkey, l_extendedprice FROM ducklake.main.lineitem
          WHERE l_linenumber = 2""")
      }
      lake.table("main.rtas")
        .agg(count(lit(1)).as("n"),
          round(sum("l_extendedprice"), 2).as("total"))
    }, """
      SELECT count(*) AS n, round(sum(l_extendedprice), 2) AS total
      FROM lineitem WHERE l_linenumber = 2
    """),

    ("lake_rewrite_files", (s: SparkSession, dir: String) => {
      // targeted maintenance: absorb MOR deletes into a fresh file, then
      // read back — contents must equal the logical state (oracle
      // recomputes the delete predicate over the raw table)
      val (lake, _) = fixture(s, dir)
      if (!lake.tableExists("main.rwgate")) {
        lake.createTableAs(t(s, dir, "orders").coalesce(1), "main.rwgate")
        lake.deleteWhere("main.rwgate", col("o_orderkey") % 7 === 0)
        lake.rewriteFiles("main.rwgate", minDeleteRatio = 0.01)
      }
      lake.table("main.rwgate")
        .agg(count(lit(1)).as("n"), sum("o_orderkey").as("key_sum"),
          round(sum("o_totalprice"), 2).as("total"))
    }, """
      SELECT count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        round(sum(o_totalprice), 2) AS total
      FROM orders WHERE o_orderkey % 7 <> 0
    """),

    ("lake_sql_merge_full", (s: SparkSession, dir: String) => {
      // full three-clause MERGE: matched update, unmatched insert, and
      // NOT MATCHED BY SOURCE delete — rows absent from the source are
      // purged (the complete sync-from-source DML shape)
      val (lake, _) = fixture(s, dir)
      if (!lake.tableExists("main.merge_full")) {
        lake.createTableAs(t(s, dir, "region").coalesce(1), "main.merge_full")
        s.range(1, 4).select(col("id").cast("int").as("k"))
          .unionByName(s.range(80, 81).select(col("id").cast("int").as("k")))
          .createOrReplaceTempView("merge_full_src")
        s.sql("""
          MERGE INTO ducklake.main.merge_full r
          USING merge_full_src s ON r.r_regionkey = s.k
          WHEN MATCHED THEN UPDATE SET r_name = concat('u_', r.r_name)
          WHEN NOT MATCHED THEN INSERT (r_regionkey, r_name) VALUES (s.k, 'new')
          WHEN NOT MATCHED BY SOURCE THEN DELETE""")
      }
      lake.table("main.merge_full").orderBy("r_regionkey")
    }, """
      SELECT r_regionkey, concat('u_', r_name) AS r_name
      FROM region WHERE r_regionkey IN (1, 2, 3)
      UNION ALL
      SELECT 80, 'new'
      ORDER BY r_regionkey
    """),

    ("lake_sql_merge_sync_update", (s: SparkSession, dir: String) => {
      // NOT MATCHED BY SOURCE -> UPDATE: rows absent from the source are
      // flagged instead of deleted (soft sync — mark-stale semantics)
      val (lake, _) = fixture(s, dir)
      if (!lake.tableExists("main.merge_sync")) {
        lake.createTableAs(t(s, dir, "region").coalesce(1), "main.merge_sync")
        s.range(0, 3).select(col("id").cast("int").as("k"))
          .createOrReplaceTempView("merge_sync_src")
        s.sql("""
          MERGE INTO ducklake.main.merge_sync r
          USING merge_sync_src s ON r.r_regionkey = s.k
          WHEN MATCHED THEN UPDATE SET r_name = concat('live_', r.r_name)
          WHEN NOT MATCHED BY SOURCE THEN UPDATE SET r_name = 'stale'""")
      }
      lake.table("main.merge_sync").orderBy("r_regionkey")
    }, """
      SELECT r_regionkey,
        CASE WHEN r_regionkey IN (0, 1, 2) THEN concat('live_', r_name)
             ELSE 'stale' END AS r_name
      FROM region ORDER BY r_regionkey
    """),

    ("lake_stream_sink", (s: SparkSession, dir: String) => {
      // streaming INGESTION: writeStream.toTable into the lake (per-epoch
      // append snapshots), then a batch read back — oracle is the nation
      // table the stream carried
      val (lake, _) = fixture(s, dir)
      if (!lake.tableExists("main.sink_nation")) {
        import s.implicits._
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        val rows = t(s, dir, "nation")
          .select("n_nationkey", "n_name", "n_regionkey").orderBy("n_nationkey")
          .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
        val mem = MemoryStream[(Int, String, Int)]
        val q = mem.toDF().toDF("n_nationkey", "n_name", "n_regionkey")
          .writeStream
          .option("checkpointLocation",
            s"/tmp/graft-sink-ckpt-${UUID.randomUUID().toString.take(8)}")
          .toTable("ducklake.main.sink_nation")
        try {
          val (first, rest) = rows.splitAt(rows.length / 2)
          mem.addData(first.toSeq); q.processAllAvailable()
          mem.addData(rest.toSeq); q.processAllAvailable()
        } finally q.stop()
      }
      lake.table("main.sink_nation").orderBy("n_nationkey")
    }, """
      SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey
    """),

    ("lake_txn_multi", (s: SparkSession, dir: String) => {
      // cross-table atomic transaction: both tables land in ONE snapshot,
      // then a lake-to-lake join reads them back
      val (lake, _) = fixture(s, dir)
      if (!lake.tableExists("main.txn_orders")) {
        lake.transaction { tx =>
          tx.write(t(s, dir, "orders").filter(col("o_orderkey") % 100 === 0)
            .coalesce(1), "main.txn_orders")
          tx.write(t(s, dir, "customer").coalesce(1), "main.txn_cust")
        }
      }
      lake.table("main.txn_orders")
        .join(lake.table("main.txn_cust"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("c_mktsegment")
    }, """
      SELECT c_mktsegment, count(*) AS n, round(sum(o_totalprice), 2) AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE o_orderkey % 100 = 0
      GROUP BY 1 ORDER BY 1
    """),

    ("lake_nested", (s: SparkSession, dir: String) => {
      // struct + map columns through the lake write/read cycle (reference
      // rejects nested types — extension); flattened for the oracle
      val (lake, _) = fixture(s, dir)
      if (!lake.tableExists("main.nested_orders")) {
        lake.createTableAs(
          t(s, dir, "orders").select(col("o_orderkey"),
            struct(col("o_totalprice").as("price"),
              col("o_orderstatus").as("status")).as("info"),
            map(col("o_orderpriority"), col("o_totalprice")).as("by_prio"))
            .coalesce(1),
          "main.nested_orders")
      }
      lake.table("main.nested_orders")
        .select(col("o_orderkey"),
          col("info.price").as("price"),
          col("info.status").as("status"),
          element_at(map_values(col("by_prio")), 1).as("mval"))
        .orderBy("o_orderkey")
    }, """
      SELECT o_orderkey, o_totalprice AS price, o_orderstatus AS status,
             o_totalprice AS mval
      FROM orders ORDER BY o_orderkey
    """),

    ("lake_view", (s: SparkSession, dir: String) => {
      // catalog-persisted SQL view (late-binding) over a lake table
      val (lake, _) = fixture(s, dir)
      try lake.createView("main.rev_by_flag",
        """SELECT l_returnflag, round(sum(l_extendedprice), 2) AS rev,
                  count(*) AS n
           FROM lake_main_lineitem GROUP BY l_returnflag""")
      catch { case _: graft.lake.UnsupportedException => () } // already exists
      lake.view("main.rev_by_flag").orderBy("l_returnflag")
    }, """
      SELECT l_returnflag, round(sum(l_extendedprice), 2) AS rev, count(*) AS n
      FROM lineitem GROUP BY 1 ORDER BY 1
    """),

    ("lake_rollback", (s: SparkSession, dir: String) => {
      // snapshot rollback: MOR delete -> mark -> append + more deletes ->
      // rollbackTo(mark). Scan must equal the marked state; the oracle is
      // the plain-SQL equivalent of that state.
      val (lake, _) = fixture(s, dir)
      if (!lake.tableExists("main.rb_supplier")) {
        lake.createTableAs(t(s, dir, "supplier").coalesce(1), "main.rb_supplier")
        lake.deleteWhere("main.rb_supplier", col("s_suppkey") % 7 === 0)
        val mark = lake.currentSnapshot
        lake.insertInto(t(s, dir, "supplier")
          .filter(col("s_suppkey") <= 20).coalesce(1), "main.rb_supplier")
        lake.deleteWhere("main.rb_supplier", col("s_suppkey") > 90)
        lake.rollbackTo("main.rb_supplier", mark)
      }
      lake.table("main.rb_supplier")
        .select("s_suppkey", "s_name", "s_acctbal").orderBy("s_suppkey")
    }, """
      SELECT s_suppkey, s_name, s_acctbal FROM supplier
      WHERE s_suppkey % 7 <> 0 ORDER BY s_suppkey
    """),

    ("lake_clone", (s: SparkSession, dir: String) => {
      // zero-copy clone of a MOR table, then divergent deletes on the
      // clone only — the scan proves shared files + independent state
      val (lake, _) = fixture(s, dir)
      if (!lake.tableExists("main.li_clone")) {
        lake.cloneTable("main.lineitem_del", "main.li_clone")
        lake.deleteWhere("main.li_clone", col("l_linenumber") === 1)
      }
      lake.table("main.li_clone")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
        .orderBy("l_returnflag")
    }, """
      SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS qty
      FROM lineitem WHERE l_orderkey % 97 <> 0 AND l_linenumber <> 1
      GROUP BY 1 ORDER BY 1
    """),

    ("lake_sql_view", (s: SparkSession, dir: String) => {
      // full SQL view lifecycle through the injected extension: CREATE OR
      // REPLACE VIEW + SELECT via spark.sql against the DSv2 catalog. The
      // view reads orders AFTER the fixture's v2 append (late binding).
      fixture(s, dir)
      s.sql("""CREATE OR REPLACE VIEW ducklake.main.prio_rev AS
               SELECT o_orderpriority, count(*) AS n,
                      round(sum(o_totalprice), 2) AS total
               FROM ducklake.main.orders GROUP BY o_orderpriority""")
      s.sql("SELECT * FROM ducklake.main.prio_rev ORDER BY o_orderpriority")
    }, """
      SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
      FROM (SELECT * FROM orders
            UNION ALL SELECT * FROM orders WHERE o_orderkey % 10 = 0)
      GROUP BY 1 ORDER BY 1
    """),

    ("sim_ivf_topk", (s: SparkSession, dir: String) => {
      // Oracle-gated against the EXACT brute-force answer: with nProbe=5
      // of 8 cells the IVF path achieves perfect recall on this corpus
      // (verified 15/15 at sf0.001/0.01/0.1), so its top-k rows must
      // hash-match DuckDB's exact cosine top-k — the strongest gate an
      // ANN operator can carry. (r17 inherited-state fix: the sf0.001
      // fixture puts query 1's true 2nd neighbor — vec 209 — in its
      // 5th-ranked cell, so nProbe=3 missed it; required probe depth
      // measured per SF: sf0.001→5, sf0.01→3, sf0.1→1, and the rank-4/5
      // distance gap is ~5e-3, far above k-means float noise. Widening
      // probes only ADDS exactly-ranked candidates, so a result that
      // already equals the exact top-k under (sim desc, id) cannot
      // change — verified unchanged at sf0.01/sf0.1.)
      val emb = t(s, dir, "embeddings")
      graft.ops.Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5), "vec_id",
        "embedding", k = 3, nCells = 8, nProbe = 5)
        .orderBy("query_id", "rnk")
    }, """
      SELECT query_id, neighbor_id, sim, rnk
      FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          round(list_cosine_similarity(
            list_transform(c.embedding, x -> CAST(x AS DOUBLE)),
            list_transform(q.embedding, x -> CAST(x AS DOUBLE))), 6) AS sim,
          CAST(row_number() OVER (PARTITION BY q.vec_id
            ORDER BY round(list_cosine_similarity(
              list_transform(c.embedding, x -> CAST(x AS DOUBLE)),
              list_transform(q.embedding, x -> CAST(x AS DOUBLE))), 6) DESC,
            c.vec_id) AS INT) AS rnk
        FROM embeddings q, embeddings c
        WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id)
      WHERE rnk <= 3
      ORDER BY query_id, rnk
    """),

    ("lake_comments", (s: SparkSession, dir: String) => {
      // COMMENT ON table + column round-trip through SQL and
      // information_schema (idempotent: re-setting the same comment)
      val (lake, _) = fixture(s, dir)
      s.sql("COMMENT ON TABLE ducklake.main.docs IS 'training documents'")
      s.sql("ALTER TABLE ducklake.main.docs ALTER COLUMN num_chars COMMENT 'character count'")
      val t = lake.informationSchema("tables")
        .filter(col("table_name") === "docs")
        .select(lit("table").as("objtype"), col("table_name").as("obj"), col("comment"))
      val c = lake.informationSchema("columns")
        .filter(col("table_name") === "docs" && col("column_name") === "num_chars")
        .select(lit("column").as("objtype"), col("column_name").as("obj"), col("comment"))
      t.unionAll(c).orderBy("objtype")
    }, """
      SELECT * FROM (VALUES
        ('column', 'num_chars', 'character count'),
        ('table', 'docs', 'training documents')) t(objtype, obj, "comment")
      ORDER BY objtype
    """),

    ("lake_virtual_cols", (s: SparkSession, dir: String) => {
      // hidden queryable virtual columns (snapshot_id / filename /
      // file_row_number) over the two-commit orders fixture, reduced to a
      // deterministic summary: 2 snapshots, 2 files, per-file row numbers
      // summing to n(n-1)/2 each
      fixture(s, dir)
      s.sql("""
        SELECT CAST(count(DISTINCT snapshot_id) AS BIGINT) AS n_snaps,
               CAST(count(DISTINCT filename) AS BIGINT) AS n_files,
               sum(file_row_number) AS pos_sum,
               sum(rowid) AS rowid_sum,
               CAST(count(DISTINCT rowid) AS BIGINT) AS n_rowids,
               count(*) AS n_rows
        FROM ducklake.main.orders""")
    }, """
      WITH c1 AS (SELECT count(*) AS n FROM orders),
           c2 AS (SELECT count(*) AS m FROM orders WHERE o_orderkey % 10 = 0)
      SELECT 2 AS n_snaps, 2 AS n_files,
             CAST(n * (n - 1) / 2 + m * (m - 1) / 2 AS BIGINT) AS pos_sum,
             CAST((n + m) * (n + m - 1) / 2 AS BIGINT) AS rowid_sum,
             CAST(n + m AS BIGINT) AS n_rowids,
             CAST(n + m AS BIGINT) AS n_rows
      FROM c1, c2
    """),

    ("lake_sql_time_travel", (s: SparkSession, dir: String) => {
      // SQL `VERSION AS OF <snapshot>` through the connector: the pinned
      // v1 state of orders, before the v2 append — oracle is plain orders
      val (_, marks) = fixture(s, dir)
      s.sql(s"""
        SELECT o_orderstatus, count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM ducklake.main.orders VERSION AS OF ${marks("orders_v1")}
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus""")
    }, """
      SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
      FROM orders GROUP BY 1 ORDER BY 1
    """),

    ("lake_tag_read", (s: SparkSession, dir: String) => {
      // named snapshot refs: tag the pre-append orders snapshot and time
      // travel by tag name through SQL — oracle is plain orders (v1)
      val (lake, marks) = fixture(s, dir)
      lake.tagSnapshot("orders-v1", marks("orders_v1"))
      s.sql("""
        SELECT o_orderstatus, count(*) AS n,
               min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        FROM ducklake.main.orders VERSION AS OF 'orders-v1'
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus""")
    }, """
      SELECT o_orderstatus, count(*) AS n,
             min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      FROM orders GROUP BY 1 ORDER BY 1
    """),

    ("lake_stream_incremental", (s: SparkSession, dir: String) => {
      // snapshot-incremental MicroBatchStream driven to completion: the
      // stream consumes both orders commits (v1 CTAS + v2 append) as
      // micro-batches; oracle = batch SQL over the same logical content
      fixture(s, dir)
      val name = s"lake_stream_${UUID.randomUUID().toString.take(8)}"
      val q = s.readStream.table("ducklake.main.orders")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .writeStream.outputMode("complete").format("memory")
        .queryName(name).start()
      try q.processAllAvailable() finally q.stop()
      s.table(name).orderBy("o_orderstatus")
    }, """
      SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
      FROM (SELECT * FROM orders UNION ALL
            SELECT * FROM orders WHERE o_orderkey % 10 = 0)
      GROUP BY 1 ORDER BY 1
    """),

    ("lake_info_columns", (s: SparkSession, dir: String) => {
      val (lake, _) = fixture(s, dir)
      lake.informationSchema("columns")
        .filter(col("table_name") === "lineitem")
        .select("column_name", "column_type", "column_order")
        .orderBy("column_order")
    }, """
      SELECT * FROM (VALUES
        ('l_orderkey', 'int64', CAST(0 AS BIGINT)), ('l_partkey', 'int64', 1),
        ('l_suppkey', 'int64', 2), ('l_linenumber', 'int32', 3),
        ('l_quantity', 'float64', 4), ('l_extendedprice', 'float64', 5),
        ('l_discount', 'float64', 6), ('l_tax', 'float64', 7),
        ('l_returnflag', 'varchar', 8), ('l_linestatus', 'varchar', 9),
        ('l_shipdate', 'timestamp', 10))
      t(column_name, column_type, column_order)
      ORDER BY column_order
    """),

    ("lake_stream_upsert", (s: SparkSession, dir: String) => {
      // streaming UPSERT: foreachBatch runs a per-micro-batch MERGE INTO
      // the lake (the CDC-apply loop of a continuously-maintained
      // aggregate). Two micro-batches of events fold into per-user
      // running totals; the final table must equal the one-shot batch
      // aggregate. At 100 TB each micro-batch MERGE is a delta write —
      // cost tracks the batch, never the table.
      val (lake, _) = fixture(s, dir)
      if (!lake.tableExists("main.upsert_users")) {
        import s.implicits._
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        s.sql("""CREATE TABLE IF NOT EXISTS ducklake.main.upsert_users
                 (user_id BIGINT, n BIGINT, total DOUBLE)""")
        // bounded feed: toLocalIterator streams the source partition by
        // partition, so the driver holds at most one chunk — never the
        // whole table — and each chunk becomes its own micro-batch MERGE
        val src = t(s, dir, "events").select("user_id", "value")
        val mem = MemoryStream[(Long, Double)]
        val q = mem.toDF().toDF("user_id", "value")
          .writeStream
          .option("checkpointLocation",
            s"/tmp/graft-upsert-ckpt-${UUID.randomUUID().toString.take(8)}")
          .foreachBatch { (batch: DataFrame, _: Long) =>
            batch.groupBy("user_id")
              .agg(count(lit(1)).as("n"), sum("value").as("total"))
              .createOrReplaceTempView("__upsert_batch")
            batch.sparkSession.sql(
              """MERGE INTO ducklake.main.upsert_users t
                 USING __upsert_batch b ON t.user_id = b.user_id
                 WHEN MATCHED THEN UPDATE SET
                   n = t.n + b.n, total = t.total + b.total
                 WHEN NOT MATCHED THEN INSERT (user_id, n, total)
                 VALUES (b.user_id, b.n, b.total)""")
            ()
          }
          .start()
        try {
          val it = src.toLocalIterator()
          val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
          while (it.hasNext) {
            buf.clear()
            while (it.hasNext && buf.size < 4096) {
              val r = it.next()
              buf += ((r.getLong(0), r.getDouble(1)))
            }
            mem.addData(buf.toSeq)
            q.processAllAvailable()
          }
        } finally q.stop()
      }
      lake.table("main.upsert_users")
        .select(col("user_id"), col("n"), round(col("total"), 2).as("total"))
        .orderBy("user_id")
    }, """
      SELECT user_id, count(*) AS n, round(sum(value), 2) AS total
      FROM events GROUP BY 1 ORDER BY 1
    """),

    ("lake_geometry_stats", (s: SparkSession, dir: String) => {
      // the geometry surface end to end: WKT→WKB ingest into a
      // geometry-typed lake column, per-file bbox/type extra_stats
      // computed by the distributed write-side pass, read back from the
      // catalog and emitted as exact numbers (the values are constants,
      // so the DuckDB oracle is a VALUES row — SF-independent)
      import graft.lake.Geo
      val root = s"/tmp/graft-geo-${UUID.randomUUID().toString.take(8)}"
      val lake = new DuckLake(s, s"$root/meta", s"$root/data")
      try {
        val enc = org.apache.spark.sql.Encoders.BINARY
        lake.createTableAs(
          s.createDataset(Seq(Geo.wktToWkb("POINT (1 2)")))(enc).toDF("g")
            .coalesce(1), "main.geo")
        lake.refineColumnType("main.geo", "g", "geometry")
        lake.insertInto(
          s.createDataset(Seq(
            Geo.wktToWkb("LINESTRING Z (5 5 5, 10 10 10)"),
            Geo.wktToWkb("POINT M (20 20 5)")))(enc).toDF("g").coalesce(1),
          "main.geo")
        val (cols, rows) = lake.store.dumpMetadataTable("ducklake_file_column_stats")
        val ei = cols.indexWhere(_._1.equalsIgnoreCase("extra_stats"))
        val stats = rows.flatMap(r => Option(r(ei)).map(_.toString))
          .flatMap(Geo.parseStatsJson)
        val u = stats.foldLeft(Geo.emptyStats)(_ merge _)
        import s.implicits._
        Seq((stats.size, u.xmin, u.xmax, u.ymin, u.ymax, u.zmin, u.zmax,
          u.mmin, u.mmax, u.types.toSeq.sorted.mkString(",")))
          .toDF("n_geo_files", "xmin", "xmax", "ymin", "ymax",
            "zmin", "zmax", "mmin", "mmax", "types_csv")
      } finally lake.close()
    }, """
      SELECT CAST(1 AS INT) AS n_geo_files,
        5.0 AS xmin, 20.0 AS xmax, 5.0 AS ymin, 20.0 AS ymax,
        5.0 AS zmin, 10.0 AS zmax, 5.0 AS mmin, 5.0 AS mmax,
        'linestring_z,point_m' AS types_csv
    """)
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map { case (n, f, _) => n -> f }.toMap

  val oracle: Map[String, String] =
    defs.filter(_._3 != null)
      .map { case (n, _, o) => n -> o.stripMargin.trim.replaceAll("\\s+", " ") }.toMap
}
