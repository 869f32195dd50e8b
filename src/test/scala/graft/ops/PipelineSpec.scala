package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Behavior specs for the corpus-assembly operators: the distributed
  * prefix sum must be exactly the single-window running total, splits and
  * samples must be deterministic with the advertised rates, and packing
  * must produce contiguous bounded batches.
  */
class PipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.lake.connector.GraftSparkExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  test("prefixSum equals the single-partition global window exactly") {
    val toks = docs.select(col("doc_id"),
      TextOps.bpeishTokenCount(col("text")).cast("long").as("n_tok"))
    val dist = Pipeline.prefixSum(toks, Seq(col("doc_id")), col("n_tok"), "cum")
      .select("doc_id", "cum")
    val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val global = toks.withColumn("cum", sum("n_tok").over(w)).select("doc_id", "cum")
    assert(dist.except(global).isEmpty && global.except(dist).isEmpty)
  }

  test("prefixSum over a descending, tied order stays a correct running total") {
    // quality-style key with heavy ties: the doc_id tiebreaker must make
    // the order total and the cumsum reproducible
    val df = docs.select(col("doc_id"), (col("n_chars") % 7).as("k"),
      lit(1L).as("one"))
    val order = Seq(col("k").desc, col("doc_id"))
    val dist = Pipeline.prefixSum(df, order, col("one"), "cum")
    val rows = dist.orderBy(col("k").desc, col("doc_id"))
      .select("cum").collect().map(_.getLong(0))
    assert(rows.toSeq == (1L to rows.length).toSeq)
  }

  test("split3 is deterministic, covers every row, and hits ~90/5/5") {
    val n = docs.count().toDouble
    val splits = docs.withColumn("s", Pipeline.split3(col("doc_id")))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.values.sum.toDouble == n)
    assert(splits("train") / n > 0.8 && splits("train") / n < 0.97)
    // same assignment on every evaluation (pure function of the key)
    val again = docs.withColumn("s", Pipeline.split3(col("doc_id")))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits == again)
  }

  test("stratifiedSample applies per-stratum rates and never invents rows") {
    val sampled = Pipeline.stratifiedSample(docs, col("lang"), col("doc_id"),
      Map("en" -> 32), defaultBuckets = 128)
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = byLang.getOrElse("en", 0L).toDouble / totals("en")
    assert(enRate > 0.03 && enRate < 0.25, s"en rate $enRate not ~12.5%")
    totals.keys.filterNot(_ == "en").foreach { l =>
      val r = byLang.getOrElse(l, 0L).toDouble / totals(l)
      assert(r > 0.25 && r < 0.75, s"$l rate $r not ~50%")
    }
    // subset property
    assert(sampled.join(docs, Seq("doc_id"), "left_anti").isEmpty)
  }

  test("weightedSample: k per stratum, deterministic, inclusion tracks weight") {
    import spark.implicits._
    // two strata; weights 100 vs 1 in stratum A — the heavy rows should
    // dominate a k=50-of-200 sample (A-ES: P(heavy beats light) = w/(w+1))
    val rows = (0L until 200L).map(i => ("A", i, if (i < 100) 100.0 else 1.0)) ++
      (200L until 260L).map(i => ("B", i, 1.0))
    val df = rows.toDF("stratum", "id", "wt")
    val s1 = Pipeline.weightedSample(df, col("stratum"), col("id"), col("wt"), k = 50)
    val s2 = Pipeline.weightedSample(df, col("stratum"), col("id"), col("wt"), k = 50)
    // deterministic across invocations
    assert(s1.collect().map(_.getLong(1)).sorted.toSeq ==
      s2.collect().map(_.getLong(1)).sorted.toSeq)
    val a = s1.filter(col("stratum") === "A").collect().map(_.getLong(1))
    assert(a.length == 50)
    // heavy rows (ids < 100, weight 100x) should take nearly every slot
    assert(a.count(_ < 100L) >= 45, s"heavy-row count ${a.count(_ < 100L)} of 50")
    // stratum B has 60 rows, all weight 1: exactly k survive, all from B
    val b = s1.filter(col("stratum") === "B").count()
    assert(b == 50)
    // a stratum smaller than k keeps everything
    val tiny = Pipeline.weightedSample(df.filter(col("stratum") === "B"),
      col("stratum"), col("id"), col("wt"), k = 100)
    assert(tiny.count() == 60)

    // non-positive weights corrupt A-ES ordering silently (w=0 → -Inf
    // priority, w<0 flips ln(u)/w) — the guard must fail the job instead
    val bad = Seq((1L, "A", 1.0), (2L, "A", 0.0)).toDF("id", "stratum", "wt")
    val e = intercept[Exception] {
      Pipeline.weightedSample(bad, col("stratum"), col("id"), col("wt"), k = 1)
        .collect()
    }
    assert(e.getMessage.contains("strictly positive") ||
      Option(e.getCause).exists(_.getMessage.contains("strictly positive")))
  }

  test("contaminatedDocs flags planted eval overlap and nothing else") {
    import spark.implicits._
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),       // contains eval 4-gram
      (2L, "one two three four five six seven"),          // clean
      (3L, "beta gamma delta epsilon something else"),    // same 4-gram, shifted
      (4L, "completely unrelated text with no overlap")   // clean
    ).toDF("doc_id", "text")
    val eval_ = Seq((100L, "xx alpha beta gamma delta epsilon yy"))
      .toDF("doc_id", "text")
    val hits = Pipeline.contaminatedDocs(train, eval_, "text", "doc_id", w = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 shares "alpha beta gamma delta" + "beta gamma delta epsilon";
    // doc 3 shares only "beta gamma delta epsilon"
    assert(hits == Map(1L -> 2L, 3L -> 1L), s"got $hits")
  }

  test("shardShuffle is a deterministic permutation with dense per-shard ranks") {
    val a = Pipeline.shardShuffle(docs.select("doc_id"), col("doc_id"))
    val b = Pipeline.shardShuffle(docs.select("doc_id"), col("doc_id"))
    // reproducible: identical assignment on re-evaluation
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    // covers every row exactly once
    assert(a.count() == docs.count())
    assert(a.select("doc_id").distinct().count() == docs.count())
    // ranks are dense 1..n within each shard
    val perShard = a.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
      .collect()
    perShard.foreach { r =>
      assert(r.getInt(2) == 1 && r.getInt(3).toLong == r.getLong(1))
    }
    // shards are reasonably balanced (16 hash shards over the corpus)
    val ns = perShard.map(_.getLong(1))
    assert(ns.length == 16 || docs.count() < 64)
  }

  test("dup-line metrics: planted duplicate lines are measured exactly") {
    import spark.implicits._
    val df = Seq(
      (1L, "aaa\nbbb\nccc\naaa"),   // 4 lines, 1 dup (aaa) -> frac 0.25
      (2L, "xx\nyy"),               // no dups
      (3L, "p\n\n  \np")            // blanks ignored: 2 lines, 1 dup
    ).toDF("id", "text")
    val got = df.select(col("id"),
        TextOps.dupLineFraction(col("text")).as("f"),
        TextOps.dupLineCharFraction(col("text")).as("cf"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got(1L) == (0.25, 3.0 / 12))
    assert(got(2L) == (0.0, 0.0))
    assert(got(3L) == (0.5, 0.5))
  }

  test("mixEpochs: integer weights copy exactly, fractions land near rate, 0 drops") {
    val mixed = Pipeline.mixEpochs(docs, col("lang"), col("doc_id"),
      Map("en" -> 2.0, "zh" -> 0.0, "de" -> 0.5))
    val base = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = mixed.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("en") == 2 * base("en"))              // exactly two copies
    assert(!got.contains("zh"))                      // weight 0 drops all
    assert(got("fr") == base("fr"))                  // default 1.0 untouched
    val deRate = got("de").toDouble / base("de")     // md5-fractional half
    assert(deRate > 0.2 && deRate < 0.8, s"de rate $deRate")
    // determinism: an identical second run yields the identical multiset
    val again = Pipeline.mixEpochs(docs, col("lang"), col("doc_id"),
      Map("en" -> 2.0, "zh" -> 0.0, "de" -> 0.5))
    assert(mixed.select("doc_id", "epoch").except(again.select("doc_id", "epoch")).isEmpty)
    // epoch indices are dense 0..k per kept doc (en docs carry 0 and 1)
    val enEpochs = mixed.filter(col("lang") === "en")
      .groupBy("doc_id").agg(collect_set("epoch").as("es"))
      .select(array_sort(col("es"))).distinct().collect()
    assert(enEpochs.length == 1 && enEpochs.head.getSeq[Int](0) == Seq(0, 1))
  }

  test("chunks: full token coverage with exact stride overlap") {
    val maxTok = 40; val overlap = 8; val stride = maxTok - overlap
    val rows = docs.select(col("doc_id"),
        size(TextOps.tokens(col("text"))).as("n"),
        TextOps.chunks(col("text"), maxTok, overlap).as("cs"))
      .collect()
    rows.foreach { r =>
      val n = r.getInt(1)
      val cs = r.getSeq[String](2)
      val lens = cs.map(c => if (c.isEmpty) 0 else c.split(" ").length)
      // every chunk except the last is exactly maxTok tokens
      lens.init.foreach(l => assert(l == maxTok))
      // chunks reconstruct the token count with stride arithmetic
      if (n <= maxTok) assert(cs.length == 1 && lens.last == n)
      else {
        assert(lens.last == n - (cs.length - 1) * stride)
        assert(lens.last > 0 && lens.last <= maxTok)
      }
    }
  }

  test("bigramLmScore ranks corpus-fluent text above shuffled gibberish") {
    import spark.implicits._
    val fluent = (1L to 30L).map(i => (i, "the cat sat on the mat and the dog ran"))
    // same vocabulary, transitions never repeated elsewhere
    val weird = Seq((99L, "mat the on dog cat ran the sat and"))
    val scores = TextOps.bigramLmScore((fluent ++ weird).toDF("id", "text"), "text", "id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(99L) < scores(1L))
    assert(scores(1L) == scores(30L)) // identical docs score identically
  }

  test("tfidfTopTerms ranks a planted rare term above common ones") {
    import spark.implicits._
    val corpus = (Seq((1L, "alpha beta gamma zyzzyx"), (2L, "alpha beta gamma"))
      ++ (3L to 20L).map(i => (i, "alpha beta gamma delta"))).toDF("id", "text")
    val top = TextOps.tfidfTopTerms(corpus, "text", "id", 1)
      .filter(col("id") === 1L).select("term").head().getString(0)
    assert(top == "zyzzyx") // df=1 -> highest idf, beats corpus-wide terms
  }

  test("quantileFilter keeps exactly the at-or-above-median rows per stratum") {
    import spark.implicits._
    val df = Seq(
      ("en", 1L, 10.0), ("en", 2L, 20.0), ("en", 3L, 30.0), // median 20
      ("de", 4L, 1.0), ("de", 5L, 2.0), ("de", 6L, 3.0), ("de", 7L, 4.0) // median 2.5
    ).toDF("lang", "id", "score")
    val kept = Pipeline.quantileFilter(df, col("lang"), col("score"), 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L, 6L, 7L))
    // q=0 keeps everything; q=1 keeps only per-stratum maxima
    assert(Pipeline.quantileFilter(df, col("lang"), col("score"), 0.0).count() == 7)
    assert(Pipeline.quantileFilter(df, col("lang"), col("score"), 1.0)
      .select("id").collect().map(_.getLong(0)).toSet == Set(3L, 7L))
  }

  test("packByBudget yields contiguous batches bounded by budget + one straddler") {
    val toks = docs.select(col("doc_id"),
      TextOps.bpeishTokenCount(col("text")).cast("long").as("n_tok"))
    val budget = 1000L
    val packed = Pipeline.packByBudget(toks, Seq(col("doc_id")), col("n_tok"),
      budget, "batch_id")
    val maxTok = toks.agg(max("n_tok")).head().getLong(0)
    val per = packed.groupBy("batch_id")
      .agg(sum("n_tok").as("t"), min("doc_id").as("lo"), max("doc_id").as("hi"))
      .orderBy("batch_id").collect()
    // each batch holds at most budget + the largest straddling doc
    per.foreach(r => assert(r.getLong(1) <= budget + maxTok))
    // batches partition the id range contiguously (no interleaving)
    per.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) < b.getLong(2))
      case _ =>
    }
    // batch ids are dense from 0
    assert(per.map(_.getLong(0)).toSeq == per.indices.map(_.toLong))
  }
}
