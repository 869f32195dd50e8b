package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Join operators Spark has no built-in physical strategy for, expressed
  * as shuffle-friendly compositions (no nested-loop / cross product, no
  * driver-side collection) so they hold up at cluster scale.
  *
  * The reference engine inherits plain equi/theta joins from DataFusion
  * (SURVEY §2.B); as-of and interval joins are the two join shapes a
  * time-series / training-data pipeline needs on top.
  */
object Joins {

  /** As-of join: for every left row, attach the payload of the LATEST
    * right row with `rightTime <= leftTime`, matching on `on` keys
    * (DuckDB `ASOF JOIN`, kdb `aj`, pandas `merge_asof`).
    *
    * Plan shape: union both sides tagged, ONE hash shuffle on the keys,
    * one window pass carrying the last-seen right payload forward
    * (`last(_, ignoreNulls)` over rows-unbounded-preceding), keep left
    * rows. O(n log n) per key group, no range explosion — scales to
    * arbitrarily many rows per key, unlike the per-key collect or the
    * `rightTime <= leftTime` theta-join (which is quadratic).
    *
    * At equal timestamps the right row sorts first, so a right row AT the
    * left timestamp matches (inclusive semantics, like DuckDB `>=`).
    * Right rows that tie on (keys, rightTime) are matched arbitrarily —
    * pre-dedupe the right side for deterministic output.
    *
    * Left columns pass through; right payload columns (everything but the
    * keys) come back null when no right row precedes the left row. Right
    * payload names must not collide with left column names.
    */
  def asof(left: DataFrame, right: DataFrame, on: Seq[String],
           leftTime: String, rightTime: String): DataFrame =
    asof(left, right, on, leftTime, rightTime, "backward")

  /** As-of join with a match direction:
    *  - `backward` (default): latest right row at or before the left time;
    *  - `forward`: earliest right row at or after the left time;
    *  - `nearest`: whichever of the two is closer in time, ties (equal
    *    distance, including an exact-time match) resolved backward.
    * All three are the SAME one-shuffle union+window shape — `nearest`
    * evaluates both direction windows over one hash exchange (two sorts,
    * zero extra shuffles) and picks per row. Right (on, time) pairs must
    * be unique (pre-aggregate duplicates) or the carried payload among
    * equal keys is sort-unstable.
    *
    * NULL times never match, on either side and in every direction: a
    * NULL-time left row gets a null payload, and NULL-time right rows
    * are never carried — SQL comparison semantics, consistent across
    * backward/forward/nearest.
    */
  def asof(left: DataFrame, right: DataFrame, on: Seq[String],
           leftTime: String, rightTime: String, direction: String): DataFrame = {
    require(on.nonEmpty, "asof join requires at least one equality key")
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"unknown asof direction '$direction'")
    val payload = right.columns.filterNot(on.contains).toSeq
    val collisions = left.columns.toSet.intersect(payload.toSet)
    require(collisions.isEmpty,
      s"right payload columns collide with left: ${collisions.mkString(", ")}")
    require(left.schema(leftTime).dataType == right.schema(rightTime).dataType,
      s"time columns must share a type: $leftTime is " +
        s"${left.schema(leftTime).dataType}, $rightTime is ${right.schema(rightTime).dataType}")

    val payloadType = StructType(right.schema.fields.filter(f => payload.contains(f.name)))
    val leftOnly = left.columns.filterNot(on.contains).toSeq

    val l2 = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(payloadType))
      .select((on ++ Seq("__t", "__side") ++ leftOnly :+ "__p").map(col): _*)
    val r2 = right.select(
      on.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side")) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payload.map(col): _*).as("__p"): _*)

    // backward pass: (t asc, side asc) puts a right row at equal time
    // BEFORE the left row — "at or before". forward pass: t desc with the
    // same side order — "at or after". Each carries (match time, payload)
    // so `nearest` can compare distances.
    val wb = Window.partitionBy(on.map(col): _*).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(on.map(col): _*).orderBy(col("__t").desc, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NULL times never match, on either side (SQL comparison semantics,
    // as DuckDB's ASOF inequality gives): an ungated carry would hand a
    // NULL-time right row (struct(null, payload) is non-null) to every
    // later row in the backward pass, and a NULL-time LEFT row — which
    // sorts last under the descending forward window — would "match" the
    // globally earliest right row in forward/nearest while backward
    // yields none. Right rows gate here; left rows are nulled after the
    // window pass (below), so all three directions agree: null payload.
    val carried = when(col("__side") === 0 && col("__t").isNotNull,
      struct(col("__t").as("__mt"), col("__p").as("__pp")))
    val u = l2.unionByName(r2)
    val matched = direction match {
      case "backward" => u.withColumn("__m", last(carried, ignoreNulls = true).over(wb))
      case "forward"  => u.withColumn("__m", last(carried, ignoreNulls = true).over(wf))
      case "nearest" =>
        u.withColumn("__mb", last(carried, ignoreNulls = true).over(wb))
          .withColumn("__mf", last(carried, ignoreNulls = true).over(wf))
          // backward match time <= t <= forward match time, so both
          // distances are the non-negative differences below; equal
          // distance keeps backward
          .withColumn("__m",
            when(col("__mb").isNull, col("__mf"))
              .when(col("__mf").isNull, col("__mb"))
              .when(col("__t") - col("__mb.__mt") <= col("__mf.__mt") - col("__t"),
                col("__mb"))
              .otherwise(col("__mf")))
          .drop("__mb", "__mf")
    }
    matched
      .filter(col("__side") === 1)
      // a NULL left time matches nothing in any direction (see carry
      // gate above)
      .withColumn("__m", when(col("__t").isNotNull, col("__m")))
      .select(left.columns.toIndexedSeq.map(col) ++
        payload.map(c => col(s"__m.__pp.$c").as(c)): _*)
  }

  /** Interval (range) join: every `points` row paired with every
    * `intervals` row whose `[loCol, hiCol]` contains `pointCol`
    * (inclusive), matching on optional equality `keys`.
    *
    * Plan shape: each interval is exploded over the fixed-width bins it
    * covers, each point maps to its single bin, and the pairing becomes a
    * plain equi-join on (keys, bin) with a residual containment filter —
    * Catalyst then picks broadcast/shuffled-hash/sort-merge as usual. No
    * `BroadcastNestedLoopJoin`, which is what Spark falls back to for a
    * bare `lo <= p AND p <= hi` condition and which dies at scale.
    *
    * Pick `binWidth` (same units as the columns) near the typical
    * interval width: explosion factor is ~(interval/binWidth + 1) rows
    * per interval, while a too-large width degrades the bin join's
    * selectivity toward the cross product.
    *
    * Columns must be integral (long/int); output = points columns ++
    * interval columns (keys deduplicated); names must not collide.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame, pointCol: String,
                      loCol: String, hiCol: String, keys: Seq[String] = Nil,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val collisions = points.columns.toSet.intersect(intervals.columns.toSet) -- keys
    require(collisions.isEmpty,
      s"non-key columns collide between sides: ${collisions.mkString(", ")}")

    // exact floored division on longs (v may be negative; double division
    // is exact here because v - pmod(v, w) is a multiple of w < 2^53)
    def bin(v: Column): Column = ((v - pmod(v, lit(binWidth))) / binWidth).cast("long")

    val p2 = points.withColumn("__bin", bin(col(pointCol)))
    val i2 = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__bin", explode(sequence(bin(col(loCol)), bin(col(hiCol)))))
    p2.join(i2, (keys :+ "__bin").toSeq)
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
