package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins at 100 TB: when one join key carries
  * a disproportionate share of the big side (a hot customer, a null-ish
  * default key), a plain shuffled join funnels that key into one reducer.
  * Salting splits each hot key into `salts` sub-keys: the big side gets a
  * deterministic per-row salt, the small side is replicated `salts` ways,
  * and the join key becomes (key, salt) — spreading the hot key across
  * `salts` reducers at the cost of replicating the small side.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`)
  * handles sort-merge cases automatically; explicit salting remains the
  * tool when AQE can't help (aggregations over the join, non-SMJ plans).
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salted `salts` ways. Result equals
    * `big.join(small, key)` row-for-row. The salt is derived from stable
    * row content (`saltOn`), not rand(), so plans stay deterministic and
    * retry-safe.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, saltOn: Column,
      salts: Int): DataFrame = {
    val bigSalted = big.withColumn("__salt", pmod(hash(saltOn), lit(salts)))
    val smallSalted = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    bigSalted.join(smallSalted, Seq(key, "__salt")).drop("__salt")
  }
}
