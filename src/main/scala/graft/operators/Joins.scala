package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join utilities for skew: explicit key salting.
  *
  * AQE's skew-join handling (on by default) splits oversized partitions at
  * runtime and covers most cases; explicit salting is the tool when one
  * hot key dominates so badly that even split partitions overwhelm a task,
  * or when AQE is unavailable (streaming-static joins).
  *
  * Shape: the big side gets a deterministic salt in [0, factor) derived
  * from non-key columns (NOT rand() — keeps retries/speculative tasks
  * consistent); the small side is exploded `factor` times so every
  * (key, salt) bucket finds its match. Result is row-identical to the
  * unsalted join (proved in JoinsSpec); the shuffle key becomes
  * (key, salt), spreading a hot key over `factor` reducers.
  */
object Joins {

  /** Inner equi-join of `big` and `small` on `key`, salted `factor` ways.
    * `saltSource` must be deterministic per row (e.g. a row id column);
    * it only affects distribution, never the result.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltSource: Column, factor: Int): DataFrame = {
    val salted = big.withColumn("_salt", pmod(xxhash64(saltSource), lit(factor)))
    val exploded = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(factor - 1L))))
    salted.join(exploded, Seq(key, "_salt")).drop("_salt")
  }
}
