package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot keys.
  *
  * First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`,
  * on in GraftSession): it splits oversized sort-merge partitions at
  * runtime and needs no code change. Salting is for the cases AQE can't
  * reach — a single pathological key in a shuffled equi-join whose
  * partition still exceeds executor memory after AQE's split, or
  * stateful/windowed operators keyed on a hot entity (all of one key's
  * rows must still meet in one task under plain repartitioning).
  *
  * [[saltedJoin]] spreads each hot left-side key over `saltFactor`
  * shuffle partitions by appending a deterministic salt derived from a
  * content column, and replicates the (small-ish) right side once per
  * salt value. Output is exactly the plain join's output — asserted by
  * SkewSpec.
  */
object Skew {

  /** Equi-join `large ⋈ small` on `key`, salting the large side.
    *
    * @param saltCol any large-side column (ideally near-unique) from
    *                which the salt is derived deterministically —
    *                no RNG, so retries/speculative tasks agree.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltCol: Column, saltFactor: Int = 8): DataFrame = {
    val salted = large.withColumn("__salt", pmod(hash(saltCol), lit(saltFactor)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (salted partial, then final) distinct-count per key —
    * for hot-key aggregations where even map-side combine leaves one
    * reducer with the hot key's whole distinct-set. Phase 1 aggregates
    * per (key, salt); phase 2 merges. For plain sums/counts Spark's
    * partial aggregation already does this — use only for
    * distinct-style or state-heavy aggregates. */
  def saltedDistinctCount(df: DataFrame, key: String, valueCol: String,
                          saltFactor: Int = 8): DataFrame =
    df.withColumn("__salt", pmod(hash(col(valueCol)), lit(saltFactor)))
      .groupBy(col(key), col("__salt"))
      .agg(countDistinct(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("distinct_count"))
}
