package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range/interval joins, rewritten to shuffle equi-joins.
  *
  * Spark has no native range-join strategy: a join whose ONLY condition
  * is `point BETWEEN lo AND hi` plans as BroadcastNestedLoopJoin (or a
  * cartesian product), which is O(points × intervals) — unusable at
  * scale. Even with an equi-key alongside the range condition, the
  * per-key workload is a cross product (events_per_key ×
  * intervals_per_key), quadratic on hot keys.
  *
  * The standard fix (the binning rewrite every warehouse engine and
  * Databricks' range-join hint use): quantize time into fixed-width
  * bins, explode each interval to the bins it overlaps, tag each point
  * with its single containing bin, equi-join on (keys…, bin), then
  * re-check the exact predicate. Bin containment is implied by interval
  * containment (floor is monotone), so the rewrite loses nothing and the
  * residual filter removes same-bin non-matches — output is exactly the
  * naive join's. Each point now meets only the intervals overlapping
  * its bin instead of all of them.
  */
object Ranges {

  /** Join `points` to every interval containing them
    * (`start <= pt <= end`, both inclusive) via the binning rewrite —
    * one shuffle equi-join on (keys…, bin), never a nested loop.
    * `keys` may be empty (global intervals: campaign windows,
    * maintenance periods).
    *
    * Pick `binSeconds` near the TYPICAL interval length: output-side
    * work is unchanged, but each interval materializes
    * span/binSeconds + 1 bin rows (too-fine bins inflate the build
    * side) while each bin accumulates the points of binSeconds worth of
    * time (too-coarse bins inflate candidate pairs). A degenerate
    * interval (open-ended sentinel, corrupt end < start) would explode
    * the build side or vanish silently — both fail loudly via
    * `maxBinsPerInterval` / the end >= start check rather than skew a
    * 1000-executor stage or drop rows. */
  def pointInIntervalJoin(points: DataFrame, intervals: DataFrame,
                          keys: Seq[String], ptCol: String,
                          startCol: String, endCol: String,
                          binSeconds: Long = 3600L,
                          maxBinsPerInterval: Long = 10000L): DataFrame = {
    require(binSeconds > 0 && maxBinsPerInterval > 0)
    def bin(c: org.apache.spark.sql.Column) =
      floor(unix_timestamp(c) / binSeconds)
    val pb = points.withColumn("__bin", bin(col(ptCol)))
    val ib = intervals
      .withColumn("__lo", bin(col(startCol)))
      .withColumn("__hi", bin(col(endCol)))
      .withColumn("__bin", explode(
        when(col("__hi") < col("__lo"), raise_error(concat(
          lit("pointInIntervalJoin: interval end precedes start ("),
          col(startCol).cast("string"), lit(" .. "),
          col(endCol).cast("string"), lit(")"))))
        .when(col("__hi") - col("__lo") >= maxBinsPerInterval, raise_error(concat(
          lit(s"pointInIntervalJoin: interval spans >= $maxBinsPerInterval bins of ${binSeconds}s ("),
          col(startCol).cast("string"), lit(" .. "), col(endCol).cast("string"),
          lit("); raise binSeconds or maxBinsPerInterval"))))
        .otherwise(sequence(col("__lo"), col("__hi")))))
      .drop("__lo", "__hi")
    pb.join(ib, keys :+ "__bin")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bin")
  }
}
