package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: co-locate both sides of a recurring join so
  * the join runs with ZERO exchanges — the pre-shuffle trick that turns
  * an every-query lineitem⋈orders shuffle into a one-time write cost.
  *
  * At 100 TB the shuffle of the fact table dominates any join-heavy
  * workload; bucketing both tables by the join key into the same bucket
  * count lets Spark plan a SortMergeJoin whose children are already
  * partitioned (`ClusteredDistribution` satisfied by `HashPartitioning`
  * from the bucket spec) — `.explain` shows no Exchange on either side
  * (asserted by `BucketedJoinSpec`). The reference hand-rolled the
  * equivalent by keying its Redis lookups per order id
  * (`dws/OrderWideApp.scala:98-111`); here it is a storage property the
  * optimizer exploits for every downstream query.
  */
object Bucketed {

  /** Write `df` as a bucketed managed table (sorted within buckets on
    * the same key, so merge joins skip the per-task sort too). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucket-count tables on their bucket keys — planned
    * shuffle-free when both sides were written with [[writeBucketed]]. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
