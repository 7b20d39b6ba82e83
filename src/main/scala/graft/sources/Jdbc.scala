package graft.sources

import java.util.Properties
import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC edges — the reference's external-table surface re-expressed as
  * Spark's JDBC datasource.
  *
  * Sources (S5/S6, `util/PhoenixUtil.scala:45-70`,
  * `util/MySQLUtil.scala:29-57`): the reference hand-pruned columns in
  * SQL strings and hand-batched `IN`-list lookups; `spark.read.jdbc`
  * gets both from Catalyst — column pruning and predicate pushdown
  * reach the remote scan (`PushedFilters` in the plan), and
  * `partitionColumn`/`numPartitions` parallelize big reads.
  *
  * Sink (K3/K4, `dws/OrderWideApp.scala:186-199`): batched appends with
  * the reference's exact knobs — 100-row batches, isolation NONE,
  * bounded writer parallelism.
  *
  * Exercised against embedded Derby in JdbcSpec (no external DB in this
  * environment; the URL is the only deployment-specific piece).
  */
object Jdbc {

  /** S5/S6: read a (dimension) table; Catalyst pushes filters/pruning. */
  def readTable(spark: SparkSession, url: String, table: String,
                props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** S5 at scale: partitioned parallel read over a numeric key range. */
  def readTablePartitioned(spark: SparkSession, url: String, table: String,
                           partitionColumn: String, lower: Long, upper: Long,
                           numPartitions: Int,
                           props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lower, upper, numPartitions, props)

  /** K3/K4: batched append with the reference's write envelope
    * (`batchsize=100, isolationLevel=NONE, numPartitions=4`). */
  def writeBatched(df: DataFrame, url: String, table: String,
                   batchSize: Int = 100, numPartitions: Int = 4): Unit =
    df.coalesce(numPartitions)
      .write
      .mode("append")
      .option("batchsize", batchSize)
      .option("isolationLevel", "NONE")
      .jdbc(url, table, new Properties())
}
