package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.GmallQueries.orderWide(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.GmallQueries.queries ++
      operators.TextOps.queries ++
      operators.Dedup.queries ++
      operators.Similarity.queries ++
      operators.Multimodal.queries ++
      operators.AsOf.queries ++
      operators.Curation.queries ++
      operators.GraphOps.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.GmallQueries.oracle ++
      operators.TextOps.oracle ++
      operators.Dedup.oracle ++
      operators.Similarity.oracle ++
      operators.Multimodal.oracle ++
      operators.AsOf.oracle ++
      operators.Curation.oracle ++
      operators.GraphOps.oracle
}
