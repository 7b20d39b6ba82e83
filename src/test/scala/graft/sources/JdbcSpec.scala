package graft.sources

import graft.{GraftSession, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Live JDBC round-trip against embedded Derby (ships with Spark):
  * write the nation dim through the batched sink, read it back as a
  * JDBC source, verify predicate pushdown reaches the JDBC scan, and
  * run the J2-style fact⋈jdbc-dim join.
  */
class JdbcSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private val url = "jdbc:derby:memory:graftdb;create=true"

  lazy val spark: SparkSession = GraftSession.tune(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4"))
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("JDBC round-trip: batched dim write, source read, pushdown, dim join") {
    val nation = Tables.nation(spark, sf)
    Jdbc.writeBatched(nation, url, "nation_dim")

    val back = Jdbc.readTable(spark, url, "nation_dim")
    assert(back.count() === nation.count())
    assert(back.columns.map(_.toLowerCase).sorted === nation.columns.sorted)

    // predicate pushdown: the filter must reach the JDBC scan
    val filtered = back.filter(col("n_nationkey") < 5)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.toLowerCase.contains("n_nationkey"),
      s"filter not pushed to JDBC scan:\n$plan")
    assert(filtered.count() === 5)

    // J2 analog: fact joined against the JDBC-backed dimension
    val joined = Tables.customer(spark, sf)
      .join(broadcast(back), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name").count()
    assert(joined.count() === 25)
  }

  test("JDBC partitioned parallel read covers the full table") {
    val n = Jdbc.readTablePartitioned(spark, url, "nation_dim",
      "n_nationkey", 0L, 24L, numPartitions = 4)
    assert(n.rdd.getNumPartitions === 4)
    assert(n.count() === 25)
  }
}
