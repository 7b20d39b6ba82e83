package graft.tools

import graft.{GraftSession, Tables}
import graft.sources.Jdbc
import org.apache.spark.sql.functions._

/** Library-boundary drive of the JDBC edges against embedded Derby. */
object DriveJdbc {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("drive-jdbc")
    val url = "jdbc:derby:memory:drivedb;create=true"
    Jdbc.writeBatched(Tables.nation(spark, "/root/testdata/sf0.01"), url, "nation_dim")
    val back = Jdbc.readTable(spark, url, "nation_dim")
    println("round-trip rows: " + back.count())
    val filtered = back.filter(col("n_nationkey") < 5)
    println("pushdown line: " + filtered.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("PushedFilters")).mkString(" | "))
    println("filtered rows: " + filtered.count())
    val part = Jdbc.readTablePartitioned(spark, url, "nation_dim", "n_nationkey", 0, 24, 4)
    println("partitioned read: parts=" + part.rdd.getNumPartitions + " rows=" + part.count())
    try {
      Jdbc.readTable(spark, url, "no_such_table").count()
      println("ERROR-PROBE: no exception!")
    } catch { case e: Exception =>
      println("ERROR-PROBE OK: " + e.getMessage.linesIterator.next()) }
    spark.stop()
  }
}
