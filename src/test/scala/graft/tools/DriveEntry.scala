package graft.tools

import org.apache.spark.sql.SparkSession

/** Simulates the driver's smoke check: a VANILLA session (no
  * GraftExtensions, no nanosAsLong flag) calling SparkEntry.entry. */
object DriveEntry {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("driver-smoke-sim")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"ENTRY ROWS: $n")
    spark.stop()
  }
}
