package graft.tools

import graft.GraftSession

/** Manual SQL-surface drive for the simhash64 function (probes incl.
  * error paths). `sbt "Test/runMain graft.tools.DriveSimhash"`. */
object DriveSimhash {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("drive-simhash")
    spark.sql(
      """SELECT simhash64(transform(split('a b a c', ' '), t -> xxhash64(t))) AS h1,
        |       simhash64(transform(split('c a b a', ' '), t -> xxhash64(t))) AS h2,
        |       simhash64(CAST(array() AS ARRAY<BIGINT>)) AS h_empty,
        |       simhash64(CAST(NULL AS ARRAY<BIGINT>)) AS h_null""".stripMargin).show()
    // error path: wrong input type
    try {
      spark.sql("SELECT simhash64(array('x','y'))").collect()
      println("ERROR-PROBE: no exception raised!")
    } catch {
      case e: Exception => println("ERROR-PROBE OK: " + e.getMessage.linesIterator.next())
    }
    spark.stop()
  }
}
