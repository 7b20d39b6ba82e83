package graft.sources

import graft.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Layout is about what the READER gets to skip — so these specs assert
  * on scan metrics (rows surfaced by the parquet reader after row-group
  * pruning), not on query results: the same filter over the same data
  * must read a small slice from a clustered layout and ~everything from
  * an unclustered one. AQE is disabled inside the metric helper so the
  * executed plan's leaves are the file scans themselves.
  */
class LayoutSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.tune(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4"))
    .getOrCreate()

  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("graft-layout").toString

  override def afterAll(): Unit = spark.stop()

  private val n = 200000L

  /** x and y are independent uniform columns, deliberately SCRAMBLED
    * relative to write order — an unclustered write must get no
    * accidental locality. */
  private def data: DataFrame =
    spark.range(n).select(
      col("id"),
      pmod(xxhash64(col("id")), lit(1000)).as("x"),
      pmod(xxhash64(col("id"), lit(7)), lit(1000)).as("y"))

  /** Rows the parquet reader actually surfaced (post row-group/page
    * pruning, pre any residual Spark filter). */
  private def scanRows(build: => DataFrame): Long = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = build
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .flatMap(_.metrics.get("numOutputRows").map(_.value)).sum
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("range-clustered layout: a 1% filter reads a slice, unclustered reads ~all") {
    val plain = s"$tmp/plain"; val clustered = s"$tmp/clustered"
    data.write.mode("overwrite").parquet(plain)
    Layout.writeRangeClustered(data, clustered, Seq("x"),
      maxRecordsPerFile = 10000)
    val readPlain = scanRows(spark.read.parquet(plain).filter(col("x") < 10))
    val readClustered = scanRows(spark.read.parquet(clustered).filter(col("x") < 10))
    // identical answers either way
    assert(spark.read.parquet(plain).filter(col("x") < 10).count() ===
      spark.read.parquet(clustered).filter(col("x") < 10).count())
    // unclustered: every row group spans ~the full x range -> no skipping
    assert(readPlain >= n * 9 / 10, s"unclustered read $readPlain of $n")
    // clustered: only row groups whose [min,max] overlaps x<10
    assert(readClustered <= n / 5,
      s"clustered layout should skip most row groups, read $readClustered of $n")
  }

  test("z-order clusters BOTH columns; lexicographic sort only its leading one") {
    val byX = s"$tmp/by_x"; val byZ = s"$tmp/by_z"
    Layout.writeRangeClustered(data, byX, Seq("x", "y"),
      maxRecordsPerFile = 10000)
    Layout.writeZOrdered(data, byZ, Seq("x", "y"),
      maxRecordsPerFile = 10000)
    def yFilter(path: String) =
      spark.read.parquet(path).filter(col("y") >= 300 && col("y") < 400)
    // 10% filter on the NON-leading column: the x-sort gives y no
    // locality, z-order gives it real skipping
    val readByX = scanRows(yFilter(byX))
    val readByZ = scanRows(yFilter(byZ))
    assert(yFilter(byX).count() === yFilter(byZ).count())
    assert(readByZ * 2 <= readByX,
      s"z-order should read at most half of what the x-sort reads on a y " +
        s"filter (got z=$readByZ vs x=$readByX)")
    // and the z-layout still skips on x too (locality on EVERY dimension)
    val readXz = scanRows(spark.read.parquet(byZ).filter(col("x") < 100))
    assert(readXz <= n / 2, s"z-order x-filter read $readXz of $n")
  }

  test("zValue: interleaves, is monotone per dimension, clamps out-of-domain") {
    val zv = Layout.zValue(Seq((col("x"), 0.0, 1000.0), (col("y"), 0.0, 1000.0)), bits = 8)
    val rows = spark.range(4).select(
      when(col("id") % 2 === 0, lit(0)).otherwise(lit(999)).as("x"),
      when(col("id") < 2, lit(0)).otherwise(lit(999)).as("y"))
      .select(zv.as("z")).distinct().collect().map(_.getLong(0)).sorted
    // corners of the square map to distinct, ordered z-values with the
    // origin lowest and the far corner highest
    assert(rows.length === 4 && rows.head === 0L)
    // out-of-domain values clamp to the edge bucket rather than wrap
    val clamped = spark.range(1).select(
      Layout.zValue(Seq((lit(-50).cast("long"), 0.0, 1000.0)), bits = 8).as("lo"),
      Layout.zValue(Seq((lit(5000).cast("long"), 0.0, 1000.0)), bits = 8).as("hi"))
      .head()
    assert(clamped.getLong(0) === 0L && clamped.getLong(1) === 255L)
  }

  test("compact: rewrites a small-files table into ~target-size files, data intact") {
    val frag = s"$tmp/frag"; val compacted = s"$tmp/compacted"
    data.repartition(64).write.mode("overwrite").parquet(frag)
    assert(new java.io.File(frag).listFiles().count(_.getName.endsWith(".parquet")) === 64)
    Layout.compact(spark, frag, compacted, targetRecordsPerFile = 50000)
    val outFiles = new java.io.File(compacted).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(outFiles === 4, s"200k rows / 50k target = 4 files, got $outFiles")
    val a = spark.read.parquet(frag).collect().map(_.mkString("|")).toSet
    val b = spark.read.parquet(compacted).collect().map(_.mkString("|")).toSet
    assert(a === b)
  }
}
