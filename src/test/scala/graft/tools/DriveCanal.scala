package graft.tools

import java.nio.file.{Files, Paths, StandardOpenOption}
import graft.GraftSession
import graft.streaming.Runner

/** End-to-end drive for the MIXED Maxwell/Canal CDC router
  * (`Runner.mixedRouterQuery`): writes a fixture dir containing both
  * envelope shapes on one feed, streams it through the router, and
  * asserts the per-topic fan-out — including the Canal per-array-row
  * explode (FIXTURES.md §4.4). Run with
  * `sbt "Test/runMain graft.tools.DriveCanal <workDir>"`.
  * Dev verification harness, not part of the library surface.
  */
object DriveCanal {
  def main(args: Array[String]): Unit = {
    val Array(workDir) = args
    val inDir = s"$workDir/cdc_mixed"
    Files.createDirectories(Paths.get(inDir))
    val lines = Seq(
      // Maxwell facts (insert kept, update dropped) and a dim update (kept)
      """{"type":"insert","table":"order_info","data":{"id":1,"final_total_amount":10.0}}""",
      """{"type":"update","table":"order_info","data":{"id":1,"final_total_amount":11.0}}""",
      """{"type":"update","table":"user_info","data":{"id":7,"age":30}}""",
      // Canal 3-row INSERT commit → 3 messages on ods_order_detail
      """{"type":"INSERT","table":"order_detail","data":[{"id":10,"order_id":1},{"id":11,"order_id":1},{"id":12,"order_id":1}]}""",
      // Canal UPDATE → dropped (reference forwards INSERT only)
      """{"type":"UPDATE","table":"order_detail","data":[{"id":10,"order_id":1}]}""",
      // Canal single-row INSERT on another table
      """{"type":"INSERT","table":"base_province","data":[{"id":2,"name":"p2"}]}""")
    Files.write(Paths.get(s"$inDir/mixed.jsonl"),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)

    val spark = GraftSession.localStreaming("drive-canal")
    val q = Runner.mixedRouterQuery(spark, inDir, s"$workDir/routed", s"$workDir/ckpt")
    q.processAllAvailable(); q.stop()

    val out = spark.read.parquet(s"$workDir/routed")
    out.orderBy("topic", "value").show(20, false)
    val counts = out.groupBy("topic").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = Map(
      "ods_order_info" -> 1L, "ods_user_info" -> 1L,
      "ods_order_detail" -> 3L, "ods_base_province" -> 1L)
    assert(counts == expected, s"per-topic fan-out mismatch: $counts vs $expected")
    println(s"[drive-canal] OK: $counts")
    spark.stop()
  }
}
