package graft.tools

import org.apache.spark.sql.functions._

/** Idle re-time for Bench's `stream_join` section — the SAME input
  * shaping (lineitem+orders as two file streams, event time derived
  * from the join key), same 16 state partitions, same rows/s over
  * total input — plus the per-batch progress breakdown (state rows,
  * update/commit ms) Bench's one number hides. Three attempts, best
  * reported, fresh checkpoint each. `Test/runMain
  * graft.tools.TimeStreamJoin [sfDir] [attempts]` */
object TimeStreamJoin {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val attempts = if (args.length > 1) args(1).toInt else 3
    val spark = graft.GraftSession.local("graft-time-stream-join")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def streamOf(name: String) = {
      val schema = spark.read.parquet(s"$sfDir/$name.parquet").schema
      val d = java.nio.file.Files.createTempDirectory(s"tsj-$name")
      java.nio.file.Files.createSymbolicLink(
        d.resolve(s"$name.parquet"),
        java.nio.file.Paths.get(s"$sfDir/$name.parquet"))
      spark.readStream.schema(schema).parquet(d.toString)
    }
    val nIn = spark.read.parquet(s"$sfDir/lineitem.parquet").count() +
      spark.read.parquet(s"$sfDir/orders.parquet").count()
    def keyTime(key: org.apache.spark.sql.Column) =
      timestamp_seconds(lit(1700000000L) + key % 86400)
    val rates = (1 to attempts).map { i =>
      val oi = streamOf("orders").select(
        col("o_orderkey").as("id"), col("o_custkey").as("user_id"),
        lit(0L).as("province_id"), col("o_orderstatus").as("order_status"),
        col("o_totalprice").as("final_total_amount"),
        col("o_totalprice").as("original_total_amount"),
        keyTime(col("o_orderkey")).as("create_time")).as[graft.streaming.OrderInfo]
      val od = streamOf("lineitem").select(
        xxhash64(col("l_orderkey"), col("l_linenumber"), col("l_partkey")).as("id"),
        col("l_orderkey").as("order_id"), col("l_partkey").as("sku_id"),
        col("l_quantity").cast("long").as("sku_num"),
        col("l_extendedprice").as("order_price"),
        keyTime(col("l_orderkey")).as("create_time")).as[graft.streaming.OrderDetail]
      val acc = spark.sparkContext.longAccumulator(s"tsj-joined-$i")
      val ckpt = java.nio.file.Files.createTempDirectory("tsj-ckpt").toString
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "16")
      try {
        val t0 = System.nanoTime()
        val q = graft.streaming.Pipelines.orderWideJoin(oi, od)
          .writeStream
          .foreachBatch((b: org.apache.spark.sql.Dataset[graft.streaming.OrderWide], _: Long) =>
            acc.add(b.count()))
          .option("checkpointLocation", ckpt)
          .start()
        q.processAllAvailable()
        q.stop()
        val sec = (System.nanoTime() - t0) / 1e9
        q.recentProgress.foreach { p =>
          println(s"[tsj] attempt=$i batch=${p.batchId} rows=${p.numInputRows} " +
            s"durationMs=${p.durationMs} " +
            p.stateOperators.map(s =>
              s"state(rows=${s.numRowsTotal} upd=${s.numRowsUpdated} " +
                s"updMs=${s.allUpdatesTimeMs} commitMs=${s.commitTimeMs})").mkString(" "))
        }
        println(f"[tsj] attempt=$i wall=$sec%.2f s joined=${acc.value} " +
          f"rows_per_sec=${(nIn / sec).toLong}")
        if (acc.value == 0L) -1.0 else nIn / sec
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    println(f"[tsj] BEST rows_per_sec=${rates.max.toLong} over $attempts attempts")
    spark.stop()
  }
}
