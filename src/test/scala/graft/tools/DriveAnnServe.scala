package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** File-edged drive for the online ANN serving pipeline: build the
  * at-rest index, write two query parquet files into a watched dir
  * (two micro-batches), run `Runner.annServeQuery`, and print the
  * served answers — the deployment shape a Kafka-fed query stream
  * would run with `format("kafka")` swapped at the edge.
  *
  * `Test/runMain graft.tools.DriveAnnServe`
  */
object DriveAnnServe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.local("drive-ann-serve")
    spark.sparkContext.setLogLevel("WARN")
    val idx = java.nio.file.Files.createTempDirectory("das-idx").toString
    graft.operators.Similarity.writeAnnIndex(spark, sf, idx)
    val qDir = java.nio.file.Files.createTempDirectory("das-q").toString
    val out = java.nio.file.Files.createTempDirectory("das-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("das-ckpt").toString
    val qs = graft.Tables.embeddings(spark, sf).filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val stream = spark.readStream.schema(qs.schema).parquet(qDir)
    val q = graft.streaming.Runner.annServeQuery(spark, sf, idx, stream, out, ckpt)
    // two arrivals → two micro-batches
    qs.filter(col("query_id") < 5).write.mode("append").parquet(qDir)
    q.processAllAvailable()
    qs.filter(col("query_id") >= 5).write.mode("append").parquet(qDir)
    q.processAllAvailable()
    q.stop()
    val served = spark.read.parquet(out)
    served.orderBy("query_id", "rank").show(20, false)
    val n = served.count()
    println(s"OK served=$n")
    assert(n == 50, s"expected 10 queries x k=5 answers, got $n")
    spark.stop()
  }
}
