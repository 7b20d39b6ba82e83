package graft.streaming

import graft.{GraftSession, Tables}
import graft.operators.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Streaming NB quality scoring (Runner.nbScoreQuery) — the
  * stream-side deployment of t29: the model trains once from the seed
  * classes, every arriving document is scored statelessly, and the
  * stream's answers must equal the batch operator's rows for the same
  * documents (shared nbScoreOf arithmetic — this spec pins that the
  * sharing actually holds through the foreachBatch path, including
  * the batch_id-partitioned idempotent sink layout). */
class NbScoreStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = GraftSession.tune(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4"))
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("two-batch scored stream == batch t29 on the same docs; batch partitions disjoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
      .take(60)
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val out = java.nio.file.Files.createTempDirectory("graft-nb-sout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-nb-sckpt").toString
    val q = Runner.nbScoreQuery(spark, sf,
      mem.toDS().toDF("doc_id", "text"), out, ckpt)
    try {
      mem.addData(docs.take(25)); q.processAllAvailable()
      mem.addData(docs.drop(25)); q.processAllAvailable()
    } finally q.stop()
    def canon(df: DataFrame) = df.collect().map(_.mkString("|")).toSet
    val streamed = spark.read.parquet(out)
      .select("doc_id", "n_tokens", "avg_logodds", "keep")
    val batch = TextOps.nbQuality(spark, sf)
      .filter(col("doc_id").isin(docs.map(_._1): _*))
    assert(canon(streamed) === canon(batch))
    // the K5 sink layout: per-batch partitions with disjoint doc sets
    val byBatch = spark.read.parquet(out)
      .select(col("batch_id").cast("long").as("batch_id"), col("doc_id"))
      .groupBy("batch_id").agg(countDistinct(col("doc_id")).as("nd"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byBatch.keySet === Set(0L, 1L))
    assert(byBatch.values.toSeq.sorted === Seq(25L, 35L))
  }
}
