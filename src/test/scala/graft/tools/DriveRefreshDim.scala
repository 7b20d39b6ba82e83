package graft.tools

import java.nio.file.{Files, Paths}
import graft.GraftSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File-edged drive of the per-batch refreshing dim join: stream rows
  * arrive in two waves; the dim parquet is overwritten between them. */
object DriveRefreshDim {
  def main(args: Array[String]): Unit = {
    val Array(root) = args
    val spark = GraftSession.localStreaming("drive-refresh-dim")
    import spark.implicits._
    val inDir = s"$root/in"; Files.createDirectories(Paths.get(inDir))
    val dimDir = s"$root/dim"
    Seq((100L, "tm_old")).toDF("sku_id", "tm_name").write.mode("overwrite").parquet(dimDir)
    Files.writeString(Paths.get(s"$inDir/w1.json"), """{"id":1,"sku_id":100}""")
    val schema = StructType(Seq(StructField("id", LongType), StructField("sku_id", LongType)))
    val stream = spark.readStream.schema(schema).json(inDir)
    val results = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val q = graft.streaming.Pipelines.runEnrichWithRefreshingDim(
      stream, () => spark.read.parquet(dimDir), Seq("sku_id"),
      s"$root/ckpt") { (batch, _) =>
      results.synchronized {
        results ++= batch.select("id", "tm_name").as[(Long, String)].collect()
      }
    }
    q.processAllAvailable()
    Seq((100L, "tm_new")).toDF("sku_id", "tm_name").write.mode("overwrite").parquet(dimDir)
    Files.writeString(Paths.get(s"$inDir/w2.json"), """{"id":2,"sku_id":100}""")
    q.processAllAvailable()
    q.stop()
    println("ENRICHED: " + results.sortBy(_._1).mkString(", "))
    spark.stop()
  }
}
