package graft.tools
import graft.GraftSession
import graft.streaming.Runner
object DriveDauRaw {
  def main(args: Array[String]): Unit = {
    val Array(in, out) = args
    val spark = GraftSession.localStreaming("drive-dau-raw")
    val q = Runner.dauQuery(spark, in, s"$out/dau", s"$out/ckpt")
    q.processAllAvailable(); q.stop()
    spark.read.parquet(s"$out/dau").show(10, false)
    spark.stop()
  }
}
