package graft.tools
import graft.GraftSession
object ProfileD78 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("profile-d78")
    val dir = "/root/testdata/sf0.1"
    def time(l: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[d78] $l%-10s ${(System.nanoTime()-t0)/1e9}%6.2f s rows=$n")
      spark.catalog.clearCache()
    }
    for (_ <- 1 to 2) {
      time("d2")(graft.operators.Dedup.ngramJaccard(spark, dir).count())
      time("d7")(graft.operators.Dedup.nearDupClusters(spark, dir).count())
      time("d8")(graft.operators.Dedup.keepBest(spark, dir).count())
    }
    spark.stop()
  }
}
