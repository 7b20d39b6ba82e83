package graft.tools

import graft.GraftSession
import graft.operators.Similarity

/** Dev-only parameter sweep: measures LSH recall of v2 (vs v1 exact
  * top-k) and v5 (vs v3 exact sweep) on a pinned corpus, to pick
  * (nPlanes, tables) for the value-level oracle gate. Run with
  * `sbt "Test/runMain graft.tools.TuneLsh <sfDir>"`. */
object TuneLsh {
  def main(args: Array[String]): Unit = {
    val Array(dir) = args
    val spark = GraftSession.local("tune-lsh")
    val v1 = Similarity.annBruteForce(spark, dir)
      .select("query_id", "neighbor_id").persist()
    println(s"[tune] exact ann pairs: ${v1.count()}")
    for ((np, nt) <- Seq((4, 24), (3, 24), (3, 32), (2, 32))) {
      val t0 = System.nanoTime()
      val v2 = Similarity.annLsh(spark, dir, nPlanes = np, tables = nt)
        .select("query_id", "neighbor_id")
      val missed = v1.exceptAll(v2).count()
      println(f"[tune] ann np=$np nt=$nt missed=$missed t=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val v3 = Similarity.nearDupPairs(spark, dir)
      .select("id_a", "id_b").persist()
    println(s"[tune] exact neardup pairs: ${v3.count()}")
    for ((np, nt) <- Seq((4, 16), (3, 24), (2, 32))) {
      val t0 = System.nanoTime()
      val v5 = Similarity.nearDupLsh(spark, dir, nPlanes = np, tables = nt)
        .select("id_a", "id_b")
      val missed = v3.exceptAll(v5).count()
      println(f"[tune] neardup np=$np nt=$nt missed=$missed t=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
