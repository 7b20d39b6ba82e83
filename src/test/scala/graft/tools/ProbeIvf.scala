package graft.tools

import org.apache.spark.sql.DataFrame

/** Dev probe for a v4 IVF gate profile (the ProbeLsh pattern): for each
  * candidate `nprobe`, check recall-completeness (IVF output set-equal
  * to the exact brute-force sweep — the `Verify.lshTrusted`
  * precondition) on the pinned sf0.001 and sf0.01 corpora, and time the
  * profile at sf0.1 with TimeQ's min-of-2 method. The cheapest complete
  * nprobe becomes the gate profile in `Similarity.queries`.
  *
  * `Test/runMain graft.tools.ProbeIvf`
  */
object ProbeIvf {
  private val gateSfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
  private val benchSf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("graft-probe-ivf")
    import graft.operators.Similarity

    def setOf(df: DataFrame): Set[String] =
      df.collect().map(_.mkString("|")).toSet

    val exact = gateSfs.map(sf => sf -> setOf(Similarity.annBruteForce(spark, sf))).toMap

    for (np <- Seq(4, 6, 8, 10, 12, 14, 16)) {
      val ok = gateSfs.forall { sf =>
        setOf(Similarity.annIvf(spark, sf, nprobe = np)) == exact(sf)
      }
      def time(f: => Long): Double = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }.min
      val t = time(Similarity.annIvf(spark, benchSf, nprobe = np).count())
      println(f"PROBE nprobe=$np%-3d complete=$ok%-5s t=$t%6.2fs")
    }
    spark.stop()
  }
}
