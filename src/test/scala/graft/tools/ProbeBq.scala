package graft.tools

import org.apache.spark.sql.DataFrame

/** Dev probe for the v17 IVF-BQ gate profile (the ProbeSq8 pattern):
  * for each candidate (nprobe, rerank), check recall-completeness
  * (output set-equal to the exact brute-force sweep — the
  * `Verify.lshTrusted` precondition) on the pinned sf0.001 and sf0.01
  * corpora, and time the profile at sf0.1 with the min-of-2 method.
  * The cheapest complete pair becomes the gate profile in
  * `Similarity.queries`. Sign bits keep only the angle's octant, so
  * expect the complete rerank to land between SQ8's 8 and raw PQ's
  * 272 on the structureless pinned corpus.
  *
  * `Test/runMain graft.tools.ProbeBq [nprobe:rerank ...]`
  */
object ProbeBq {
  private val gateSfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
  private val benchSf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("graft-probe-bq")
    import graft.operators.Similarity

    def setOf(df: DataFrame): Set[String] =
      df.collect().map(_.mkString("|")).toSet

    val exact = gateSfs.map(sf => sf -> setOf(Similarity.annBruteForce(spark, sf))).toMap

    val cands: Seq[(Int, Int)] =
      if (args.nonEmpty) args.map { a =>
        val Array(np, r) = a.split(":"); (np.toInt, r.toInt)
      }.toSeq
      else for (np <- Seq(14, 16); r <- Seq(16, 32, 48, 64, 96, 128, 192, 256))
        yield (np, r)
    for ((np, r) <- cands) {
      val rec = gateSfs.map { sf =>
        val got = setOf(Similarity.annIvfBq(spark, sf, nprobe = np, rerank = r))
        val want = exact(sf)
        (got == want, (want.size - (want -- got).size).toDouble / want.size)
      }
      val ok = rec.forall(_._1)
      val minRecall = rec.map(_._2).min
      def time(f: => Long): Double = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }.min
      val t = time(Similarity.annIvfBq(spark, benchSf, nprobe = np, rerank = r).count())
      println(f"PROBE nprobe=$np%-3d rerank=$r%-4d complete=$ok%-5s minRecall=$minRecall%5.3f t=$t%6.2fs")
    }
    spark.stop()
  }
}
