package graft.tools

import org.apache.spark.sql.DataFrame

/** Dev probe for the v12 ANN gate profile (the ProbeIvfPq pattern
  * applied to mining): for each candidate (nprobe, rerank), check that
  * `bitextMarginAnn` is output-identical to the exact all-pairs
  * `bitextMargin` (the `Verify.lshTrusted` precondition — margins are
  * computed from candidate top-k stats, so completeness here needs the
  * per-query candidate set to cover BOTH the exact top-k-by-cos AND
  * the argmax-by-margin pair) on the pinned sf0.001 and sf0.01
  * corpora, and time the profile at sf0.1 min-of-2. The cheapest
  * complete pair becomes the gate profile in `Similarity.queries`.
  *
  * `Test/runMain graft.tools.ProbeBitext [nprobe:rerank ...]`
  */
object ProbeBitext {
  private val gateSfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
  private val benchSf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("graft-probe-bitext")
    import graft.operators.Similarity

    def setOf(df: DataFrame): Set[String] =
      df.collect().map(_.mkString("|")).toSet

    val exact = gateSfs.map(sf => sf -> setOf(Similarity.bitextMargin(spark, sf))).toMap

    val cands: Seq[(Int, Int)] =
      if (args.nonEmpty) args.map { a =>
        val Array(np, r) = a.split(":"); (np.toInt, r.toInt)
      }.toSeq
      else for (np <- Seq(12, 14, 16); r <- Seq(32, 64, 96, 128, 192, 250))
        yield (np, r)
    for ((np, r) <- cands) {
      val rec = gateSfs.map { sf =>
        val got = setOf(Similarity.bitextMarginAnn(spark, sf, nprobe = np, rerank = r))
        val want = exact(sf)
        (got == want, (want.size - (want -- got).size).toDouble / want.size)
      }
      val ok = rec.forall(_._1)
      val minRecall = rec.map(_._2).min
      // time at sf0.1 only for COMPLETE dials (candidates for the gate
      // profile) — timing every incomplete dial made the sweep
      // wall-clock-prohibitive
      val t = if (!ok) -1.0 else (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        Similarity.bitextMarginAnn(spark, benchSf, nprobe = np, rerank = r).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }.min
      println(f"PROBE nprobe=$np%-3d rerank=$r%-4d complete=$ok%-5s minRecall=$minRecall%5.3f t=$t%6.2fs")
    }
    spark.stop()
  }
}
