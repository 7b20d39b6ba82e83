package graft.tools

import org.apache.spark.sql.DataFrame

/** Dev probe for a v8 PQ gate profile (the ProbeIvf pattern): for each
  * candidate `rerank` shortlist depth, check recall-completeness (PQ
  * output set-equal to the exact brute-force sweep — the
  * `Verify.lshTrusted` precondition) on the pinned sf0.001 and sf0.01
  * corpora, and time the profile at sf0.1 with the min-of-2 method.
  * The cheapest complete rerank becomes the gate profile in
  * `Similarity.queries`.
  *
  * `Test/runMain graft.tools.ProbePq [rerank ...]`
  */
object ProbePq {
  private val gateSfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
  private val benchSf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("graft-probe-pq")
    import graft.operators.Similarity

    def setOf(df: DataFrame): Set[String] =
      df.collect().map(_.mkString("|")).toSet

    val exact = gateSfs.map(sf => sf -> setOf(Similarity.annBruteForce(spark, sf))).toMap

    val cands = if (args.nonEmpty) args.map(_.toInt).toSeq
                else Seq(32, 64, 96, 128, 192, 256, 384, 512)
    for (r <- cands) {
      val rec = gateSfs.map { sf =>
        val got = setOf(Similarity.annPq(spark, sf, rerank = r))
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
      val t = time(Similarity.annPq(spark, benchSf, rerank = r).count())
      println(f"PROBE rerank=$r%-4d complete=$ok%-5s minRecall=$minRecall%5.3f t=$t%6.2fs")
    }
    spark.stop()
  }
}
