package graft.tools

import org.apache.spark.sql.DataFrame

/** Dev probe for the v2/v5 LSH gate profiles: for each candidate
  * (nPlanes, tables), check recall-completeness (LSH output set-equal
  * to the exact sweep — the `Verify.lshTrusted` precondition) on the
  * pinned sf0.001 and sf0.01 corpora, and time the profile at sf0.1
  * with TimeQ's min-of-2 method. The cheapest complete profile becomes
  * the gate profile in `Similarity.queries`.
  *
  * `Test/runMain graft.tools.ProbeLsh`
  */
object ProbeLsh {
  private val gateSfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
  private val benchSf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("graft-probe-lsh")
    import graft.operators.Similarity

    val profiles =
      if (args.nonEmpty) args.toSeq.map { p =>
        val Array(a, b) = p.split("x"); (a.toInt, b.toInt)
      }
      else Seq((3, 20), (2, 24), (2, 20), (2, 16), (2, 12), (3, 10), (3, 8), (2, 8))

    def setOf(df: DataFrame): Set[String] =
      df.collect().map(_.mkString("|")).toSet

    for ((p, t) <- profiles) {
      val v2ok = gateSfs.forall { sf =>
        setOf(Similarity.annLsh(spark, sf, nPlanes = p, tables = t)) ==
          setOf(Similarity.annBruteForce(spark, sf))
      }
      val v5ok = gateSfs.forall { sf =>
        setOf(Similarity.nearDupLsh(spark, sf, nPlanes = p, tables = t)) ==
          setOf(Similarity.nearDupPairs(spark, sf))
      }
      def time(f: => Long): Double = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }.min
      val t2 = time(Similarity.annLsh(spark, benchSf, nPlanes = p, tables = t).count())
      val t5 = time(Similarity.nearDupLsh(spark, benchSf, nPlanes = p, tables = t).count())
      println(f"PROBE planes=$p%d tables=$t%-3d v2_complete=$v2ok%-5s v5_complete=$v5ok%-5s v2=$t2%6.2fs v5=$t5%6.2fs")
    }
    spark.stop()
  }
}
