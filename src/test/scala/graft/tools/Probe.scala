package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** THE gate-profile probe harness — the nine per-family probe tools
  * (ProbeLsh/Ivf/Pq/IvfPq/Residual/Sq8/Bq/Bitext/Knn) consolidated
  * into one parameterized sweep. For every candidate dial of a family:
  * check recall-completeness (approximate output set-equal to the
  * exact reference — the `Verify` recall-probe precondition) on the
  * pinned sf0.001 AND sf0.01 corpora, and time the dial at sf0.1 with
  * the min-of-2 method. The cheapest complete dial becomes the gate
  * profile in `Similarity.queries`; adding encode family #5 is one
  * table row here, not a tenth tool.
  *
  * `Test/runMain graft.tools.Probe <family|all> [dial ...]`
  * where a dial is the family's own syntax (shown per family below):
  * `nprobe:rerank` for the IVF-composed families, `planesxtables` for
  * lsh, a bare `nprobe` for ivf, a bare `rerank` for pq.
  *
  * Family notes carried over from the per-tool docs:
  *  - lsh probes BOTH v2 (ann) and v5 (near-dup pairs) per dial — they
  *    share the (nPlanes, tables) profile.
  *  - bitext/knn completeness is stricter than plain top-k (mining
  *    margins / every vector's top-k), and their sweeps time ONLY
  *    complete dials — timing every incomplete dial made the sweep
  *    wall-clock-prohibitive.
  *  - knn defaults reflect the discovered band: below ~499 is
  *    incomplete on the pinned corpora (ADC ordering on structureless
  *    embeddings barely discriminates, and graph completeness is the
  *    max over EVERY vector's top-k).
  */
object Probe {
  private val gateSfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
  private val benchSf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

  import graft.operators.Similarity

  /** One probed operator: a label (families probing several operators
    * print one column group per label), its exact reference, and its
    * approximate form under a dial string. */
  private case class Check(label: String,
                           exact: (SparkSession, String) => DataFrame,
                           approx: (SparkSession, String, String) => DataFrame)

  private case class Family(name: String, dialHelp: String,
                            defaults: Seq[String], checks: Seq[Check],
                            timeOnlyComplete: Boolean = false)

  /** Parse "np:r" once, close over the family's operator. */
  private def npr(f: (SparkSession, String, Int, Int) => DataFrame)
      : (SparkSession, String, String) => DataFrame =
    (s, sf, dial) => {
      val Array(np, r) = dial.split(":"); f(s, sf, np.toInt, r.toInt)
    }

  private val brute: (SparkSession, String) => DataFrame =
    (s, sf) => Similarity.annBruteForce(s, sf)

  private val families: Seq[Family] = Seq(
    Family("lsh", "planesxtables",
      Seq("3x20", "2x24", "2x20", "2x16", "2x12", "3x10", "3x8", "2x8"),
      Seq(
        Check("v2", brute, (s, sf, d) => {
          val Array(p, t) = d.split("x")
          Similarity.annLsh(s, sf, nPlanes = p.toInt, tables = t.toInt)
        }),
        Check("v5", (s, sf) => Similarity.nearDupPairs(s, sf), (s, sf, d) => {
          val Array(p, t) = d.split("x")
          Similarity.nearDupLsh(s, sf, nPlanes = p.toInt, tables = t.toInt)
        }))),
    Family("ivf", "nprobe",
      Seq(4, 6, 8, 10, 12, 14, 16).map(_.toString),
      Seq(Check("v4", brute,
        (s, sf, d) => Similarity.annIvf(s, sf, nprobe = d.toInt)))),
    Family("pq", "rerank",
      Seq(32, 64, 96, 128, 192, 256, 384, 512).map(_.toString),
      Seq(Check("v8", brute,
        (s, sf, d) => Similarity.annPq(s, sf, rerank = d.toInt)))),
    Family("ivfpq", "nprobe:rerank",
      for (np <- Seq(12, 14, 16); r <- Seq(192, 224, 256, 272, 288, 320))
        yield s"$np:$r",
      Seq(Check("v9", brute,
        npr((s, sf, np, r) => Similarity.annIvfPq(s, sf, nprobe = np, rerank = r))))),
    Family("residual", "nprobe:rerank",
      for (np <- Seq(12, 14, 16); r <- Seq(192, 224, 248, 272, 288, 320))
        yield s"$np:$r",
      Seq(Check("v15", brute,
        npr((s, sf, np, r) =>
          Similarity.annIvfPqResidual(s, sf, nprobe = np, rerank = r))))),
    Family("sq8", "nprobe:rerank",
      for (np <- Seq(12, 14, 16); r <- Seq(5, 8, 12, 16, 24, 32))
        yield s"$np:$r",
      Seq(Check("v16", brute,
        npr((s, sf, np, r) => Similarity.annIvfSq8(s, sf, nprobe = np, rerank = r))))),
    Family("bq", "nprobe:rerank",
      for (np <- Seq(14, 16); r <- Seq(16, 32, 48, 64, 96, 128, 192, 256))
        yield s"$np:$r",
      Seq(Check("v17", brute,
        npr((s, sf, np, r) => Similarity.annIvfBq(s, sf, nprobe = np, rerank = r))))),
    Family("hnsw", "efSearch",
      Seq(64, 128, 192, 224, 256, 320, 400, 499).map(_.toString),
      Seq(
        Check("v18", brute,
          (s, sf, d) => graft.operators.Hnsw.annHnsw(s, sf, efSearch = d.toInt)),
        Check("v19", brute,
          (s, sf, d) => graft.operators.Hnsw.annHnswSharded(s, sf, efSearch = d.toInt)))),
    Family("bitext", "nprobe:rerank",
      for (np <- Seq(12, 14, 16); r <- Seq(32, 64, 96, 128, 192, 250))
        yield s"$np:$r",
      Seq(Check("v12", (s, sf) => Similarity.bitextMargin(s, sf),
        npr((s, sf, np, r) =>
          Similarity.bitextMarginAnn(s, sf, nprobe = np, rerank = r)))),
      timeOnlyComplete = true),
    Family("knn", "nprobe:rerank",
      for (np <- Seq(16); r <- Seq(440, 460, 480, 490, 499)) yield s"$np:$r",
      Seq(Check("v13", (s, sf) => Similarity.knnGraphExact(s, sf),
        npr((s, sf, np, r) => Similarity.knnGraph(s, sf, nprobe = np, rerank = r)))),
      timeOnlyComplete = true))

  def main(args: Array[String]): Unit = {
    val byName = families.map(f => f.name -> f).toMap
    val (picked, dials) = args.toSeq match {
      case Seq() | Seq("all") => (families, Nil)
      case name +: rest =>
        (Seq(byName.getOrElse(name, sys.error(
          s"unknown family '$name'; expected all|${families.map(_.name).mkString("|")}"))),
          rest)
    }
    val spark = graft.GraftSession.local("graft-probe")

    def setOf(df: DataFrame): Set[String] =
      df.collect().map(_.mkString("|")).toSet
    def time(f: => Long): Double = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }.min

    for (fam <- picked) {
      // exact references once per (check, sf) — reused across dials
      val exact = (for (c <- fam.checks; sf <- gateSfs)
        yield (c.label, sf) -> setOf(c.exact(spark, sf))).toMap
      for (dial <- if (dials.nonEmpty) dials else fam.defaults) {
        val cols = fam.checks.map { c =>
          val rec = gateSfs.map { sf =>
            val want = exact((c.label, sf))
            val got = setOf(c.approx(spark, sf, dial))
            (got == want, (want.size - (want -- got).size).toDouble / want.size)
          }
          val ok = rec.forall(_._1)
          val minRecall = rec.map(_._2).min
          val t =
            if (fam.timeOnlyComplete && !ok) -1.0
            else time(c.approx(spark, benchSf, dial).count())
          f"${c.label}_complete=$ok%-5s ${c.label}_minRecall=$minRecall%5.3f ${c.label}_t=$t%6.2fs"
        }
        println(f"PROBE ${fam.name}%-9s ${fam.dialHelp}=$dial  ${cols.mkString("  ")}")
      }
    }
    spark.stop()
  }
}
