package graft.operators

import graft.{GraftSession, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Invariants for the round-15 sketch/sampling additions — t34/t35
  * (count-min sketch), t36 (Efraimidis–Spirakis weighted sampling) and
  * v20 (truncated-dim rerank). The value gate is the DuckDB oracle;
  * these pin the properties the oracle can't state: CMS never
  * under-counts, sketches merge additively, the streamed sketch equals
  * batch on any split, the sample nests and keeps its weight
  * semantics, and a deep shortlist degenerates v20 to the exact
  * baseline. */
class TextOpsSketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = GraftSession.tune(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4"))
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def exactCounts: Map[String, Long] =
    Tables.documents(spark, sf)
      .select(explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("t35: CMS estimates NEVER under-count, at a wide and a colliding dial") {
    val exact = exactCounts
    val toks = exact.keys.toSeq.sorted
    for ((depth, width) <- Seq((4, 512), (3, 16), (2, 8))) {
      val est = TextOps.cmsEstimate(spark, sf, probes = toks, depth = depth, width = width)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(est.keySet === exact.keySet)
      val under = toks.filter(t => est(t) < exact(t))
      assert(under.isEmpty, s"CMS under-counted at $depth x $width: $under")
      // the sketch is bounded no matter the vocabulary
      assert(TextOps.cmsSketch(spark, sf, depth, width).count() <= depth.toLong * width)
    }
  }

  test("t34: sketches are additive — per-split sketches sum to the whole-corpus sketch") {
    val docs = Tables.documents(spark, sf)
    def canon(df: DataFrame): Map[(Int, Long), Long] =
      df.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = canon(TextOps.cmsSketchOn(docs, 3, 32))
    val even = canon(TextOps.cmsSketchOn(docs.filter(col("doc_id") % 2 === 0), 3, 32))
    val odd = canon(TextOps.cmsSketchOn(docs.filter(col("doc_id") % 2 === 1), 3, 32))
    val merged = (even.keySet ++ odd.keySet).map(k =>
      k -> (even.getOrElse(k, 0L) + odd.getOrElse(k, 0L))).toMap
    assert(merged === whole)
  }

  test("streaming CMS == batch sketch over the same docs, any batch split; state stays bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val sketchStream = graft.streaming.Pipelines.cmsSketchStream(
      mem.toDS().toDF("doc_id", "text"), depth = 3, width = 32)
    val q = sketchStream.writeStream.outputMode("complete")
      .format("memory").queryName("cms_stream").start()
    try {
      mem.addData(docs.take(20)); q.processAllAvailable()
      mem.addData(docs.drop(20)); q.processAllAvailable()
    } finally q.stop()
    def canon(df: DataFrame): Map[(Int, Long), Long] =
      df.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val streamed = canon(spark.sql("SELECT r, bucket, c FROM cms_stream"))
    val batch = canon(TextOps.cmsSketchOn(Tables.documents(spark, sf), 3, 32))
    assert(streamed === batch)
    assert(streamed.size <= 3 * 32)
  }

  test("t36: samples NEST (top-10 within top-25 within top-50) and stay deterministic") {
    def ids(k: Int): Seq[Long] =
      TextOps.weightedSample(spark, sf, k = k).collect().map(_.getLong(0)).toSeq
    val (s10, s25, s50) = (ids(10), ids(25), ids(50))
    assert(s10.size === 10 && s25.size === 25)
    assert(s10.toSet.subsetOf(s25.toSet) && s25.toSet.subsetOf(s50.toSet))
    assert(ids(25) === s25) // recompute == same sample, same order
  }

  test("t36: an overwhelming weight is always selected; zero weights are excluded") {
    import spark.implicits._
    val base = Tables.documents(spark, sf).select("doc_id", "lang", "n_chars")
    val spiked = base.union(Seq(
      (900001L, "xx", 1000000000L), // w -> inf => key -> 0- beats everything
      (900002L, "xx", 0L) // weightless: must never appear
    ).toDF("doc_id", "lang", "n_chars"))
    val got = TextOps.weightedSampleOn(spiked, k = 5, beta = 1.0)
      .collect().map(_.getLong(0)).toSet
    assert(got.contains(900001L))
    assert(!got.contains(900002L))
  }

  test("t36: the top-k is a TakeOrderedAndProject, not a global sort") {
    val plan = TextOps.weightedSample(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("t37: closed-form PMI — a pair that only co-occurs scores ln 2; independents near 0") {
    import spark.implicits._
    // 40 copies of "a b": c(a)=c(b)=c(ab)=40, N=80 => PMI = ln(40*80/1600) = ln 2
    val fused = (1 to 40).map(i => (i.toLong, "a b")).toDF("doc_id", "text")
    val got = TextOps.pmiPhrasesOn(fused, minCount = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(("a", "b", 40L, math.round(math.log(2.0) * 1e6) / 1e6)))
    // a balanced alternation "x y x y": bigrams xy (x2) and yx (x1) per doc;
    // every bigram's PMI must respect the support floor and be finite
    val alt = (1 to 30).map(i => (i.toLong, "x y x y")).toDF("doc_id", "text")
    val rows = TextOps.pmiPhrasesOn(alt, minCount = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.forall(_._3 >= 5L) && rows.forall(r => !r._4.isNaN && !r._4.isInfinite))
    // xy occurs 60 of 90 bigrams; c(x)=c(y)=60, N=120: PMI(x,y)=ln(60*120/3600)=ln 2
    val xy = rows.find(r => r._1 == "x" && r._2 == "y").get
    assert(xy._4 === math.round(math.log(2.0) * 1e6) / 1e6)
  }

  test("v20: shortlist >= corpus degenerates to exactly the brute-force baseline") {
    def canon(df: DataFrame): Set[String] =
      df.collect().map(_.mkString("|")).toSet
    val deep = Similarity.annTruncatedRerank(spark, sf, shortlist = 100000)
    assert(canon(deep) === canon(Similarity.annBruteForce(spark, sf)))
  }

  test("v20: ranks are contiguous 1..k per query at both gate dials") {
    for (df <- Seq(Similarity.annTruncatedRerank(spark, sf),
      Similarity.annTruncatedRerank(spark, sf, truncDims = 8, shortlist = 120))) {
      val byQ = df.groupBy("query_id").agg(
        collect_list(col("rank")).as("rs"), count(lit(1)).as("n")).collect()
      assert(byQ.nonEmpty)
      byQ.foreach { r =>
        assert(r.getAs[Seq[Int]]("rs").sorted === (1 to r.getAs[Long]("n").toInt))
      }
    }
  }
}
