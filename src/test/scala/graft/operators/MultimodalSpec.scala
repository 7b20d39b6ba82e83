package graft.operators

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = GraftSession.tune(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4"))
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("media pipeline: every doc becomes a media row with typed metadata") {
    val media = Multimodal.mediaTable(spark, sf)
    val n = media.count()
    assert(n > 0)
    val kinds = media.toDF().select("meta.kind").distinct()
      .collect().map(_.getString(0)).toSet
    assert(kinds === Set("image", "audio", "video"))
  }

  test("feature extraction: deterministic, fixed-dim features, sane entropy") {
    import spark.implicits._
    val f1 = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf))
      .collect().map(f => f.media_id -> (f.byte_entropy, f.feature.toSeq)).toMap
    val f2 = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf))
      .collect().map(f => f.media_id -> (f.byte_entropy, f.feature.toSeq)).toMap
    assert(f1 === f2)
    // ASCII word-salad text: entropy strictly between 0 and 8 bits/byte
    assert(f1.values.forall { case (e, _) => e > 0.0 && e < 8.0 })
    assert(f1.values.forall { case (_, feat) => feat.nonEmpty && feat.length <= 64 })
  }

  test("phash pairs: chunk-blocked join equals the all-pairs sweep, any maxDist") {
    import spark.implicits._
    val ph = Multimodal.mediaPhash(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    for (d <- Seq(4, 8, 12)) {
      val want = (for {
        (ia, ha) <- ph; (ib, hb) <- ph
        if ia < ib && ia % 3 == ib % 3
        h = java.lang.Long.bitCount(ha ^ hb) if h <= d
      } yield (ia, ib, h)).toSet
      val got = Multimodal.phashPairs(spark, sf, maxDist = d)
        .as[(Long, Long, Int)].collect().toSet
      assert(got === want, s"maxDist=$d")
    }
    // phash stays in the positive 60-bit range (packing invariant)
    assert(ph.forall { case (_, h) => h >= 0L && h < (1L << 60) })
  }

  test("frame sampling: only video rows, bounded frame count") {
    import spark.implicits._
    val frames = Multimodal.sampleFrames(Multimodal.mediaTable(spark, sf))
    val perMedia = frames.groupBy("media_id").count()
    assert(perMedia.filter(col("count") > 8).count() === 0L)
    val videoIds = Multimodal.mediaTable(spark, sf)
      .filter(_.meta.kind == "video").map(_.media_id).collect().toSet
    val frameIds = frames.select("media_id").distinct().as[Long].collect().toSet
    assert(frameIds.subsetOf(videoIds))
  }
}
