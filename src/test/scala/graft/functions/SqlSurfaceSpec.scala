package graft.functions

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Every injected function must be reachable from PURE SQL — a user of
  * the library who only speaks `spark.sql(...)` gets the same surface
  * as the Column API (which routes through `call_function` and is
  * covered by the operator specs). Also pins analysis-time arity
  * errors: a wrong-arity SQL call must fail to ANALYZE, not blow up at
  * runtime. */
class SqlSurfaceSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.tune(
    SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2"))
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("all injected functions evaluate from pure SQL") {
    val row = spark.sql(
      """SELECT
        |  cosine_similarity(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS cos,
        |  simhash64(array(3L)) AS sh,
        |  minhash_sigs(array(1L, 2L, 3L), 4) AS mh,
        |  md5_minhash_sigs(array('a', 'b'), 2) AS mmh,
        |  hyperplane_sig(array(1.0F, 1.0F), array(0.5D, 0.5D), 1) AS hp,
        |  sorted_intersect_count(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS ic,
        |  nearest_centroid_idx(array(1.0F, 0.0F), array(1.0D, 0.0D, 0.0D, 1.0D), 2) AS nc,
        |  top_centroid_idxs(array(1.0F, 0.0F), array(1.0D, 0.0D, 0.0D, 1.0D), 2, 2) AS tc,
        |  deflate_len('aaaaaaaaaaaaaaaaaaaa') AS dl
        |""".stripMargin).head()
    assert(math.abs(row.getAs[Double]("cos") - 1.0) < 1e-12)
    assert(row.getAs[Long]("sh") === 3L)
    assert(row.getAs[Seq[Long]]("mh").length === 4)
    assert(row.getAs[Seq[Long]]("mmh").length === 2)
    assert(row.getAs[Long]("hp") === 1L) // positive projection -> bit 0 set
    assert(row.getAs[Int]("ic") === 2)
    assert(row.getAs[Int]("nc") === 0) // first centroid is the argmax
    assert(row.getAs[Seq[Int]]("tc") === Seq(0, 1))
    assert(row.getAs[Int]("dl") > 0 && row.getAs[Int]("dl") < 20)
    // bloom_might_contain_long requires a FOLDABLE filter blob (the
    // expression rejects non-literal filters at analysis, by design) —
    // in SQL that's a binary X'...' literal
    val bos = new java.io.ByteArrayOutputStream()
    val bf = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    bf.putLong(42L)
    bf.writeTo(bos)
    val hex = bos.toByteArray.map("%02X".format(_)).mkString
    val probes = spark.sql(
      s"""SELECT bloom_might_contain_long(X'$hex', 42L) AS hit,
         |       bloom_might_contain_long(X'$hex', 43L) AS miss""".stripMargin)
      .head()
    assert(probes.getAs[Boolean]("hit"))
    assert(!probes.getAs[Boolean]("miss"))
    // bpe_segment: one learned merge (l,o) → "low lo" segments with lo
    // fused in both words and the </w> marker closing each
    val bpe = spark.sql(
      """SELECT bpe_segment('low lo', array('l'), array('o')) AS toks""")
      .head()
    assert(bpe.getAs[Seq[String]]("toks") ===
      Seq("lo", "w", "</w>", "lo", "</w>"))
  }

  test("wrong-arity SQL calls fail at analysis, not at runtime") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT deflate_len('a', 'b')").head()
    }
    assert(e.getMessage.toLowerCase.contains("deflate_len"))
  }
}
