package graft.operators

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** HNSW graph-ANN family (v18): gate equality vs the exact sweep under
  * a generous dial, construction determinism, the driver bound's loud
  * refusal, and serve-from-index == in-session. */
class HnswSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = GraftSession.local("hnsw-spec")
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("ef = corpus size ⇒ exhaustive sweep: equals brute force exactly") {
    // with ef = n the layer-0 search visits every reachable node; the
    // layer-0 graph is connected on this corpus (m=8, 2m at layer 0),
    // so the shortlist is the whole corpus and the Spark rescore makes
    // equality exact, not approximate
    val exact = rows(Similarity.annBruteForce(spark, sf))
    val got = rows(Hnsw.annHnsw(spark, sf, efSearch = 500))
    assert(got == exact)
  }

  test("gate profile is recall-complete on the pinned corpus") {
    // the Probe-chosen gate dial (see SparkEntry v18) — a regenerated
    // corpus that breaks this demotes in Verify rather than failing
    val exact = rows(Similarity.annBruteForce(spark, sf))
    val got = rows(Hnsw.annHnsw(spark, sf, efSearch = 8))
    assert(got == exact)
  }

  test("construction and search are deterministic") {
    val a = rows(Hnsw.annHnsw(spark, sf, efSearch = 64))
    Hnsw.invalidateGraphMemo()
    val b = rows(Hnsw.annHnsw(spark, sf, efSearch = 64))
    assert(a == b)
  }

  test("the graph memo is a real memo (same instance within a session)") {
    Hnsw.invalidateGraphMemo()
    val g1 = Hnsw.graphFor(spark, sf, 8, 96)
    val g2 = Hnsw.graphFor(spark, sf, 8, 96)
    assert(g1 eq g2)
  }

  test("driverMaxVectors refuses loudly, naming the sharded path") {
    val n = Hnsw.driverMaxVectors + 1
    val e = intercept[IllegalArgumentException] {
      Hnsw.buildGraph(new Array[Long](n), new Array[Array[Float]](n), 8, 96)
    }
    assert(e.getMessage.contains("driverMaxVectors"))
    assert(e.getMessage.contains("shard"))
  }

  test("serve from the at-rest index == in-session at equal dials") {
    val idx = java.nio.file.Files.createTempDirectory("hnsw-idx").toString
    Hnsw.writeHnswIndex(spark, sf, idx)
    Hnsw.invalidateServedMemo()
    val served = rows(Hnsw.annHnswServe(spark, sf, idx, efSearch = 256))
    val inSession = rows(Hnsw.annHnsw(spark, sf, efSearch = 256))
    assert(served == inSession)
  }

  test("serve refuses a directory without _meta.json") {
    Hnsw.invalidateServedMemo()
    val bare = java.nio.file.Files.createTempDirectory("hnsw-bare").toString
    val e = intercept[IllegalArgumentException] {
      Hnsw.annHnswServe(spark, sf, bare).collect()
    }
    assert(e.getMessage.contains("_meta.json"))
    assert(e.getMessage.contains("writeHnswIndex"))
  }

  test("serve refuses an index of a different family") {
    Hnsw.invalidateServedMemo()
    val idx = java.nio.file.Files.createTempDirectory("hnsw-wrongfam").toString
    Similarity.writeAnnIndex(spark, sf, idx) // a pq-family IVF index
    val e = intercept[IllegalArgumentException] {
      Hnsw.annHnswServe(spark, sf, idx).collect()
    }
    assert(e.getMessage.contains("hnsw"))
  }

  test("every node is reachable at layer 0 (the connectivity the " +
      "ef=n exhaustiveness test leans on)") {
    val g = Hnsw.graphFor(spark, sf, 8, 96)
    val n = g.ids.length
    val seen = new java.util.BitSet(n)
    var stack = List(g.entry)
    seen.set(g.entry)
    while (stack.nonEmpty) {
      val cur = stack.head; stack = stack.tail
      g.layers(0)(cur).foreach { nb =>
        if (!seen.get(nb)) { seen.set(nb); stack = nb :: stack }
      }
    }
    assert(seen.cardinality() == n,
      s"layer-0 graph disconnected: ${seen.cardinality()} of $n reachable")
  }
}
