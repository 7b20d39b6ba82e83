package graft.streaming

import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the streaming stratified sample's keyed update
  * (Pipelines.sampleGroup): for ANY document set split into ANY batch
  * sequence, the final membership equals the bottom-`quota` of the
  * WHOLE set ordered by (md5 rank key, doc_id) — the invariant that
  * makes the stream converge to the batch t14 sample regardless of
  * arrival order or batch boundaries. Runs the group function directly
  * (pure fold over rows + state) under ScalaCheck, no SparkSession.
  */
object SamplePropertySpec extends Properties("sampleGroup") {

  /** The SAME rank key Spark computes: md5 of the UTF-8 bytes of the
    * decimal doc_id string, lowercase hex. */
  private def rk(id: Long): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(id.toString.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
  }

  private val feedGen: Gen[(List[Long], Int, Int)] = for {
    ids <- Gen.listOf(Gen.chooseNum(0L, 5000L))
    quota <- Gen.choose(1, 10)
    nBatches <- Gen.choose(1, 6)
  } yield (ids, quota, nBatches)

  property("final membership == bottom-quota of the union, any batching") =
    Prop.forAll(feedGen) { case (ids, quota, nBatches) =>
      val state = new TestGroupState[SampleState]
      val chunkSize = math.max(1, (ids.size + nBatches - 1) / nBatches)
      var lastEmit: Seq[SampleRow] = Nil
      ids.grouped(chunkSize).foreach { batch =>
        val rows = batch.map(id => ("en", id, rk(id))).iterator
        val out = Pipelines.sampleGroup(quota, 0L)("en", rows, state).toSeq
        if (out.nonEmpty) lastEmit = out
      }
      val want = ids.distinct.map(id => (rk(id), id)).sorted.take(quota)
        .zipWithIndex.map { case ((_, id), i) => (id, i + 1) }
      val got = lastEmit.sortBy(_.rk).map(r => (r.doc_id, r.rk))
      // every batch emits the full current sample; after the last batch
      // the emission must be exactly the bottom-quota of everything
      (ids.isEmpty && got.isEmpty) || got == want
    }

  property("ver increments once per batch; members never exceed quota") =
    Prop.forAll(feedGen) { case (ids, quota, nBatches) =>
      val state = new TestGroupState[SampleState]
      val chunkSize = math.max(1, (ids.size + nBatches - 1) / nBatches)
      var batches = 0
      ids.grouped(chunkSize).foreach { batch =>
        Pipelines.sampleGroup(quota, 0L)(
          "en", batch.map(id => ("en", id, rk(id))).iterator, state).length
        batches += 1
      }
      val st = state.getOption
      (ids.isEmpty && st.isEmpty) ||
        (st.exists(_.ver == batches) && st.exists(_.members.size <= quota))
    }
}
