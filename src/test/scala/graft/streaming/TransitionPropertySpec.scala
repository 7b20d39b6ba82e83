package graft.streaming

import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the streaming transition extraction's keyed
  * update (Pipelines.transitionGroup) — the state function behind the
  * graph family's maintain loop. Pure fold under ScalaCheck, no
  * SparkSession (the SamplePropertySpec pattern). Invariants:
  * in-order batching reproduces the batch LEAD window exactly; under
  * ANY arrival order the state still tracks the global (ts, id)
  * maximum (late rows can cost emissions, never corrupt the chain);
  * and a full re-delivery emits nothing.
  *
  * The generator deliberately produces SUB-MILLISECOND ties (same
  * getTime, different nanos): Tables.normalizeEventTs emits micros and
  * the batch LEAD window orders by the full value, so the fold must
  * order/compare with Timestamp.compareTo — a getTime-keyed fold
  * mis-orders exactly these rows (the round-15 ADVICE finding). The
  * model keys below are (getTime, getNanos, id), which orders
  * identically to (compareTo, id). */
object TransitionPropertySpec extends Properties("transitionGroup") {

  private type Ev = (Long, java.sql.Timestamp, Long, String)

  private def mkTs(sec: Long, micros: Long): java.sql.Timestamp = {
    val ts = new java.sql.Timestamp(1700000000000L + sec * 1000)
    ts.setNanos((micros * 1000).toInt) // < 1 ms, so getTime is unchanged
    ts
  }

  private val feedGen: Gen[(List[Ev], Int)] = for {
    n <- Gen.choose(0, 40)
    tss <- Gen.listOfN(n, Gen.chooseNum(0L, 20L)) // small range => ts ties
    // sub-ms component: tiny range => frequent same-millisecond,
    // different-microsecond collisions (plus exact full ties at 0)
    micros <- Gen.listOfN(n, Gen.oneOf(0L, 1L, 2L, 999L))
    types <- Gen.listOfN(n, Gen.oneOf("view", "click", "purchase"))
    nBatches <- Gen.choose(1, 5)
  } yield (tss.zip(micros).zip(types).zipWithIndex.map { case (((t, us), ty), i) =>
    (7L, mkTs(t, us), i.toLong, ty)
  }, nBatches)

  private def key(e: Ev): (Long, Int, Long) = (e._2.getTime, e._2.getNanos, e._3)

  private def sortedPairs(events: List[Ev]): List[(String, String)] = {
    val s = events.sortBy(key).map(_._4)
    if (s.size < 2) Nil else s.zip(s.tail)
  }

  private def run(state: TestGroupState[TransitionState],
                  batches: Seq[Seq[Ev]]): Seq[(String, String)] =
    batches.flatMap(b =>
      Pipelines.transitionGroup(0L)(7L, b.iterator, state).toSeq
        .map(t => (t.src, t.dst)))

  property("in-order batching == the batch LEAD window's adjacent pairs") =
    Prop.forAll(feedGen) { case (events, nBatches) =>
      val inOrder = events.sortBy(key)
      val chunk = math.max(1, (inOrder.size + nBatches - 1) / nBatches)
      val state = new TestGroupState[TransitionState]
      run(state, inOrder.grouped(chunk).toSeq) == sortedPairs(events)
    }

  property("any arrival order: state ends at the global (ts, id) maximum") =
    Prop.forAll(feedGen) { case (events, nBatches) =>
      val chunk = math.max(1, (events.size + nBatches - 1) / nBatches)
      val state = new TestGroupState[TransitionState]
      run(state, events.grouped(chunk).toSeq)
      val want = events.map(key).sorted.lastOption
      state.getOption.map(s => (s.ts.getTime, s.ts.getNanos, s.event_id)) == want
    }

  property("full re-delivery (any order) emits zero further transitions") =
    Prop.forAll(feedGen) { case (events, nBatches) =>
      val chunk = math.max(1, (events.size + nBatches - 1) / nBatches)
      val state = new TestGroupState[TransitionState]
      run(state, events.grouped(chunk).toSeq)
      run(state, Seq(events)).isEmpty
    }
}
