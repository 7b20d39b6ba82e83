package graft.streaming

import java.sql.Timestamp
import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the apportionment core (SURVEY §5 / §7.4.1): for
  * ANY order whose detail amounts sum to original_total, the emitted
  * shares sum exactly to final_total — the invariant the reference's
  * remainder trick exists to guarantee. Runs apportionGroup directly
  * (pure function of rows + state) under ScalaCheck, no SparkSession.
  */
object ApportionPropertySpec extends Properties("apportion") {

  private val ts0 = Timestamp.valueOf("2024-01-01 00:00:00")

  // an order: 1–8 details with cent amounts, arbitrary discount so
  // final_total ≤ original_total
  private val orderGen: Gen[(List[Long], Long)] = for {
    n <- Gen.choose(1, 8)
    cents <- Gen.listOfN(n, Gen.choose(1L, 1000000L))
    discount <- Gen.choose(0L, cents.sum - 1)
  } yield (cents, cents.sum - discount)

  private def run(detailCents: List[Long], finalC: Long,
                  batches: List[List[Int]]): List[OrderWideSplit] = {
    val originalC = detailCents.sum
    val rows = detailCents.zipWithIndex.map { case (c, i) =>
      OrderWide(i + 1, 1L, 100L + i, 1, c / 100.0, finalC / 100.0,
        originalC / 100.0, ts0)
    }
    val state = new TestGroupState[ApportionState]
    batches.flatMap { idxs =>
      Pipelines.apportionGroup(0L)(1L, idxs.map(rows(_)).iterator, state).toList
    }
  }

  property("shares sum exactly to final_total across any batch split") =
    Prop.forAll(orderGen, Gen.choose(0, 6)) { (order, splitAt) =>
      val (cents, finalC) = order
      val idxs = cents.indices.toList
      val cut = math.min(splitAt, idxs.size)
      val batches = List(idxs.take(cut), idxs.drop(cut)).filter(_.nonEmpty)
      val out = run(cents, finalC, batches)
      val sumC = out.map(s => Math.round(s.final_detail_amount * 100)).sum
      (out.size == cents.size) && (sumC == finalC)
    }

  property("non-remainder shares are floor-proportional") =
    Prop.forAll(orderGen) { case (cents, finalC) =>
      val out = run(cents, finalC, List(cents.indices.toList))
      val originalC = cents.sum
      val shares = out.sortBy(_.order_detail_id)
        .map(s => Math.round(s.final_detail_amount * 100))
      shares.zip(cents).init.forall { case (share, c) =>
        share == (finalC * c) / originalC
      }
    }
}

/** Minimal in-memory GroupState for driving apportionGroup directly. */
/** Hand-rolled GroupState for driving stateful functions directly
  * (scalatestplus is not in the offline cache). `timedOut` and
  * `lastTimeoutMs` let TTL paths be exercised without the
  * ProcessingTimeTimeout busy-spin under processAllAvailable. */
class TestGroupState[T] extends org.apache.spark.sql.streaming.GroupState[T] {
  private var st: Option[T] = None
  var timedOut: Boolean = false
  var lastTimeoutMs: Long = -1L
  override def exists: Boolean = st.isDefined
  override def get: T = st.get
  override def getOption: Option[T] = st
  override def update(s: T): Unit = st = Some(s)
  override def remove(): Unit = st = None
  override def hasTimedOut: Boolean = timedOut
  override def setTimeoutDuration(d: Long): Unit = lastTimeoutMs = d
  override def setTimeoutDuration(d: String): Unit = ()
  override def setTimeoutTimestamp(t: Long): Unit = ()
  override def setTimeoutTimestamp(t: Long, add: String): Unit = ()
  override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(t: java.sql.Date, add: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = 0L
  override def getCurrentProcessingTimeMs(): Long = 0L
}
