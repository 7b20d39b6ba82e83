package graft.functions

/** Per-thread single-entry memo for decoded plan-literal model tables
  * (BPE merge tables, unigram piece tables).
  *
  * The table expressions arrive as array LITERALS: inside one task the
  * same `ArrayData` instances are passed to the kernel for every row,
  * so decoding them (UTF8String→String conversion + hash build, O(vocab)
  * per row) is pure waste after the first row. Keying a cache on the
  * REFERENCE identity of the two array operands is exact for literals
  * and safely conservative otherwise: per-row computed arrays are fresh
  * objects, miss the memo, and decode as before — never a stale hit.
  *
  * The identity key leans on an internals invariant: a reused container
  * must imply unchanged contents. This HOLDS on Spark 4.1.2 —
  * `UnsafeRow.getArray` and `WritableColumnVector.getArray` allocate a
  * fresh wrapper per call (verified in the shipped jars), so the only
  * way to see the same `ArrayData` object twice is a plan literal,
  * which is immutable. Because that is an undocumented invariant, each
  * hit ALSO re-checks the operands' `numElements` stamps (O(1)): a
  * future row implementation that hands back a mutated-in-place
  * container with a different length misses the memo loudly (fresh
  * decode) instead of returning a silently stale table. A same-length
  * in-place mutation would still slip through — the stamp is a cheap
  * tripwire for the likely regression shape, not a content hash.
  *
  * One entry per thread (ThreadLocal): rows of a task arrive on one
  * thread, so a single slot gives a ~100% hit rate while bounding
  * retention to one decoded table per executor thread — no eviction
  * policy, no concurrency, no unbounded identity map. Null decodes
  * (mismatched/null-element tables — the kernel's error contract) are
  * not stored; the error path re-scans per row, which only costs on
  * malformed input. */
private[functions] final class LiteralTableMemo[T <: AnyRef] {
  private final case class Entry(k1: AnyRef, n1: Int, k2: AnyRef, n2: Int,
                                 value: T)
  private val slot = new ThreadLocal[Entry]

  /** Return the decoded table for (k1, k2), reusing the thread's last
    * decode when both operands are the SAME objects (`eq`) AND their
    * length stamps (`n1`, `n2` — pass `numElements()`) are unchanged. */
  def get(k1: AnyRef, n1: Int, k2: AnyRef, n2: Int)(decode: => T): T = {
    val cur = slot.get()
    if (cur != null && (cur.k1 eq k1) && (cur.k2 eq k2) &&
        cur.n1 == n1 && cur.n2 == n2) cur.value
    else {
      val v = decode
      if (v != null) slot.set(Entry(k1, n1, k2, n2, v))
      v
    }
  }
}
