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
  * One entry per thread (ThreadLocal): rows of a task arrive on one
  * thread, so a single slot gives a ~100% hit rate while bounding
  * retention to one decoded table per executor thread — no eviction
  * policy, no concurrency, no unbounded identity map. Null decodes
  * (mismatched/null-element tables — the kernel's error contract) are
  * not stored; the error path re-scans per row, which only costs on
  * malformed input. */
private[functions] final class LiteralTableMemo[T <: AnyRef] {
  private val slot = new ThreadLocal[(AnyRef, AnyRef, T)]

  /** Return the decoded table for (k1, k2), reusing the thread's last
    * decode when both operands are the SAME objects (`eq`). */
  def get(k1: AnyRef, k2: AnyRef)(decode: => T): T = {
    val cur = slot.get()
    if (cur != null && (cur._1 eq k1) && (cur._2 eq k2)) cur._3
    else {
      val v = decode
      if (v != null) slot.set((k1, k2, v))
      v
    }
  }
}
