package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: segment text into unigram-LM subword
  * tokens (the SentencePiece-unigram apply side, Kudo 2018) — per
  * whitespace word, the Viterbi maximum-likelihood split of the word's
  * code-point sequence under a piece→log-probability table. The table
  * arrives as two parallel array literals (pieces, logprobs) — the
  * tiny driver-held model riding the plan as literals, the
  * bpe_segment / nearest_centroid_idx pattern — so corpus tokenization
  * stays a NARROW map-only scan inside WholeStageCodegen.
  *
  * The Viterbi kernel ([[UnigramSegment.viterbi]]) is SHARED with the
  * trainer's E-step (`operators.TextOps.trainUnigram`), so tokenizing
  * the training corpus reproduces the trainer's final segmentations
  * exactly — the same lockstep contract `codePointSymbols` gives BPE.
  * Determinism: a strictly-greater score wins; an exact score tie
  * keeps the SMALLEST start index (the longest final piece); a single
  * code point absent from the table scores [[UnigramSegment.UnkLogProb]]
  * so every word always segments — EXCEPT under an adversarial table
  * whose non-finite logprobs (-Inf/NaN on a single code point) make a
  * word unreachable: that row yields null (the mismatched-table
  * contract), never a crash or a silently partial split. Per-row cost
  * is O(chars × maxPieceLen) table lookups; the O(vocab) table decode
  * is memoized per thread on the literal arrays' identity
  * ([[LiteralTableMemo]]), so it is paid once per task, not per row.
  */
case class UnigramSegment(text: Expression, pieces: Expression, logprobs: Expression)
    extends TernaryExpression {

  override def first: Expression = text
  override def second: Expression = pieces
  override def third: Expression = logprobs

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (text.dataType, pieces.dataType, logprobs.dataType) match {
      case (StringType, ArrayType(StringType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          "unigram_segment needs (string, array<string>, array<double>), got " +
            s"${text.dataType.catalogString} / ${pieces.dataType.catalogString} / " +
            s"${logprobs.dataType.catalogString}")
    }

  override def nullSafeEval(t: Any, p: Any, lp: Any): Any =
    UnigramSegment.segment(t.asInstanceOf[UTF8String],
      p.asInstanceOf[ArrayData], lp.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, p, lp) => {
      val cls = UnigramSegment.getClass.getName.stripSuffix("$")
      val out = ctx.freshName("out")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  $cls.segment($t, $p, $lp);
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(text = newFirst, pieces = newSecond, logprobs = newThird)
}

object UnigramSegment {

  /** Score of a single code point absent from the piece table — low
    * enough that any in-vocabulary split is preferred, finite so every
    * word segments. Shared by trainer and segmenter. */
  val UnkLogProb: Double = -100.0

  /** Viterbi maximum-likelihood segmentation of one word's code-point
    * symbols under `lp` (piece → log-prob). Ties keep the smallest
    * start index (longest final piece); both trainer E-step and the
    * expression call THIS method, so the two can never drift.
    *
    * Returns null when the end state is unreachable — only possible
    * when a SINGLE code point carries a non-finite table score (-Inf
    * is skipped, NaN never wins a max), since out-of-table singles get
    * the finite [[UnkLogProb]]. The trainer's tables are ln(count /
    * total) over positive counts — always finite — so the null branch
    * is unreachable from training; it exists for the SQL-exposed
    * expression, where the table is caller-supplied. */
  def viterbi(cps: Array[String], lp: java.util.HashMap[String, java.lang.Double],
              maxPieceLen: Int): Array[String] = {
    val L = cps.length
    if (L == 0) return Array.empty
    val best = new Array[Double](L + 1)
    val back = new Array[Int](L + 1)
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    best(0) = 0.0
    var i = 1
    while (i <= L) {
      back(i) = -1
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (best(j) != Double.NegativeInfinity) {
          val sb = new java.lang.StringBuilder
          var k = j
          while (k < i) { sb.append(cps(k)); k += 1 }
          val piece = sb.toString
          val plp = lp.get(piece)
          val score =
            if (plp != null) plp.doubleValue()
            else if (i - j == 1) UnkLogProb
            else Double.NegativeInfinity
          if (score != Double.NegativeInfinity) {
            val s = best(j) + score
            if (s > best(i)) { best(i) = s; back(i) = j }
          }
        }
        j += 1
      }
      i += 1
    }
    if (back(L) < 0) return null // unreachable end — adversarial table
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = L
    while (pos > 0) {
      val j = back(pos)
      val sb = new java.lang.StringBuilder
      var k = j
      while (k < pos) { sb.append(cps(k)); k += 1 }
      out += sb.toString
      pos = j
    }
    out.reverseIterator.toArray
  }

  /** Decoded piece table: the per-row working form of the two literal
    * arrays. */
  final class PieceTable(val lp: java.util.HashMap[String, java.lang.Double],
                         val maxPieceLen: Int)

  private val tableMemo = new LiteralTableMemo[PieceTable]

  /** Decode the parallel (pieces, logprobs) literals; null on mismatch
    * or null elements — the kernel's error contract. */
  private def decodeTable(pieces: ArrayData, logprobs: ArrayData): PieceTable = {
    val n = pieces.numElements()
    if (n != logprobs.numElements()) return null
    val lp = new java.util.HashMap[String, java.lang.Double](n * 2)
    var maxPieceLen = 1
    var m = 0
    while (m < n) {
      if (pieces.isNullAt(m) || logprobs.isNullAt(m)) return null
      val p = pieces.getUTF8String(m).toString
      lp.put(p, logprobs.getDouble(m))
      val cpLen = p.codePointCount(0, p.length)
      if (cpLen > maxPieceLen) maxPieceLen = cpLen
      m += 1
    }
    new PieceTable(lp, maxPieceLen)
  }

  /** The per-row kernel, shared by interpreted eval and codegen. A
    * mismatched or null-element piece table — or one under which a
    * word's end state is Viterbi-unreachable (non-finite single-piece
    * scores) — yields null (never a crash or a silently partial
    * segmentation). */
  def segment(text: UTF8String, pieces: ArrayData, logprobs: ArrayData): ArrayData = {
    val table = tableMemo.get(pieces, pieces.numElements(),
      logprobs, logprobs.numElements())(decodeTable(pieces, logprobs))
    if (table == null) return null
    // the trainer's word derivation: trim + whitespace split (TextOps
    // .tokens semantics)
    val words = text.toString.trim.split("\\s+")
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var w = 0
    while (w < words.length) {
      val segs = viterbi(BpeSegment.codePointSymbols(words(w)), table.lp,
        table.maxPieceLen)
      if (segs == null) return null
      var i = 0
      while (i < segs.length) { out += UTF8String.fromString(segs(i)); i += 1 }
      w += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** Column-API entry point (session must carry [[GraftExtensions]]). */
  def unigram_segment(text: Column, pieces: Column, logprobs: Column): Column =
    call_function("unigram_segment", text, pieces, logprobs)
}
