package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: segment text into BPE subword tokens by
  * applying a learned merge table (`operators.TextOps.bpeMerges`
  * output) — whitespace-split words, per-character symbols plus the
  * `</w>` end-of-word marker, then every merge applied IN RANK ORDER
  * with the same left-to-right scan the trainer uses, so segmenting
  * the training corpus reproduces the trainer's final word states
  * exactly (asserted by OperatorsSpec).
  *
  * The merge table arrives as two parallel string-array literals
  * (lefts, rights) — a tiny driver-held model riding the plan as
  * literals, the nearest_centroid_idx pattern. Per row the cost is
  * O(merges × chars): a 40-merge table over a 200-char doc is ~8k
  * scans — the per-row kernel an RDD/UDF formulation would pay anyway,
  * minus SerDe, null handling, and codegen-boundary costs. The heavy
  * loop lives in [[BpeSegment.segment]] (compiled Scala, shared by
  * interpreted eval and the generated code's single static call — the
  * codegen value here is staying INSIDE the WholeStageCodegen pipeline,
  * not re-JITing a string loop).
  */
case class BpeSegment(text: Expression, lefts: Expression, rights: Expression)
    extends TernaryExpression {

  override def first: Expression = text
  override def second: Expression = lefts
  override def third: Expression = rights

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (text.dataType, lefts.dataType, rights.dataType) match {
      case (StringType, ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          "bpe_segment needs (string, array<string>, array<string>), got " +
            s"${text.dataType.catalogString} / ${lefts.dataType.catalogString} / " +
            s"${rights.dataType.catalogString}")
    }

  override def nullSafeEval(t: Any, l: Any, r: Any): Any =
    BpeSegment.segment(t.asInstanceOf[UTF8String],
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, l, r) => {
      val cls = BpeSegment.getClass.getName.stripSuffix("$")
      val out = ctx.freshName("out")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  $cls.segment($t, $l, $r);
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(text = newFirst, lefts = newSecond, rights = newThird)
}

object BpeSegment {

  /** One symbol per Unicode CODE POINT (not UTF-16 char): supplementary
    * characters (emoji, rare CJK) must enter BPE as whole characters —
    * a per-char split would emit lone surrogate halves, which are not
    * valid strings. Shared by the segmenter below AND the trainer's
    * word derivation (TextOps.trainBpe) so the two can never drift. */
  def codePointSymbols(s: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](s.length)
    var i = 0
    while (i < s.length) {
      val n = Character.charCount(s.codePointAt(i))
      out += s.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** Decoded merge table: the two literal arrays as String pairs. */
  final class MergeTable(val ls: Array[String], val rs: Array[String])

  private val tableMemo = new LiteralTableMemo[MergeTable]

  /** Decode the parallel (lefts, rights) literals; null on mismatch or
    * null elements — the kernel's error contract. */
  private def decodeTable(lefts: ArrayData, rights: ArrayData): MergeTable = {
    val n = lefts.numElements()
    if (n != rights.numElements()) return null
    val ls = new Array[String](n)
    val rs = new Array[String](n)
    var m = 0
    while (m < n) {
      if (lefts.isNullAt(m) || rights.isNullAt(m)) return null
      ls(m) = lefts.getUTF8String(m).toString
      rs(m) = rights.getUTF8String(m).toString
      m += 1
    }
    new MergeTable(ls, rs)
  }

  /** The per-row kernel, shared by interpreted eval and codegen. A
    * mismatched or null-element merge table yields null (never a
    * silently partial segmentation). The O(merges) table decode is
    * memoized per thread on the literal arrays' identity
    * ([[LiteralTableMemo]]) — paid once per task, not per row. */
  def segment(text: UTF8String, lefts: ArrayData, rights: ArrayData): ArrayData = {
    val table = tableMemo.get(lefts, lefts.numElements(),
      rights, rights.numElements())(decodeTable(lefts, rights))
    if (table == null) return null
    val ls = table.ls
    val rs = table.rs
    val n = ls.length
    // the trainer's word derivation: trim + whitespace split (TextOps
    // .tokens semantics — an empty text yields the single empty word)
    val words = text.toString.trim.split("\\s+")
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var w = 0
    while (w < words.length) {
      var syms: Array[String] = {
        val cps = codePointSymbols(words(w))
        val a = new Array[String](cps.length + 1)
        System.arraycopy(cps, 0, a, 0, cps.length)
        a(cps.length) = "</w>"
        a
      }
      var k = 0
      while (k < n) {
        // left-to-right scan-merge, identical to the training loop
        val l = ls(k); val r = rs(k)
        val merged = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
            merged += l + r; i += 2
          } else { merged += syms(i); i += 1 }
        }
        syms = merged.toArray
        k += 1
      }
      var i = 0
      while (i < syms.length) { out += UTF8String.fromString(syms(i)); i += 1 }
      w += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** Column-API entry point (session must carry [[GraftExtensions]]). */
  def bpe_segment(text: Column, lefts: Column, rights: Column): Column =
    call_function("bpe_segment", text, lefts, rights)
}
