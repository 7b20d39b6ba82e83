package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: all `numHashes` PORTABLE (md5) MinHash
  * permutation minima of a string-shingle set in one pass.
  *
  * Permutation i of shingle s is the hex digest `md5(i + "|" + s)` —
  * exactly what the composable
  * `array_min(transform(sh, s => md5(concat(lit(s"i|"), s).cast("binary"))))`
  * evaluates (digesting the UTF-8 bytes of prefix‖shingle is digesting
  * the concatenation), so swapping formulations cannot change values;
  * the equivalence is pinned by a spec. Two wins over the composable
  * form: ONE reused MessageDigest per row instead of a fresh instance
  * per (permutation × shingle) — Spark's `Md5` goes through
  * DigestUtils which allocates every call — and minima are compared as
  * 16-byte digests (unsigned byte order == hex lexicographic order),
  * hex-encoding only the numHashes winners per document instead of
  * every digest.
  */
case class Md5MinHashSigs(shingles: Expression, numHashes: Expression)
    extends BinaryExpression {

  override def left: Expression = shingles
  override def right: Expression = numHashes

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (shingles.dataType, numHashes.dataType) match {
      case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          "md5_minhash_sigs needs (array<string>, int), got " +
            s"${shingles.dataType.catalogString} / ${numHashes.dataType.catalogString}")
    }

  override def nullSafeEval(sh: Any, n: Any): Any =
    Md5MinHashSigs.compute(sh.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sh, n) => {
      val out = ctx.freshName("sigs")
      s"""
         |Object $out = graft.functions.Md5MinHashSigs.compute($sh, $n);
         |if ($out == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(shingles = newLeft, numHashes = newRight)
}

object Md5MinHashSigs {
  private val HEX = "0123456789abcdef".toCharArray

  /** Shared by eval and generated code (called as a plain static from
    * the Java side — forwarded below). Returns null for empty input or
    * when every element is null; null ELEMENTS are skipped, matching
    * `array_min`'s null-skipping over the composable `md5(null) → null`
    * form (the one divergence: an all-null array yields null here
    * instead of an array of nulls — a signature with no information
    * either way). */
  def compute(sh: ArrayData, numHashes: Int): ArrayData = {
    val n0 = sh.numElements()
    if (numHashes <= 0 || n0 == 0) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    // shingle bytes fetched once, reused by every permutation
    val buf = new Array[Array[Byte]](n0)
    var len = 0
    var j0 = 0
    while (j0 < n0) {
      if (!sh.isNullAt(j0)) {
        buf(len) = sh.getUTF8String(j0).getBytes
        len += 1
      }
      j0 += 1
    }
    if (len == 0) return null
    val shingleBytes = buf
    val out = new Array[AnyRef](numHashes)
    var i = 0
    var j = 0
    while (i < numHashes) {
      val prefix = (i.toString + "|").getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var best: Array[Byte] = null
      j = 0
      while (j < len) {
        md.reset()
        md.update(prefix)
        md.update(shingleBytes(j))
        val d = md.digest()
        if (best == null || unsignedLess(d, best)) best = d
        j += 1
      }
      out(i) = UTF8String.fromString(hex(best))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Unsigned byte-wise compare — identical ordering to comparing the
    * lowercase hex encodings lexicographically. */
  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val ai = a(i) & 0xff; val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  private def hex(d: Array[Byte]): String = {
    val cs = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      cs(i * 2) = HEX((d(i) >> 4) & 0xf)
      cs(i * 2 + 1) = HEX(d(i) & 0xf)
      i += 1
    }
    new String(cs)
  }

  /** Column-API entry point (session must carry [[GraftExtensions]]). */
  def md5_minhash_sigs(shingles: Column, numHashes: Column): Column =
    call_function("md5_minhash_sigs", shingles, numHashes)
}
