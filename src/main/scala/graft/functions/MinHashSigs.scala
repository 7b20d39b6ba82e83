package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: all `numHashes` MinHash permutation
  * minima of a hashed-shingle set in ONE fused loop.
  *
  * Permutation i of shingle-hash h is defined as
  * `xxhash64(i, h)` = `XXH64.hashLong(h, XXH64.hashInt(i, 42))` — exactly
  * what the composable `array_min(transform(sh, h => xxhash64(lit(i), h)))`
  * evaluates, so swapping formulations cannot change signatures. The
  * composable form is numHashes separate array passes, each allocating a
  * fresh long array per row (HOF lambdas get no CSE); this is a single
  * numHashes × n loop with a stack `long[numHashes]`, inside whole-stage
  * codegen. The signature pass dominates MinHash-LSH candidate
  * generation at corpus scale (reference capability: near-dup detection;
  * cf. operators/Dedup.minhashLsh). Null elements are skipped (treated
  * as absent from the set, like [[Md5MinHashSigs]]); an all-null or
  * empty array yields null.
  */
case class MinHashSigs(hashes: Expression, numHashes: Expression)
    extends BinaryExpression {

  override def left: Expression = hashes
  override def right: Expression = numHashes

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (hashes.dataType, numHashes.dataType) match {
      case (ArrayType(LongType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          "minhash_sigs needs (array<bigint>, int), got " +
            s"${hashes.dataType.catalogString} / ${numHashes.dataType.catalogString}")
    }

  override def nullSafeEval(h: Any, n: Any): Any = {
    val arr = h.asInstanceOf[ArrayData]
    val np = n.asInstanceOf[Int]
    val len = arr.numElements()
    if (np <= 0 || len == 0) return null // empty set has no minima
    // null ELEMENTS are skipped (absent from the set) like
    // Md5MinHashSigs — SQL callers can pass containsNull arrays, and
    // reading a null slot as 0 would hash a fabricated member. All-null
    // input degenerates to the empty set → null.
    var nonNull = 0
    var j0 = 0
    while (j0 < len) { if (!arr.isNullAt(j0)) nonNull += 1; j0 += 1 }
    if (nonNull == 0) return null
    val sigs = new Array[Long](np)
    var i = 0
    while (i < np) {
      val seed = XXH64.hashInt(i, 42L)
      var best = Long.MaxValue
      var j = 0
      while (j < len) {
        if (!arr.isNullAt(j)) {
          val v = XXH64.hashLong(arr.getLong(j), seed)
          if (v < best) best = v
        }
        j += 1
      }
      sigs(i) = best
      i += 1
    }
    new GenericArrayData(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, n) => {
      val len = ctx.freshName("len")
      val sigs = ctx.freshName("sigs")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val seed = ctx.freshName("seed")
      val best = ctx.freshName("best")
      val v = ctx.freshName("v")
      val xxh = classOf[XXH64].getName // Java class, static methods
      val nonNull = ctx.freshName("nonNull")
      val j0 = ctx.freshName("j0")
      s"""
         |int $len = $h.numElements();
         |int $nonNull = 0;
         |for (int $j0 = 0; $j0 < $len; $j0++) {
         |  if (!$h.isNullAt($j0)) $nonNull++;
         |}
         |if ($n <= 0 || $nonNull == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $sigs = new long[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $seed = $xxh.hashInt($i, 42L);
         |    long $best = Long.MAX_VALUE;
         |    for (int $j = 0; $j < $len; $j++) {
         |      if ($h.isNullAt($j)) continue;
         |      long $v = $xxh.hashLong($h.getLong($j), $seed);
         |      if ($v < $best) $best = $v;
         |    }
         |    $sigs[$i] = $best;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(hashes = newLeft, numHashes = newRight)
}

object MinHashSigs {
  /** Column-API entry point (session must carry [[GraftExtensions]]). */
  def minhash_sigs(hashes: Column, numHashes: Column): Column =
    call_function("minhash_sigs", hashes, numHashes)
}
