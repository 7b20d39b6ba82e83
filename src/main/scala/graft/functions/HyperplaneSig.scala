package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native Catalyst expression: pack the sign bits of `nPlanes` hyperplane
  * projections of a float vector into one long — the signature step of
  * random-hyperplane LSH (SimHash for vectors).
  *
  * `planes` is the flattened row-major plane matrix (nPlanes × dim
  * doubles, a literal — broadcast by codegen constant-folding). Bit p of
  * the result is 1 iff Σ_d emb[d] · planes[p·dim + d] > 0.
  *
  * Motivation: the composable formulation (one `aggregate(zip_with(...))`
  * fold per plane per table) allocates an intermediate array per plane
  * per row and re-evaluates the embedding cast in every lambda (HOF
  * bodies get no common-subexpression elimination). This expression is
  * one fused loop over the `ArrayData` buffers — nPlanes × dim multiplies,
  * zero allocation — and participates in whole-stage codegen. At corpus
  * scale the signature pass is the dominant narrow stage of ANN-LSH
  * (reference capability: similarity search over embeddings; cf.
  * operators/Similarity.scala).
  */
case class HyperplaneSig(emb: Expression, planes: Expression, nPlanes: Expression)
    extends TernaryExpression {

  override def first: Expression = emb
  override def second: Expression = planes
  override def third: Expression = nPlanes

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (emb.dataType, planes.dataType, nPlanes.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          "hyperplane_sig needs (array<float>, array<double>, int), got " +
            s"${emb.dataType.catalogString} / ${planes.dataType.catalogString} / " +
            nPlanes.dataType.catalogString)
    }

  private lazy val embMayBeNull = emb.dataType match {
    case ArrayType(_, cn) => cn; case _ => true
  }
  private lazy val planesMayBeNull = planes.dataType match {
    case ArrayType(_, cn) => cn; case _ => true
  }

  override def nullSafeEval(e: Any, p: Any, n: Any): Any = {
    val x = e.asInstanceOf[ArrayData]
    val m = p.asInstanceOf[ArrayData]
    val np = n.asInstanceOf[Int]
    val dim = x.numElements()
    // plane matrix must cover nPlanes × dim EXACTLY: a shorter matrix
    // would project against garbage, a longer one means the caller built
    // it for a different dimension and every row stride would be wrong
    // (overlapping, correlated "planes") — null, never silently wrong
    if (np <= 0 || np > 63 || m.numElements() != np * dim) return null
    // a null element leaves the dot products undefined — null the whole
    // signature rather than read the slot as 0 (SQL callers can pass
    // containsNull arrays). Scans are gated on STATIC element
    // nullability so the hot signature loop pays nothing when types
    // prove null-freedom (the production plane matrix is a typedLit).
    if (embMayBeNull) {
      var k = 0
      while (k < dim) { if (x.isNullAt(k)) return null; k += 1 }
    }
    if (planesMayBeNull) {
      var k = 0
      val pm = np * dim
      while (k < pm) { if (m.isNullAt(k)) return null; k += 1 }
    }
    var sig = 0L
    var pl = 0
    while (pl < np) {
      var dot = 0.0
      var d = 0
      val base = pl * dim
      while (d < dim) {
        dot += x.getFloat(d).toDouble * m.getDouble(base + d)
        d += 1
      }
      if (dot > 0) sig |= (1L << pl)
      pl += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, p, n) => {
      val dim = ctx.freshName("dim")
      val sig = ctx.freshName("sig")
      val pl = ctx.freshName("pl")
      val d = ctx.freshName("d")
      val dot = ctx.freshName("dot")
      val base = ctx.freshName("base")
      val k = ctx.freshName("k")
      val hasNull = ctx.freshName("hasNull")
      val embScan = if (embMayBeNull)
        s"""for (int $k = 0; $k < $dim && !$hasNull; $k++) {
           |    if ($e.isNullAt($k)) $hasNull = true;
           |  }""".stripMargin
      else ""
      val planeScan = if (planesMayBeNull)
        s"""for (int $k = 0; $k < $n * $dim && !$hasNull; $k++) {
           |    if ($p.isNullAt($k)) $hasNull = true;
           |  }""".stripMargin
      else ""
      s"""
         |int $dim = $e.numElements();
         |boolean $hasNull = false;
         |if ($n > 0 && $n <= 63 && $p.numElements() == $n * $dim) {
         |  $embScan
         |  $planeScan
         |}
         |if ($n <= 0 || $n > 63 || $p.numElements() != $n * $dim || $hasNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $sig = 0L;
         |  for (int $pl = 0; $pl < $n; $pl++) {
         |    double $dot = 0.0;
         |    int $base = $pl * $dim;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      $dot += (double) $e.getFloat($d) * $p.getDouble($base + $d);
         |    }
         |    if ($dot > 0) $sig |= (1L << $pl);
         |  }
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(emb = newFirst, planes = newSecond, nPlanes = newThird)
}

object HyperplaneSig {
  /** Column-API entry point (session must carry [[GraftExtensions]]). */
  def hyperplane_sig(emb: Column, planes: Column, nPlanes: Column): Column =
    call_function("hyperplane_sig", emb, planes, nPlanes)
}
