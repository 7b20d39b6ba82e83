package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression: index of the max-cosine centroid for a
  * float vector against a flattened literal centroid matrix (nCents ×
  * dim doubles, row-major) — the assignment step of IVF / k-means.
  *
  * Motivation: the composable formulation builds one literal-vector
  * cosine subtree PER centroid (`array_max(array(struct(cos, cid), …))`)
  * — a plan whose size grows with nCents × dim and which is re-planned
  * and re-codegen'd for every Lloyd iteration (the centroid literals
  * change each pass). At bench scale that made IVF overhead-bound:
  * near-identical runtimes at 500 and 5 000 corpus rows. This expression
  * keeps the plan O(1) — one literal array — and runs nCents × dim
  * multiplies in a single fused loop.
  *
  * Tie-breaking matches `array_max` over (cos, cid) structs with
  * ascending-cid centroid order: equal cosines pick the LATER index, and
  * NaN compares greater than any number (Spark's double ordering), so a
  * zero-norm input lands on the last NaN-scoring centroid rather than
  * erroring. Returns 0-based index; null on nCents ≤ 0, a matrix whose
  * length ≠ nCents × dim, or any null element.
  */
case class NearestCentroidIdx(emb: Expression, cents: Expression, nCents: Expression)
    extends TernaryExpression {

  override def first: Expression = emb
  override def second: Expression = cents
  override def third: Expression = nCents

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (emb.dataType, cents.dataType, nCents.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          "nearest_centroid_idx needs (array<float>, array<double>, int), got " +
            s"${emb.dataType.catalogString} / ${cents.dataType.catalogString} / " +
            nCents.dataType.catalogString)
    }

  // gate the per-row null scans on the STATIC element nullability — the
  // production caller passes typedLit arrays (containsNull=false), so the
  // hot assignment loop must not pay a nc×dim isNullAt sweep per row
  private lazy val embMayBeNull = emb.dataType match {
    case ArrayType(_, n) => n; case _ => true
  }
  private lazy val centsMayBeNull = cents.dataType match {
    case ArrayType(_, n) => n; case _ => true
  }

  override def nullSafeEval(e: Any, c: Any, n: Any): Any = {
    val x = e.asInstanceOf[ArrayData]
    val m = c.asInstanceOf[ArrayData]
    val nc = n.asInstanceOf[Int]
    val dim = x.numElements()
    if (nc <= 0 || m.numElements() != nc * dim) return null
    var k = 0
    if (embMayBeNull) {
      while (k < dim) { if (x.isNullAt(k)) return null; k += 1 }
    }
    if (centsMayBeNull) {
      k = 0
      val total = nc * dim
      while (k < total) { if (m.isNullAt(k)) return null; k += 1 }
    }
    var nx = 0.0
    var d = 0
    while (d < dim) { val v = x.getFloat(d).toDouble; nx += v * v; d += 1 }
    val xn = math.sqrt(nx)
    var best = Double.NegativeInfinity
    var bestIdx = 0
    var cIdx = 0
    while (cIdx < nc) {
      var dot = 0.0; var nb = 0.0
      val base = cIdx * dim
      d = 0
      while (d < dim) {
        val cv = m.getDouble(base + d)
        dot += x.getFloat(d).toDouble * cv; nb += cv * cv
        d += 1
      }
      val cos = dot / (xn * math.sqrt(nb))
      // NaN > any number, ties -> later index (array_max struct order)
      if (java.lang.Double.isNaN(cos) || (!java.lang.Double.isNaN(best) && cos >= best)) {
        best = cos; bestIdx = cIdx
      }
      cIdx += 1
    }
    bestIdx
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, c, n) => {
      val dim = ctx.freshName("dim")
      val hasNull = ctx.freshName("hasNull")
      val k = ctx.freshName("k")
      val nx = ctx.freshName("nx")
      val xn = ctx.freshName("xn")
      val best = ctx.freshName("best")
      val bestIdx = ctx.freshName("bestIdx")
      val cIdx = ctx.freshName("cIdx")
      val dot = ctx.freshName("dot")
      val nb = ctx.freshName("nb")
      val base = ctx.freshName("base")
      val d = ctx.freshName("d")
      val cv = ctx.freshName("cv")
      val cos = ctx.freshName("cos")
      val embScan = if (embMayBeNull)
        s"""for (int $k = 0; $k < $dim && !$hasNull; $k++) {
           |    if ($e.isNullAt($k)) $hasNull = true;
           |  }""".stripMargin
      else ""
      val centScan = if (centsMayBeNull)
        s"""for (int $k = 0; $k < $n * $dim && !$hasNull; $k++) {
           |    if ($c.isNullAt($k)) $hasNull = true;
           |  }""".stripMargin
      else ""
      s"""
         |int $dim = $e.numElements();
         |boolean $hasNull = false;
         |if ($n > 0 && $c.numElements() == $n * $dim) {
         |  $embScan
         |  $centScan
         |}
         |if ($n <= 0 || $c.numElements() != $n * $dim || $hasNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $nx = 0.0;
         |  for (int $d = 0; $d < $dim; $d++) {
         |    double $cv = (double) $e.getFloat($d); $nx += $cv * $cv;
         |  }
         |  double $xn = java.lang.Math.sqrt($nx);
         |  double $best = Double.NEGATIVE_INFINITY;
         |  int $bestIdx = 0;
         |  for (int $cIdx = 0; $cIdx < $n; $cIdx++) {
         |    double $dot = 0.0; double $nb = 0.0;
         |    int $base = $cIdx * $dim;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      double $cv = $c.getDouble($base + $d);
         |      $dot += (double) $e.getFloat($d) * $cv; $nb += $cv * $cv;
         |    }
         |    double $cos = $dot / ($xn * java.lang.Math.sqrt($nb));
         |    if (Double.isNaN($cos) || (!Double.isNaN($best) && $cos >= $best)) {
         |      $best = $cos; $bestIdx = $cIdx;
         |    }
         |  }
         |  ${ev.value} = $bestIdx;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(emb = newFirst, cents = newSecond, nCents = newThird)
}

object NearestCentroidIdx {
  /** Column-API entry point (session must carry [[GraftExtensions]]). */
  def nearest_centroid_idx(emb: Column, cents: Column, nCents: Column): Column =
    call_function("nearest_centroid_idx", emb, cents, nCents)
}
