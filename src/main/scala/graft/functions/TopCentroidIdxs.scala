package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression: indices of the `k` max-cosine centroids
  * for a float vector against a flattened literal centroid matrix —
  * the probe step of IVF ANN (the query-side sibling of
  * [[NearestCentroidIdx]], which answers k = 1 for the corpus side).
  *
  * Replaces the composable probe (`sort_array(array(struct(−cos, cid),
  * …))` + `slice`) whose plan grows O(nCents × dim) literal cosine
  * subtrees. Ordering matches it: cosine descending, index ascending on
  * ties, NaN-scoring centroids ranked last (the struct sort's ascending
  * −cos puts NaN last — note this is the OPPOSITE NaN preference of the
  * assignment argmax, preserved from the composable forms each
  * replaces). k is clamped to nCents like `slice` past the array end.
  * Null on k ≤ 0, nCents ≤ 0, a matrix length ≠ nCents × dim, or (when
  * element nullability is statically possible) any null element.
  */
case class TopCentroidIdxs(emb: Expression, cents: Expression,
                           nCents: Expression, k: Expression)
    extends QuaternaryExpression {

  override def first: Expression = emb
  override def second: Expression = cents
  override def third: Expression = nCents
  override def fourth: Expression = k

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (emb.dataType, cents.dataType, nCents.dataType, k.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _), IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          "top_centroid_idxs needs (array<float>, array<double>, int, int), got " +
            s"${emb.dataType.catalogString} / ${cents.dataType.catalogString} / " +
            s"${nCents.dataType.catalogString} / ${k.dataType.catalogString}")
    }

  private lazy val embMayBeNull = emb.dataType match {
    case ArrayType(_, n) => n; case _ => true
  }
  private lazy val centsMayBeNull = cents.dataType match {
    case ArrayType(_, n) => n; case _ => true
  }

  override def nullSafeEval(e: Any, c: Any, n: Any, kk: Any): Any = {
    val x = e.asInstanceOf[ArrayData]
    val m = c.asInstanceOf[ArrayData]
    val nc = n.asInstanceOf[Int]
    val kIn = kk.asInstanceOf[Int]
    val dim = x.numElements()
    if (nc <= 0 || kIn <= 0 || m.numElements() != nc * dim) return null
    if (embMayBeNull) {
      var i = 0
      while (i < dim) { if (x.isNullAt(i)) return null; i += 1 }
    }
    if (centsMayBeNull) {
      var i = 0
      val total = nc * dim
      while (i < total) { if (m.isNullAt(i)) return null; i += 1 }
    }
    val kEff = math.min(kIn, nc)
    val cos = new Array[Double](nc)
    var nx = 0.0
    var d = 0
    while (d < dim) { val v = x.getFloat(d).toDouble; nx += v * v; d += 1 }
    val xn = math.sqrt(nx)
    var ci = 0
    while (ci < nc) {
      var dot = 0.0; var nb = 0.0
      val base = ci * dim
      d = 0
      while (d < dim) {
        val cv = m.getDouble(base + d)
        dot += x.getFloat(d).toDouble * cv; nb += cv * cv
        d += 1
      }
      cos(ci) = dot / (xn * math.sqrt(nb))
      ci += 1
    }
    new GenericArrayData(TopCentroidIdxs.selectTop(cos, kEff))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, c, n, kk) => {
      val dim = ctx.freshName("dim")
      val hasNull = ctx.freshName("hasNull")
      val i = ctx.freshName("i")
      val nx = ctx.freshName("nx")
      val xn = ctx.freshName("xn")
      val cos = ctx.freshName("cos")
      val ci = ctx.freshName("ci")
      val dot = ctx.freshName("dot")
      val nb = ctx.freshName("nb")
      val base = ctx.freshName("base")
      val d = ctx.freshName("d")
      val cv = ctx.freshName("cv")
      val kEff = ctx.freshName("kEff")
      val cls = classOf[TopCentroidIdxs].getName
      val embScan = if (embMayBeNull)
        s"""for (int $i = 0; $i < $dim && !$hasNull; $i++) {
           |    if ($e.isNullAt($i)) $hasNull = true;
           |  }""".stripMargin
      else ""
      val centScan = if (centsMayBeNull)
        s"""for (int $i = 0; $i < $n * $dim && !$hasNull; $i++) {
           |    if ($c.isNullAt($i)) $hasNull = true;
           |  }""".stripMargin
      else ""
      s"""
         |int $dim = $e.numElements();
         |boolean $hasNull = false;
         |if ($n > 0 && $kk > 0 && $c.numElements() == $n * $dim) {
         |  $embScan
         |  $centScan
         |}
         |if ($n <= 0 || $kk <= 0 || $c.numElements() != $n * $dim || $hasNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $kEff = java.lang.Math.min($kk, $n);
         |  double[] $cos = new double[$n];
         |  double $nx = 0.0;
         |  for (int $d = 0; $d < $dim; $d++) {
         |    double $cv = (double) $e.getFloat($d); $nx += $cv * $cv;
         |  }
         |  double $xn = java.lang.Math.sqrt($nx);
         |  for (int $ci = 0; $ci < $n; $ci++) {
         |    double $dot = 0.0; double $nb = 0.0;
         |    int $base = $ci * $dim;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      double $cv = $c.getDouble($base + $d);
         |      $dot += (double) $e.getFloat($d) * $cv; $nb += $cv * $cv;
         |    }
         |    $cos[$ci] = $dot / ($xn * java.lang.Math.sqrt($nb));
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    $cls.selectTop($cos, $kEff));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(emb = newFirst, cents = newSecond, nCents = newThird, k = newFourth)
}

object TopCentroidIdxs {
  /** Top-k selection by (cos desc, idx asc), NaN last — shared by eval
    * and generated code. Insertion into k slots: k is tiny (nprobe). */
  def selectTop(cos: Array[Double], k: Int): Array[Int] = {
    // ranks a before b?
    def before(ca: Double, ia: Int, cb: Double, ib: Int): Boolean = {
      val na = java.lang.Double.isNaN(ca); val nb = java.lang.Double.isNaN(cb)
      if (na != nb) !na
      else if (!na && ca != cb) ca > cb
      else ia < ib
    }
    val idx = new Array[Int](k)
    var filled = 0
    var i = 0
    while (i < cos.length) {
      var pos = filled
      while (pos > 0 && before(cos(i), i, cos(idx(pos - 1)), idx(pos - 1))) pos -= 1
      if (pos < k) {
        val end = math.min(filled, k - 1)
        var j = end
        while (j > pos) { idx(j) = idx(j - 1); j -= 1 }
        idx(pos) = i
        if (filled < k) filled += 1
      }
      i += 1
    }
    idx
  }

  /** Column-API entry point (session must carry [[GraftExtensions]]). */
  def top_centroid_idxs(emb: Column, cents: Column, nCents: Column, k: Column): Column =
    call_function("top_centroid_idxs", emb, cents, nCents, k)
}
