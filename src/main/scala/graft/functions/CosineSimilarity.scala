package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two float vectors.
  *
  * Motivation: the composable formulation
  * (`aggregate(zip_with(...))`, operators/Similarity.scala) allocates
  * intermediate arrays per row and evaluates three lambda chains. This
  * expression is one fused loop over both `ArrayData` buffers with zero
  * allocation, and participates in whole-stage codegen via `doGenCode` —
  * the hot path of brute-force ANN at 100 TB corpus scale.
  *
  * Accumulation is sequential in double precision, numerically identical
  * to the composable version and to DuckDB's `list_dot_product`-based
  * oracle — swapping one for the other cannot change results.
  *
  * Registered through [[GraftExtensions]] (SparkSessionExtensions), the
  * public injection point — usable from SQL as
  * `cosine_similarity(a, b)` and from the Column API via
  * [[CosineSimilarity.cosine_similarity]].
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // always nullable: mismatched dimensions yield NULL even when both
  // inputs are non-nullable (also keeps ev.isNull a real variable in
  // the generated code)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          "cosine_similarity needs two array<float> args, got " +
            s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // mismatched dimensions → NULL, matching the composable zip_with
    // formulation (null-padding propagates) — never a silently wrong
    // prefix similarity
    if (n != y.numElements()) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = (double) $a.getFloat($i);
         |    double $yi = (double) $b.getFloat($i);
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-API entry point (session must carry [[GraftExtensions]]). */
  def cosine_similarity(a: Column, b: Column): Column =
    call_function("cosine_similarity", a, b)
}

/** Engine extensions: custom function registration. Applied by
  * GraftSession; production callers use
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  // builders get no arity checking from the analyzer — wrong-arity SQL
  // calls must raise an analysis-time error, not an IndexOutOfBounds at
  // construction (or silently drop extra args)
  private def checkArity(name: String, n: Int, exprs: Seq[Expression]): Unit =
    if (exprs.length != n)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> name, "expectedNum" -> n.toString,
          "actualNum" -> exprs.length.toString, "docroot" -> ""))

  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (exprs: Seq[Expression]) => {
        checkArity("cosine_similarity", 2, exprs)
        CosineSimilarity(exprs.head, exprs(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => {
        checkArity("simhash64", 1, exprs)
        SimHash64(exprs.head)
      }))
    e.injectFunction((
      new FunctionIdentifier("md5_minhash_sigs"),
      new ExpressionInfo(classOf[Md5MinHashSigs].getName, "md5_minhash_sigs"),
      (exprs: Seq[Expression]) => {
        checkArity("md5_minhash_sigs", 2, exprs)
        Md5MinHashSigs(exprs.head, exprs(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (exprs: Seq[Expression]) => {
        checkArity("sorted_intersect_count", 2, exprs)
        SortedIntersectCount(exprs.head, exprs(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "minhash_sigs"),
      (exprs: Seq[Expression]) => {
        checkArity("minhash_sigs", 2, exprs)
        MinHashSigs(exprs.head, exprs(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("nearest_centroid_idx"),
      new ExpressionInfo(classOf[NearestCentroidIdx].getName, "nearest_centroid_idx"),
      (exprs: Seq[Expression]) => {
        checkArity("nearest_centroid_idx", 3, exprs)
        NearestCentroidIdx(exprs.head, exprs(1), exprs(2))
      }))
    e.injectFunction((
      new FunctionIdentifier("top_centroid_idxs"),
      new ExpressionInfo(classOf[TopCentroidIdxs].getName, "top_centroid_idxs"),
      (exprs: Seq[Expression]) => {
        checkArity("top_centroid_idxs", 4, exprs)
        TopCentroidIdxs(exprs.head, exprs(1), exprs(2), exprs(3))
      }))
    e.injectFunction((
      new FunctionIdentifier("hyperplane_sig"),
      new ExpressionInfo(classOf[HyperplaneSig].getName, "hyperplane_sig"),
      (exprs: Seq[Expression]) => {
        checkArity("hyperplane_sig", 3, exprs)
        HyperplaneSig(exprs.head, exprs(1), exprs(2))
      }))
    e.injectFunction((
      new FunctionIdentifier("deflate_len"),
      new ExpressionInfo(classOf[DeflateLen].getName, "deflate_len"),
      (exprs: Seq[Expression]) => {
        checkArity("deflate_len", 1, exprs)
        DeflateLen(exprs.head)
      }))
    e.injectFunction((
      new FunctionIdentifier("bloom_might_contain_long"),
      new ExpressionInfo(classOf[BloomMightContainLong].getName,
        "bloom_might_contain_long"),
      (exprs: Seq[Expression]) => {
        checkArity("bloom_might_contain_long", 2, exprs)
        BloomMightContainLong(exprs.head, exprs(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("bpe_segment"),
      new ExpressionInfo(classOf[BpeSegment].getName, "bpe_segment"),
      (exprs: Seq[Expression]) => {
        checkArity("bpe_segment", 3, exprs)
        BpeSegment(exprs.head, exprs(1), exprs(2))
      }))
    e.injectFunction((
      new FunctionIdentifier("unigram_segment"),
      new ExpressionInfo(classOf[UnigramSegment].getName, "unigram_segment"),
      (exprs: Seq[Expression]) => {
        checkArity("unigram_segment", 3, exprs)
        UnigramSegment(exprs.head, exprs(1), exprs(2))
      }))
  }
}
