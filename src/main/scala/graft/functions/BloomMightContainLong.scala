package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral, JavaCode, TrueLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: probe a serialized
  * `org.apache.spark.util.sketch.BloomFilter` with a long key — the
  * map-side prune of a two-phase "Bloom then exact-confirm" join
  * (TextOps.decontaminateBloom), the same shape Spark's own runtime
  * row-level filtering injects for shuffle joins.
  *
  * The filter argument must be FOLDABLE (a driver-built filter entering
  * the plan as a binary literal — the IVF-centroid "model as literal"
  * pattern): it is deserialized ONCE per expression instance, never per
  * row, and enters generated code as a reference object. Keys are
  * hashed longs (`xxhash64`), matching the sketch's `putLong` path —
  * probing costs no per-row string allocation.
  *
  * Guarantee: false positives only, NEVER false negatives — a
  * downstream exact join may therefore confirm survivors without losing
  * matches, keeping two-phase results bit-identical to the one-phase
  * exact operator. A null/absent filter yields NULL (not false): a
  * missing model must not silently claim "no matches".
  */
case class BloomMightContainLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = bloom == null || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) if left.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, LongType) =>
        TypeCheckResult.TypeCheckFailure(
          "bloom_might_contain_long needs a FOLDABLE (literal) serialized " +
            "filter — build it on the driver and pass it as a literal")
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          "bloom_might_contain_long needs (binary, bigint) args, got " +
            s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }

  // deserialized once per expression instance (foldable left); null when
  // the literal itself is null
  @transient private lazy val bloom: BloomFilter = {
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    if (bytes == null) null
    else BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def eval(input: InternalRow): Any = {
    if (bloom == null) return null
    val v = right.eval(input)
    if (v == null) null else bloom.mightContainLong(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (bloom == null) {
      // constant-null filter → constant-null result
      ev.copy(code = code"", isNull = TrueLiteral,
        value = JavaCode.defaultLiteral(dataType))
    } else {
      val bf = ctx.addReferenceObj("graftBloomFilter", bloom,
        classOf[BloomFilter].getName)
      val keyGen = right.genCode(ctx)
      if (right.nullable) {
        ev.copy(code =
          code"""
            ${keyGen.code}
            boolean ${ev.isNull} = ${keyGen.isNull};
            boolean ${ev.value} = false;
            if (!${ev.isNull}) {
              ${ev.value} = $bf.mightContainLong(${keyGen.value});
            }
          """)
      } else {
        ev.copy(code =
          code"""
            ${keyGen.code}
            boolean ${ev.value} = $bf.mightContainLong(${keyGen.value});
          """, isNull = FalseLiteral)
      }
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BloomMightContainLong {
  /** Column-API entry point (session must carry [[GraftExtensions]]). */
  def bloom_might_contain_long(filter: Column, key: Column): Column =
    call_function("bloom_might_contain_long", filter, key)
}
