package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: DEFLATE-compressed length of a string or
  * binary column (zlib raw deflate, default level).
  *
  * The compression-ratio quality signal the Gopher/CCNet filter family
  * uses: text that compresses far better than prose is repetitive
  * boilerplate (keyword stuffing, template spam), text that barely
  * compresses is high-entropy noise (minified blobs, base64, OCR
  * garbage) — both are cut candidates for a training corpus. zlib is
  * deterministic for a given input and level, so the signal is
  * run/partition-stable (but NOT portable across engines — the derived
  * query is gate-checked rows-only, with value determinism pinned in
  * ScalaTest against a driver-side reference).
  *
  * One JNI deflate call per row on a thread-local `Deflater` (reset,
  * never reallocated — allocating one per row would dominate the scan);
  * no per-row allocation beyond the shared scratch buffer.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deflate_len needs string or binary, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input match {
      case s: UTF8String => s.getBytes
      case b: Array[Byte] => b
    }
    Integer.valueOf(DeflateLen.deflatedLen(bytes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bytes = if (child.dataType == StringType) s"$a.getBytes()" else a
      s"${ev.value} = graft.functions.DeflateLen.deflatedLen($bytes);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateLen {
  private val local = new ThreadLocal[(Deflater, Array[Byte])] {
    // nowrap=true: raw DEFLATE stream, no zlib header/checksum — the
    // 6-byte envelope would blur ratios on short documents
    override def initialValue(): (Deflater, Array[Byte]) =
      (new Deflater(Deflater.DEFAULT_COMPRESSION, true), new Array[Byte](8192))
  }

  /** Compressed byte count of `bytes` under raw DEFLATE, default level.
    * Called per row from both the interpreted and codegen paths. */
  def deflatedLen(bytes: Array[Byte]): Int = {
    val (d, buf) = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  /** Column-API entry point (session must carry [[GraftExtensions]]). */
  def deflate_len(c: Column): Column = call_function("deflate_len", c)
}
