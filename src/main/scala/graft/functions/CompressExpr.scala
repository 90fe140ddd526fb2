package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.GraftExprBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** zlib compression ratio of a document: deflated size / raw size — the
  * classic repetition-and-entropy quality signal (highly repetitive spam
  * compresses to a small fraction; random/encrypted junk compresses to
  * ~1). Production corpus filters threshold on exactly this ratio.
  *
  * A native expression because the work is per-row byte crunching no
  * Column combinator can express without a UDF (which would break the
  * repo's zero-UDF / codegen-path policy). The generated code calls the
  * instance directly (addReferenceObj) so the containing operator stays
  * inside whole-stage codegen — the r18 CodegenFallback form demoted the
  * whole projection to the interpreted path. Deterministic: fixed level,
  * default strategy, no preset dictionary; only the deflated LENGTH is
  * used, never the byte stream. Empty strings report 1.0 (nothing to
  * compress); null propagates. */
case class DeflateRatio(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deflate_ratio needs string, got ${other.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"

  /** The per-row kernel, shared by interpreted eval and generated code. */
  def ratioOf(u: UTF8String): Double = {
    val bytes = u.getBytes
    if (bytes.isEmpty) 1.0
    else {
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
      try {
        d.setInput(bytes)
        d.finish()
        val buf = new Array[Byte](8192)
        var total = 0L
        while (!d.finished()) total += d.deflate(buf)
        total.toDouble / bytes.length
      } finally d.end()
    }
  }

  override def nullSafeEval(input: Any): Any =
    ratioOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dr", this, classOf[DeflateRatio].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.ratioOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

object DeflateRatio {
  def apply(text: Column): Column =
    GraftExprBridge.column(DeflateRatio(GraftExprBridge.expression(text)))
}
