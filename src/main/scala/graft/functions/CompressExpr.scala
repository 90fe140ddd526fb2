package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  * repo's zero-UDF / codegen-path policy — [[CodegenFallback]] keeps the
  * surrounding projection in codegen and makes one interpreted call per
  * row, the same tier as the fused hashers). Deterministic: fixed level,
  * default strategy, no preset dictionary; only the deflated LENGTH is
  * used, never the byte stream. Empty strings report 1.0 (nothing to
  * compress); null propagates. */
case class DeflateRatio(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deflate_ratio needs string, got ${other.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
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

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

object DeflateRatio {
  def apply(text: Column): Column =
    GraftExprBridge.column(DeflateRatio(GraftExprBridge.expression(text)))
}
