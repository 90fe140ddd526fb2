package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.GraftExprBridge
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a serialized
  * [[org.apache.spark.util.sketch.BloomFilter]] carried as a literal in
  * the plan — the zero-UDF way to apply a driver-built Bloom filter
  * map-side (`might_contain`'s internal cousin is not in the public
  * registry). The filter deserializes ONCE per task (identity-cached on
  * the literal's byte array, which task deserialization interns), so the
  * per-row cost is the probe alone. No false negatives, ≤ fpp false
  * positives — callers must exact-verify survivors when they need
  * exactness. */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_contains needs (binary, bigint), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  @transient private var cachedBytes: AnyRef = _
  @transient private var cachedFilter: BloomFilter = _
  private def filterFor(b: Array[Byte]): BloomFilter = {
    if (!(b eq cachedBytes)) {
      cachedFilter = BloomFilter.readFrom(new java.io.ByteArrayInputStream(b))
      cachedBytes = b
    }
    cachedFilter
  }

  /** The per-row kernel, shared by interpreted eval and generated code
    * (keeps the surrounding operator inside whole-stage codegen — the r18
    * CodegenFallback form demoted the whole filter stage). */
  def probe(filterBytes: Array[Byte], value: Long): Boolean =
    filterFor(filterBytes).mightContainLong(value)

  override def nullSafeEval(filterBytes: Any, value: Any): Any =
    probe(filterBytes.asInstanceOf[Array[Byte]], value.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", this, classOf[BloomContains].getName)
    nullSafeCodeGen(ctx, ev, (f, v) => s"${ev.value} = $ref.probe($f, $v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}

object BloomContains {
  def apply(filterBytes: Array[Byte], value: Column): Column =
    GraftExprBridge.column(BloomContains(
      org.apache.spark.sql.catalyst.expressions.Literal(filterBytes),
      GraftExprBridge.expression(value)))

  /** Serialize a built filter for embedding as a plan literal. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
}
