package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Coalesce, Expression, Literal, Multiply}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native product aggregate — `fold(*, x)` (reference Builtin.Fold with the
  * `*` op, Andl.Runtime/Builtin.cs:387-395; seed 1 per SymbolTable.GetSeed,
  * SymbolTable.cs:221-256).
  *
  * Spark has no product() aggregate; the previous lowering collected the
  * group into one array buffer and multiplied it (O(group) executor memory —
  * a degenerate key owning a large corpus slice OOMs the buffer). This is a
  * DeclarativeAggregate with a single double buffer slot: O(1) memory,
  * map-side partial aggregation, whole-stage codegen — the same shape as
  * Spark's own Sum. Null inputs are ignored (SQL aggregate discipline);
  * empty/all-null groups evaluate to null, callers coalesce the seed. */
case class ProductAgg(child: Expression) extends DeclarativeAggregate
    with UnaryLike[Expression] {

  override def prettyName: String = "graft_product"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_product needs a double input, got ${child.dataType}")

  private lazy val prod = AttributeReference("prod", DoubleType)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(prod)
  override lazy val initialValues: Seq[Expression] = Seq(Literal(null, DoubleType))

  // null-safe multiply: skip null inputs, adopt the first non-null value
  override lazy val updateExpressions: Seq[Expression] =
    Seq(Coalesce(Seq(Multiply(prod, child), child, prod)))

  override lazy val mergeExpressions: Seq[Expression] =
    Seq(Coalesce(Seq(Multiply(prod.left, prod.right), prod.right, prod.left)))

  override lazy val evaluateExpression: Expression = prod

  override protected def withNewChildInternal(newChild: Expression): ProductAgg =
    copy(child = newChild)
}
