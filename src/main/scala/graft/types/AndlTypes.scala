package graft.types

import org.apache.spark.sql.types._

/** Andl ↔ Spark scalar type bridge (SURVEY §1.2; reference type registry
  * Andl.Runtime/DataType.cs:50-131). `number` maps to double — a documented
  * deviation from the C# 128-bit decimal; exact-aggregation paths cast to
  * DecimalType(18,x) explicitly where parallel summation order could leak
  * (Queries numeric-determinism policy). */
object AndlTypes {

  val toSpark: Map[String, DataType] = Map(
    "text"   -> StringType,
    "number" -> DoubleType,
    "time"   -> TimestampType,
    "bool"   -> BooleanType,
    "binary" -> BinaryType)

  /** Andl type name (or Spark DDL as fallback) → Spark type. */
  def sparkOf(name: String): DataType =
    toSpark.getOrElse(name.trim.toLowerCase, DataType.fromDDL(name))

  /** Spark type → Andl name; non-Andl types render as Spark DDL
    * (schema(r) shows nested/array attrs truthfully). */
  def nameOf(dt: DataType): String = dt match {
    case StringType       => "text"
    case DoubleType       => "number"
    case TimestampType    => "time"
    case TimestampNTZType => "time" // Andl time has no tz (TypedValue.cs:352-407)
    case BooleanType      => "bool"
    case BinaryType       => "binary"
    case other            => other.sql.toLowerCase
  }

  /** DDL rendering for SQL UDF signatures. */
  def ddlOf(dt: DataType): String = dt.sql
}
