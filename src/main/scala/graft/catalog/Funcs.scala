package graft.catalog

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType, StructField}
import graft.types.AndlTypes

/** Typed user-defined function: `def f(a:T,...) => expr`
  * (AstFactory.Deffun, Andl.Peg/AstFactory.cs:132-155). The body is an ANSI
  * SQL expression over the named parameters — registered as a Spark SQL UDF
  * (`CREATE FUNCTION ... RETURN <expr>`), so it inlines into Catalyst plans
  * like any native expression (no JVM closure, full codegen/pushdown) and
  * persists as plain text across sessions — the same property the
  * reference gets from storing compiled ExpressionBlocks in its catalog
  * (Catalog.cs:93-128).
  *
  * A function typed (T,T)→T is FOLDABLE (AstFactory.cs:147-149, tested by
  * Test/SuiteRelFold.andl:73-77): see [[FunDef.fold]].
  */
final case class FunDef(name: String,
                        args: Seq[(String, DataType)],
                        returns: DataType,
                        body: String) {
  def arity: Int = args.length
  def argTypes: Seq[DataType] = args.map(_._2)

  /** Foldable iff binary with both args and result the same type. */
  def foldable: Boolean = arity == 2 && argTypes.forall(_ == returns)

  def ddl(sqlName: String): String = {
    val params = args.map { case (n, t) => s"$n ${AndlTypes.ddlOf(t)}" }.mkString(", ")
    s"CREATE OR REPLACE TEMPORARY FUNCTION $sqlName($params) RETURNS ${AndlTypes.ddlOf(returns)} RETURN $body"
  }

  /** DDL for the fold companion of a foldable function: a UDF over the
    * collected group array whose body is `aggregate(arr, seed, (a,b) ->
    * body)` with the lambda parameters named exactly like the function's
    * own parameters, so the body text binds to them directly. Needed
    * because a SQL UDF CALL inside a higher-order-function lambda does not
    * analyze (its inlined parameters escape the lambda scope) — inlining
    * the body into the lambda at DDL time sidesteps that. */
  def foldDdl(foldSqlName: String): String = {
    val t = AndlTypes.ddlOf(returns)
    val (n1, n2) = (args(0)._1, args(1)._1)
    s"CREATE OR REPLACE TEMPORARY FUNCTION $foldSqlName(arr ARRAY<$t>) RETURNS $t " +
      s"RETURN aggregate(arr, CAST(${FunDef.sqlDefault(returns)} AS $t), ($n1, $n2) -> $body)"
  }
}

object FunDef {
  /** SQL literal for the type's default value — the fold seed for user
    * functions (no-NULL discipline; Symbol.GetSeed, SymbolTable.cs:221-256). */
  def sqlDefault(dt: DataType): String = dt match {
    case org.apache.spark.sql.types.StringType    => "''"
    case org.apache.spark.sql.types.BooleanType   => "false"
    case org.apache.spark.sql.types.BinaryType    => "X''"
    case org.apache.spark.sql.types.TimestampType => "TIMESTAMP '0001-01-01 00:00:00'"
    case org.apache.spark.sql.types.DateType      => "DATE '0001-01-01'"
    case _                                        => "0"
  }
}

/** A FunDef bound to its registered SQL name (overloads get mangled names —
  * SQL functions cannot overload; resolution happens in the Catalog, which
  * mirrors SymbolTable.AddOverload, Andl.Peg/SymbolTable.cs:345-359). */
final case class RegisteredFun(fd: FunDef, sqlName: String) {
  /** Invoke as a Column expression. */
  def apply(cols: Column*): Column = {
    require(cols.length == fd.arity, s"${fd.name} expects ${fd.arity} args")
    call_function(sqlName, cols: _*)
  }

  def foldSqlName: String = s"${sqlName}__fold"

  /** Use a (T,T)→T function as a fold (aggregate): left-fold the group's
    * values through the function starting from the type-default seed —
    * exactly the reference's accumulator chain (Builtin.Fold,
    * Builtin.cs:387-395). Deterministic for commutative+associative f, or
    * for any f when `ord` sort columns are supplied (ordered fold,
    * TransformOrdered semantics). Implemented by the `__fold` companion
    * UDF (see [[FunDef.foldDdl]]). */
  def fold(value: Column, ord: Seq[Column] = Nil): Column = {
    require(fd.foldable, s"${fd.name} is not foldable: ${fd.args} → ${fd.returns}")
    val arr =
      if (ord.isEmpty) collect_list(value.cast(fd.returns))
      else {
        val packed = struct((ord :+ value.cast(fd.returns).as("__v")): _*)
        transform(array_sort(collect_list(packed)), x => x.getField("__v"))
      }
    call_function(foldSqlName, arr)
  }
}

/** User-defined type with ordered components and value semantics
  * (TypedValue.cs:631-709, DataType.cs:406-470): a named StructType column
  * plus constructor / component selectors. Struct equality and struct
  * ordering give the reference's value semantics for free. */
final case class UdtDef(name: String, components: Seq[(String, DataType)]) {
  def sparkType: StructType =
    StructType(components.map { case (n, t) => StructField(n, t, nullable = false) })

  /** Constructor: `ust1(23,'x')` (Builtin.UserSelector, Builtin.cs:318-321). */
  def construct(args: Column*): Column = {
    require(args.length == components.length,
      s"$name expects ${components.length} components")
    struct(args.zip(components).map { case (c, (n, t)) => c.cast(t).as(n) }: _*)
  }

  /** Component getter `u.C1` (LDCOMP opcode, Evaluator.cs:256-260). */
  def get(u: Column, component: String): Column = {
    require(components.exists(_._1 == component), s"$name has no $component")
    u.getField(component)
  }
}

object UdtDef {
  /** Subtype: one component named `super` of the base type
    * (AstFactory.SubType, Andl.Peg/AstFactory.cs:100-105; the built-in
    * `date` is a subtype of `time`, Builtin.cs:1022-1048). */
  def subtype(name: String, base: DataType): UdtDef =
    UdtDef(name, Seq("super" -> base))
}
