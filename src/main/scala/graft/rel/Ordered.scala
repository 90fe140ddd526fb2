package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** `.order(%G, -A, B)` ordered transforms: running aggregates, per-group
  * subtotals, and window offset functions (SURVEY §2.5; reference
  * TransformOrdered, Andl.Runtime/DataTableLocal.cs:589-627, over an
  * OrderedIndex, OrderedIndex.cs:74-170).
  *
  * `%` marks grouped (partition-boundary) terms, `-` descending
  * (Andl.grammar.peg:189-195). The reference breaks ties by input ordinal
  * (ArrayComparer, OrderedIndex.cs:45-55); we require the caller to supply a
  * total order (append a key column) — at cluster scale "input ordinal" is
  * not a stable notion, and every reference test orders by a key anyway.
  *
  * All of this maps to built-in window functions: one shuffle on the
  * partition keys, then sorted streaming within each partition — the plan
  * Spark would pick for any windowed query, with whole-stage codegen.
  */
final case class OrderSpec(groupBy: Seq[String], sort: Seq[Column]) {
  def window: WindowSpec =
    if (groupBy.isEmpty) Window.orderBy(sort: _*)
    else Window.partitionBy(groupBy.map(col): _*).orderBy(sort: _*)

  /** Running frame: unbounded-preceding → current row (the only implicit
    * frame the reference has besides whole-group). */
  def running: WindowSpec =
    window.rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** Whole-group frame (nth / whole-partition aggregates). */
  def whole: WindowSpec =
    window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
}

object Ordered {

  /** Running fold: fold values from the start of the group to the current
    * row (Sample/sample5.andl:8-27 running totals). */
  def runningFold(op: String, c: Column, spec: OrderSpec): Column = op match {
    case "+" | "sum" => sum(c).over(spec.running)
    case "max"       => max(c).over(spec.running)
    case "min"       => min(c).over(spec.running)
    case "count"     => count(lit(1)).over(spec.running)
    case other => throw new IllegalArgumentException(s"no running fold: $other")
  }

  /** ord(): 1-based ordinal of the row under the order spec
    * (Builtin.Ordinal, Builtin.cs:339-343 — reference returns the INPUT
    * ordinal; we return the ordinal under the explicit total order, which is
    * what every reference test observes since they always sort first). */
  def ord(spec: OrderSpec): Column = row_number().over(spec.window)

  /** ordg(): ordinal of the group's FIRST row under the full order
    * (Builtin.OrdinalGroup, Builtin.cs:346-350 → DataRow.Ordinal(true),
    * DataRow.cs:252-255 → OrderedIndex.Offset(row,0,Absolute),
    * OrderedIndex.cs:129-147 — the reference returns the INPUT ordinal of
    * the group's first row in its index sorted by all spec segments; we
    * return the 1-based position under the explicit total order
    * (groupKeys then sort), the same documented deviation as [[ord]]).
    * Scale note: like ungrouped [[ord]], the global row_number is a
    * single-partition window — reference semantics are inherently a total
    * order; use only where the reference language would (presentation /
    * small ordered transforms). */
  def ordg(spec: OrderSpec): Column = {
    val global = Window.orderBy(spec.groupBy.map(col) ++ spec.sort: _*)
    first(row_number().over(global)).over(spec.whole)
  }

  /** lag with NO-NULL discipline: outside the group returns the column's
    * type default, never null (DataRow.cs:242-249). */
  def lagD(c: Column, n: Int, dt: DataType, spec: OrderSpec): Column =
    coalesce(lag(c, n).over(spec.window), Rel.defaultCol(dt))

  /** lead, default-not-null at the group edge. */
  def leadD(c: Column, n: Int, dt: DataType, spec: OrderSpec): Column =
    coalesce(lead(c, n).over(spec.window), Rel.defaultCol(dt))

  /** nth(a,n): value of the n-th row of the group (0-based, absolute),
    * default if the group is smaller (Builtin.cs:353-371). */
  def nthD(c: Column, n: Int, dt: DataType, spec: OrderSpec): Column =
    coalesce(nth_value(c, n + 1).over(spec.whole), Rel.defaultCol(dt))

  /** rank: reference is a stub returning n+1 (Builtin.Rank:374-380);
    * we exceed it with real rank semantics. */
  def rank(spec: OrderSpec): Column =
    org.apache.spark.sql.functions.rank().over(spec.window)
}

/** Ordered folds over an arbitrary OrderSpec (any mix of asc/desc keys):
  * collect the group IN WINDOW ORDER (collect_list over the whole-group
  * frame of an ordered window iterates rows in sort order), then fold the
  * array. This is the general path for order-dependent folds (`- / &`,
  * user fns) that [[graft.rel.Fold.concatFold]]'s ascending-only
  * array_sort cannot express. Used with transform+dedup it reproduces the
  * reference's TransformOrdered group-collapse ("subtotal" rows,
  * DataTableLocal.cs:616-624). */
object OrderedFold {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** fold(&, value) under spec — ordered string concat. */
  def concat(value: Column, spec: OrderSpec, sep: String = ""): Column =
    array_join(collect_list(value).over(spec.whole), sep)

  /** Generic ordered left-fold under spec. */
  def fold(value: Column, spec: OrderSpec, seed: Column,
           f: (Column, Column) => Column): Column =
    aggregate(collect_list(value).over(spec.whole), seed, f)
}
