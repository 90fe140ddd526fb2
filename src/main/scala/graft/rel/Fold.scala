package graft.rel

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Andl's single aggregation primitive: `fold(op, expr)` inside a transform
  * (AstFactory.Fold, Andl.Peg/AstFactory.cs:387-400; runtime
  * Builtin.Fold, Andl.Runtime/Builtin.cs:387-395).
  *
  * Foldable ops are binary ops `(T,T)→T` (SymbolTable.cs:455-512):
  * commutative ones (`+ * max min and or xor`, union/intersect on RVAs) fold
  * in any order — these map to native Spark aggregate functions and stay
  * inside whole-stage codegen with map-side partial aggregation.
  * Order-dependent ones (`- / &` concat) are only deterministic under a
  * total order — those go through [[Fold.orderedFold]], which materializes
  * the group as a sorted array and folds it with `functions.aggregate`
  * (still distributed: one array per group, built by a single shuffle).
  */
object Fold {

  /** Builtin commutative folds → native Spark aggregates (codegen'd,
    * partial-aggregation-friendly). Seeds per SymbolTable.GetSeed
    * (SymbolTable.cs:221-256): an empty GLOBAL fold yields the seed, never
    * NULL (grouped folds never see an empty group) — `+` seeds 0, `and`
    * true, `or`/`xor` false, `*` 1. `min`/`max` seed with the TYPE default,
    * which needs the value type: use the `(op, c, dt)` overload where an
    * empty global fold is possible. */
  def fold(op: String, c: Column): Column = op match {
    case "+" | "sum" => coalesce(sum(c), lit(0))
    case "*"         => product(c)
    case "max"       => max(c)
    case "min"       => min(c)
    case "and"       => coalesce(bool_and(c), lit(true))
    case "or"        => coalesce(bool_or(c), lit(false))
    case "xor"       => count_if(c) % 2 === 1
    case other => throw new IllegalArgumentException(s"not a builtin fold: $other")
  }

  /** Seed-safe fold for empty global folds over typed values: coalesces to
    * the per-op seed (type default for min/max, Rel.defaultCol). */
  def fold(op: String, c: Column, dt: org.apache.spark.sql.types.DataType): Column = op match {
    case "max" | "min" => coalesce(fold(op, c), Rel.defaultCol(dt))
    case other         => fold(other, c)
  }

  /** fold(+,1) — the count idiom (Test/SetupSuite.andl:28). */
  def foldCount(): Column = count(lit(1))

  /** fold(+,x)/fold(+,1) — the average idiom (SetupSuite.andl:29). */
  def foldAvg(c: Column): Column = avg(c)

  /** Product aggregate — Spark has no product(); log-space tricks break on
    * zero/negative. A native DeclarativeAggregate with one double buffer
    * slot: O(1) memory per group, map-side partial aggregation, codegen
    * (graft.functions.ProductAgg). Empty group yields the seed 1
    * (SymbolTable.GetSeed). */
  def product(c: Column): Column = coalesce(productWin(c), lit(1.0))

  /** The bare ProductAgg aggregate column (no seed coalesce) — usable with
    * `.over(window)` for running products, where the coalesce must wrap the
    * windowed value, not the aggregate. */
  def productWin(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.GraftExprBridge
    GraftExprBridge.column(
      graft.functions.ProductAgg(GraftExprBridge.expression(c.cast("double")))
        .toAggregateExpression())
  }

  /** Loud ceiling for per-group aggregation buffers in inherently-sequential
    * folds. A degenerate key (one group owning a 100 TB corpus slice) would
    * otherwise OOM one executor mid-build; failing fast with the knob name
    * is the honest behavior for semantics that cannot be decomposed.
    * Session-tunable: `spark.graft.maxFoldGroupRows`. */
  def maxGroupRows: Long =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.maxFoldGroupRows", "4194304").toLong

  /** Wrap a collected-group array with the size guard: evaluating the array
    * past the cap raises a clear error instead of a silent OOM. */
  private def guarded(arr: Column, what: String): Column = {
    val cap = maxGroupRows
    val ok = assert_true(size(arr) <= lit(cap),
      lit(s"$what: group exceeded $cap rows (spark.graft.maxFoldGroupRows) — " +
        "inherently sequential fold over a degenerate group; add a grouping " +
        "key or raise the cap if the group genuinely fits in one buffer"))
    when(ok.isNull, arr)
  }

  /** Order-dependent fold: sort the group by `ord`, then left-fold `value`
    * with `f` starting from `seed`. Deterministic under the given total
    * order (mirror of TransformOrdered, DataTableLocal.cs:589-627).
    * Implemented as array_sort(collect_list(struct)) + functions.aggregate —
    * no UDF, stays in codegen. The group buffer is size-guarded
    * ([[maxGroupRows]]). */
  def orderedFold(ord: Seq[Column], value: Column, seed: Column,
                  f: (Column, Column) => Column): Column = {
    val packed = struct((ord :+ value.as("__v")): _*)
    val sorted = guarded(array_sort(collect_list(packed)), "orderedFold")
    aggregate(sorted, seed, (acc, x) => f(acc, x.getField("__v")))
  }

  /** Ordered string-concat fold: `.order(k).select{fold(&, s)}`.
    * Size-guarded like [[orderedFold]]. */
  def concatFold(ord: Seq[Column], value: Column, sep: String = ""): Column = {
    val packed = struct((ord :+ value.as("__v")): _*)
    array_join(transform(guarded(array_sort(collect_list(packed)), "concatFold"),
      _.getField("__v")), sep)
  }

  /** Generic user-function fold `(T,T)→T` as a typed Aggregator
    * (SURVEY §2.9: reference precedent is a custom SQLite aggregate,
    * SqliteDatabase.cs:233-278). Only parallel-safe when `f` is associative
    * and commutative — same caveat the reference's ANY flag encodes. */
  def userFold[T](z: T, f: (T, T) => T)(implicit enc: Encoder[T]): Aggregator[T, T, T] =
    new Aggregator[T, T, T] {
      override def zero: T = z
      override def reduce(b: T, a: T): T = f(b, a)
      override def merge(b1: T, b2: T): T = f(b1, b2)
      override def finish(r: T): T = r
      override def bufferEncoder: Encoder[T] = enc
      override def outputEncoder: Encoder[T] = enc
    }

  /** fold(union, rva) — set-union of relation-valued attributes across a
    * group (used for nesting, Sample/sample3.andl:30-33). */
  def foldUnionRva(rva: Column): Column =
    array_sort(array_distinct(flatten(collect_list(rva))))
}
