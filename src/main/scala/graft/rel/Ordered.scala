package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType
import graft.rel.Checkpoint.PinOps

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
final case class OrderSpec(groupBy: Seq[String], sort: Seq[Column],
                           rawSort: Seq[Column] = Nil) {
  /** The partitioned window for this spec. UNGROUPED specs refuse loudly:
    * `Window.orderBy` with no partition is the single-partition WindowExec
    * that serializes the whole relation through one task — every ungrouped
    * global-order transform in this engine lowers through
    * [[graft.rel.Segmented]] (running folds, offsets, collapse) or
    * [[Ordered.withGlobalOrdinal]] (ordinals) instead, and no caller — the
    * DSL included — gets to build the unscalable plan by accident. */
  def window: WindowSpec =
    if (groupBy.isEmpty)
      throw new IllegalArgumentException(
        "ungrouped OrderSpec: a global-order window would run single-" +
          "partition (unscalable). Use graft.rel.Segmented (running folds/" +
          "offsets/collapse) or Ordered.withGlobalOrdinal (ordinals) for " +
          "ungrouped ordered transforms, or add a % group key")
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
    * row (Sample/sample5.andl:8-27 running totals). Order-dependent folds
    * (`&` concat, `*`) run over the running frame too — deterministic
    * because the frame iterates in window order. */
  def runningFold(op: String, c: Column, spec: OrderSpec): Column = op match {
    case "+" | "sum" => sum(c).over(spec.running)
    case "max"       => max(c).over(spec.running)
    case "min"       => min(c).over(spec.running)
    case "count"     => count(lit(1)).over(spec.running)
    case "&"         => array_join(collect_list(c).over(spec.running), "")
    case "*"         => aggregate(collect_list(c.cast("double")).over(spec.running),
                          lit(1.0), (acc, x) => acc * x)
    case other => throw new IllegalArgumentException(s"no running fold: $other")
  }

  /** The reference's ordered TRANSFORM with group-collapse (TransformOrdered,
    * DataTableLocal.cs:589-627): rows stream in sort order with running fold
    * accumulators (reset at `%`-group breaks); a computed row is emitted only
    * when the NEXT row changes some non-fold output value or the group ends
    * — so within a run of identical non-fold values only the LAST row (the
    * completed running fold = subtotal) survives. `.order(%CITY).select{CITY,
    * SS:=fold(+,STATUS)}` → one subtotal row per city; with no non-fold
    * columns and no grouping the whole relation collapses to one total row
    * (Sample/sample5.andl:7-18; SuiteRelOrder.andl:17-26 relies on exactly
    * this to lift ordered concat folds to scalars).
    *
    * Spark plan: one shuffle on the group keys, windowed running folds +
    * a `lead` run-boundary test, then a filter — no second shuffle, no
    * driver involvement, codegen throughout.
    *
    * @param nonFold (name, expr) output attributes evaluated per row
    * @param folds   (name, op, value) running folds (op per [[runningFold]])
    */
  def transformOrdered(r: Rel, spec: OrderSpec,
                       nonFold: Seq[(String, Column)],
                       folds: Seq[(String, String, Column)]): Rel = {
    if (spec.groupBy.isEmpty) {
      // ungrouped: segmented lowering — global ordinal + per-partition
      // running folds with prefix carry; run-collapse via ordinal self-join
      // (no single-partition window; see graft.rel.Segmented)
      val (prep, seg) = Segmented.prepare(r.df, spec.sort)
      val computed = nonFold ++ folds.map { case (n, op, c) =>
        (n, seg.runningFold(op, c))
      }
      val frame = seg.materialize(prep)
      val withCols = computed.foldLeft(frame) { case (d, (n, c)) => d.withColumn(n, c) }
      return Rel.bag(seg.collapseRuns(withCols, nonFold.map(_._1), computed.map(_._1)))
    }
    val computed = nonFold.map { case (n, c) => (n, c) } ++
      folds.map { case (n, op, c) => (n, runningFold(op, c, spec)) }
    val withCols = computed.foldLeft(r.df) { case (d, (n, c)) => d.withColumn(n, c) }
    // emit iff last row of its run: next row (window order) differs in a
    // non-fold output, or there is no next row in the partition (group end —
    // lead returns NULL there, and NULL is never <=>-equal to a no-NULL value)
    val lastOfRun = nonFold
      .map { case (n, _) => !(lead(col(n), 1).over(spec.window) <=> col(n)) }
      .reduceOption(_ || _)
      .getOrElse(lead(lit(1), 1).over(spec.window).isNull)
    Rel.bag(withCols.withColumn("__emit", lastOfRun)
      .filter(col("__emit"))
      .select(computed.map { case (n, _) => col(n) }: _*))
  }

  /** ord(): 1-based ordinal of the row under the order spec
    * (Builtin.Ordinal, Builtin.cs:339-343 — reference returns the INPUT
    * ordinal; we return the ordinal under the explicit total order, which is
    * what every reference test observes since they always sort first).
    * Grouped specs only (`spec.window` refuses ungrouped) — for a GLOBAL
    * ordinal use [[withGlobalOrdinal]] / [[Segmented]] instead. */
  def ord(spec: OrderSpec): Column = row_number().over(spec.window)

  /** Scale-safe 1-based GLOBAL ordinal under a total order — the two-pass
    * zipWithIndex pattern, never a single-partition window: range-partition
    * by the sort keys (global order across partitions), sort within each,
    * number rows per physical partition with a PARTITIONED window, then add
    * the exclusive prefix-sum of per-partition counts. The count pass is
    * O(numPartitions) driver work (bounded by cluster size, not data size).
    * The ranged frame is localCheckpointed so the count pass and the
    * numbering pass see the SAME physical partitioning (range-boundary
    * sampling is not deterministic across separate executions). */
  def withGlobalOrdinal(df: DataFrame, sort: Seq[Column], out: String,
                        keepPid: Option[String] = None): DataFrame = {
    require(sort.nonEmpty, "global ordinal needs a total order")
    val ranged = df.repartitionByRange(sort: _*).sortWithinPartitions(sort: _*)
      .withColumn("__go_pid", spark_partition_id())
      .pin()
    val counts = ranged.groupBy("__go_pid").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.map(_._2).scanLeft(0L)(_ + _).init
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = counts.map(_._1).zip(offsets).toSeq.toDF("__go_pid", "__go_off")
    val w = Window.partitionBy("__go_pid").orderBy(sort: _*)
    val numbered = ranged.join(broadcast(offDf), Seq("__go_pid"), "left")
      .withColumn(out, row_number().over(w).cast("long") +
        coalesce(col("__go_off"), lit(0L)))
      .drop("__go_off")
    keepPid match {
      case Some(p) => numbered.withColumnRenamed("__go_pid", p)
      case None => numbered.drop("__go_pid")
    }
  }

  /** ordg(): every row gets the GLOBAL ordinal of its group's FIRST row
    * under the full order (Builtin.OrdinalGroup, Builtin.cs:346-350 →
    * DataRow.Ordinal(true), DataRow.cs:252-255 → OrderedIndex.Offset(row,
    * 0,Absolute), OrderedIndex.cs:129-147 — the reference returns the INPUT
    * ordinal of the group's first row in its index sorted by all spec
    * segments; we return the 1-based position under the explicit total
    * order (groupKeys then sort), the same documented deviation as
    * [[ord]]). Built on [[withGlobalOrdinal]] + a per-GROUP min window —
    * no single-partition window anywhere, so it survives any scale. */
  def withOrdg(df: DataFrame, spec: OrderSpec, out: String): DataFrame = {
    if (spec.groupBy.isEmpty)
      return df.withColumn(out, lit(1L)) // one group: its first row is row 1
    val tmp = "__go_ordg"
    withGlobalOrdinal(df, spec.groupBy.map(col) ++ spec.sort, tmp)
      .withColumn(out, min(col(tmp)).over(Window.partitionBy(spec.groupBy.map(col): _*)))
      .drop(tmp)
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
  * array_sort cannot express. The reference's TransformOrdered
  * group-collapse itself is [[Ordered.transformOrdered]]. */
object OrderedFold {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** Size guard on the whole-group window buffer — same cap and failure
    * mode as [[Fold.maxGroupRows]]: fail loud, never OOM silently. */
  private def guarded(arr: Column, what: String): Column = {
    val cap = Fold.maxGroupRows
    val ok = assert_true(size(arr) <= lit(cap),
      lit(s"$what: window group exceeded $cap rows " +
        "(spark.graft.maxFoldGroupRows) — inherently sequential fold over a " +
        "degenerate group; add a grouping key or raise the cap"))
    when(ok.isNull, arr)
  }

  /** fold(&, value) under spec — ordered string concat. */
  def concat(value: Column, spec: OrderSpec, sep: String = ""): Column =
    array_join(guarded(collect_list(value).over(spec.whole), "OrderedFold.concat"), sep)

  /** Generic ordered left-fold under spec. */
  def fold(value: Column, spec: OrderSpec, seed: Column,
           f: (Column, Column) => Column): Column =
    aggregate(guarded(collect_list(value).over(spec.whole), "OrderedFold.fold"), seed, f)
}
