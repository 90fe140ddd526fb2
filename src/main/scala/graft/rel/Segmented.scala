package graft.rel

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scale-safe lowering for UNGROUPED ordered transforms — the reference's
  * TransformOrdered with no `%` group (DataTableLocal.cs:589-627 walks the
  * whole table in sort order) and the window offset builtins over a global
  * order (Builtin.cs:339-371).
  *
  * A naive Spark lowering is `Window.orderBy(sort)` — a SINGLE-partition
  * window that serializes the whole relation through one task (the one
  * WindowExec Spark warns about with "No Partition Defined"). This class
  * replaces it with the segmented pattern built on
  * [[Ordered.withGlobalOrdinal]]:
  *
  *   1. range-partition by the sort keys + sort within partitions, pin, and
  *      number rows with a global ordinal `__seg_go` (two-pass zipWithIndex —
  *      driver work is O(numPartitions), never O(rows));
  *   2. run every window PARTITIONED by the physical partition id
  *      `__seg_pid` (each task streams its own sorted slice);
  *   3. stitch partition boundaries back together with per-partition
  *      carry-out values: running folds add the combined total of all PRIOR
  *      partitions (an O(numPartitions) driver scan joined back broadcast),
  *      offset functions (lag/lead/nth) resolve through equi-self-joins on
  *      the ordinal, whole-relation folds become ordinary one-row
  *      aggregates.
  *
  * Column-producing methods REGISTER what they need and return columns over
  * names that [[materialize]] later joins/derives onto the prepared frame —
  * the same compile-then-materialize shape Catalyst itself uses. Only
  * decomposable folds get the distributed path; inherently sequential user
  * folds buffer the relation in one aggregation buffer behind a loud size
  * guard ([[Segmented.maxBufferRows]]) — the honest cost of non-associative
  * semantics, failed fast instead of OOMing an executor.
  */
final class Segmented private[rel] () {
  val goName = "__seg_go"
  val pidName = "__seg_pid"
  private def go = col(goName)
  private def pid = col(pidName)
  private def pidW = Window.partitionBy(pid).orderBy(go)
  private def running = pidW.rowsBetween(Window.unboundedPreceding, Window.currentRow)

  private var k = 0
  private def fresh(tag: String): String = { k += 1; s"__seg_${tag}_$k" }

  /** Per-partition running fold whose cross-partition carry is the exclusive
    * prefix-combine of per-partition totals (totals = the running value of
    * each partition's LAST row, via max_by). The neutral is `null` for every
    * op (combine treats null as identity; corrected expressions coalesce),
    * so the prefix column's type is derived from the local running column's
    * resolved schema at materialize time — no type bookkeeping here. */
  private case class Prefix(name: String, localName: String, local: Column,
                            combine: (Any, Any) => Any)
  /** Whole-relation one-row aggregate, joined back broadcast. */
  private case class Whole(name: String, agg: Column)
  /** Value of the row at ordinal `go - shift` (provider row's go + shift =
    * consumer row's go): lag(n) is shift +n, lead(n) is shift -n. */
  private case class Offset(name: String, value: Column, shift: Int)
  /** Value of the global n-th row (0-based). */
  private case class NthRow(name: String, value: Column, n: Int)

  private val prefixes = mutable.Buffer[Prefix]()
  private val wholes = mutable.Buffer[Whole]()
  private val offsets = mutable.Buffer[Offset]()
  private val nths = mutable.Buffer[NthRow]()
  private var buffersWholeRelation = false
  private def guardBuffer(): Unit = buffersWholeRelation = true

  // ------------------------------------------------------------ driver math
  /** Type-generic numeric add/multiply — the per-partition totals come back
    * with whatever type Spark's aggregate resolved to (sum(int)→long,
    * sum(double)→double, …). */
  private def addAny(a: Any, b: Any): Any = (a, b) match {
    case (x: java.lang.Long, y: java.lang.Long)       => x + y
    case (x: java.lang.Double, y: java.lang.Double)   => x + y
    case (x: java.lang.Integer, y: java.lang.Integer) => x + y
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.add(y)
    case (x: Number, y: Number) => x.doubleValue + y.doubleValue
  }
  private def mulAny(a: Any, b: Any): Any = (a, b) match {
    case (x: java.lang.Long, y: java.lang.Long)       => x * y
    case (x: java.lang.Double, y: java.lang.Double)   => x * y
    case (x: java.lang.Integer, y: java.lang.Integer) => x * y
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.multiply(y)
    case (x: Number, y: Number) => x.doubleValue * y.doubleValue
  }
  private def anyL(a: Any): Long = a.asInstanceOf[Number].longValue
  private def anyS(a: Any): String = a.asInstanceOf[String]
  private def anyB(a: Any): Boolean = a.asInstanceOf[Boolean]
  private def cmpComb(takeMax: Boolean): (Any, Any) => Any = (a, b) => {
    val c = a.asInstanceOf[java.lang.Comparable[Any]].compareTo(b)
    if ((c >= 0) == takeMax) a else b
  }

  private def reg(tag: String, local: Column,
                  combine: (Any, Any) => Any): (Column, Column) = {
    val p = Prefix(fresh(s"pfx_$tag"), fresh(s"loc_$tag"), local, combine)
    prefixes += p
    (col(p.name), col(p.localName))
  }

  private def regWhole(agg: Column): Column = {
    val n = fresh("tot"); wholes += Whole(n, agg); col(n)
  }

  // --------------------------------------------------------- running folds

  /** Running fold from the start of the RELATION to the current row, under
    * the global order. Decomposable ops only (`-` decomposes through its
    * seed: fold(-,xs) = -(sum xs), exact because IEEE negation is exact;
    * `/` has no such identity and must go through [[runningGeneric]]).
    * A null prefix (first partition) is the identity — every corrected
    * expression coalesces. */
  def runningFold(op: String, value: Column): Column = op match {
    case "+" | "sum" =>
      val (p, l) = reg("sum", sum(value).over(running), addAny)
      coalesce(p + l, l)
    case "count" =>
      val (p, l) = reg("cnt", count(lit(1)).over(running), addAny)
      coalesce(p + l, l)
    case "max" =>
      val (p, l) = reg("max", max(value).over(running), cmpComb(true))
      greatest(p, l)
    case "min" =>
      val (p, l) = reg("min", min(value).over(running), cmpComb(false))
      least(p, l)
    case "&" =>
      // Running text concat materializes O(running-prefix) characters per
      // row AND carries each partition's full concatenated text through the
      // driver prefix-combine — inherently O(total text). Size-guarded like
      // wholeFold("&")/runningGeneric: fail loud, never silently OOM.
      guardBuffer()
      val (p, l) = reg("cat", array_join(collect_list(value).over(running), ""),
        (a, b) => anyS(a) + anyS(b))
      concat(coalesce(p, lit("")), l)
    case "*" =>
      // Native ProductAgg (DeclarativeAggregate, one double buffer slot)
      // over the running frame: O(1) state per row, vs the previous
      // collect_list prefix array that was O(n²) across the partition.
      // NOTE segmented '+' and '*' combine per-partition subtotals as
      // prefix⊕local, which re-associates IEEE arithmetic across partition
      // boundaries (the reference folds strictly sequentially); like the
      // documented collation/decimal deviations this can drift in the last
      // ulps under repartitioning — integral inputs are exact, doubles are
      // reproducible only for a fixed partitioning. `/` is excluded
      // entirely for the same reason (see runningGeneric).
      val (p, l) = reg("prod", Fold.productWin(value).over(running), mulAny)
      coalesce(p * l, l)
    case "-" =>
      val (p, l) = reg("sum", sum(value).over(running), addAny)
      lit(0) - coalesce(p + l, l)
    case other => throw new IllegalArgumentException(s"no segmented running fold: $other")
  }

  /** Running boolean and/or/xor. */
  def runningBool(op: String, value: Column): Column = op match {
    case "and" =>
      val (p, l) = reg("and", min(value).over(running), (a, b) => anyB(a) && anyB(b))
      coalesce(p && l, l)
    case "or" =>
      val (p, l) = reg("or", max(value).over(running), (a, b) => anyB(a) || anyB(b))
      coalesce(p || l, l)
    case "xor" =>
      val (p, l) = reg("xor", (sum(value.cast("long")).over(running) % 2) === 1,
        (a, b) => anyB(a) ^ anyB(b))
      coalesce(p =!= l, l)
    case other => throw new IllegalArgumentException(s"not a boolean fold: $other")
  }

  /** Running bitwise and/or/xor over numbers (reference widens to int64,
    * TypedValue.cs bit ops). */
  def runningBits(op: String, value: Column): Column = {
    val v = value.cast("long")
    op match {
      case "and" =>
        val (p, l) = reg("band", call_function("bit_and", v).over(running),
          (a, b) => anyL(a) & anyL(b))
        coalesce(p.bitwiseAND(l), l).cast("double")
      case "or" =>
        val (p, l) = reg("bor", call_function("bit_or", v).over(running),
          (a, b) => anyL(a) | anyL(b))
        coalesce(p.bitwiseOR(l), l).cast("double")
      case "xor" =>
        val (p, l) = reg("bxor", call_function("bit_xor", v).over(running),
          (a, b) => anyL(a) ^ anyL(b))
        coalesce(p.bitwiseXOR(l), l).cast("double")
      case other => throw new IllegalArgumentException(s"not a bitwise fold: $other")
    }
  }

  /** Running fold with a non-decomposable (user) step function: inherently
    * sequential, so the sorted value array is built once (size-guarded) and
    * each row folds its prefix slice. */
  def runningGeneric(value: Column, seed: Column, step: (Column, Column) => Column): Column = {
    guardBuffer()
    val arr = regWhole(transform(
      sort_array(collect_list(struct(go.as("g"), value.as("v")))), _.getField("v")))
    aggregate(slice(arr, lit(1), go.cast("int")), seed, step)
  }

  // ----------------------------------------------------------- whole folds

  /** Whole-relation fold under the global order — an ordinary one-row
    * aggregate (order only matters for `&`, which sorts by ordinal inside
    * the aggregation buffer). */
  def wholeFold(op: String, value: Column, dt: DataType): Column = op match {
    case "+" | "sum" => regWhole(coalesce(sum(value), lit(0)))
    case "count"     => regWhole(count(lit(1)))
    case "max"       => regWhole(coalesce(max(value), Rel.defaultCol(dt)))
    case "min"       => regWhole(coalesce(min(value), Rel.defaultCol(dt)))
    case "*"         => regWhole(Fold.product(value)) // O(1) buffer (ProductAgg)
    case "-"         => regWhole(lit(0) - coalesce(sum(value), lit(0)))
    case "&"         => guardBuffer(); regWhole(Fold.concatFold(Seq(go), value))
    case other => throw new IllegalArgumentException(s"no segmented whole fold: $other")
  }

  def wholeBool(op: String, value: Column): Column = op match {
    case "and" => regWhole(coalesce(min(value), lit(true)))
    case "or"  => regWhole(coalesce(max(value), lit(false)))
    case "xor" => regWhole(coalesce(sum(value.cast("long")) % 2 === 1, lit(false)))
    case other => throw new IllegalArgumentException(s"not a boolean fold: $other")
  }

  def wholeBits(op: String, value: Column): Column = {
    val v = value.cast("long")
    val agg = op match {
      case "and" => call_function("bit_and", v)
      case "or"  => call_function("bit_or", v)
      case "xor" => call_function("bit_xor", v)
      case other => throw new IllegalArgumentException(s"not a bitwise fold: $other")
    }
    regWhole(agg).cast("double")
  }

  /** Whole-relation user fold in global order (size-guarded buffer). */
  def wholeGeneric(value: Column, seed: Column, step: (Column, Column) => Column): Column = {
    guardBuffer()
    regWhole(Fold.orderedFold(Seq(go), value, seed, step))
  }

  // ------------------------------------------------------ offset functions

  /** lag(v,n) with the reference's type-default edge (DataRow.cs:242-249) —
    * an equi-self-join on the ordinal, never a window. */
  def lagD(value: Column, n: Int, dt: DataType): Column = {
    val nm = fresh("lag"); offsets += Offset(nm, value, n)
    coalesce(col(nm), Rel.defaultCol(dt))
  }

  def leadD(value: Column, n: Int, dt: DataType): Column = {
    val nm = fresh("lead"); offsets += Offset(nm, value, -n)
    coalesce(col(nm), Rel.defaultCol(dt))
  }

  /** nth(v,n): the global n-th row's value (0-based), type default past the
    * end — a one-row broadcast. */
  def nthD(value: Column, n: Int, dt: DataType): Column = {
    val nm = fresh("nth"); nths += NthRow(nm, value, n)
    coalesce(col(nm), Rel.defaultCol(dt))
  }

  /** ord(): the global ordinal itself. */
  def ord: Column = go

  /** rank(): 1 + rows strictly before the first tie — min ordinal over the
    * tie group (a window PARTITIONED by the undirected sort keys). */
  def rank(rawSort: Seq[Column]): Column =
    if (rawSort.isEmpty) go
    else min(go).over(Window.partitionBy(rawSort: _*))

  // ------------------------------------------------------------ materialize

  /** Join/derive everything the registered columns reference onto the
    * prepared frame. Call once, after all columns are compiled. */
  def materialize(prep: DataFrame): DataFrame = {
    var df = prep
    if (buffersWholeRelation) {
      val cap = Fold.maxGroupRows
      val n = prep.count()
      require(n <= cap,
        s"ungrouped ordered fold would buffer $n rows in one aggregation " +
          s"buffer (limit $cap); this op is inherently sequential — add a " +
          "% group to the order spec, or raise spark.graft.maxFoldGroupRows " +
          "if the relation genuinely fits")
    }
    prefixes.foreach { p => df = df.withColumn(p.localName, p.local) }
    if (prefixes.nonEmpty) {
      val aggs = prefixes.map(p => max_by(col(p.localName), go).as(p.localName)).toSeq
      val totalsDf = df.groupBy(pid).agg(aggs.head, aggs.tail: _*)
      val totals = totalsDf.collect().sortBy(_.getInt(0))
      // exclusive prefix-combine per need; null = identity (first partition)
      val prefixVals: Seq[Array[Any]] = prefixes.zipWithIndex.map { case (p, j) =>
        totals.map(_.get(j + 1)).scanLeft(null: Any) { (acc, x) =>
          if (acc == null) x else if (x == null) acc else p.combine(acc, x)
        }.init
      }.toSeq
      val rows = totals.indices.map { i =>
        Row.fromSeq(totals(i).getInt(0) +: prefixes.indices.map(j => prefixVals(j)(i)))
      }
      // prefix columns take whatever type the aggregates resolved to
      val totSchema = totalsDf.schema
      val schema = StructType(StructField(pidName, IntegerType) +:
        prefixes.zipWithIndex.map { case (p, j) =>
          totSchema(j + 1).copy(name = p.name, nullable = true)
        }.toSeq)
      val pdf = prep.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), schema)
      df = df.join(broadcast(pdf), Seq(pidName), "left")
    }
    if (wholes.nonEmpty) {
      val aggs = wholes.map(w => w.agg.as(w.name)).toSeq
      val one = prep.agg(aggs.head, aggs.tail: _*)
      df = crossOne(df, one)
    }
    offsets.groupBy(_.shift).toSeq.sortBy(_._1).foreach { case (shift, group) =>
      val jg = fresh("jgo")
      val shifted = prep.select(
        (go + shift).as(jg) +: group.map(o => o.value.as(o.name)).toSeq: _*)
      df = df.join(shifted, go === col(jg), "left").drop(jg)
    }
    nths.foreach { nh =>
      val one = prep.filter(go === (nh.n + 1)).select(nh.value.as(nh.name))
      df = crossOne(df, one)
    }
    df
  }

  /** Left-join a ≤1-row frame onto every row (broadcast, dummy key) —
    * unlike crossJoin, an EMPTY right side keeps the left rows (nth past
    * the end yields the type default, not an empty relation). */
  private def crossOne(df: DataFrame, one: DataFrame): DataFrame = {
    val dk = fresh("dk")
    df.withColumn(dk, lit(1))
      .join(broadcast(one.withColumn(dk, lit(1))), Seq(dk), "left")
      .drop(dk)
  }

  /** The reference's ordered-transform group collapse (TransformOrdered,
    * DataTableLocal.cs:589-627): emit a row only when the NEXT row (global
    * order) differs in some non-fold output, or there is no next row. The
    * next row resolves through an ordinal self-join on a slim projection —
    * exact across partition boundaries, no window. */
  def collapseRuns(frame: DataFrame, nonFold: Seq[String], out: Seq[String]): DataFrame = {
    val filtered =
      if (nonFold.isEmpty) {
        // no non-fold outputs: only the globally-last row (the grand total)
        val mx = frame.agg(max(go).as("__seg_mx"))
        crossOne(frame, mx).filter(go === col("__seg_mx"))
      } else {
        val jg = fresh("ngo")
        val nxt = frame.select(
          (go - 1).as(jg) +: lit(true).as("__seg_nex") +:
            nonFold.map(n => col(n).as(s"__seg_nx_$n")): _*)
        frame.join(nxt, go === col(jg), "left")
          .filter(coalesce(col("__seg_nex"), lit(false)) === false ||
            nonFold.map(n => !(col(s"__seg_nx_$n") <=> col(n))).reduce(_ || _))
      }
    filtered.select(out.map(col): _*)
  }
}

object Segmented {
  /** Range-partition + sort + pin `df` under `sort` and number rows with
    * the global ordinal; returns the prepared frame and the builder. */
  def prepare(df: DataFrame, sort: Seq[Column]): (DataFrame, Segmented) = {
    val seg = new Segmented()
    val prep = Ordered.withGlobalOrdinal(df, sort, seg.goName, keepPid = Some(seg.pidName))
    (prep, seg)
  }
}
