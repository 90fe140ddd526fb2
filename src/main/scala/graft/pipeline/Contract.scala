package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-contract validation — the "expectations" gate a release pipeline
  * runs before shipping a corpus (the Deequ/Great-Expectations shape,
  * re-expressed as ONE Spark aggregation): declare what must hold of a
  * table (null fractions, value ranges, regex shape, membership,
  * uniqueness, referential containment, row-count bounds), evaluate every
  * expectation's metric in a single pass, and emit a per-expectation
  * report row (rule, target, metric, threshold, pass).
  *
  * Scale shape: all row-local expectations (not-null / in-range / matches
  * / is-in / row-count) fold into ONE aggregate over ONE scan — adding an
  * expectation adds a conditional-sum column, not a pass. Referential
  * checks join their dimension into the same scan — broadcast while the
  * dimension is small, a shuffled join past a configurable size bound
  * (see [[refJoin]]), so a cluster-sized reference set still validates.
  * The one deliberate exception is [[Contract.Unique]]: exact uniqueness
  * needs a distinct aggregate, which Spark plans via Expand (one extra
  * duplicate of the scan per check) — declared, not hidden; at
  * 100 TB prefer key-partitioned layouts where uniqueness is a bucketed
  * groupBy, or sketch-based monitoring ([[graft.functions.Sketches]]).
  *
  * Determinism: every metric is an integer-conditional sum divided by the
  * row count, rounded to 6dp — partitioning-invariant and replayable
  * verbatim by a SQL oracle. */
object Contract {

  sealed trait Expectation

  /** Fraction of rows with a non-null `column` must be ≥ `minFraction`. */
  final case class NotNull(column: String, minFraction: Double = 1.0)
      extends Expectation

  /** Fraction of rows with `lo ≤ column ≤ hi` (nulls fail) ≥ `minFraction`. */
  final case class InRange(column: String, lo: Double, hi: Double,
                           minFraction: Double = 1.0) extends Expectation

  /** Fraction of rows whose `column` matches `regex` (nulls fail)
    * ≥ `minFraction`. */
  final case class Matches(column: String, regex: String,
                           minFraction: Double = 1.0) extends Expectation

  /** Fraction of rows whose `column` is one of `values` (nulls fail)
    * ≥ `minFraction`. */
  final case class IsIn(column: String, values: Seq[String],
                        minFraction: Double = 1.0) extends Expectation

  /** Total row count must lie in [lo, hi]. Metric is the count. */
  final case class RowCount(lo: Long, hi: Long) extends Expectation

  /** distinct(columns)/count must be 1.0 — exact, so rows where any key
    * component is null are EXCLUDED from the distinct (Spark's
    * count_distinct semantics); pair with [[NotNull]] on the key. Adds an
    * Expand duplicate of the scan (see object doc). */
  final case class Unique(columns: Seq[String]) extends Expectation

  /** Fraction of rows whose `column` appears in `dim.dimColumn`
    * (broadcast; nulls fail) ≥ `minFraction`. */
  final case class RefIn(column: String, dim: DataFrame, dimColumn: String,
                         minFraction: Double = 1.0) extends Expectation

  // empty-table discipline: a fraction over zero rows is VACUOUSLY 1.0 —
  // guarded with `when` (ANSI division would throw, and a null metric
  // would make pass null and slip through validate's filter silently);
  // guard emptiness itself with RowCount, which stays exact
  private def frac(cond: Column): Column =
    when(count(lit(1)) > 0,
      round(sum(when(cond, 1L).otherwise(0L)).cast("double") / count(lit(1)), 6))
      .otherwise(lit(1.0))

  /** Join every RefIn's dimension into the scan — one marker column
    * `__ref<i>` per referential expectation. Small dimensions (code
    * tables) take an explicit BROADCAST hint; a dimension whose
    * Catalyst-estimated size exceeds `spark.graft.contract.refBroadcastBytes`
    * (default: the session's own autoBroadcastJoinThreshold, floor 10 MB)
    * joins WITHOUT the hint, so the planner picks a shuffled join — the
    * path that scales to a reference set too big for executor memory.
    * The decision is a driver-side plan-stats read, zero extra jobs, and
    * the marker-column semantics are identical on both paths. */
  // size estimates memoized per dim LOGICAL PLAN object: the streaming
  // monitor calls refJoin once per micro-batch with the same dim frame,
  // and re-running the optimizer on it every batch is pure driver waste.
  // Weak keys: a dropped dim frame drops its memo entry.
  private val refSizeMemo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, java.lang.Long]())

  private[graft] def refJoin(df: DataFrame,
                             expectations: Seq[Expectation]): DataFrame =
    expectations.zipWithIndex.foldLeft(df) {
      case (acc, (RefIn(c, dim, dc, _), i)) =>
        val spark = df.sparkSession
        val limit = spark.conf.getOption("spark.graft.contract.refBroadcastBytes")
          .map(_.toLong)
          .getOrElse(math.max(
            spark.sessionState.conf.autoBroadcastJoinThreshold, 10L << 20))
        val key = dim.queryExecution.logical
        val est: Long = Option(refSizeMemo.get(key)).map(_.longValue).getOrElse {
          val s = spark.sessionState.executePlan(key)
            .optimizedPlan.stats.sizeInBytes
          val v = if (s.isValidLong) s.toLong else Long.MaxValue
          refSizeMemo.put(key, v)
          v
        }
        val d = dim.select(col(dc).as(s"__ref$i")).distinct()
        acc.join(if (limit > 0 && est <= limit) broadcast(d) else d,
          acc(c) === col(s"__ref$i"), "left")
      case (acc, _) => acc
    }

  /** The per-row hit condition of a FRACTION-style expectation (evaluated
    * on a [[refJoin]]ed frame); None for RowCount/Unique, whose metrics
    * are not row-local conditionals. */
  private[graft] def hitCond(e: Expectation, i: Int): Option[Column] = e match {
    case NotNull(c, _)        => Some(col(c).isNotNull)
    case InRange(c, lo, hi, _) =>
      Some(col(c).isNotNull && col(c) >= lo && col(c) <= hi)
    case Matches(c, re, _)    => Some(col(c).rlike(re))
    case IsIn(c, vs, _)       => Some(col(c).isin(vs: _*))
    case RefIn(_, _, _, _)    => Some(col(s"__ref$i").isNotNull)
    case _                    => None
  }

  /** Display label, target column, and pass threshold of an expectation —
    * shared by the batch report and the streaming monitor so their rows
    * are comparable verbatim. */
  private[graft] def describe(e: Expectation): (String, String, Double) =
    e match {
      case NotNull(c, f)         => ("not_null", c, f)
      case InRange(c, lo, hi, f) => (s"in_range[$lo,$hi]", c, f)
      case Matches(c, re, f)     => (s"matches[$re]", c, f)
      case IsIn(c, vs, f)        => (s"is_in[${vs.mkString("|")}]", c, f)
      case RowCount(lo, hi)      => (s"row_count[$lo,$hi]", "*", lo.toDouble)
      case Unique(cs)            => ("unique", cs.mkString(","), 1.0)
      case RefIn(c, _, dc, f)    => (s"ref_in[$dc]", c, f)
    }

  /** Evaluate every expectation: (rule, target, metric, threshold, pass),
    * one report row per expectation, in expectation order. */
  def check(df: DataFrame, expectations: Seq[Expectation]): DataFrame = {
    require(expectations.nonEmpty, "contract: no expectations")

    val withRefs = refJoin(df, expectations)

    val aggs: Seq[Column] = expectations.zipWithIndex.map {
      case (RowCount(_, _), i)      => count(lit(1)).cast("double").as(s"m$i")
      case (Unique(cs), i) =>
        when(count(lit(1)) > 0, round(
          countDistinct(col(cs.head), cs.tail.map(col): _*).cast("double") /
            count(lit(1)), 6)).otherwise(lit(1.0)).as(s"m$i")
      case (e, i) => frac(hitCond(e, i).get).as(s"m$i")
    }

    val reportRows = expectations.zipWithIndex.map { case (e, i) =>
      val m = col(s"m$i")
      val (rule, target, threshold) = describe(e)
      val pass = e match {
        case RowCount(lo, hi) => m >= lo && m <= hi
        case _                => m >= threshold
      }
      struct(lit(rule).as("rule"), lit(target).as("target"),
        m.as("metric"), lit(threshold).as("threshold"), pass.as("pass"))
    }

    withRefs.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(reportRows: _*)).as("r"))
      .select(col("r.rule"), col("r.target"), col("r.metric"),
        col("r.threshold"), col("r.pass"))
  }

  /** Hard gate: run [[check]] and throw (listing every violated rule and
    * its metric) if any expectation fails — the release-blocking mode. */
  def validate(df: DataFrame, expectations: Seq[Expectation]): Unit = {
    val bad = check(df, expectations).where(!col("pass")).collect()
    require(bad.isEmpty, "contract violated: " + bad.map(r =>
      s"${r.getString(0)}(${r.getString(1)}) metric=${r.getDouble(2)} " +
        s"threshold=${r.getDouble(3)}").mkString("; "))
  }
}
