package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — for every left row, the single most recent right
  * row with `right.ts <= left.ts` (inclusive) within the same key. The op
  * Spark famously lacks: the direct formulation is a non-equi range join
  * (`l.key = r.key AND r.ts <= l.ts` + argmax), which Catalyst executes as
  * a sort-merge join producing every (left, earlier-right) pair — O(n·m)
  * per key before the argmax collapses it. Dead at scale.
  *
  * This lowers to ONE shuffle and a linear pass: tag the two sides, union
  * them, and take a running `last(rightPayload, ignoreNulls)` over
  * (key) ordered by (ts, side) with an unbounded-preceding row frame —
  * Spark evaluates that frame incrementally, so each key's timeline is
  * scanned once. Right rows sort before left rows at equal ts, which is
  * exactly the inclusive bound. Rows-per-key is the only memory dimension
  * (a sort spill, not a join explosion).
  *
  * Ties inside the right stream at the same (key, ts) resolve by the last
  * row in the sort, which is unspecified — pass a right side unique on
  * (key, ts) (aggregate first if needed) for deterministic output.
  * Left rows with no earlier right row get NULL payload columns (left
  * join semantics).
  */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               rightPayload: Seq[String], prefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct((ts +: rightPayload).map(col): _*)
    val r = right.select(col(key), col(ts), lit(0).as("__side"),
      payload.as("__p"), lit(null).cast(sqlStruct(left)).as("__l"))
    val l = left.select(col(key), col(ts), lit(1).as("__side"),
      lit(null).cast(r.schema("__p").dataType).as("__p"),
      struct(leftCols.map(col): _*).as("__l"))
    val w = Window.partitionBy(key).orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        (ts +: rightPayload).map(c => col(s"__m.$c").as(s"$prefix$c")): _*)
  }

  private def sqlStruct(df: DataFrame) =
    org.apache.spark.sql.types.StructType(df.schema.fields)
}
