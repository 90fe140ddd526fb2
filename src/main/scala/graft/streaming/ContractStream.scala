package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.pipeline.Contract
import graft.pipeline.Contract._

/** Streaming data-contract monitor: the live-ingest face of
  * [[graft.pipeline.Contract]]. Every micro-batch folds into exact
  * per-rule (hits, rows) COUNTER pairs — one conditional-sum aggregate
  * over the batch, rule-cardinality longs to the driver — and the report
  * computes cumulative fractions, so after ANY prefix of the stream the
  * monitor's report row-for-row EQUALS `Contract.check` of the batches
  * ingested so far (same labels, same 6dp rounding, same thresholds).
  * That identity is what the CI gate exercises.
  *
  * Supported rules: every fraction-style expectation (not-null /
  * in-range / matches / is-in / broadcast referential containment) plus
  * RowCount on the cumulative count. [[Contract.Unique]] is REFUSED:
  * exact distinctness does not decompose into mergeable per-batch
  * counters — continuous uniqueness monitoring belongs to the HLL
  * sketches ([[graft.functions.Sketches]]), with the exact check run at
  * release time by the batch operator.
  *
  * Scale shape: the stream engine holds ZERO state (foreachBatch); the
  * driver holds 2 longs per rule. foreachBatch is at-least-once, so the
  * monitor dedups on batchId — a replayed batch never double-counts. */
object ContractStream {

  final class Monitor(expectations: Seq[Expectation]) extends Serializable {
    require(expectations.nonEmpty, "contract monitor: no expectations")
    require(!expectations.exists(_.isInstanceOf[Unique]),
      "contract monitor: Unique does not stream exactly — use the batch " +
        "check (or sketch-based uniqueness) instead")

    private val fracIdx = expectations.zipWithIndex
      .filter { case (e, i) => Contract.hitCond(e, i).isDefined }
    private var rows = 0L
    private val hits = scala.collection.mutable.Map.empty[Int, Long]
    private var ingestedBatches = Set.empty[Long]

    /** Fold one micro-batch in: ONE aggregate (count + a conditional sum
      * per fraction rule) over the RefIn-joined batch. Negative batchId
      * skips the exactly-once dedup (plain batch callers). */
    def ingest(batch: DataFrame, batchId: Long = -1L): Unit = synchronized {
      if (batchId >= 0L && ingestedBatches.contains(batchId)) return
      val base = Contract.refJoin(batch, expectations)
      val aggs = count(lit(1)).as("n") +: fracIdx.map { case (e, i) =>
        sum(when(Contract.hitCond(e, i).get, 1L).otherwise(0L)).as(s"h$i")
      }
      val r = base.agg(aggs.head, aggs.tail: _*).collect()(0)
      rows += r.getLong(r.fieldIndex("n"))
      fracIdx.foreach { case (_, i) =>
        val fi = r.fieldIndex(s"h$i")
        if (!r.isNullAt(fi)) hits(i) = hits.getOrElse(i, 0L) + r.getLong(fi)
      }
      if (batchId >= 0L) ingestedBatches += batchId
    }

    private def round6(v: Double): Double =
      java.math.BigDecimal.valueOf(v)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

    /** Cumulative report, identical row-for-row to `Contract.check` over
      * the union of ingested batches (vacuous 1.0 fractions before any
      * row arrives — RowCount carries the emptiness verdict). */
    def report(): Seq[(String, String, Double, Double, Boolean)] = synchronized {
      expectations.zipWithIndex.map { case (e, i) =>
        val (rule, target, threshold) = Contract.describe(e)
        val metric = e match {
          case RowCount(_, _) => rows.toDouble
          case _ => if (rows == 0L) 1.0
                    else round6(hits.getOrElse(i, 0L).toDouble / rows)
        }
        val pass = e match {
          case RowCount(lo, hi) => rows >= lo && rows <= hi
          case _                => metric >= threshold
        }
        (rule, target, metric, threshold, pass)
      }
    }

    /** True while every cumulative expectation currently holds. */
    def healthy(): Boolean = report().forall(_._5)
  }

  /** Run the monitor over a streaming DataFrame: each micro-batch is
    * ingested (exactly once, by batchId) and the refreshed report handed
    * to `sink` — the continuous release-gate alarm. */
  def start(stream: DataFrame, monitor: Monitor,
            sink: Seq[(String, String, Double, Double, Boolean)] => Unit,
            checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        monitor.ingest(batch, batchId)
        sink(monitor.report())
      }
      .start()
}
