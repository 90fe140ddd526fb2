package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
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
  * in-range / matches / is-in / referential containment — broadcast for
  * small reference sets, shuffled join past the [[Contract.refJoin]]
  * size bound, batch and stream faces identical) plus
  * RowCount on the cumulative count. [[Contract.Unique]] streams as a
  * SKETCH: exact distinctness does not decompose into mergeable per-batch
  * counters, but an HLL sketch does — each batch contributes one
  * `hll_sketch_agg` state (riding the same single aggregate), the driver
  * unions it into a cumulative sketch (DataSketches HLL, the library
  * behind Spark's own hll_* functions), and the report row carries
  * approx-distinct/rows with the sketch's published relative standard
  * error in its rule label; pass uses the sketch's 2-std-dev upper
  * bound, so a true-unique stream never false-alarms. The exact check
  * still belongs to the batch operator at release time.
  *
  * Scale shape: the stream engine holds ZERO state (foreachBatch); the
  * driver holds 2 longs per rule. foreachBatch is at-least-once, so the
  * monitor dedups on batchId — a replayed batch never double-counts.
  *
  * SCOPE: the counters live in DRIVER memory while the source's progress
  * is checkpointed, so a query restarted from its checkpoint with a fresh
  * Monitor would skip already-committed batches (the source replays
  * nothing) and lose their counts. Pass `stateFile` to [[start]] to close
  * that gap: the snapshot persists atomically after every batch and
  * restores automatically before the restarted query runs — the
  * cumulative identity with the batch check then holds across process
  * lifetimes. Without it, the identity holds within one process and
  * `snapshot()`/`restore` remain available for custom wiring. */
object ContractStream {

  /** The monitor's entire state: plain longs plus one compact HLL sketch
    * per Unique rule — persist next to the checkpoint to make the
    * counters restart-durable (see SCOPE above). */
  final case class MonitorState(lastBatchId: Long, rows: Long,
                                hits: Map[Int, Long],
                                sketches: Map[Int, Array[Byte]])

  final class Monitor(expectations: Seq[Expectation], lgK: Int = 12)
      extends Serializable {
    require(expectations.nonEmpty, "contract monitor: no expectations")
    require(lgK >= 4 && lgK <= 21, s"contract monitor: lgK=$lgK out of [4,21]")

    /** Order-sensitive fingerprint of the expectation list AND the sketch
      * precision — stamped into persisted state so a restart with a
      * CHANGED contract fails loud instead of silently misassigning
      * per-rule counter indices. lgK is part of the identity: restoring a
      * sketch written at a different lgK would silently union mixed
      * precisions and publish a wrong rse in the rule label. The
      * encoding is INJECTIVE over the rule structure (length-prefixed
      * fields, never delimiter joins — `IsIn(Seq("a","b"))` and
      * `IsIn(Seq("a|b"))` must differ). Known limit: RefIn fingerprints
      * its column names, not the reference DATA — swapping the dim
      * relation between restarts is not detectable from here. */
    private[streaming] val contractId: String = {
      def str(s: String) = s"${s.length}:$s"
      def strs(ss: Seq[String]) = s"${ss.length}:" + ss.map(str).mkString
      val enc = s"lgk($lgK)" + expectations.map {
        case NotNull(c, f)         => s"nn(${str(c)}$f)"
        case InRange(c, lo, hi, f) => s"ir(${str(c)}$lo,$hi,$f)"
        case Matches(c, re, f)     => s"ma(${str(c)}${str(re)}$f)"
        case IsIn(c, vs, f)        => s"in(${str(c)}${strs(vs)}$f)"
        case RowCount(lo, hi)      => s"rc($lo,$hi)"
        case Unique(cs)            => s"un(${strs(cs)})"
        case RefIn(c, _, dc, f)    => s"ri(${str(c)}${str(dc)}$f)"
      }.mkString
      java.security.MessageDigest.getInstance("MD5")
        .digest(enc.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
    }

    private val fracIdx = expectations.zipWithIndex
      .filter { case (e, i) => Contract.hitCond(e, i).isDefined }
    private val uniqIdx = expectations.zipWithIndex
      .collect { case (u: Unique, i) => (u, i) }
    // published error of a DataSketches HLL at this lgK: rse ≈ 1.04/√(2^lgK)
    private val rse = 1.04 / math.sqrt(math.pow(2.0, lgK))
    private var rows = 0L
    private val hits = scala.collection.mutable.Map.empty[Int, Long]
    // cumulative compact HLL per Unique rule, unioned driver-side — the
    // per-batch sketch rides the SAME single aggregate as the counters
    private val sketches = scala.collection.mutable.Map.empty[Int, Array[Byte]]
    // foreachBatch batchIds are MONOTONIC within a query, so the dedup
    // state is one long, not an ever-growing Set — a replayed/retried
    // batch re-presents an id ≤ the max already folded in
    private var lastBatchId = -1L

    /** The distinct-domain input for a Unique rule: rows where any key
      * column is null are excluded, exactly like countDistinct in the
      * batch check; the tuple funnels through xxhash64 (collision odds
      * ~n²/2⁶⁵ — far below the sketch's own error). */
    private def uniqInput(u: Unique): Column = {
      val nn = u.columns.map(col(_).isNotNull).reduce(_ && _)
      when(nn, xxhash64(u.columns.map(col): _*))
    }

    /** Fold one micro-batch in: ONE aggregate (count + a conditional sum
      * per fraction rule + an HLL state per unique rule) over the
      * RefIn-joined batch. Negative batchId skips the exactly-once dedup
      * (plain batch callers). Non-negative ids must arrive MONOTONICALLY
      * (foreachBatch guarantees this): any id ≤ the max already folded in
      * is treated as an at-least-once REPLAY and skipped — a caller
      * feeding genuinely out-of-order fresh ids would silently lose them,
      * so such callers must use the negative-id path and dedup
      * themselves. */
    def ingest(batch: DataFrame, batchId: Long = -1L): Unit = synchronized {
      if (batchId >= 0L && batchId <= lastBatchId) return
      val base = Contract.refJoin(batch, expectations)
      val aggs = (count(lit(1)).as("n") +: fracIdx.map { case (e, i) =>
        sum(when(Contract.hitCond(e, i).get, 1L).otherwise(0L)).as(s"h$i")
      }) ++ uniqIdx.map { case (u, i) =>
        hll_sketch_agg(uniqInput(u), lit(lgK)).as(s"u$i")
      }
      val r = base.agg(aggs.head, aggs.tail: _*).collect()(0)
      rows += r.getLong(r.fieldIndex("n"))
      fracIdx.foreach { case (_, i) =>
        val fi = r.fieldIndex(s"h$i")
        if (!r.isNullAt(fi)) hits(i) = hits.getOrElse(i, 0L) + r.getLong(fi)
      }
      uniqIdx.foreach { case (_, i) =>
        val fi = r.fieldIndex(s"u$i")
        if (!r.isNullAt(fi)) {
          val u = new org.apache.datasketches.hll.Union(lgK)
          sketches.get(i).foreach(b =>
            u.update(org.apache.datasketches.hll.HllSketch.heapify(b)))
          u.update(org.apache.datasketches.hll.HllSketch.heapify(
            r.getAs[Array[Byte]](fi)))
          sketches(i) = u.getResult.toCompactByteArray
        }
      }
      if (batchId >= 0L) lastBatchId = batchId
    }

    def snapshot(): MonitorState = synchronized {
      MonitorState(lastBatchId, rows, hits.toMap, sketches.toMap)
    }

    /** Rebuild driver state from a [[snapshot]] before restarting a query
      * from its checkpoint. */
    def restore(s: MonitorState): Unit = synchronized {
      lastBatchId = s.lastBatchId; rows = s.rows
      hits.clear(); s.hits.foreach { case (k, v) => hits(k) = v }
      sketches.clear(); s.sketches.foreach { case (k, v) => sketches(k) = v }
    }

    private def round6(v: Double): Double =
      java.math.BigDecimal.valueOf(v)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

    /** Cumulative report, identical row-for-row to `Contract.check` over
      * the union of ingested batches (vacuous 1.0 fractions before any
      * row arrives — RowCount carries the emptiness verdict). Unique rows
      * are the one APPROXIMATE face: rule label carries the sketch's
      * published error (`unique~hll[rse=…]`), metric is the estimate/rows
      * ratio (capped at 1.0), and pass uses the sketch's 2-std-dev upper
      * bound so a genuinely unique stream never false-alarms while a
      * duplicate mass beyond the error band always trips. */
    def report(): Seq[(String, String, Double, Double, Boolean)] = synchronized {
      expectations.zipWithIndex.map { case (e, i) =>
        val (rule0, target, threshold) = Contract.describe(e)
        e match {
          case RowCount(lo, hi) =>
            (rule0, target, rows.toDouble, threshold, rows >= lo && rows <= hi)
          case _: Unique =>
            val rule = f"unique~hll[lgk=$lgK,rse=$rse%.4f]"
            if (rows == 0L) (rule, target, 1.0, threshold, true)
            else {
              val sk = sketches.get(i)
                .map(org.apache.datasketches.hll.HllSketch.heapify)
              val est = sk.map(_.getEstimate).getOrElse(0.0)
              val ub = sk.map(_.getUpperBound(2)).getOrElse(0.0)
              val metric = round6(math.min(est / rows, 1.0))
              (rule, target, metric, threshold,
                math.min(ub / rows, 1.0) >= threshold)
            }
          case _ =>
            val metric = if (rows == 0L) 1.0
                         else round6(hits.getOrElse(i, 0L).toDouble / rows)
            (rule0, target, metric, threshold, metric >= threshold)
        }
      }
    }

    /** True while every cumulative expectation currently holds. */
    def healthy(): Boolean = report().forall(_._5)
  }

  /** Run the monitor over a streaming DataFrame: each micro-batch is
    * ingested (exactly once, by batchId) and the refreshed report handed
    * to `sink` — the continuous release-gate alarm.
    *
    * `stateFile` (optional) makes the counters RESTART-DURABLE: the
    * monitor restores from the file before the query starts (so a query
    * restarted from its checkpoint — which replays nothing — keeps its
    * cumulative counts) and persists a snapshot atomically (tmp + rename,
    * through the Hadoop FS so it can sit next to the checkpoint on any
    * filesystem) after every ingested batch. Persist-then-sink ordering
    * means a crash between ingest and persist re-presents the batch on
    * restart and the batchId dedup drops it — at-least-once persists,
    * exactly-once counts. */
  def start(stream: DataFrame, monitor: Monitor,
            sink: Seq[(String, String, Double, Double, Boolean)] => Unit,
            checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow(),
            stateFile: Option[String] = None): StreamingQuery = {
    stateFile.foreach { f =>
      readState(stream.sparkSession, f).foreach { case (cid, ckpt, s) =>
        require(cid == monitor.contractId,
          s"contract monitor: state file $f was written by a DIFFERENT " +
            "expectation list or sketch lgK — per-rule counters/sketches " +
            "would misassign; delete the file (fresh counts) or restart " +
            "with the original contract and lgK")
        // a wiped/relocated checkpoint restarts batchIds at 0 — restoring
        // the old lastBatchId would silently DROP the reprocessed batches
        // as "replays"; fail loud instead
        require(ckpt == checkpointDir,
          s"contract monitor: state file $f belongs to checkpoint '$ckpt', " +
            s"not '$checkpointDir' — reprocessing from a fresh checkpoint " +
            "needs fresh counts; delete the state file too")
        monitor.restore(s)
      }
    }
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        monitor.ingest(batch, batchId)
        stateFile.foreach(f => writeState(batch.sparkSession, f,
          monitor.contractId, checkpointDir, monitor.snapshot()))
        sink(monitor.report())
      }
      .start()
  }

  // ------------------------------------------ durable state (JSON file)

  private def fs(spark: org.apache.spark.sql.SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private[streaming] def writeState(spark: org.apache.spark.sql.SparkSession,
                                    path: String, contractId: String,
                                    checkpointDir: String,
                                    s: MonitorState): Unit = {
    val b64 = java.util.Base64.getEncoder
    def longMap(m: Map[Int, Long]) =
      m.toSeq.sorted.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val sk = s.sketches.toSeq.sortBy(_._1).map { case (k, v) =>
      s""""$k":"${b64.encodeToString(v)}"""" }.mkString("{", ",", "}")
    val json =
      s"""{"contract":"$contractId","checkpoint":${graft.types.Json.str(checkpointDir)},"lastBatchId":${s.lastBatchId},"rows":${s.rows},"hits":${longMap(s.hits)},"sketches":$sk}"""
    val f = fs(spark, path)
    val tmp = new org.apache.hadoop.fs.Path(path + ".tmp")
    val out = f.create(tmp, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val tgt = new org.apache.hadoop.fs.Path(path)
    // delete+rename is TWO operations; the crash window between them is
    // covered on the read side (a complete .tmp with no main file IS the
    // newest state — see readState), so durability never silently resets
    if (f.exists(tgt)) f.delete(tgt, false)
    require(f.rename(tmp, tgt), s"contract monitor: rename $tmp -> $tgt failed")
  }

  private[streaming] def readState(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[(String, String, MonitorState)] = {
    val f = fs(spark, path)
    val p = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + ".tmp")
    // crash-window recovery: main missing but a tmp present means the
    // writer died between delete and rename — the tmp was fully written
    // (create+close precede the delete) and IS the newest snapshot
    val src = if (f.exists(p)) p else if (f.exists(tmp)) tmp else return None
    val in = f.open(src)
    val json = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    val m = new com.fasterxml.jackson.databind.ObjectMapper
    val n = m.readTree(json)
    def intMap[A](field: String)(f: com.fasterxml.jackson.databind.JsonNode => A): Map[Int, A] = {
      val it = n.get(field).fields()
      val b = Map.newBuilder[Int, A]
      while (it.hasNext) { val e = it.next(); b += e.getKey.toInt -> f(e.getValue) }
      b.result()
    }
    val b64 = java.util.Base64.getDecoder
    Some((n.get("contract").asText(), n.get("checkpoint").asText(),
      MonitorState(
        n.get("lastBatchId").asLong(), n.get("rows").asLong(),
        intMap("hits")(_.asLong()),
        intMap("sketches")(v => b64.decode(v.asText())))))
  }
}
