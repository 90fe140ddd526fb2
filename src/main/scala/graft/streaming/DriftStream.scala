package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming distribution-drift monitor: the live-ingest face of
  * [[graft.pipeline.Profile.driftReport]]. A REFERENCE bucket profile is
  * computed once from the frozen corpus; every arriving micro-batch's
  * bucket counts fold into a running stream profile, and after each batch
  * the monitor emits per-bucket PSI of accumulated-stream vs reference —
  * the "is the new crawl drifting away from what we trained on" alarm,
  * evaluated continuously instead of at snapshot time.
  *
  * Scale shape: per batch, ONE distributed hash aggregate per dimension
  * (cardinality = buckets, not rows) runs inside `foreachBatch`; only the
  * bucket-count rows (a few dozen) reach the driver, where the running
  * profile lives as a map keyed by (dim, bucket). The stream engine holds
  * ZERO state — the monitor is a plain batch aggregation per micro-batch,
  * so watermarks, state-store sizing, and output modes never enter the
  * picture. PSI math matches Profile.driftReport bit-for-bit (same ε, the
  * same HALF_UP 6dp rounding Spark's `round` applies).
  */
object DriftStream {

  final case class DriftRow(dim: String, bucket: String, nRef: Long,
                            nStream: Long, shareRef: Double,
                            shareStream: Double, psi: Double)

  /** (dim, bucket, n) counts — the same shape driftReport aggregates. */
  def bucketCounts(df: DataFrame, dims: Seq[(String, Column)]): DataFrame =
    dims.map { case (name, bucket) =>
      df.select(lit(name).as("dim"), bucket.cast("string").as("bucket"))
        .groupBy("dim", "bucket").agg(count(lit(1)).as("n"))
    }.reduce(_ unionByName _)

  private def round6(v: Double): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  final case class MonitorState(lastBatchId: Long,
                                acc: Map[(String, String), Long])

  /** Driver-side running profile. State = one counter per observed
    * (dim, bucket) — bounded by bucket cardinality at any corpus scale. */
  final class Monitor(reference: DataFrame, dims: Seq[(String, Column)],
                      eps: Double = 1e-6) extends Serializable {
    private val refCounts: Map[(String, String), Long] =
      bucketCounts(reference, dims).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    private val refTot: Map[String, Long] =
      refCounts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    private var acc = Map.empty[(String, String), Long]
    // batchId WATERMARK, not a set (ids are monotone per query; a set
    // grows one entry per batch forever on an unbounded stream)
    private var lastBatchId = -1L

    /** Identity of what the counters MEAN: dimension list, ε, and the
      * full reference profile — restoring a state file against a
      * different reference or dims would compute silently-wrong PSI. */
    private[streaming] val monitorId: String = {
      // JSON-quoted components keep the encoding INJECTIVE for arbitrary
      // dim/bucket strings (the ContractStream fingerprint lesson)
      def q(s: String) = graft.types.Json.str(s)
      val enc = dims.map(d => q(d._1)).mkString("dims(", ",", ")") +
        s"eps($eps)" +
        refCounts.toSeq.sortBy(_._1)
          .map { case ((d, b), n) => s"[${q(d)},${q(b)},$n]" }
          .mkString("ref(", ",", ")")
      val md = java.security.MessageDigest.getInstance("SHA-256")
      md.digest(enc.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
    }

    /** Fold one micro-batch into the running profile (one distributed
      * aggregate per dim; bucket-cardinality rows collected).
      * `batchId` makes ingestion idempotent: foreachBatch is
      * at-least-once (a batch retried after a mid-batch failure or
      * restart is RE-delivered with the same id), so a replayed batch
      * must not double-count. Pass a negative id to skip dedup (batch
      * callers outside a stream). */
    def ingest(batch: DataFrame, batchId: Long = -1L): Unit = synchronized {
      if (batchId >= 0L && batchId <= lastBatchId) return
      bucketCounts(batch, dims).collect().foreach { r =>
        val k = (r.getString(0), r.getString(1))
        acc = acc.updated(k, acc.getOrElse(k, 0L) + r.getLong(2))
      }
      if (batchId >= 0L) lastBatchId = batchId
    }

    def snapshot(): MonitorState = synchronized {
      MonitorState(lastBatchId, acc)
    }

    /** Rebuild driver state from a [[snapshot]] before restarting a query
      * from its checkpoint. */
    def restore(s: MonitorState): Unit = synchronized {
      lastBatchId = s.lastBatchId; acc = s.acc
    }

    /** Per-bucket PSI of accumulated stream vs reference, over the union
      * of observed buckets; rows sorted (dim, bucket). */
    def report(): Seq[DriftRow] = synchronized {
      val streamTot = acc.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
      (refCounts.keySet ++ acc.keySet).toSeq.sorted.map { case k@(dim, b) =>
        val n1 = refCounts.getOrElse(k, 0L)
        val n2 = acc.getOrElse(k, 0L)
        val p1 = n1.toDouble / refTot.getOrElse(dim, 1L).max(1L)
        val p2 = n2.toDouble / streamTot.getOrElse(dim, 1L).max(1L)
        DriftRow(dim, b, n1, n2, round6(p1), round6(p2),
          round6((p2 - p1) * math.log((p2 + eps) / (p1 + eps))))
      }
    }

    /** Per-dimension PSI totals — the alarm-threshold view
      * (<0.1 stable, 0.1–0.25 drifting, >0.25 changed). */
    def totals(): Map[String, Double] =
      report().groupBy(_.dim).view
        .mapValues(rows => round6(rows.map(_.psi).sum)).toMap
  }

  /** Run the monitor over a streaming DataFrame: each micro-batch is
    * ingested and the refreshed report handed to `sink`. The stream
    * engine stays stateless (foreachBatch); foreachBatch is
    * AT-LEAST-ONCE (a micro-batch retried after a mid-batch failure or
    * restart is re-delivered under the same batchId), so the monitor
    * dedups on batchId inside the closure to keep counts exactly-once.
    *
    * `stateFile` (optional) makes the running profile RESTART-DURABLE,
    * mirroring [[ContractStream.start]]: restore before the query starts,
    * persist atomically after every ingested batch (persist-then-sink).
    * The file refuses a monitor with a different reference profile, dims,
    * or ε (the PSI would be silently wrong) and a different checkpoint
    * (fresh batchIds over restored counts would drop real batches as
    * replays). */
  def start(stream: DataFrame, monitor: Monitor,
            sink: Seq[DriftRow] => Unit, checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow(),
            stateFile: Option[String] = None): StreamingQuery = {
    stateFile.foreach { f =>
      readState(stream.sparkSession, f).foreach { case (mid, ckpt, s) =>
        require(mid == monitor.monitorId,
          s"drift monitor: state file $f was written by a monitor with a " +
            "DIFFERENT reference profile, dims, or eps — the restored " +
            "counters would compute wrong PSI; delete the file (fresh " +
            "counts) or restart with the original reference")
        require(ckpt == checkpointDir,
          s"drift monitor: state file $f belongs to checkpoint '$ckpt', " +
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
          monitor.monitorId, checkpointDir, monitor.snapshot()))
        sink(monitor.report())
      }
      .start()
  }

  // ------------------------------------------ durable state (JSON file)

  private def split(path: String): (String, String) = {
    val i = path.lastIndexOf('/')
    require(i > 0, s"state file needs a parent dir: $path")
    (path.substring(0, i), path.substring(i + 1))
  }

  private[streaming] def writeState(spark: org.apache.spark.sql.SparkSession,
                                    path: String, monitorId: String,
                                    checkpointDir: String,
                                    s: MonitorState): Unit = {
    def jstr(x: String) = graft.types.Json.str(x)
    val rows = s.acc.toSeq.sortBy(_._1)
      .map { case ((d, b), n) => s"[${jstr(d)},${jstr(b)},$n]" }
      .mkString("[", ",", "]")
    val (dir, name) = split(path)
    graft.sources.BucketedStore.writeMeta(spark, dir, name,
      s"""{"monitorId":${jstr(monitorId)},""" +
      s""""checkpoint":${jstr(checkpointDir)},""" +
      s""""lastBatchId":${s.lastBatchId},"acc":$rows}""")
  }

  private[streaming] def readState(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[(String, String, MonitorState)] = {
    val (dir, name) = split(path)
    val node = try graft.sources.BucketedStore.readMeta(spark, dir, name)
               catch { case _: Exception => return None }
    import scala.jdk.CollectionConverters._
    val acc = node.get("acc").elements().asScala
      .map(e => (e.get(0).asText(), e.get(1).asText()) -> e.get(2).asLong())
      .toMap
    Some((node.get("monitorId").asText(), node.get("checkpoint").asText(),
      MonitorState(node.get("lastBatchId").asLong(), acc)))
  }
}
