package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming heavy hitters — the "trending tokens/URLs/n-grams in the live
  * crawl" monitor: the streaming face of [[graft.pipeline.Heavy.topKExact]],
  * built from the MERGEABLE form of the same Misra–Gries summary.
  *
  * Per micro-batch the cluster runs exactly the batch operator's candidate
  * machinery — per-partition bounded MG summaries, then one broadcast-join
  * exact recount of the ≤ m·P candidates — so only a bounded
  * (item, batch-count) table ever reaches the driver. The driver folds each
  * batch table into its own capacity-m summary with the standard MG merge
  * (add weights; while over capacity, subtract the (m+1)-th largest weight
  * and drop non-positives). Classic guarantees compose: every reported
  * weight undercounts its true frequency by at most the TRACKED bound
  * `error` = Σ_b N_b/m (candidate loss) + Σ merge cuts — up to 2·N/m in
  * the worst case, so items with TOTAL stream frequency > `error` are
  * guaranteed present. State is O(m) on the driver, zero in the stream
  * engine — the [[DriftStream.Monitor]] shape, including the batchId dedup
  * that keeps at-least-once foreachBatch delivery exactly-once. */
object HeavyStream {

  final case class MonitorState(lastBatchId: Long, totalRows: Long,
                                batchErr: Double, mergeErr: Long,
                                counts: Map[String, Long])

  final class TopKMonitor(m: Int) extends Serializable {
    require(m >= 1, s"TopKMonitor: m=$m")
    private var counts = Map.empty[String, Long]
    // batchId WATERMARK, not a set: ids are monotone per query and the
    // only replay shape is the current failed batch re-delivered, so the
    // watermark dedups exactly — where a Set[Long] grows one entry per
    // batch forever on an unbounded stream
    private var lastBatchId = -1L
    private var totalRows = 0L
    // the TWO undercount sources, tracked separately so error() is the
    // real bound, not the single-source N/m underestimate: per-batch
    // candidate loss (an item absent from every partition summary of
    // batch b hides ≤ N_b/m occurrences) and driver-side merge shrinks
    // (each over-capacity cut subtracts `cut` from every survivor)
    private var batchErr = 0.0
    private var mergeErr = 0L

    /** Fold one micro-batch of items (one string column) into the summary. */
    def ingest(batch: DataFrame, batchId: Long = -1L,
               itemCol: String = "item"): Unit = synchronized {
      if (batchId >= 0L && batchId <= lastBatchId) return
      val spark = batch.sparkSession
      import spark.implicits._
      val ds = batch.select(col(itemCol).cast("string").as("item")).as[String]
      // batch-local candidates: the SAME bounded per-partition MG pass the
      // batch operator runs (the one legitimate mapPartitions)
      val cands = ds.mapPartitions { it =>
        val c = new scala.collection.mutable.HashMap[String, Long]
        it.foreach { item =>
          if (c.contains(item)) c(item) += 1
          else if (c.size < m) c(item) = 1
          else c.keys.toArray.foreach { k =>
            val v = c(k) - 1; if (v == 0) c.remove(k) else c(k) = v
          }
        }
        c.keysIterator
      }.distinct().toDF("item")
      val batchCounts = ds.toDF("item").join(broadcast(cands), "item")
        .groupBy("item").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1))
      val nb = ds.count()
      totalRows += nb
      batchErr += nb.toDouble / m
      // mergeable-MG fold: add weights, then shrink back to capacity m
      var merged = counts
      batchCounts.foreach { case (i, n) =>
        merged = merged.updated(i, merged.getOrElse(i, 0L) + n)
      }
      if (merged.size > m) {
        val cut = merged.values.toSeq.sorted(Ordering[Long].reverse)(m)
        mergeErr += cut
        merged = merged.flatMap { case (i, n) =>
          if (n - cut > 0) Some(i -> (n - cut)) else None
        }
      }
      counts = merged
      if (batchId >= 0L) lastBatchId = batchId
    }

    def snapshot(): MonitorState = synchronized {
      MonitorState(lastBatchId, totalRows, batchErr, mergeErr, counts)
    }

    /** Rebuild driver state from a [[snapshot]] before restarting a query
      * from its checkpoint. */
    def restore(s: MonitorState): Unit = synchronized {
      lastBatchId = s.lastBatchId; totalRows = s.totalRows
      batchErr = s.batchErr; mergeErr = s.mergeErr; counts = s.counts
    }

    private[streaming] def capacity: Int = m

    /** Current top-k by summary weight (desc, item asc). Weights
      * UNDERCOUNT true frequencies by at most [[error]]. */
    def topK(k: Int): Seq[(String, Long)] = synchronized {
      counts.toSeq.sortBy { case (i, n) => (-n, i) }.take(k)
    }

    /** The additive undercount bound for the rows seen so far: the SUM of
      * both tracked sources — Σ_b N_b/m (per-batch candidate loss, totals
      * N/m) plus the cumulative merge-shrink cuts (≤ N/m more), so the
      * true bound can approach 2N/m and this reports the exact tracked
      * value, not the single-source N/m underestimate. Every reported
      * weight undercounts its true frequency by at most [[error]];
      * presence is guaranteed for items with frequency > [[error]]. */
    def error: Double = synchronized { batchErr + mergeErr }
    def rowsSeen: Long = synchronized { totalRows }
  }

  /** Run the monitor over a streaming item column; `sink` receives the
    * refreshed top-k after each batch.
    *
    * `stateFile` (optional) makes the summary RESTART-DURABLE, mirroring
    * [[ContractStream.start]]: restore before the query starts (a restart
    * from its checkpoint replays nothing, so the counts must come from
    * the file), persist atomically after every ingested batch
    * (persist-then-sink: a crash between ingest and persist re-presents
    * the batch and the batchId watermark drops it). The file refuses a
    * monitor with a DIFFERENT capacity m (the error bound would lie) or a
    * different checkpoint (fresh batchIds over restored counts would
    * silently drop the reprocessed batches as replays). */
  def start(items: DataFrame, monitor: TopKMonitor, k: Int,
            sink: Seq[(String, Long)] => Unit, checkpointDir: String,
            itemCol: String = "item",
            trigger: Trigger = Trigger.AvailableNow(),
            stateFile: Option[String] = None): StreamingQuery = {
    stateFile.foreach { f =>
      readState(items.sparkSession, f).foreach { case (m0, ckpt, s) =>
        require(m0 == monitor.capacity,
          s"heavy-hitter monitor: state file $f was written at capacity " +
            s"m=$m0, not ${monitor.capacity} — the MG error bound would " +
            "lie; delete the file (fresh counts) or keep the original m")
        require(ckpt == checkpointDir,
          s"heavy-hitter monitor: state file $f belongs to checkpoint " +
            s"'$ckpt', not '$checkpointDir' — reprocessing from a fresh " +
            "checkpoint needs fresh counts; delete the state file too")
        monitor.restore(s)
      }
    }
    items.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        monitor.ingest(batch, batchId, itemCol)
        stateFile.foreach(f => writeState(batch.sparkSession, f,
          monitor.capacity, checkpointDir, monitor.snapshot()))
        sink(monitor.topK(k))
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
                                    path: String, m: Int,
                                    checkpointDir: String,
                                    s: MonitorState): Unit = {
    def jstr(x: String) = graft.types.Json.str(x)
    val cs = s.counts.toSeq.sortBy(_._1)
      .map { case (k, v) => s"[${jstr(k)},$v]" }.mkString("[", ",", "]")
    val (dir, name) = split(path)
    graft.sources.BucketedStore.writeMeta(spark, dir, name,
      s"""{"m":$m,"checkpoint":${jstr(checkpointDir)},""" +
      s""""lastBatchId":${s.lastBatchId},"totalRows":${s.totalRows},""" +
      s""""batchErr":${s.batchErr},"mergeErr":${s.mergeErr},"counts":$cs}""")
  }

  private[streaming] def readState(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[(Int, String, MonitorState)] = {
    val (dir, name) = split(path)
    val node = try graft.sources.BucketedStore.readMeta(spark, dir, name)
               catch { case _: Exception => return None }
    import scala.jdk.CollectionConverters._
    val counts = node.get("counts").elements().asScala
      .map(e => e.get(0).asText() -> e.get(1).asLong()).toMap
    Some((node.get("m").asInt(), node.get("checkpoint").asText(),
      MonitorState(node.get("lastBatchId").asLong(),
        node.get("totalRows").asLong(), node.get("batchErr").asDouble(),
        node.get("mergeErr").asLong(), counts)))
  }
}
