package graft.rel

import org.apache.spark.sql.DataFrame

/** Lineage-pinning strategy for iterative/multi-branch operators.
  *
  * `localCheckpoint` stores blocks on executors — fastest, but lost if an
  * executor dies, which on a long cluster job forces a recompute the
  * truncated lineage can no longer express. Reliability-sensitive runs set
  *
  *   spark.graft.reliableCheckpoint = true
  *   spark.graft.checkpointDir      = hdfs://…/ckpt   (or any DFS path)
  *
  * and every pin becomes a directory-based `checkpoint` instead (write-once
  * to the DFS, survives executor loss). Local/default runs keep the cheap
  * executor-memory pin. One switch for every operator that pins —
  * WhileFix rounds, dedup signature frames, the global-ordinal range pass —
  * so cluster deployments do not chase call sites. */
object Checkpoint {

  /** True when the session routes pins through directory checkpoints.
    * Operators that RELEASE superseded pins must consult this. A LAZY
    * reliable pin DOES eventually write its directory: `RDD.doCheckpoint`
    * (run on the driver after every job) recurses into the final RDD's
    * dependencies and checkpoints the FIRST marked ancestor on each
    * lineage branch — a lazily pinned intermediate is written (via an
    * extra recompute job) as soon as any job scans through it. What a
    * lazy reliable pin does NOT give a releasing operator is a
    * materialization point it can ORDER against: the write happens as a
    * post-job side effect of whichever job first covers the pin, so a
    * loop that releases the pin's legs must either have already run such
    * a job (WhileFix's compaction releases only after the next round's
    * count) or pin the successor EAGERLY and release afterwards. */
  def isReliable(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.conf.getOption("spark.graft.reliableCheckpoint")
      .exists(_.equalsIgnoreCase("true"))

  /** The persisted-RDD id behind a pinned frame (None when the plan is not
    * a bare pin) — lets ledger-diff cleanup loops exempt pins that must
    * survive the batch that created them. */
  def pinnedRddId(df: DataFrame): Option[Int] =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => Some(lr.rdd.id)
      case _ => None
    }

  def pin(df: DataFrame, eager: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    val pinned = if (isReliable(spark)) {
      val sc = spark.sparkContext
      if (sc.getCheckpointDir.isEmpty)
        spark.conf.getOption("spark.graft.checkpointDir").foreach(sc.setCheckpointDir)
      require(sc.getCheckpointDir.nonEmpty,
        "spark.graft.reliableCheckpoint=true needs spark.graft.checkpointDir (or SparkContext.setCheckpointDir)")
      df.checkpoint(eager)
    } else df.localCheckpoint(eager)
    val led = ledgers.get()
    if (led != null) pinned.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => led.pins += lr
      case _ => ()
    }
    pinned
  }

  // --------------------------------------------------- per-thread pin ledger

  /** Pins recorded between [[openLedger]] and [[drainLedger]] on one
    * thread. Streaming foreachBatch bodies drain the pins THEY created
    * without touching anything else on the shared SparkContext: the
    * previous scheme diffed `sc.getPersistentRDDs` (context-GLOBAL)
    * around the batch, so any CONCURRENT work — another streaming query,
    * a gateway session — that pinned during the batch window had its pin
    * unpersisted under it, and a localCheckpoint's truncated lineage
    * turns that into missing-block failures, not a recompute. The ledger
    * scopes the drain to this code path's own pins. */
  final class PinLedger private[Checkpoint] () {
    private[Checkpoint] val pins = scala.collection.mutable
      .ArrayBuffer.empty[org.apache.spark.sql.execution.LogicalRDD]
  }

  private val ledgers = new ThreadLocal[PinLedger]()

  /** Open a ledger on the calling thread: every [[pin]] this thread makes
    * until the matching [[drainLedger]] is recorded in it. One ledger per
    * thread (the single foreachBatch body is the use case) — opening a
    * second one before draining the first throws. */
  def openLedger(): PinLedger = {
    require(ledgers.get() == null, "pin ledger already open on this thread")
    val led = new PinLedger
    ledgers.set(led)
    led
  }

  /** Close the thread's ledger and release every recorded pin except the
    * ids in `keep` (cross-batch survivors like the evolving in-memory
    * index — [[pinnedRddId]] supplies their ids). Releases storage the
    * same way [[PinOps.unpin]] does: the underlying RDD's blocks, plus
    * its `rdd-<id>` directory for reliable checkpoints. Idempotent per
    * pin (unpersist of an unpersisted RDD is a no-op). */
  def drainLedger(led: PinLedger, keep: Set[Int] = Set.empty): Unit = {
    ledgers.remove()
    led.pins.foreach { lr =>
      if (!keep.contains(lr.rdd.id)) {
        lr.rdd.unpersist(blocking = false)
        lr.rdd.getCheckpointFile.foreach { dir =>
          val p = new org.apache.hadoop.fs.Path(dir)
          p.getFileSystem(lr.rdd.sparkContext.hadoopConfiguration)
            .delete(p, true)
        }
      }
    }
    led.pins.clear()
  }

  /** Chainable syntax mirroring `.localCheckpoint()` call sites. */
  implicit class PinOps(private val df: DataFrame) extends AnyVal {
    def pin(): DataFrame = Checkpoint.pin(df, eager = true)
    def pinLazy(): DataFrame = Checkpoint.pin(df, eager = false)
    /** Release a superseded pin's storage. Iterative operators call this on
      * round i's frame once round i+1's pin has materialized, so a k-round
      * loop holds TWO copies of the per-row state, not k, without waiting
      * on the ContextCleaner.
      *
      * A localCheckpoint pins at the RDD level (the checkpointed RDD is
      * persisted and registered in `sc.persistentRdds`), which
      * `Dataset.unpersist` — a CacheManager operation — does NOT touch;
      * the release must unpersist the UNDERLYING RDD out of the plan's
      * LogicalRDD. PinLedgerSpec pins this: the Dataset-level call left
      * every "released" checkpoint resident until the ContextCleaner.
      *
      * A reliable (directory-based) checkpoint's storage is its
      * `rdd-<id>` directory on the DFS, which Spark never deletes unless
      * `spark.cleaner.referenceTracking.cleanCheckpoints` happens to fire
      * — on a deep fixpoint that is one result-sized directory PER PIN
      * left on the cluster store. unpin deletes the superseded
      * directory; the contract is the same as the block release: the
      * caller asserts this frame can never be recomputed again. */
    def unpin(): Unit = df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => release(lr)
      case _ => df.unpersist(blocking = false)
    }

    /** Release EVERY pin the frame's plan references — for draining a
      * returned result whose plan is a projection/union OVER its pins
      * (pageRank's rounded select, a fixpoint's leg union), where `unpin`
      * — top-level-only by design, so loop-internal releases can never
      * reach a shared upstream pin by accident — sees no LogicalRDD.
      * Caller asserts the whole result is dead. */
    def unpinAll(): Unit = df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => release(lr)
      case _ => ()
    }

    private def release(lr: org.apache.spark.sql.execution.LogicalRDD): Unit = {
      lr.rdd.unpersist(blocking = false)
      lr.rdd.getCheckpointFile.foreach { dir =>
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
          .delete(p, true)
      }
    }
  }
}
