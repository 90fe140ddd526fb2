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

  def pin(df: DataFrame, eager: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    val reliable = spark.conf.getOption("spark.graft.reliableCheckpoint")
      .exists(_.equalsIgnoreCase("true"))
    if (reliable) {
      val sc = spark.sparkContext
      if (sc.getCheckpointDir.isEmpty)
        spark.conf.getOption("spark.graft.checkpointDir").foreach(sc.setCheckpointDir)
      require(sc.getCheckpointDir.nonEmpty,
        "spark.graft.reliableCheckpoint=true needs spark.graft.checkpointDir (or SparkContext.setCheckpointDir)")
      df.checkpoint(eager)
    } else df.localCheckpoint(eager)
  }

  /** Chainable syntax mirroring `.localCheckpoint()` call sites. */
  implicit class PinOps(private val df: DataFrame) extends AnyVal {
    def pin(): DataFrame = Checkpoint.pin(df, eager = true)
    def pinLazy(): DataFrame = Checkpoint.pin(df, eager = false)
    /** Release a superseded pin's blocks. Iterative operators call this on
      * round i's frame once round i+1's pin has materialized, so a k-round
      * loop holds TWO copies of the per-row state, not k, without waiting
      * on the ContextCleaner. No-op for directory-based reliable
      * checkpoints (nothing is persisted in block storage there).
      *
      * A localCheckpoint pins at the RDD level (the checkpointed RDD is
      * persisted and registered in `sc.persistentRdds`), which
      * `Dataset.unpersist` — a CacheManager operation — does NOT touch;
      * the release must unpersist the UNDERLYING RDD out of the plan's
      * LogicalRDD. PinLedgerSpec pins this: the Dataset-level call left
      * every "released" checkpoint resident until the ContextCleaner. */
    def unpin(): Unit = df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => df.unpersist(blocking = false)
    }
  }
}
