package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** Structured Streaming extension: windowed aggregation with watermark and
  * custom per-key state, driven through a MemoryStream in micro-batches. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("windowed per-type aggregation over a stream (streaming q_events_hour)") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val events = in.toDF.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.hourlyByType(events, late = "10 minutes")
      .writeStream.format("memory").queryName("hourly").outputMode("update").start()
    try {
      in.addData((1L, ts(9, 5), 1L, "click", 1.0, ""),
                 (2L, ts(9, 20), 2L, "click", 2.0, ""),
                 (3L, ts(9, 30), 1L, "view", 5.0, ""))
      q.processAllAvailable()
      in.addData((4L, ts(10, 1), 3L, "click", 4.0, ""))
      q.processAllAvailable()
      val out = spark.table("hourly")
        .groupBy("hour", "event_type")
        .agg(max("n").as("n"), max("total_value").as("tv"))
        .collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(out === Set(
        ("2024-01-01 09:00:00.0", "click", 2L, 3.0),
        ("2024-01-01 09:00:00.0", "view", 1L, 5.0),
        ("2024-01-01 10:00:00.0", "click", 1L, 4.0)))
    } finally q.stop()
  }

  test("per-key running state via flatMapGroupsWithState") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val events = in.toDF.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.runningUserTotals(events)
      .writeStream.format("memory").queryName("usertotals").outputMode("update").start()
    try {
      in.addData((1L, ts(9, 0), 1L, "click", 1.0, ""),
                 (2L, ts(9, 1), 1L, "click", 2.0, ""),
                 (3L, ts(9, 2), 2L, "view", 10.0, ""))
      q.processAllAvailable()
      in.addData((4L, ts(9, 3), 1L, "view", 4.0, ""))
      q.processAllAvailable()
      // state carries across batches: latest row per user has the running totals
      val latest = spark.table("usertotals")
        .groupBy("user_id").agg(max("n_events").as("n"), max("total_value").as("tv"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(latest === Set((1L, 3L, 7.0), (2L, 1L, 10.0)))
    } finally q.stop()
  }

  test("streaming dedup drops within-watermark duplicates across batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val events = in.toDF.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.dedupWithinWatermark(events, Seq("event_id"), late = "30 minutes")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      in.addData((1L, ts(9, 0), 1L, "click", 1.0, ""),
                 (1L, ts(9, 1), 1L, "click", 1.0, ""), // dup in same batch
                 (2L, ts(9, 2), 2L, "view", 2.0, ""))
      q.processAllAvailable()
      in.addData((2L, ts(9, 10), 2L, "view", 2.0, ""), // dup across batches
                 (3L, ts(9, 11), 3L, "click", 3.0, ""))
      q.processAllAvailable()
      val ids = spark.table("dedup").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("session_window: stream (append, watermarked) finalizes the same sessions as batch") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val events = in.toDF.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.sessionizeStream(events, gap = "30 minutes", late = "0 seconds")
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      // user 1: two sessions (9:00-9:10, then 10:00); user 2: one session
      in.addData((1L, ts(9, 0), 1L, "click", 1.0, ""),
                 (2L, ts(9, 10), 1L, "click", 1.0, ""),
                 (3L, ts(9, 5), 2L, "view", 1.0, ""),
                 (4L, ts(10, 0), 1L, "click", 1.0, ""))
      q.processAllAvailable()
      // sentinel far in the future pushes the watermark past every session
      in.addData((99L, ts(23, 0), 9L, "click", 1.0, ""))
      q.processAllAvailable()
      val got = spark.table("sessions").collect().map(r =>
        (r.getLong(r.fieldIndex("user_id")),
         r.getTimestamp(r.fieldIndex("session_start")).toString,
         r.getTimestamp(r.fieldIndex("session_end")).toString,
         r.getLong(r.fieldIndex("n_events")))).toSet
      assert(got === Set(
        (1L, "2024-01-01 09:00:00.0", "2024-01-01 09:10:00.0", 2L),
        (1L, "2024-01-01 10:00:00.0", "2024-01-01 10:00:00.0", 1L),
        (2L, "2024-01-01 09:05:00.0", "2024-01-01 09:05:00.0", 1L)))
    } finally q.stop()
  }

  test("incremental near-dup: streamed docs match the historical index like batch") {
    import graft.streaming.DocStream
    implicit val sq = spark.sqlContext
    val history = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 30 && length(col("text")) >= 5)
    val hist = history.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val index = DocStream.buildIndex(history)
    // planted: exact copy of doc 0, near copy of doc 1, and noise
    val newDocs = Seq(
      (1000L, hist(0L)),
      (1001L, hist(1L) + " extra trailing tokens here"),
      (1002L, "completely unrelated text about nothing in particular at all"))
    val got = scala.collection.mutable.Set.empty[(Long, Long)]
    val in = MemoryStream[(Long, String)]
    val q = DocStream.start(in.toDF.toDF("doc_id", "text"), index,
      b => got.synchronized {
        got ++= b.collect().map(r => (r.getLong(0), r.getLong(1)))
      })
    try {
      in.addData(newDocs.take(2): _*)
      q.processAllAvailable()
      in.addData(newDocs.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    // identical result to the batch path over the same docs
    val batch = DocStream.matchAgainst(newDocs.toDF("doc_id", "text"), index)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.toSet === batch)
    // the planted dups are found; the noise doc matches nothing
    assert(got.contains((1000L, 0L)), s"exact copy missed: $got")
    assert(got.contains((1001L, 1L)), s"near copy missed: $got")
    assert(!got.exists(_._1 == 1002L), s"noise matched: $got")
  }

  test("streaming drift monitor equals the batch PSI report") {
    import graft.streaming.DriftStream
    implicit val sq = spark.sqlContext
    val ref = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val dims = Seq(
      "len" -> least(floor(length(col("text")) / 200).cast("long"), lit(9L)),
      "lang" -> col("lang"), "source" -> col("source"))
    // a skewed "new crawl": drop every 3rd doc, so shares shift
    val v2 = ref.where(col("doc_id") % 3 =!= 0)
    val rows = v2.collect().map(r => (r.getLong(0), r.getString(1),
      r.getString(2), r.getString(3)))
    val mon = new DriftStream.Monitor(ref, dims)
    val in = MemoryStream[(Long, String, String, String)]
    var last: Seq[DriftStream.DriftRow] = Nil
    val ckpt = java.nio.file.Files.createTempDirectory("drift").toString
    val q = DriftStream.start(
      in.toDF.toDF("doc_id", "text", "lang", "source"), mon,
      rep => last = rep, ckpt,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      in.addData(rows.take(rows.length / 2).toIndexedSeq: _*)
      q.processAllAvailable()
      in.addData(rows.drop(rows.length / 2).toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    // the monitor's accumulated report == the batch driftReport over the
    // same reference and the same (fully-arrived) v2
    val batch = graft.pipeline.Profile.driftReport(ref, v2, dims)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(6))).toMap
    val streamed = last.map(d => (d.dim, d.bucket) ->
      (d.nRef, d.nStream, d.psi)).toMap
    assert(streamed === batch)
    // ingesting the reference itself drifts nowhere
    val self = new DriftStream.Monitor(ref, dims)
    self.ingest(ref)
    assert(self.totals().values.forall(_ === 0.0), self.totals().toString)
  }

  test("drift monitor is exactly-once under foreachBatch replay (same batchId " +
    "re-delivered after a mid-batch failure must not double-count)") {
    import graft.streaming.DriftStream
    val ref = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dims = Seq("lang" -> col("lang"))
    val mon = new DriftStream.Monitor(ref, dims)
    mon.ingest(ref, batchId = 0L)
    val once = mon.report()
    // foreachBatch is at-least-once: replaying batch 0 is a no-op
    mon.ingest(ref, batchId = 0L)
    assert(mon.report() === once, "replayed batchId double-counted")
    // a genuinely new batch still folds in
    mon.ingest(ref, batchId = 1L)
    assert(mon.report().map(_.nStream).sum === 2 * once.map(_.nStream).sum)
  }

  test("heavy-hitter monitor stateFile: a query RESTARTED from its " +
    "checkpoint with a fresh monitor keeps the summary; a different " +
    "capacity refuses the file loudly") {
    import graft.streaming.HeavyStream
    import graft.pipeline.{Bpe, Heavy}
    val base = java.nio.file.Files.createTempDirectory("graft-hhstate")
    val (data, ckpt, state) =
      (s"$base/data", s"$base/ckpt", s"$base/hh.state.json")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 40)
    val items = docs.select(explode(Bpe.words(col("text"))).as("item"))
    val i1 = docs.filter(col("doc_id") < 20)
      .select(explode(Bpe.words(col("text"))).as("item"))
    val i2 = docs.filter(col("doc_id") >= 20)
      .select(explode(Bpe.words(col("text"))).as("item"))
    def run(mon: HeavyStream.TopKMonitor): Unit = {
      val stream = spark.readStream.schema(items.schema).parquet(data)
      val q = HeavyStream.start(stream, mon, k = 10, _ => (), ckpt,
        stateFile = Some(state))
      try q.awaitTermination() finally q.stop()
    }
    i1.coalesce(1).write.mode("append").parquet(data)
    val m1 = new HeavyStream.TopKMonitor(m = 2048)
    run(m1)
    // process "dies"; more data lands; a FRESH monitor restarts from the
    // same checkpoint — the source replays nothing, the state file must
    // carry the first run's summary (and both error terms)
    i2.coalesce(1).write.mode("append").parquet(data)
    val m2 = new HeavyStream.TopKMonitor(m = 2048)
    run(m2)
    val batch = Heavy.topKExact(items, "item", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(m2.topK(10) === batch,
      s"restarted summary diverged:\n${m2.topK(10)}\nvs\n$batch")
    assert(m2.rowsSeen === items.count())
    // the error bound carried across the restart: Σ_b N_b/m over BOTH
    // runs' batches (capacity ≫ vocabulary → no merge cuts)
    assert(math.abs(m2.error - items.count().toDouble / 2048) < 1e-9,
      s"error bound lost across restart: ${m2.error}")
    // a different capacity must refuse the state file — the MG bound lies
    val bad = new HeavyStream.TopKMonitor(m = 64)
    val e = intercept[IllegalArgumentException] { run(bad) }
    assert(e.getMessage.contains("capacity"), e.getMessage)
  }

  test("drift monitor stateFile: a query RESTARTED from its checkpoint " +
    "keeps the running profile; a different reference refuses the file") {
    import graft.streaming.DriftStream
    val base = java.nio.file.Files.createTempDirectory("graft-dstate")
    val (data, ckpt, state) =
      (s"$base/data", s"$base/ckpt", s"$base/drift.state.json")
    val ref = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dims = Seq("lang" -> col("lang"))
    val v2 = ref.where(col("doc_id") % 3 =!= 0)
    val p1 = v2.filter(col("doc_id") % 2 === 0).select("lang")
    val p2 = v2.filter(col("doc_id") % 2 =!= 0).select("lang")
    def run(mon: DriftStream.Monitor): Seq[DriftStream.DriftRow] = {
      var last: Seq[DriftStream.DriftRow] = Nil
      val stream = spark.readStream.schema(p1.schema).parquet(data)
      val q = DriftStream.start(stream, mon, rep => last = rep, ckpt,
        stateFile = Some(state))
      try q.awaitTermination() finally q.stop()
      last
    }
    p1.coalesce(1).write.mode("append").parquet(data)
    run(new DriftStream.Monitor(ref, dims))
    p2.coalesce(1).write.mode("append").parquet(data)
    val m2 = new DriftStream.Monitor(ref, dims)
    val streamed = run(m2).map(d => (d.dim, d.bucket) ->
      (d.nRef, d.nStream, d.psi)).toMap
    val batch = graft.pipeline.Profile.driftReport(ref, v2, dims)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(6))).toMap
    assert(streamed === batch,
      "restarted drift profile diverged from the batch report")
    // a monitor over a DIFFERENT reference must refuse the state file —
    // its counters would compute silently wrong PSI
    val bad = new DriftStream.Monitor(ref.limit(10), dims)
    val e = intercept[IllegalArgumentException] { run(bad) }
    assert(e.getMessage.contains("DIFFERENT reference"), e.getMessage)
  }

  test("incremental index maintenance: batch 2 matches dups planted against batch 1") {
    import graft.streaming.DocStream
    implicit val sq = spark.sqlContext
    val history = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 20 && length(col("text")) >= 5)
    val hist = history.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val index0 = DocStream.buildIndex(history)
    // batch 1 introduces two NEW documents (no dups of history);
    // batch 2 plants a copy of a batch-1 doc and a copy of a history doc
    val freshA = "a genuinely new document about segmented windows and prefix sums"
    val freshB = "another new document discussing banded minhash index maintenance"
    val batch1 = Seq((2000L, freshA), (2001L, freshB))
    val batch2 = Seq(
      (3000L, freshA + " with a small trailing edit"), // near-dup of BATCH 1 doc
      (3001L, hist(0L)),                               // exact dup of HISTORY doc
      (3002L, "wholly unrelated content that matches neither corpus nor stream"))
    val perBatch = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long)]]
    val in = MemoryStream[(Long, String)]
    val q = DocStream.startIncremental(in.toDF.toDF("doc_id", "text"), index0,
      b => perBatch.synchronized {
        perBatch += b.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      })
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(perBatch.length === 2)
    assert(perBatch(0).isEmpty, s"batch 1 should match nothing: ${perBatch(0)}")
    // batch 2 finds the dup against BATCH 1 (only reachable through append)
    // and the dup against the original history, and nothing for the noise
    assert(perBatch(1).contains((3000L, 2000L)),
      s"dup against batch 1 missed (index not appended): ${perBatch(1)}")
    assert(perBatch(1).contains((3001L, 0L)), s"history dup missed: ${perBatch(1)}")
    assert(!perBatch(1).exists(_._1 == 3002L), s"noise matched: ${perBatch(1)}")
  }

  test("persisted bucketed index: save→load matches exactly what the " +
    "in-memory index matches, and the candidate join reads the stored band " +
    "layout with NO Exchange on the index side") {
    import graft.streaming.DocStream
    val history = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 40 && length(col("text")) >= 5)
    val hist0 = history.filter(col("doc_id") === 0L)
      .collect()(0).getAs[String]("text")
    val idx = DocStream.buildIndex(history)
    val dir = java.nio.file.Files.createTempDirectory("graft-ndi").toString
    DocStream.saveIndex(idx, dir, buckets = 4)
    val loaded = DocStream.loadIndex(spark, dir)
    val batch = Seq((9000L, hist0),
      (9001L, "entirely unrelated probe content about nothing at all"))
      .toDF("doc_id", "text")
    def norm(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e6))).toSet
    val mem = norm(DocStream.matchAgainst(batch, idx))
    assert(mem.exists(t => t._1 == 9000L && t._2 == 0L),
      s"planted history dup not found in-memory: $mem")
    assert(norm(DocStream.matchAgainst(batch, loaded)) === mem,
      "persisted index diverged from the in-memory index")
    // plan contract: the whole point of the bucketed save is that the
    // HISTORY side of the (band, bh) join — the big side at scale — reads
    // its stored layout without re-shuffling. Broadcast off (a broadcast
    // batch side would make the contract vacuous), AQE off so the plan
    // tree is walkable.
    val oldBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.execution.joins.{SortMergeJoinExec, ShuffledHashJoinExec}
      val plan = DocStream.matchAgainst(batch, loaded).queryExecution.executedPlan
      def readsBand(p: SparkPlan): Boolean = p.collectLeaves().exists {
        case f: FileSourceScanExec =>
          f.relation.location.rootPaths.exists(_.toString.contains("/band"))
        case _ => false
      }
      assert(readsBand(plan), s"plan must scan the persisted band table:\n$plan")
      // the DEEPEST join touching the band scan is the candidate join; its
      // band-side child must hold no exchange (exchanges above the join —
      // the pair dedup — are legitimate)
      val bandSides = plan.collect {
        case j: SortMergeJoinExec if readsBand(j.left) || readsBand(j.right) =>
          if (readsBand(j.left)) j.left else j.right
        case j: ShuffledHashJoinExec if readsBand(j.left) || readsBand(j.right) =>
          if (readsBand(j.left)) j.left else j.right
      }
      assert(bandSides.nonEmpty, s"no shuffled join over the band table:\n$plan")
      val side = bandSides.last // preorder: last = deepest = the band join
      assert(side.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"the persisted index side re-shuffled:\n$side")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldBc)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("appendIndex is a PARTITION WRITE: history files stay byte-identical, " +
    "the delta lands as new bucket files, and a re-attach matches like a " +
    "from-scratch index over the union") {
    import graft.streaming.DocStream
    val hist1 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 20 && length(col("text")) >= 5)
    val hist2 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") >= 20 && col("doc_id") < 40 && length(col("text")) >= 5)
    val dir = java.nio.file.Files.createTempDirectory("graft-ndi-app").toString
    DocStream.saveIndex(DocStream.buildIndex(hist1), dir, buckets = 4)
    def files(sub: String): Map[String, Long] = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir, sub))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(p =>
          java.nio.file.Files.isRegularFile(p) &&
          p.getFileName.toString.startsWith("part-"))
          .map(p => p.toString -> java.nio.file.Files.size(p)).toMap
      } finally s.close()
    }
    val bandBefore = files("band")
    DocStream.appendIndex(spark, dir, hist2)
    val bandAfter = files("band")
    // partition write: every pre-append file survives at its exact size,
    // and the delta added new files — nothing was rewritten
    assert(bandBefore.forall { case (p, sz) => bandAfter.get(p).contains(sz) },
      "append rewrote or dropped history files")
    assert(bandAfter.size > bandBefore.size, "append produced no new bucket files")
    // a fresh attach over the appended layout matches EXACTLY like an
    // in-memory index built from the full union
    val hit2 = hist2.filter(col("doc_id") === 20L).collect()(0).getAs[String]("text")
    val batch = Seq((9100L, hit2),
      (9101L, "noise that matches nothing in either half")).toDF("doc_id", "text")
    def norm(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e6))).toSet
    val mem = norm(DocStream.matchAgainst(batch,
      DocStream.buildIndex(hist1.unionByName(hist2))))
    assert(mem.exists(t => t._1 == 9100L && t._2 == 20L),
      s"planted delta dup not found in-memory: $mem")
    assert(norm(DocStream.matchAgainst(batch, DocStream.loadIndex(spark, dir)))
      === mem, "appended persisted index diverged from the from-scratch index")
    // COMPACTION folds the appended files back to one file per bucket
    // (file COUNT is what many appends degrade, not data volume) in a NEW
    // generation; vacuum(0) then retires the superseded one. Results are
    // bit-identical afterwards.
    DocStream.compactIndex(spark, dir)
    DocStream.vacuumIndex(spark, dir, keepPrior = 0)
    val compacted = files("band")
    assert(compacted.size <= 4 + 1, // ≤ buckets part files (+ _SUCCESS-ish)
      s"compaction left ${compacted.size} band files:\n${compacted.keys.toSeq.sorted.mkString("\n")}")
    assert(compacted.size < bandAfter.size, "compaction did not shrink files")
    assert(norm(DocStream.matchAgainst(batch, DocStream.loadIndex(spark, dir)))
      === mem, "compaction changed results")
    // compaction crash window: main dir gone, .old complete — attach
    // self-heals and the index still serves
    val fs = java.nio.file.Paths.get(dir, "band")
    java.nio.file.Files.move(fs, java.nio.file.Paths.get(dir, "band.old"))
    assert(norm(DocStream.matchAgainst(batch, DocStream.loadIndex(spark, dir)))
      === mem, "crash-window self-heal failed")
    assert(java.nio.file.Files.isDirectory(fs), "self-heal did not restore the dir")
  }

  test("a CRASHED index append's partial delta is invisible: stage→commit " +
    "debris (marker + one file already moved) heals on the next attach, " +
    "matches equal the pre-crash index, and the re-delivered batch " +
    "commits exactly once through the batchId guard") {
    import graft.streaming.DocStream
    import graft.sources.BucketedStore
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(length(col("text")) >= 5)
    val hist = docs.filter(col("doc_id") < 20)
    val delta = docs.filter(col("doc_id") >= 20 && col("doc_id") < 40)
    val dir = java.nio.file.Files.createTempDirectory("graft-ndi-crash").toString
    DocStream.saveIndex(DocStream.buildIndex(hist), dir, buckets = 4)
    // simulate the kill between file lands INSIDE the band append: the
    // delta's bucket files staged, the intent marker committed, one file
    // already moved into the live (flat gen-0) layout
    val bandDir = s"$dir/band"
    val deltaBand = DocStream.buildIndex(delta).bandIndex
    BucketedStore.write(deltaBand, s"$bandDir/_stage-crash1", Seq("band", "bh"), 4)
    val fsys = new org.apache.hadoop.fs.Path(bandDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged = fsys.listStatus(
        new org.apache.hadoop.fs.Path(s"$bandDir/_stage-crash1"))
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .map(_.getPath.getName).toSeq.sorted
    assert(staged.size >= 2, s"need a multi-file delta: $staged")
    BucketedStore.writeMeta(spark, bandDir, "_append-crash1.json",
      s"""{"gen":0,"files":[${staged.map(graft.types.Json.str).mkString(",")}]}""")
    assert(fsys.rename(
      new org.apache.hadoop.fs.Path(s"$bandDir/_stage-crash1/${staged.head}"),
      new org.apache.hadoop.fs.Path(s"$bandDir/${staged.head}")))
    // batch: one planted dup of a HIST doc, one of a DELTA doc, one noise
    val hitHist = hist.filter(col("doc_id") === 5L).collect()(0).getAs[String]("text")
    val hitDelta = delta.filter(col("doc_id") === 20L).collect()(0).getAs[String]("text")
    val batch = Seq((9100L, hitHist), (9101L, hitDelta),
      (9102L, "noise that matches nothing at all")).toDF("doc_id", "text")
    def norm(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e6))).toSet
    // the reader path heals: results equal the PRE-crash (hist-only) index
    val memHist = norm(DocStream.matchAgainst(batch, DocStream.buildIndex(hist)))
    assert(memHist.exists(_._2 == 5L) && !memHist.exists(_._2 == 20L), memHist.toString)
    assert(norm(DocStream.matchAgainst(batch, DocStream.loadIndex(spark, dir)))
      === memHist, "a crashed append's partial delta leaked into matches")
    assert(!fsys.listStatus(new org.apache.hadoop.fs.Path(bandDir)).exists { st =>
      val n = st.getPath.getName
      n.startsWith("_stage-") || n.startsWith("_append-")
    }, "attach left the crash debris")
    // re-delivery commits EXACTLY once: the append runs, the replay no-ops
    assert(DocStream.appendIndexBatch(spark, dir, delta, batchId = 1L))
    assert(!DocStream.appendIndexBatch(spark, dir, delta, batchId = 1L),
      "replayed batch re-appended past the watermark")
    val memAll = norm(DocStream.matchAgainst(batch,
      DocStream.buildIndex(hist.unionByName(delta))))
    assert(memAll.exists(_._2 == 20L), memAll.toString)
    assert(norm(DocStream.matchAgainst(batch, DocStream.loadIndex(spark, dir)))
      === memAll, "re-delivered index diverged from the from-scratch union")
  }

  test("maintainIndex is policy-driven upkeep: healthy layouts are left " +
    "alone, fragmentation past the budget triggers a renew-fenced fold + " +
    "vacuum, results are unchanged, and stats report the recovery") {
    import graft.streaming.DocStream
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(length(col("text")) >= 5)
    val hist = docs.filter(col("doc_id") < 20)
    val dir = java.nio.file.Files.createTempDirectory("graft-ndi-mnt").toString
    DocStream.saveIndex(DocStream.buildIndex(hist), dir, buckets = 4)
    val fresh = DocStream.indexStats(spark, dir)
    assert(fresh("band").gen === 0 && fresh("band").files > 0)
    assert(fresh("band").supersededGens === 0)
    // healthy: nothing folds, generation unchanged
    assert(DocStream.maintainIndex(spark, dir, maxFilesPerBucket = 4)
      === Seq.empty)
    assert(DocStream.indexStats(spark, dir)("band").gen === 0)
    // fragment: three delta appends → up to 4 files per bucket per layout
    val deltas = (0 until 3).map(i => docs
      .filter(col("doc_id") >= 20 + i * 10 && col("doc_id") < 30 + i * 10))
    deltas.foreach(d => DocStream.appendIndex(spark, dir, d))
    val fragged = DocStream.indexStats(spark, dir)
    assert(fragged("band").maxFilesPerBucket > 2 &&
      fragged("grams").maxFilesPerBucket > 2,
      s"test setup did not fragment: $fragged")
    // over budget: both layouts fold; keepPrior=0 reclaims immediately
    val folded = DocStream.maintainIndex(spark, dir,
      maxFilesPerBucket = 2, keepPrior = 0)
    assert(folded.toSet === Set("band", "grams"), s"folded: $folded")
    val after = DocStream.indexStats(spark, dir)
    assert(after("band").gen === 1 && after("grams").gen === 1)
    assert(after("band").maxFilesPerBucket === 1 &&
      after("grams").maxFilesPerBucket === 1,
      s"fold did not de-fragment: $after")
    assert(after("band").supersededGens === 0 &&
      after("band").supersededBytes === 0L,
      "vacuum(keepPrior=0) left superseded storage behind")
    // the maintained index serves exactly like a from-scratch one
    val hit = docs.filter(col("doc_id") === 25L).collect()(0).getAs[String]("text")
    val probe = Seq((9300L, hit), (9301L, "matches nothing at all"))
      .toDF("doc_id", "text")
    def norm(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e6))).toSet
    val mem = norm(DocStream.matchAgainst(probe, DocStream.buildIndex(
      hist.unionByName(deltas.reduce(_ unionByName _)))))
    assert(mem.exists(_._2 == 25L), s"planted dup not found in-memory: $mem")
    assert(norm(DocStream.matchAgainst(probe, DocStream.loadIndex(spark, dir)))
      === mem, "maintained index diverged from the from-scratch index")
    // steady state: the next upkeep call is a no-op
    assert(DocStream.maintainIndex(spark, dir, maxFilesPerBucket = 2)
      === Seq.empty)
    assert(DocStream.indexStats(spark, dir)("band").gen === 1)
  }

  test("restart-durable incremental dedup over the PERSISTED index: " +
    "batches match-then-append through the batchId guard; a replayed " +
    "batch is a disk no-op and a crash-window duplicate append never " +
    "changes results") {
    import graft.streaming.DocStream
    implicit val sq = spark.sqlContext
    val history = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 20 && length(col("text")) >= 5)
    val hist0 = history.filter(col("doc_id") === 0L)
      .collect()(0).getAs[String]("text")
    val dir = java.nio.file.Files.createTempDirectory("graft-ndi-inc").toString
    DocStream.saveIndex(DocStream.buildIndex(history), dir, buckets = 4)
    val freshA = "a genuinely new document about segmented windows and prefix sums"
    val batch1 = Seq((2000L, freshA),
      (2001L, "another new document discussing banded minhash index maintenance"))
    val batch2 = Seq(
      (3000L, freshA + " with a small trailing edit"), // near-dup of BATCH 1 doc
      (3001L, hist0),                                  // exact dup of HISTORY doc
      (3002L, "wholly unrelated content that matches neither corpus nor stream"))
    val perBatch = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long)]]
    val in = MemoryStream[(Long, String)]
    val q = DocStream.startIncrementalPersisted(in.toDF.toDF("doc_id", "text"),
      dir, b => perBatch.synchronized {
        perBatch += b.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      })
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(perBatch.length === 2)
    assert(perBatch(0).isEmpty, s"batch 1 should match nothing: ${perBatch(0)}")
    assert(perBatch(1).contains((3000L, 2000L)),
      s"dup against batch 1 missed (persisted append lost): ${perBatch(1)}")
    assert(perBatch(1).contains((3001L, 0L)), s"history dup missed: ${perBatch(1)}")
    // nothing stays pinned between batches — the index lives on disk
    // (covered by the foreachBatch ledger drain; spot-check the band scan)
    // exactly-once: REPLAYING an appended batch is a no-op on disk
    def bandFiles: Set[String] = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir, "band"))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
          .map(_.toString).toSet
      } finally s.close()
    }
    val before = bandFiles
    assert(!DocStream.appendIndexBatch(spark, dir,
      batch2.toDF("doc_id", "text"), batchId = 1L),
      "replayed batchId must be skipped")
    assert(bandFiles === before, "replayed batch wrote files")
    // crash window: an UNGUARDED duplicate append leaves duplicate index
    // rows — the post-verify pair dedup makes results identical anyway
    val probe = Seq((9200L, freshA + " probing the duplicated half"))
      .toDF("doc_id", "text")
    val clean = DocStream.matchAgainst(probe, DocStream.loadIndex(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    DocStream.appendIndex(spark, dir, batch1.toDF("doc_id", "text"))
    val dup = DocStream.matchAgainst(probe, DocStream.loadIndex(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(clean.nonEmpty && dup === clean,
      s"duplicate index rows leaked into results: $dup vs $clean")
  }

  test("compaction runs SAFELY while an incremental stream is live: the " +
    "generation swap between batches never breaks the query, appends land " +
    "in the new generation, and matches stay exact across the flip") {
    import graft.streaming.DocStream
    implicit val sq = spark.sqlContext
    val history = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 20 && length(col("text")) >= 5)
    val hist0 = history.filter(col("doc_id") === 0L)
      .collect()(0).getAs[String]("text")
    val dir = java.nio.file.Files.createTempDirectory("graft-ndi-cmp").toString
    DocStream.saveIndex(DocStream.buildIndex(history), dir, buckets = 4)
    val freshA = "compaction era document about generation pointers and file swaps"
    val perBatch = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long)]]
    val in = MemoryStream[(Long, String)]
    val q = DocStream.startIncrementalPersisted(in.toDF.toDF("doc_id", "text"),
      dir, b => perBatch.synchronized {
        perBatch += b.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      })
    try {
      in.addData((4000L, freshA), (4001L, hist0)) // one fresh, one history dup
      q.processAllAvailable()
      // the query is STILL ACTIVE (checkpoint state, evolving source) when
      // the maintenance job folds both layout halves into new generations;
      // keepPrior=1 is the grace window for anything mid-listing
      assert(q.isActive)
      DocStream.compactIndex(spark, dir)
      DocStream.vacuumIndex(spark, dir, keepPrior = 1)
      in.addData(
        (5000L, freshA + " with a trailing edit"), // near-dup of PRE-compact batch
        (5001L, hist0),                            // history dup THROUGH the new gen
        (5002L, "unrelated post-compaction content matching nothing at all"))
      q.processAllAvailable()
    } finally q.stop()
    assert(perBatch.length === 2)
    assert(perBatch(0) === Set((4001L, 0L)), s"pre-compact batch: ${perBatch(0)}")
    assert(perBatch(1).contains((5000L, 4000L)),
      s"append across the compaction flip was lost: ${perBatch(1)}")
    assert(perBatch(1).contains((5001L, 0L)),
      s"history dup missed through the compacted generation: ${perBatch(1)}")
    assert(!perBatch(1).exists(_._1 == 5002L), s"phantom match: ${perBatch(1)}")
    // both halves advanced a generation and still carry every append
    assert(graft.sources.BucketedStore.currentGen(spark, s"$dir/band") === 1)
    val probe = Seq((9300L, freshA + " probing after the era"))
      .toDF("doc_id", "text")
    val got = DocStream.matchAgainst(probe, DocStream.loadIndex(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((9300L, 4000L)),
      s"post-compaction index lost the streamed corpus: $got")
  }

  test("maintainEvery folds the index FROM INSIDE the stream: upkeep " +
    "triggers on the batch cadence, the generation advances mid-query, " +
    "and matches stay exact across the self-maintenance") {
    import graft.streaming.DocStream
    implicit val sq = spark.sqlContext
    val history = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 20 && length(col("text")) >= 5)
    val hist0 = history.filter(col("doc_id") === 0L)
      .collect()(0).getAs[String]("text")
    val dir = java.nio.file.Files.createTempDirectory("graft-ndi-auto").toString
    DocStream.saveIndex(DocStream.buildIndex(history), dir, buckets = 4)
    val freshA = "self maintaining stream document about fold cadences " +
      "and steady state upkeep of persisted generations"
    val perBatch = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long)]]
    val in = MemoryStream[(Long, String)]
    // budget of 1 file per bucket: the initial save is already at 1, so
    // the first cadence check after an append MUST fold
    val q = DocStream.startIncrementalPersisted(in.toDF.toDF("doc_id", "text"),
      dir, b => perBatch.synchronized {
        perBatch += b.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }, maintainEvery = 2, maxFilesPerBucket = 1)
    try {
      in.addData((4000L, freshA), (4001L, hist0))  // batch 0
      q.processAllAvailable()
      in.addData((5000L, freshA + " almost"))      // batch 1
      q.processAllAvailable()
      in.addData((6000L, hist0),                   // batch 2 → upkeep fires
        (6001L, freshA + " with a trailing edit"))
      q.processAllAvailable()
      assert(q.isActive)
      // the stream maintained itself: both halves folded mid-query, back
      // to one file per bucket (the post-fold steady state, statted while
      // the stream idles between batches)
      assert(graft.sources.BucketedStore.currentGen(spark, s"$dir/band") >= 1,
        "maintainEvery never folded the band layout")
      val folded = DocStream.indexStats(spark, dir)
      assert(folded("band").maxFilesPerBucket === 1 &&
        folded("grams").maxFilesPerBucket === 1,
        s"in-stream upkeep did not de-fragment: $folded")
      in.addData((7000L, freshA + " probed"),
        (7001L, "unrelated content matching nothing whatsoever")) // batch 3
      q.processAllAvailable()
    } finally q.stop()
    assert(perBatch.length === 4)
    assert(perBatch(0) === Set((4001L, 0L)), s"batch 0: ${perBatch(0)}")
    assert(perBatch(1).contains((5000L, 4000L)), s"batch 1: ${perBatch(1)}")
    assert(perBatch(2).contains((6000L, 0L)) &&
      perBatch(2).exists(p => p._1 == 6001L && Set(4000L, 5000L)(p._2)),
      s"batch 2 (the upkeep batch): ${perBatch(2)}")
    assert(perBatch(3).exists(p => p._1 == 7000L && p._2 == 4000L ||
        p._1 == 7000L && p._2 == 5000L || p._1 == 7000L && p._2 == 6001L),
      s"batch 3 through the folded generation: ${perBatch(3)}")
    assert(!perBatch(3).exists(_._1 == 7001L), s"phantom: ${perBatch(3)}")
  }

  test("MIXED-WRITER upkeep: a rival session's fold between batches is " +
    "taken cleanly, a fold beside a held lease fails LOUD, a stream that " +
    "loses a batch to a rival's lease fails loud (never silently " +
    "interleaves), and re-delivery after the lost race is exactly-once") {
    import graft.streaming.DocStream
    import graft.sources.WriterLease
    implicit val sq = spark.sqlContext
    val history = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 20 && length(col("text")) >= 5)
    val hist0 = history.filter(col("doc_id") === 0L)
      .collect()(0).getAs[String]("text")
    val dir = java.nio.file.Files.createTempDirectory("graft-ndi-rival").toString
    DocStream.saveIndex(DocStream.buildIndex(history), dir, buckets = 4)
    val freshA = "mixed writer era document about rival sessions and lease fences"
    val perBatch = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long)]]
    val in = MemoryStream[(Long, String)]
    val q = DocStream.startIncrementalPersisted(in.toDF.toDF("doc_id", "text"),
      dir, b => perBatch.synchronized {
        perBatch += b.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      })
    val rival = spark.newSession()
    try {
      in.addData((4000L, freshA), (4001L, hist0)) // batch 0
      q.processAllAvailable()
      assert(perBatch(0) === Set((4001L, 0L)), s"batch 0: ${perBatch(0)}")
      // (1) the stream is idle between batches — a RIVAL SESSION's policy
      // fold takes the free lease and folds the append fragmentation
      assert(q.isActive)
      val folded = DocStream.maintainIndex(rival, dir, maxFilesPerBucket = 1)
      assert(folded.nonEmpty, "rival fold found nothing to compact (setup)")
      assert(graft.sources.BucketedStore.currentGen(spark, s"$dir/band") >= 1,
        "rival fold never advanced the band generation")
      // (2) a fold attempted WHILE an appender holds the lease fails LOUD
      // (the exact shape of a rival maintainIndex racing a mid-flight
      // appendIndexBatch — the lease is what keeps the fold from flipping
      // a generation the append is landing rows into)
      val holding = new java.util.concurrent.CountDownLatch(1)
      val release = new java.util.concurrent.CountDownLatch(1)
      val appender = new Thread(() =>
        WriterLease.withLease(spark, dir, "appendIndexBatch-mid-flight") {
          holding.countDown(); release.await()
        })
      appender.start(); holding.await()
      intercept[WriterLease.LeaseConflictException] {
        DocStream.maintainIndex(rival, dir, maxFilesPerBucket = 1)
      }
      // (3) the STREAM loses its next batch to the held lease: the query
      // fails LOUD (the batch append refuses to interleave) instead of
      // silently landing rows beside the rival's write
      in.addData((5000L, freshA + " with a trailing edit"), (5001L, hist0))
      val streamErr = intercept[Throwable] { q.processAllAvailable() }
      def chain(t: Throwable): List[Throwable] =
        if (t == null) Nil else t :: chain(t.getCause)
      assert((chain(streamErr) ++ q.exception.toList.flatMap(chain)).exists {
        case _: WriterLease.LeaseConflictException => true
        case t => t.getMessage != null && t.getMessage.contains("writer lease")
      }, s"stream did not fail on the lease conflict: $streamErr")
      // the refused batch advanced NOTHING: watermark still at batch 0
      val meta = graft.sources.BucketedStore.readMeta(spark, dir, "index.meta.json")
      assert(meta.get("lastBatch").asLong() === 0L,
        "lost-race batch advanced the exactly-once watermark")
      release.countDown(); appender.join()
      // (4) re-delivery AFTER the lost race (what the restarted query's
      // checkpoint replay performs) is exactly-once: the whole batch
      // lands once, a second delivery of the same batchId is a no-op
      val redeliver = Seq((5000L, freshA + " with a trailing edit"),
        (5001L, hist0)).toDF("doc_id", "text")
      assert(DocStream.appendIndexBatch(spark, dir, redeliver, batchId = 1L),
        "re-delivered batch was refused")
      assert(!DocStream.appendIndexBatch(spark, dir, redeliver, batchId = 1L),
        "duplicate re-delivery was not skipped")
      // the re-delivered rows serve through the rival's folded generation
      val probe = Seq((9400L, freshA + " probing the mixed writer era"))
        .toDF("doc_id", "text")
      val got = DocStream.matchAgainst(probe, DocStream.loadIndex(spark, dir))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.contains((9400L, 4000L)) || got.contains((9400L, 5000L)),
        s"re-delivered corpus not served after the rival's fold: $got")
    } finally q.stop()
  }

  test("start-from-nothing stream: an EMPTY persisted index (no parquet " +
    "files at all — schemas come from the meta) accepts batches, and " +
    "batch 2 matches batch 1's planted dup through the appended layout") {
    import graft.streaming.DocStream
    implicit val sq = spark.sqlContext
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-ndi-zero").toString
    DocStream.saveIndex(DocStream.buildIndex(empty), dir, buckets = 4)
    val freshA = "a first ever document about cold starting a dedup index"
    val batch1 = Seq((1L, freshA),
      (2L, "a second unrelated document about nothing in particular"))
    val batch2 = Seq((3L, freshA + " with a trailing edit"))
    val perBatch = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long)]]
    val in = MemoryStream[(Long, String)]
    val q = DocStream.startIncrementalPersisted(in.toDF.toDF("doc_id", "text"),
      dir, b => perBatch.synchronized {
        perBatch += b.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      })
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(perBatch.length === 2)
    assert(perBatch(0).isEmpty, s"nothing to match at cold start: ${perBatch(0)}")
    assert(perBatch(1) === Set((3L, 1L)),
      s"batch 2 must match batch 1's planted dup: ${perBatch(1)}")
  }

  test("persisted chunk index: chunking parameters travel with the data, " +
    "and append anti-joins the stored hashes so a re-append is a no-op and " +
    "probes never double-count") {
    import graft.streaming.DocStream
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(length(col("text")) >= 32)
    val hist1 = docs.filter(col("doc_id") < 20)
    val hist2 = docs.filter(col("doc_id") >= 20 && col("doc_id") < 40)
    val dir = java.nio.file.Files.createTempDirectory("graft-cdi").toString
    DocStream.saveChunkIndex(DocStream.buildChunkIndex(hist1), dir)
    val loaded = DocStream.loadChunkIndex(spark, dir)
    assert((loaded.minLen, loaded.avgBits, loaded.maxLen) === (16, 5, 128))
    val probe = hist1.limit(2).unionByName(hist2.limit(2))
    def norm(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Double)] =
      df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // persisted probe == in-memory probe, and a full hist1 doc is all-dup
    val mem = norm(DocStream.chunkDupFraction(probe,
      DocStream.buildChunkIndex(hist1)))
    val per = norm(DocStream.chunkDupFraction(probe, loaded, "doc_id", "text"))
    assert(per === mem)
    assert(per.exists(_._2._2 === 1.0), s"hist1 probe doc should be all-dup: $per")
    // append hist2, then append it AGAIN: the anti-join makes the second a
    // no-op — stored rows stay exactly the distinct union's hashes
    DocStream.appendChunkIndex(spark, dir, hist2)
    DocStream.appendChunkIndex(spark, dir, hist2)
    val re = DocStream.loadChunkIndex(spark, dir)
    val unionDistinct = DocStream.buildChunkIndex(hist1.unionByName(hist2)).count()
    assert(re.hashes.count() === unionDistinct,
      "re-append duplicated hashes — probes would double-count lengths")
    // the hist2 probe docs are now all-dup too, through the appended layout
    val after = norm(DocStream.chunkDupFraction(probe, re, "doc_id", "text"))
    assert(after.values.forall(_._2 === 1.0), s"probe after append: $after")
    // policy upkeep: the appends fragmented some bucket past a 1-file
    // budget, so maintain folds + vacuums — and the verdicts don't move
    assert(DocStream.maintainChunkIndex(spark, dir,
      maxFilesPerBucket = 1, keepPrior = 0), "maintain skipped a fold")
    assert(graft.sources.BucketedStore.currentGen(spark, s"$dir/hashes") === 1)
    assert(graft.sources.BucketedStore.stats(spark, s"$dir/hashes")
      .supersededBytes === 0L, "vacuum(0) left superseded storage")
    assert(norm(DocStream.chunkDupFraction(probe,
      DocStream.loadChunkIndex(spark, dir), "doc_id", "text")) === after,
      "maintenance changed probe verdicts")
  }

  test("batch and stream agree on the events table (file source)") {
    val dir = "/root/testdata/sf0.001"
    // file source wants a directory it can list; stage the single parquet
    // file into a temp dir and stream it through the SAME transform as the
    // batch query, then compare group keys and totals exactly
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream").toFile
    tmp.deleteOnExit()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(tmp.getPath, "events.parquet"))
    val q = EventStream.hourlyByType(EventStream.fromParquetDir(spark, tmp.getPath))
      .writeStream.format("memory").queryName("filehourly")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getTimestamp(r.fieldIndex("hour")).toString,
         r.getString(r.fieldIndex("event_type")),
         r.getLong(r.fieldIndex("n")))
      val streamed = spark.table("filehourly").collect().map(key).toSet
      val batch = Queries.qEventsHour(spark, dir).collect().map(key).toSet
      assert(streamed.nonEmpty && streamed === batch)
    } finally q.stop()
  }

  test("streaming heavy hitters: finite stream's top-k equals the batch " +
    "operator; replayed batches don't double-count; MG shrink keeps the head") {
    import graft.streaming.HeavyStream
    import graft.pipeline.{Bpe, Heavy}
    implicit val sq = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val items = docs.select(explode(Bpe.words(col("text"))).as("item"))
    val words = items.collect().map(_.getString(0))
    // capacity far above the distinct-word count → summary is exact
    val mon = new HeavyStream.TopKMonitor(m = 2048)
    val in = MemoryStream[String]
    val ckpt = java.nio.file.Files.createTempDirectory("hh").toString
    var last: Seq[(String, Long)] = Nil
    val q = HeavyStream.start(in.toDF.toDF("item"), mon, k = 10,
      rep => last = rep, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      in.addData(words.take(words.length / 2).toIndexedSeq: _*)
      q.processAllAvailable()
      in.addData(words.drop(words.length / 2).toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val batch = Heavy.topKExact(items, "item", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(last === batch, s"stream top-k diverged:\n$last\nvs\n$batch")
    assert(mon.rowsSeen === words.length.toLong)
    // replay: a batchId the monitor already folded is a strict no-op
    val before = mon.topK(10)
    mon.ingest(items, batchId = 0L)
    assert(mon.topK(10) === before && mon.rowsSeen === words.length.toLong,
      "replayed batchId double-counted")
    // shrink path: tiny capacity still keeps the dominant item on top
    val small = new HeavyStream.TopKMonitor(m = 4)
    val skew = (Seq.fill(500)("hot") ++ (1 to 100).map(i => s"cold$i"))
    small.ingest(skew.toDF("item"), batchId = 0L)
    assert(small.topK(1).head._1 === "hot")
    // error() tracks BOTH undercount sources: the per-batch candidate
    // loss N/m plus the merge-shrink cuts — ≥ the old single-source
    // N/m figure, ≤ the worst-case 2N/m, and an actual BOUND: the
    // dominant item's reported weight may undercount by at most error()
    assert(small.error >= 600.0 / 4 && small.error <= 2 * 600.0 / 4,
      s"error out of [N/m, 2N/m]: ${small.error}")
    val hotReported = small.topK(1).head._2
    assert(500L - hotReported <= small.error.ceil.toLong,
      s"undercount ${500L - hotReported} exceeds reported bound ${small.error}")
  }

  test("fault injection: crash between offset log and commit log replays the " +
    "batch, file sink stays exactly-once vs the batch plan") {
    // the round-9 incident class: a query dies mid-batch and the restart
    // RE-DELIVERS the batch. The crash window that matters is after the
    // offset log records batch 0 but before the commit log does — on
    // restart the engine re-executes batch 0, and the FileStreamSink's own
    // transaction log must refuse the duplicate write. Injected here by
    // deleting checkpoint/commits/0 after a clean run (byte-identical to
    // dying at that point), then restarting against the same sink.
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val src = java.nio.file.Files.createTempDirectory("fi-src").toString
    val out = java.nio.file.Files.createTempDirectory("fi-out").toString + "/sink"
    val ckpt = java.nio.file.Files.createTempDirectory("fi-ckpt").toString
    // stage inputs as top-level single files (the file source lists the
    // directory's leaves, not nested non-partition subdirs)
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("fi-stage").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(src, s"$name.parquet"))
    }
    stage(events.where(col("event_id") % 2 === 0), "part1")

    def run(): Unit = {
      val q = EventStream.fromParquetDir(spark, src)
        .where(col("value") > 0)
        .select(col("event_id"), col("event_type"), col("value"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      // AvailableNow termination races the checkpoint-path lock release;
      // a restart before deregistration trips the "multiple streaming
      // queries concurrently using <ckpt>" guard — wait it out
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.streams.active.exists(_.id == q.id) &&
        System.nanoTime() < deadline) Thread.sleep(50)
    }
    run()
    val afterBatch0 = spark.read.parquet(out).count()
    assert(afterBatch0 > 0)
    // crash injection: offsets/0 exists, commits/0 vanishes (including the
    // local-FS checksum sidecar — a lost commit loses both)
    val commit0 = java.nio.file.Paths.get(ckpt, "commits", "0")
    assert(java.nio.file.Files.deleteIfExists(commit0), "commit log layout moved")
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(ckpt, "commits", ".0.crc"))
    // more input arrives while "down"
    stage(events.where(col("event_id") % 2 =!= 0), "part2")
    run() // restart: re-executes batch 0 (re-delivery), then batch 1
    val got = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sorted.toSeq
    val want = graft.sources.Sources.nanosTsToMicros(
        spark.read.schema(spark.read.parquet(src).schema).parquet(src))
      .where(col("value") > 0)
      .select(col("event_id"), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sorted.toSeq
    assert(got === want, "file sink not exactly-once under batch re-delivery")
  }

  test("stateless corpus ops (scrub, quality, split, weighted sample) run unchanged on a doc stream") {
    import org.apache.spark.sql.functions._
    val src = "/root/testdata/sf0.001/documents.parquet"
    val schema = spark.read.parquet(src).schema
    def enrich(df: org.apache.spark.sql.DataFrame) =
      graft.pipeline.Sampling.weightedHashSample(
          graft.pipeline.Sampling.hashSplit(df, col("doc_id")), col("doc_id"),
          least(lit(1.0),
            graft.pipeline.TextAnalysis.stopwordRatio(col("text")) * 10.0))
        .select(col("doc_id") +:
          graft.pipeline.TextAnalysis.scrub(col("text")).as("text") +:
          graft.pipeline.TextAnalysis.qualityScore(col("text")).as("quality") +:
          col("split") +:
          // repetition signals are in-row too — stream face identical
          graft.pipeline.TextAnalysis.repetitionSignals(col("text"))
            .map { case (n, c) => c.as(n) }: _*)
    val batch = enrich(spark.read.parquet(src)).collect().map(_.toSeq).toSet
    val f = new java.io.File(src)
    val q = enrich(spark.readStream.schema(schema)
        .parquet(s"${f.getParent}/{${f.getName}}"))
      .writeStream.format("memory").queryName("statelessdocs")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("statelessdocs").collect().map(_.toSeq).toSet
      assert(streamed.nonEmpty && streamed === batch)
    } finally q.stop()
  }

  test("event-time ingest normalizes every shipped parquet ts precision identically") {
    // The generated events table has shipped ts as TIMESTAMP(NANOS)
    // (surfacing as long under nanosAsLong) in rounds ≤8 and
    // TIMESTAMP(MICROS)/NTZ from round 9 — the silent unit flip that broke
    // both streaming gates. Lock the contract: all three surfaced forms
    // (instant, NTZ micros, long nanos) normalize to the SAME instant
    // column, for the batch loader and the streaming source alike.
    import graft.sources.Sources
    val base = java.nio.file.Files.createTempDirectory("tsprec-").toString
    val rows = Seq(
      (1L, ts(9, 5), 1L, "click", 1.0, ""),
      (2L, ts(9, 20), 2L, "purchase", 2.0, ""),
      (3L, ts(10, 1), 1L, "view", 3.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.write.parquet(s"$base/ltz")                                   // instant micros
    rows.withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.parquet(s"$base/ntz")                                     // NTZ micros
    rows.withColumn("ts", unix_micros(col("ts")) * 1000L)
      .write.parquet(s"$base/nanos")                                   // long nanos
    val expect = rows.orderBy("event_id").collect().map(_.toSeq).toSeq
    for (variant <- Seq("ltz", "ntz", "nanos")) {
      val batch = Sources.nanosTsToMicros(spark.read.parquet(s"$base/$variant"))
      assert(batch.schema("ts").dataType ===
        org.apache.spark.sql.types.TimestampType, s"batch $variant")
      assert(batch.orderBy("event_id").collect().map(_.toSeq).toSeq === expect,
        s"batch $variant values")
      val stream = EventStream.fromParquetDir(spark, s"$base/$variant")
      assert(stream.isStreaming, s"stream $variant")
      assert(stream.schema("ts").dataType ===
        org.apache.spark.sql.types.TimestampType, s"stream $variant type")
      // and the watermark the gates rely on resolves against it
      EventStream.hourlyByTypeExact(stream)
    }
  }

  test("stream-stream interval join (purchase×click) equals the batch range join") {
    val dir = "/root/testdata/sf0.001"
    val events = graft.sources.Sources.nanosTsToMicros(
      spark.read.parquet(s"$dir/events.parquet"))
    // ONE definition, both modes: batch (watermarks no-op) vs streaming
    val batch = EventStream.purchaseClickJoin(events).collect()
      .map(_.toSeq).toSet
    val q = EventStream.purchaseClickJoin(
        EventStream.fromParquetDir(spark, s"$dir/events.parquet"))
      .writeStream.format("memory").queryName("pcjoin")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("pcjoin").collect().map(_.toSeq).toSet
      assert(streamed.nonEmpty, "no purchase-click matches in fixture")
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming contract monitor: cumulative report equals the batch check, " +
       "replayed batches never double-count") {
    import spark.implicits._
    import graft.pipeline.Contract
    import graft.pipeline.Contract._
    val exps = Seq(
      NotNull("text", minFraction = 0.9),
      IsIn("lang", Seq("en", "fr"), minFraction = 0.7),
      RowCount(2, 10),
      RefIn("src", Seq("s1", "s2").toDF("k"), "k", minFraction = 0.9))
    val b1 = Seq((1L, "alpha", "en", "s1"), (2L, null: String, "fr", "s2"))
      .toDF("id", "text", "lang", "src")
    val b2 = Seq((3L, "gamma", "xx", "s9"), (4L, "delta", "en", "s1"))
      .toDF("id", "text", "lang", "src")
    val mon = new graft.streaming.ContractStream.Monitor(exps)
    mon.ingest(b1, batchId = 0L)
    mon.ingest(b1, batchId = 0L) // at-least-once redelivery: must no-op
    mon.ingest(b2, batchId = 1L)
    val streamed = mon.report().map(r => (r._1, r._2, r._3, r._4, r._5))
    val batch = Contract.check(b1.unionByName(b2), exps).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4))).toSeq
    assert(streamed === batch)
    assert(!mon.healthy()) // not_null 0.75 < 0.9 must trip the alarm
  }

  test("streaming unique monitor: the HLL ratio tracks the exact batch " +
       "check within the sketch's published bound, a unique prefix never " +
       "false-alarms, and a restart restores from snapshot") {
    import spark.implicits._
    import graft.pipeline.Contract
    import graft.pipeline.Contract._
    val lgK = 12
    val bound = 3 * 1.04 / math.sqrt(math.pow(2.0, lgK)) // 3σ ≈ 0.0488
    val exps = Seq(Unique(Seq("id")), NotNull("id"))
    val b1 = spark.range(0, 1000).toDF("id")            // all distinct
    val b2 = spark.range(500, 1500).toDF("id")          // 500 duplicates

    val mon = new graft.streaming.ContractStream.Monitor(exps, lgK)
    mon.ingest(b1, batchId = 0L)
    // unique prefix: metric ~1.0 and the 2σ-upper-bound pass must HOLD
    val pre = mon.report().head
    assert(pre._1.startsWith("unique~hll[lgk=12,rse=0.01"), pre._1)
    assert(math.abs(pre._3 - 1.0) <= bound && pre._5, pre.toString)

    // snapshot/restore at the batch boundary: a restarted monitor must
    // continue to the same report as the uninterrupted one
    val resumed = new graft.streaming.ContractStream.Monitor(exps, lgK)
    resumed.restore(mon.snapshot())

    Seq(mon, resumed).foreach(_.ingest(b2, batchId = 1L))
    assert(mon.report() === resumed.report())

    // 2000 rows, 1500 distinct: exact batch metric 0.75 — the sketch
    // ratio lands within the published 3σ band and the alarm TRIPS
    val exact = Contract.check(b1.unionByName(b2), exps)
      .collect().head.getDouble(2)
    assert(exact === 0.75)
    val row = mon.report().head
    assert(math.abs(row._3 - exact) <= bound,
      s"sketch ratio ${row._3} vs exact $exact — outside ±$bound")
    assert(!row._5 && !mon.healthy(), row.toString)

    // null keys leave the distinct-domain numerator, like countDistinct
    val mon2 = new graft.streaming.ContractStream.Monitor(
      Seq(Unique(Seq("k"))), lgK)
    mon2.ingest(Seq(Some(1L), Some(2L), None).toDF("k"))
    val r2 = mon2.report().head
    assert(math.abs(r2._3 - 2.0 / 3) <= bound, r2.toString)
  }

  test("contract monitor stateFile: a query RESTARTED from its checkpoint " +
       "with a fresh monitor keeps the cumulative counts") {
    import spark.implicits._
    import graft.pipeline.Contract
    import graft.pipeline.Contract._
    val base = java.nio.file.Files.createTempDirectory("graft-cstate")
    val (data, ckpt, state) =
      (s"$base/data", s"$base/ckpt", s"$base/monitor.state.json")
    val exps = Seq(NotNull("text"), Unique(Seq("id")), RowCount(1, 100))
    val p1 = Seq((1L, "alpha"), (2L, null: String), (3L, "gamma"))
      .toDF("id", "text")
    val p2 = Seq((3L, "gamma-dup"), (4L, "delta")).toDF("id", "text")
    def run(mon: graft.streaming.ContractStream.Monitor): Unit = {
      val stream = spark.readStream.schema(p1.schema).parquet(data)
      val q = graft.streaming.ContractStream.start(stream, mon, _ => (),
        ckpt, stateFile = Some(state))
      try q.awaitTermination() finally q.stop()
    }
    p1.coalesce(1).write.mode("append").parquet(data)
    val m1 = new graft.streaming.ContractStream.Monitor(exps)
    run(m1)
    // process "dies"; more data lands; a FRESH monitor restarts from the
    // same checkpoint — the source replays nothing, the state file must
    // carry the first run's counts
    p2.coalesce(1).write.mode("append").parquet(data)
    val m2 = new graft.streaming.ContractStream.Monitor(exps)
    run(m2)
    val streamed = m2.report()
    val batch = Contract.check(p1.unionByName(p2), exps).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4))).toSeq
    // fraction + count rows are EXACT across the restart; the unique row
    // is the sketch face — same target/verdict, metric within its bound
    assert(streamed(0) === batch(0) && streamed(2) === batch(2), streamed.toString)
    assert(streamed(1)._2 === batch(1)._2 &&
      math.abs(streamed(1)._3 - batch(1)._3) <= 0.05 &&
      streamed(1)._5 === batch(1)._5, s"${streamed(1)} vs ${batch(1)}")

    // a restart with a CHANGED contract must refuse the state file loudly —
    // restoring it would misassign the per-rule counter indices
    val changed = new graft.streaming.ContractStream.Monitor(
      Seq(Unique(Seq("id")), NotNull("text")))
    val err = intercept[IllegalArgumentException] {
      val stream = spark.readStream.schema(p1.schema).parquet(data)
      graft.streaming.ContractStream.start(stream, changed, _ => (),
        ckpt, stateFile = Some(state))
    }
    assert(err.getMessage.contains("DIFFERENT expectation list"))

    // same expectations but a DIFFERENT lgK must refuse too: restoring a
    // sketch of another precision would silently union mixed precisions
    // and publish a wrong rse in the rule label
    val otherLgK = new graft.streaming.ContractStream.Monitor(exps, lgK = 14)
    val err2 = intercept[IllegalArgumentException] {
      val stream = spark.readStream.schema(p1.schema).parquet(data)
      graft.streaming.ContractStream.start(stream, otherLgK, _ => (),
        ckpt, stateFile = Some(state))
    }
    assert(err2.getMessage.contains("sketch lgK"))
  }

  test("streaming maintenance of the persisted IVF-PQ serving index: " +
    "streamed vectors become searchable, a REPLAYED batchId is a disk " +
    "no-op, and a crash-window duplicate append is invisible in the " +
    "served top-k") {
    import graft.pipeline.Similarity
    import graft.rel.Checkpoint.PinOps
    implicit val sq = spark.sqlContext
    def vec(id: Long): Array[Float] = {
      val r = new scala.util.Random(id * 7919 + 17)
      Array.fill(16)(r.nextFloat() * 2f - 1f)
    }
    val seed = (0L until 48L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val deltaRows = (48L until 64L).map(i => (i, vec(i)))
    val corpus = seed.unionByName(deltaRows.toDF("vec_id", "embedding"))
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq-str").toString
    val idx = Similarity.ivfPqBuild(seed, nlist = 8, m = 8, codes = 16)
    Similarity.saveIvfPq(idx, dir)
    idx.centroids.unpinAll(); idx.codebooks.unpinAll(); idx.codes.unpinAll()
    // the withheld vectors arrive as TWO micro-batches (batchIds 0, 1)
    val in = MemoryStream[(Long, Array[Float])]
    val q = Similarity.startIvfPqAppendStream(
      in.toDF.toDF("vec_id", "embedding"), dir)
    try {
      in.addData(deltaRows.take(8): _*); q.processAllAvailable()
      in.addData(deltaRows.drop(8): _*); q.processAllAvailable()
    } finally q.stop()
    def codeRows: Long = spark.read.parquet(s"$dir/codes").count()
    assert(codeRows === 64L, "streamed appends did not land in the codes store")
    // a streamed-in vector is SERVED: probing with vector 50's exact
    // embedding returns 50 as the top hit at cosine ≈ 1
    val probe = Seq((50L, vec(50L))).toDF("q_id", "q_vec")
    def top1: (Long, Double) = {
      val r = Similarity.ivfPqSearch(probe, Similarity.loadIvfPq(spark, dir),
          corpus, k = 3, nprobe = 8)
        .orderBy(col("cosine").desc).collect()(0)
      (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))
    }
    val (hit, cos) = top1
    assert(hit === 50L && cos > 0.999,
      s"streamed vector not served: top1=$hit cosine=$cos")
    // exactly-once: replaying an applied batchId is refused AND a disk no-op
    assert(!Similarity.appendIvfPqBatch(spark, dir,
      deltaRows.take(8).toDF("vec_id", "embedding"), batchId = 0L),
      "replayed batchId must be skipped")
    assert(codeRows === 64L, "replayed batch wrote code rows")
    // crash window (insert done, meta not advanced): duplicate code rows
    // exist on disk but never reach the served results — the pre-top-k
    // candidate dedup keeps them out of the k·overFetch cut
    Similarity.appendIvfPq(spark, dir,
      deltaRows.take(4).toDF("vec_id", "embedding"))
    assert(codeRows === 68L, "duplicate injection did not land (test setup)")
    val served = Similarity.ivfPqSearch(probe,
      Similarity.loadIvfPq(spark, dir), corpus, k = 10, nprobe = 8).collect()
    val pairs = served.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")))
    assert(pairs.distinct.length === pairs.length,
      s"duplicate (q_id, vec_id) pairs in served top-k: ${pairs.mkString(",")}")
    assert(served.length === 10, s"top-k shrank to ${served.length}")
    val (hit2, cos2) = top1
    assert(hit2 === 50L && cos2 > 0.999,
      "crash-window duplicates changed the served top hit")
  }
}
