package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Classifier, Retrieval, Selection, Similarity}
import graft.rel.Checkpoint.PinOps

/** Pin ledger: one-shot pipeline operators must RELEASE their
  * executor-storage pins (localCheckpoints) before returning — at most the
  * documented bounded RESULT pin may remain, and unpersisting that result
  * must drain the ledger back to the baseline. Guards the eager-release
  * discipline (bm25/dsir/classifier one-shot unpins, lloydRefine's
  * base/per-round releases) against silent regressions: a leaked pin here
  * is corpus-sized executor storage held until the ContextCleaner happens
  * to run — on a 100 TB job, that is memory pressure and spilled shuffles
  * for the rest of the application. */
class PinLedgerSpec extends SparkSpec {
  import spark.implicits._

  /** Live persisted-RDD ids — localCheckpoint registers here and
    * `unpersist` removes synchronously, so before/after set difference IS
    * the operator's pin ledger. */
  private def live: Set[Int] = spark.sparkContext.getPersistentRDDs.keys.toSet

  private lazy val docs = (0 until 200).map { i =>
    (i.toLong, s"alpha beta gamma token$i doc ${"word " * (i % 9)}content", i % 2)
  }.toDF("doc_id", "text", "label")

  private lazy val embeds = (0 until 300).map { i =>
    (i.toLong, Array.tabulate(16)(j => math.sin(i * 31.0 + j).toFloat))
  }.toDF("vec_id", "embedding")

  test("bm25 one-shot: corpus-sized pins released, only the bounded result " +
       "pin remains, and unpersisting it drains the ledger") {
    val queries = Seq((1L, "alpha beta"), (2L, "token42")).toDF("query_id", "qtext")
    val before = live
    val r = Retrieval.bm25(docs, queries, k = 5)
    assert(r.count() > 0)
    val extra = live -- before
    assert(extra.size <= 1, s"bm25 left ${extra.size} pins (index/candidates leak)")
    r.unpin()
    assert((live -- before).isEmpty, "unpinning the bm25 result did not drain the ledger")
  }

  test("dsirSample and dsirSelect: the corpus weight pin is released before return") {
    val target = docs.where(col("label") === 1)
    val before = live
    assert(Selection.dsirSample(docs, target, n = 20).count() === 20)
    assert(Selection.dsirSelect(docs, target, n = 20).count() === 20)
    assert((live -- before).isEmpty,
      s"dsir left ${(live -- before).size} pins after returning a driver-bounded sample")
  }

  test("classifier training: per-iteration feature/weight pins all released") {
    val before = live
    val (_, losses) = Classifier.trainLogistic(docs, col("label") === 1, iters = 4)
    assert(losses.nonEmpty)
    assert((live -- before).isEmpty,
      s"trainLogistic left ${(live -- before).size} pins")
  }

  test("ivf quantizer training: driver tier leaves nothing; distributed " +
       "Lloyd leaves only the final centroid pin") {
    val before = live
    assert(Similarity.ivfCentroids(embeds, nlist = 4, lloydIters = 2).count() === 4)
    assert((live -- before).isEmpty,
      s"driver-tier quantizer left ${(live -- before).size} pins")
    // force the distributed loop (cap 0 disables the driver tier): the
    // training base and every superseded round's centroids must release;
    // the final centroids are the result pin
    spark.conf.set("spark.graft.kmeansDriverCap", "0")
    try {
      val before2 = live
      val cents = Similarity.ivfCentroids(embeds, nlist = 4, lloydIters = 3)
      assert(cents.count() === 4)
      val extra = live -- before2
      assert(extra.size <= 1,
        s"distributed Lloyd left ${extra.size} pins (base or stale rounds leak)")
      cents.unpin()
      assert((live -- before2).isEmpty)
    } finally spark.conf.unset("spark.graft.kmeansDriverCap")
  }

  test("lloydRefine degenerate input (lloydIters=0) releases the probe pin " +
       "on the early-return path") {
    val before = live
    assert(Similarity.ivfCentroids(embeds, nlist = 4, lloydIters = 0).count() === 4)
    assert((live -- before).isEmpty, "iters=0 early return leaked the base pin")
  }

  test("connectedComponents: pair/edge pins release on BOTH tiers and " +
       "superseded label rounds release in-loop") {
    // one 300-cycle: pointer doubling needs ~log2(300) rounds, so the
    // in-loop release is actually exercised
    val pairs = (0 until 300).map(i => (i.toLong, ((i + 1) % 300).toLong))
      .toDF("id_a", "id_b")
    val before = live
    assert(graft.pipeline.Cluster.connectedComponents(pairs).count() === 300)
    assert((live -- before).isEmpty,
      "driver-tier CC returned local rows but left the pair/edge pins")
    val before2 = live
    val cc = graft.pipeline.Cluster.connectedComponents(pairs, driverEdgeCap = 0)
    assert(cc.count() === 300)
    val extra = live -- before2
    assert(extra.size <= 1,
      s"distributed CC left ${extra.size} pins (edge layout or stale label rounds)")
    cc.unpinAll()
    assert((live -- before2).isEmpty)
  }

  test("pqTrain: the subvector sample and superseded codebook rounds " +
       "release on both tiers; only the final codebook pin remains") {
    val before = live
    assert(Similarity.pqTrain(embeds, m = 4, codes = 4, lloydIters = 2)
      .count() === 16)
    assert((live -- before).isEmpty,
      "driver-tier pqTrain left pins (sample not released)")
    spark.conf.set("spark.graft.kmeansDriverCap", "0")
    try {
      val before2 = live
      val cb = Similarity.pqTrain(embeds, m = 4, codes = 4, lloydIters = 3)
      assert(cb.count() === 16)
      val extra = live -- before2
      assert(extra.size <= 1,
        s"distributed pqTrain left ${extra.size} pins (sample or stale rounds)")
      cb.unpin()
      assert((live -- before2).isEmpty)
    } finally spark.conf.unset("spark.graft.kmeansDriverCap")
  }

  test("a caller done with a lazy dedup result drains its backing pins " +
       "with unpinAll") {
    val before = live
    val pairs = graft.pipeline.Dedup.minhashPairs(docs)
    pairs.count()
    assert((live -- before).nonEmpty, "minhashPairs should pin grams/signatures")
    pairs.unpinAll()
    assert((live -- before).isEmpty, "unpinAll left backing pins resident")
  }

  test("pageRank: the EDGE-sized layout and node-set pins are released; " +
       "only the node-sized result remains, and unpinAll drains it") {
    val edges = (0 until 400)
      .map(i => (s"n${i % 50}", s"n${(i * 7 + 3) % 50}")).toDF("src", "dst")
    val before = live
    val pr = graft.rel.Graph.pageRank(edges, iters = 3, dangling = true, tol = 1e-9)
    assert(pr.count() === 50)
    val extra = live -- before
    assert(extra.size <= 1,
      s"pageRank left ${extra.size} pins (edge layout / node set leak)")
    pr.unpinAll()
    assert((live -- before).isEmpty, "unpinAll did not drain the rank pin")
  }

  test("while fixpoint, driver tier: converging on the driver releases the seed pin") {
    import org.apache.spark.sql.functions.col
    val before = live
    val out = graft.rel.WhileFix(Seq(0).toDF("A1"),
      d => d.filter(col("A1") < 10).select((col("A1") + 1).as("A1")))
    assert(out.count() === 11)
    assert((live -- before).isEmpty,
      "driver-tier convergence returned local rows but left the seed pinned")
  }

  test("while fixpoint, distributed tier: superseded compactions and absorbed " +
       "frontiers release once their successor materializes — resident pins " +
       "are O(legs since last compaction), not O(rounds)") {
    import org.apache.spark.sql.functions.col
    val before = live
    // depth-20 chain, 1 step/round, compact every 2 rounds → ~20 rounds,
    // ~10 compactions. Unreleased, the ledger would hold ~30 pins.
    val probe = new graft.rel.WhileFix.Probe
    val out = graft.rel.WhileFix(Seq(0).toDF("A1"),
      d => d.filter(col("A1") < 20).select((col("A1") + 1).as("A1")),
      compactEvery = 2, stepsPerRound = 1, tinyRows = 0L, probe = probe)
    assert(out.count() === 21)
    assert(probe.distributedRounds >= 10, "test must exercise many compactions")
    val extra = live -- before
    assert(extra.size <= 4, // last compaction pin + ≤2 legs + slack
      s"fixpoint left ${extra.size} resident pins — superseded compactions leak")
    out.unpinAll()
    assert((live -- before).isEmpty, "unpinAll did not drain the result legs")
  }

  test("streaming incremental dedup holds ONE index generation (in-memory " +
       "face) / NOTHING between batches (persisted face)") {
    import graft.streaming.DocStream
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val history = (0 until 50)
      .map(i => (i.toLong, s"history document number $i about topic ${i % 7}"))
      .toDF("doc_id", "text")
    val batches = (0 until 4).map(b => (100L + b,
      s"streamed document $b arriving later with fresh content"))
    // in-memory face: after N batches, live pins = index0's (caller-owned)
    // + ONE current generation (2 pins) + nothing per batch
    val index0 = DocStream.buildIndex(history)
    val before = live
    val in = MemoryStream[(Long, String)]
    val q = DocStream.startIncremental(in.toDF.toDF("doc_id", "text"),
      index0, _.count())
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val extra = live -- before
    assert(extra.size <= 2,
      s"in-memory incremental dedup accumulated ${extra.size} pins over " +
      "4 batches — superseded index generations leak")
    // persisted face: the index is the DIRECTORY; the ledger returns to
    // baseline after every batch
    val dir = java.nio.file.Files.createTempDirectory("graft-ndi-ledger").toString
    DocStream.saveIndex(index0, dir, buckets = 4)
    index0.bandIndex.unpin(); index0.grams.unpinAll()
    val before2 = live
    val in2 = MemoryStream[(Long, String)]
    val q2 = DocStream.startIncrementalPersisted(in2.toDF.toDF("doc_id", "text"),
      dir, _.count())
    try {
      batches.foreach { b => in2.addData(b); q2.processAllAvailable() }
    } finally q2.stop()
    assert((live -- before2).isEmpty,
      s"persisted incremental dedup left ${(live -- before2).size} pins — " +
      "the per-batch ledger drain regressed")
  }

  test("the foreachBatch ledger drain never touches CONCURRENT pins on the " +
       "shared context: a frame pinned by another thread DURING the batch " +
       "window stays resident and readable (global-registry-diff regression " +
       "— the old drain unpersisted it, and truncated lineage then meant " +
       "missing-block failures, not a recompute)") {
    import graft.streaming.DocStream
    import graft.rel.Checkpoint
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val history = (0 until 30)
      .map(i => (i.toLong, s"ledger isolation history doc $i topic ${i % 5}"))
      .toDF("doc_id", "text")
    val index0 = DocStream.buildIndex(history)
    // the "gateway session": another thread pins mid-batch
    @volatile var other: org.apache.spark.sql.DataFrame = null
    val in = MemoryStream[(Long, String)]
    val q = DocStream.start(in.toDF.toDF("doc_id", "text"), index0, m => {
      val t = new Thread(() => {
        other = (0 until 40).map(i => (i.toLong, i * 2.0)).toDF("k", "v").pin()
      })
      t.start(); t.join()
      m.count()
    })
    try { in.addData((900L, "a fresh streamed doc")); q.processAllAvailable() }
    finally q.stop()
    assert(other != null)
    val id = Checkpoint.pinnedRddId(other)
    assert(id.exists(spark.sparkContext.getPersistentRDDs.contains),
      "the concurrent thread's pin was unpersisted by the batch drain")
    assert(other.count() === 40,
      "the concurrent pin's blocks are gone — drain touched foreign storage")
    other.unpin()
    // and the ledger itself: records only this thread's pins, honors keep
    val led = Checkpoint.openLedger()
    val a = Seq((1, 2)).toDF("x", "y").pin()
    val b = Seq((3, 4)).toDF("x", "y").pin()
    @volatile var foreign: org.apache.spark.sql.DataFrame = null
    val t2 = new Thread(() => { foreign = Seq((5, 6)).toDF("x", "y").pin() })
    t2.start(); t2.join()
    Checkpoint.drainLedger(led, keep = Checkpoint.pinnedRddId(b).toSet)
    val liveNow = spark.sparkContext.getPersistentRDDs.keys.toSet
    assert(!Checkpoint.pinnedRddId(a).exists(liveNow), "drained pin survived")
    assert(Checkpoint.pinnedRddId(b).exists(liveNow), "keep id was drained")
    assert(Checkpoint.pinnedRddId(foreign).exists(liveNow),
      "another thread's pin was recorded in this thread's ledger")
    b.unpin(); foreign.unpin()
  }

  test("reliable checkpoints: superseded pins DELETE their rdd-* directories " +
       "— a deep fixpoint leaves O(result) files on the DFS, not O(rounds)") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-reclaim")
    spark.conf.set("spark.graft.reliableCheckpoint", "true")
    // sc's checkpoint dir is global and sticky — set it directly so this
    // test's dir wins even if another suite configured one earlier
    spark.sparkContext.setCheckpointDir(dir.toString)
    try {
      val out = graft.rel.WhileFix(Seq(0).toDF("A1"),
        d => d.filter(col("A1") < 12).select((col("A1") + 1).as("A1")),
        compactEvery = 2, stepsPerRound = 1, tinyRows = 0L)
      assert(out.count() === 13)
      def rddDirs: Seq[java.nio.file.Path] = {
        val s = java.nio.file.Files.walk(dir)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.filter(p =>
            p.getFileName.toString.startsWith("rdd-")).toList
        } finally s.close()
      }
      // ~12 rounds × (fresh pin + eager compactions) would be 15+ dirs
      // unreclaimed; the release discipline holds only the live legs
      val liveDirs = rddDirs
      assert(liveDirs.nonEmpty, "reliable mode must produce directory checkpoints")
      assert(liveDirs.size <= 4,
        s"${liveDirs.size} rdd-* dirs left on the checkpoint store — superseded " +
        "reliable pins are not being deleted")
      // the survivors are the result's storage: the frame still reads green
      assert(out.count() === 13)
      out.unpinAll()
      assert(rddDirs.isEmpty, "unpinAll must reclaim the result's directories")
    } finally {
      spark.conf.set("spark.graft.reliableCheckpoint", "false")
    }
  }
}
