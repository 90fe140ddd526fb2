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
}
