package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Pack

/** Context-window chunking + greedy sequence packing laws. */
class PackSpec extends SparkSpec {
  import spark.implicits._

  private def mkDoc(id: Long, n: Int): (Long, String) =
    (id, (0 until n).map(i => s"w${id}_$i").mkString(" "))

  private lazy val docs = spark.createDataFrame(
    Seq(mkDoc(1, 10), mkDoc(2, 40), mkDoc(3, 41), mkDoc(4, 99), mkDoc(5, 70),
      (6L, "   "), mkDoc(7, 1), mkDoc(8, 300))).toDF("doc_id", "text")

  test("chunkSplit: reconstruction law — dropping the overlap from every " +
    "chunk after the first restores the original token stream") {
    val out = Pack.chunkSplit(docs, chunkTokens = 40, overlap = 10)
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
    for ((id, rows) <- out) {
      val chunks = rows.sortBy(_.getAs[Int]("chunk_idx"))
        .map(_.getAs[String]("chunk").split("\\s+").toSeq)
      val rebuilt = chunks.head ++ chunks.tail.flatMap(_.drop(10))
      val orig = docs.filter(col("doc_id") === id).collect()(0)
        .getAs[String]("text").trim.split("\\s+").toSeq
      assert(rebuilt === orig, s"doc $id")
      assert(chunks.forall(c => c.nonEmpty && c.size <= 40))
    }
  }

  test("chunkSplit: chunk counts follow ceil((n-overlap)/stride) and blank docs vanish") {
    val counts = Pack.chunkSplit(docs, chunkTokens = 40, overlap = 10)
      .groupBy("doc_id").agg(count(lit(1)).as("nc"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("nc")).toMap
    assert(counts === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 2L,
      7L -> 1L, 8L -> 10L)) // doc 6 (blank) absent
  }

  test("packGreedy: never overflows, pack ids contiguous, greedy-tight") {
    val packed = Pack.packGreedy(docs, budget = 100, buckets = 2).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("pack_id"),
        r.getAs[Long]("doc_id"), r.getAs[Int]("n_tokens")))
    assert(packed.length === 8)
    val byPack = packed.groupBy(p => (p._1, p._2))
    // no pack exceeds the budget
    assert(byPack.values.forall(_.map(_._4).sum <= 100))
    for ((bucket, rows) <- packed.groupBy(_._1)) {
      val inOrder = rows.sortBy(_._3)
      // pack ids start at 0 and never jump by more than 1
      assert(inOrder.head._2 === 0L)
      assert(inOrder.sliding(2).forall(w =>
        w.last._2 - w.head._2 >= 0 && w.last._2 - w.head._2 <= 1))
      // greedy tightness: a new pack opens only when the doc would overflow
      inOrder.sliding(2).foreach { case Array(a, b) =>
        if (b._2 != a._2) {
          val packSum = byPack((bucket, a._2)).map(_._4).sum
          assert(packSum + b._4 > 100, s"pack ${a._2} in bucket $bucket closed early")
        }
      case _ => ()
      }
    }
  }

  test("packGreedy: oversized docs are capped to the budget, empty docs ride along") {
    val packed = Pack.packGreedy(docs, budget = 100, buckets = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_tokens")).toMap
    assert(packed(8L) === 100) // 300 tokens capped
    assert(packed(6L) === 0)   // blank doc contributes nothing but is placed
  }

  test("packGreedy: assignment is a pure function of content — invariant " +
    "under input partitioning") {
    val a = Pack.packGreedy(docs, budget = 100, buckets = 2).collect().toSet
    val b = Pack.packGreedy(docs.repartition(13), budget = 100, buckets = 2)
      .collect().toSet
    assert(a === b)
  }

  test("writeShards: hive-partitioned by bucket, packs contiguous within files") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-shards").toFile
    tmp.deleteOnExit()
    val packed = Pack.packGreedy(docs, budget = 100, buckets = 2)
    Pack.writeShards(packed, docs, tmp.getPath)
    val dirs = tmp.listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs === Array("bucket=0", "bucket=1"))
    // one data file per shard (file count = shard count, not × task count)
    tmp.listFiles().filter(_.isDirectory).foreach { d =>
      assert(d.listFiles().count(_.getName.endsWith(".parquet")) === 1,
        s"expected exactly one parquet file in ${d.getName}")
    }
    val back = spark.read.parquet(tmp.getPath)
    assert(back.count() === packed.count())
    // round trip preserves the assignment and carries the text back in
    val cols = back.select("doc_id", "bucket", "pack_id", "n_tokens")
      .collect().map(_.toSeq).toSet
    assert(cols === packed.collect().map(_.toSeq).toSet)
    assert(back.schema.fieldNames.contains("text"))
  }

  test("writeShardsJsonl: same layout and assignment as the parquet writer") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-jsonl").toFile
    tmp.deleteOnExit()
    val packed = Pack.packGreedy(docs, budget = 100, buckets = 2)
    Pack.writeShardsJsonl(packed, docs, tmp.getPath)
    val dirs = tmp.listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs === Array("bucket=0", "bucket=1"))
    tmp.listFiles().filter(_.isDirectory).foreach { d =>
      assert(d.listFiles().count(_.getName.endsWith(".json.gz")) === 1,
        s"expected exactly one jsonl file in ${d.getName}")
    }
    val back = spark.read.json(tmp.getPath)
    assert(back.count() === packed.count())
    val cols = back.select("doc_id", "bucket", "pack_id", "n_tokens")
      .collect().map(_.toSeq).toSet
    assert(cols === packed.collect().map(_.toSeq).toSet)
    assert(back.schema.fieldNames.contains("text"))
  }

  test("Sources.jsonl: shard round trip, schema-driven read == inferred read") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-jsonl-rd").toFile
    tmp.deleteOnExit()
    val packed = Pack.packGreedy(docs, budget = 100, buckets = 2)
    Pack.writeShardsJsonl(packed, docs, tmp.getPath)
    val inferred = graft.sources.Sources.jsonl(spark, tmp.getPath).bagDF
    assert(inferred.count() === packed.count())
    assert(inferred.select("doc_id", "bucket", "pack_id", "n_tokens")
      .collect().map(_.toSeq).toSet ===
      packed.collect().map(_.toSeq).toSet)
    // the 100 TB path: explicit schema (no inference scan) reads the same rows
    val typed = graft.sources.Sources.jsonl(spark, tmp.getPath,
      Some(inferred.schema)).bagDF
    assert(typed.schema === inferred.schema)
    assert(typed.collect().map(_.toSeq).toSet ===
      inferred.collect().map(_.toSeq).toSet)
  }

  test("packStats: fill ratios are in (0,1] for non-degenerate packs") {
    val stats = Pack.packStats(
      Pack.packGreedy(docs, budget = 100, buckets = 2), budget = 100).collect()
    assert(stats.forall(_.getAs[Double]("fill_ratio") <= 1.0))
    assert(stats.map(_.getAs[Long]("n_docs")).sum === 8L)
  }
}
