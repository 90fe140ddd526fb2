package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.pipeline.{Decontaminate, Dedup, Similarity}
import graft.rel.AsOf

/** The round-6 pipeline additions: as-of join (hand-checked semantics +
  * one-shuffle plan), train/eval decontamination (differential vs the
  * brute-force contains cross-scan), chunk-level dedup (hand corpus +
  * reconstruction law), and int8 quantization (error bound + recall). */
class AsOfDecontamSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def ts(s: String) = Timestamp.valueOf(s)

  // ------------------------------------------------------------- as-of join

  private def asofFixture = {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), 5.0),
      (2L, 10L, ts("2024-01-01 12:00:00"), 6.0),
      (3L, 10L, ts("2024-01-01 08:00:00"), 7.0), // before any right row
      (4L, 20L, ts("2024-01-01 09:00:00"), 8.0)  // user with no right rows
    ).toDF("event_id", "user_id", "ts", "purchase_value")
    val right = Seq(
      (10L, ts("2024-01-01 09:30:00"), 1.0),
      (10L, ts("2024-01-01 10:00:00"), 2.0), // equal ts → inclusive match
      (10L, ts("2024-01-01 11:00:00"), 3.0)
    ).toDF("user_id", "ts", "value")
    (left, right)
  }

  test("asofJoin: latest right at-or-before each left, inclusive, null when none") {
    val (l, r) = asofFixture
    val got = AsOf.asofJoin(l, r, "user_id", "ts", Seq("value"), prefix = "click_")
      .select("event_id", "click_ts", "click_value")
      .collect().map(x => x.getLong(0) -> ((
        Option(x.getTimestamp(1)).map(_.toString).orNull,
        if (x.isNullAt(2)) null else x.getDouble(2).asInstanceOf[Any])))
      .toMap
    // event 1 at 10:00 matches the 10:00 right row (inclusive bound)
    assert(got(1L) == ("2024-01-01 10:00:00.0", 2.0))
    // event 2 at 12:00 matches the latest right row, 11:00
    assert(got(2L) == ("2024-01-01 11:00:00.0", 3.0))
    // event 3 precedes every right row; event 4's user has none
    assert(got(3L) == (null, null) && got(4L) == (null, null))
  }

  test("asofJoin keeps every left row (left-join cardinality)") {
    val (l, r) = asofFixture
    assert(AsOf.asofJoin(l, r, "user_id", "ts", Seq("value")).count() == l.count())
  }

  test("asofJoin plans ONE exchange — never a range join explosion") {
    val (l, r) = asofFixture
    val p = AsOf.asofJoin(l, r, "user_id", "ts", Seq("value"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges:\n${p.take(3000)}")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range-join explosion:\n${p.take(3000)}")
  }

  // ------------------------------------------------------- decontamination

  test("decontamination equals the brute-force contains cross-scan (exact)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val snippets = Decontaminate.evalSnippets(docs)
    val fast = Decontaminate.contaminated(docs, snippets)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val norm = docs.select(col("doc_id"), Decontaminate.normText(col("text")).as("nt"))
    val brute = norm.crossJoin(snippets)
      .filter(col("nt").contains(col("snippet")))
      .select("doc_id", "eval_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == brute)
    // the corpus's near-dup structure must produce real CROSS-doc hits
    assert(brute.exists { case (d, e) => d != e }, "fixture has no cross-doc hits")
  }

  test("decontamination candidate join carries no text column through the shuffle") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val df = Decontaminate.contaminated(docs, Decontaminate.evalSnippets(docs))
    assert(!df.queryExecution.executedPlan.toString
      .contains("CartesianProduct"), "decontamination fell back to a cross-scan")
  }

  test("fuzzy decontamination catches perturbed snippets that exact matching misses") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // corrupt the first character of every snippet: exact `contains` now
    // finds NOTHING, but ≥60% of each snippet's 8-grams survive
    val perturbed = Decontaminate.evalSnippets(docs)
      .select(col("eval_id"),
        concat(lit("z"), substring(col("snippet"), 2, 39)).as("snippet"))
    val exact = Decontaminate.contaminated(docs, perturbed)
    assert(exact.count() === 0)
    val fuzzy = Decontaminate.fuzzyContaminated(docs, perturbed, n = 8, frac = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted (self) pair recovered
    val evalIds = Decontaminate.evalSnippets(docs)
      .select("eval_id").collect().map(_.getLong(0)).toSet
    assert(evalIds.forall(e => fuzzy.contains((e, e))),
      s"missing self-pairs: ${evalIds.filterNot(e => fuzzy.contains((e, e)))}")
  }

  test("fuzzy decontamination overlap equals the brute-force gram-set fraction") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 120)
    val snips = Decontaminate.evalSnippets(docs)
    val fast = Decontaminate.fuzzyContaminated(docs, snips, n = 8, frac = 0.6)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("overlap"))).toMap
    import graft.pipeline.TextAnalysis
    val dg = docs.select(col("doc_id"),
      TextAnalysis.hashedCharNgrams(Decontaminate.normText(col("text")), 8).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val eg = snips.select(col("eval_id"),
      TextAnalysis.hashedCharNgrams(Decontaminate.normText(col("snippet")), 8).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val brute = (for {
      (d, dgs) <- dg; (e, egs) <- eg
      ov = egs.intersect(dgs).size.toDouble / egs.size
      if ov >= 0.6
    } yield (d, e) -> ov).toMap
    assert(fast.keySet === brute.keySet)
    fast.foreach { case (k, v) => assert(math.abs(v - brute(k)) < 1e-9) }
  }

  // ------------------------------------------------------ chunk-level dedup

  test("chunkDedup: global first occurrence wins, later repeats dropped") {
    val docs = Seq(
      (1L, "a b c d e f g h i j k l"),          // chunks: [a..j], [k l]
      (2L, "a b c d e f g h i j x y"),          // chunk 1 duplicates doc 1's
      (3L, "k l")                               // duplicates doc 1's chunk 2
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(docs, chunkTokens = 10)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), (r.getString(2), r.getBoolean(3))))
      .toMap
    assert(out((1L, 1)) == ("a b c d e f g h i j", true))
    assert(out((1L, 2)) == ("k l", true))
    assert(out((2L, 1)) == ("a b c d e f g h i j", false)) // dup of (1,1)
    assert(out((2L, 2)) == ("x y", true))
    assert(out((3L, 1)) == ("k l", false))                 // dup of (1,2)
  }

  test("chunkDedup/cdcDedup: struct owner election works on STRING doc ids") {
    // the packed doc_id·10⁶+idx election required numeric ids (and had an
    // overflow ceiling); the struct election must handle any orderable id
    val docs = Seq(
      ("b", "a b c d e f g h i j"),
      ("a", "a b c d e f g h i j")   // same chunk — smaller id owns it
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(docs, chunkTokens = 10)
      .collect().map(r => (r.getString(0), r.getBoolean(3))).toMap
    assert(out("a") && !out("b"))
    val cdc = Dedup.cdcDedup(docs)
    val keptBy = cdc.collect().groupBy(_.getString(0))
      .view.mapValues(_.forall(_.getBoolean(4))).toMap
    assert(keptBy("a"), "lexicographically smallest id must own its chunks")
    assert(cdc.filter(col("doc_id") === "b" && col("kept")).count() === 0,
      "identical text under a larger id must fully deduplicate")
  }

  test("chunkDedup reconstruction law: chunks reassemble the normalized text") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(50)
    val rebuilt = Dedup.chunkDedup(docs)
      .groupBy("doc_id")
      .agg(array_join(transform(sort_array(collect_list(
        struct(col("chunk_idx"), col("chunk")))), x => x.getField("chunk")), " ")
        .as("rebuilt"))
    val cmp = docs.select(col("doc_id"),
        regexp_replace(lower(trim(col("text"))), "\\s+", " ").as("norm"))
      .join(rebuilt, "doc_id")
      .filter(col("norm") =!= col("rebuilt"))
    assert(cmp.count() == 0)
  }

  // -------------------------------------------------- int8 quantized vectors

  test("quantizeI8: reconstruction error within scale/2 per component") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").limit(100)
    val q = emb.select(col("embedding"), Similarity.quantizeI8(col("embedding")).as("qz"))
    val maxErr = q.select(max(array_max(zip_with(
        col("embedding"), col("qz.q"),
        (x, v) => abs(x.cast("double") - v.cast("double") * col("qz.scale")))))
        .as("e"))
      .head().getDouble(0)
    val maxScale = q.select(max(col("qz.scale"))).head().getFloat(0)
    assert(maxErr <= maxScale / 2 + 1e-6, s"err $maxErr scale $maxScale")
  }

  test("quantizedKnn achieves near-exact recall vs brute force at sf0.001") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val brute = Similarity.bruteForceKnn(queries, emb, k = 10)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Similarity.quantizedKnn(queries, emb, k = 10)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & quant).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall")
  }
}
