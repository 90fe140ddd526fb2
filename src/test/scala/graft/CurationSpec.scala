package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Bpe, Coreset, Sampling}
import graft.sources.Layout

/** Round-11 curation operators: Z-order layout, BPE-merge training,
  * greedy k-center coreset selection, per-group adaptive floors — unit
  * semantics plus the physical-plan contracts that make them 100-TB-safe. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ Z-order

  test("zorderKey interleaves bits (hand-computed values)") {
    // Part1By1(3)=0b101=5, Part1By1(5)=0b10001=17 → z(3,5)=5|(17<<1)=39
    val row = Seq((3L, 5L)).toDF("x", "y")
      .select(Layout.zorderKey(col("x"), col("y"), bits = 8).as("z"))
      .collect().head
    assert(row.getLong(0) === 39L)
    // zero maps to zero; max 8-bit corner interleaves to 2^16-1
    val corners = Seq((0L, 0L), (255L, 255L)).toDF("x", "y")
      .select(Layout.zorderKey(col("x"), col("y"), bits = 8).as("z"))
      .collect().map(_.getLong(0))
    assert(corners.toSeq === Seq(0L, 65535L))
  }

  test("aligned z-key blocks are square tiles (the file-skipping property)") {
    val grid = (for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong))
      .toDF("x", "y")
      .withColumn("z", Layout.zorderKey(col("x"), col("y"), bits = 4))
    // every aligned 16-key block = one 4×4 tile: BOTH dims bounded, which
    // is exactly why per-file min/max stats prune two-dimensional predicates
    val tiles = grid.groupBy((col("z") / 16).cast("long").as("blk"))
      .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"))
      .collect()
    assert(tiles.length === 16)
    assert(tiles.forall(r => r.getLong(1) <= 3 && r.getLong(2) <= 3))
  }

  test("zorderArrange clusters both dims tighter than a one-column sort") {
    val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    def meanYSpan(df: org.apache.spark.sql.DataFrame): Double = {
      val spans = df.withColumn("pid", spark_partition_id())
        .groupBy("pid").agg((max("y") - min("y")).as("ys"))
        .collect().map(_.getLong(1))
      spans.sum.toDouble / spans.length
    }
    val z = meanYSpan(Layout.zorderArrange(grid, col("x"), col("y"),
      bits = 5, numFiles = 16))
    val oneCol = meanYSpan(grid.repartitionByRange(16, col("x"))
      .sortWithinPartitions(col("x")))
    // x-sorted files span the full y range (~31); z-ordered files span one
    // or two 8×8 tiles — strictly tighter even with sampled range bounds
    assert(z < oneCol * 0.6,
      s"z-order per-file y-span $z not clearly tighter than x-sort $oneCol")
  }

  test("zorder layout: a 2-D box predicate touches fewer FILES on disk than " +
    "a one-column sort (the pruning the layout exists for)") {
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val base = java.nio.file.Files.createTempDirectory("zprune").toString
    Layout.zorderArrange(grid, col("x"), col("y"), bits = 6, numFiles = 16)
      .write.parquet(s"$base/z")
    grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.parquet(s"$base/one")
    // the box selects an 8×8 tile; count the DISTINCT files that actually
    // hold matching rows — the file-level locality min/max pruning exploits
    def filesTouched(dir: String): Long =
      spark.read.parquet(dir)
        .where(col("x").between(16, 23) && col("y").between(16, 23))
        .select(input_file_name()).distinct().count()
    val zf = filesTouched(s"$base/z")
    val of = filesTouched(s"$base/one")
    // x-sort puts every y in every x-file: the box's x-range spans ≥ its
    // share of files AND each holds the full y sweep; z-order confines the
    // tile to 1–2 files
    assert(zf < of, s"z-order touched $zf files vs $of for one-column sort")
    assert(zf <= 2, s"8×8 tile should live in at most 2 z-ordered files, got $zf")
  }

  test("plan: zorderArrange is one range exchange, no UDF") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val arranged = Layout.zorderArrange(docs,
      least(floor(length(col("text")) / 64).cast("long"), lit(255L)),
      least(col("n_chars"), lit(255L)), bits = 8, numFiles = 8)
    val p = arranged.queryExecution.executedPlan.toString
    assert(p.linesIterator.count(_.contains("Exchange")) === 1, s"plan:\n$p")
    assert(p.contains("rangepartitioning"), s"not range-partitioned:\n$p")
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"))
  }

  // ---------------------------------------------------------------- BPE

  test("BPE training replays the textbook low/lower/newest example") {
    val docs = Seq("low low low low low", "lower lower", "newest")
      .toDF("text")
    val (rounds, vocab) = Bpe.train(Bpe.wordVocab(docs, col("text")), 2)
    // pairs: lo=7, ow=7 (tie → lexicographic), we=3, er=2 …
    assert(rounds.head.merge === Bpe.Merge("l", "o", 7L))
    assert(rounds(1).merge === Bpe.Merge("lo", "w", 7L))
    val lowSyms = vocab.where(col("word") === "low")
      .select(col("syms")).as[Seq[String]].collect().head
    assert(lowSyms === Seq("low"))
    // audit trail: chars = 5·3 + 2·5 + 1·6 = 31; round 1 merges l+o once
    // in each of the 7 low/lower occurrences → 24
    assert(rounds.head.symsBefore === 31L && rounds.head.symsAfter === 24L)
  }

  test("BPE merge application is left-to-right non-overlapping") {
    val one = Seq(Seq("a", "a", "a")).toDF("syms")
      .select(Bpe.applyMerge(col("syms"), "a", "a").as("m"))
      .as[Seq[String]].collect().head
    assert(one === Seq("aa", "a"))
  }

  test("BPE encode path agrees with the trained vocabulary") {
    val docs = Seq("low low lower", "newest lowest").toDF("text")
    val (rounds, vocab) = Bpe.train(Bpe.wordVocab(docs, col("text")), 3)
    val merges = rounds.map(_.merge)
    val vocabTotal = vocab.agg(sum(col("weight") * size(col("syms"))))
      .collect().head.getLong(0)
    val corpusTotal = docs.agg(sum(Bpe.tokenCount(col("text"), merges)))
      .collect().head.getLong(0)
    assert(vocabTotal === corpusTotal)
  }

  test("BPE vocab-join token counting agrees with the fold-chain encode") {
    val docs = Seq((1L, "low low lower"), (2L, "newest lowest"), (3L, ""))
      .toDF("doc_id", "text")
    val (rounds, vocab) = Bpe.train(Bpe.wordVocab(docs, col("text")), 3)
    val merges = rounds.map(_.merge)
    val viaVocab = Bpe.tokenCountViaVocab(docs, col("text"), vocab)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaFold = docs
      .select(col("doc_id"), Bpe.tokenCount(col("text"), merges).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // empty doc has no words → absent from the join path, 0 in the fold
    assert(viaVocab === viaFold.filter(_._2 > 0))
    // an out-of-vocabulary word falls back to its character count
    val oov = Seq((9L, "zzzz")).toDF("doc_id", "text")
    val got = Bpe.tokenCountViaVocab(oov, col("text"), vocab).collect().head
    assert(got.getLong(1) === 4L)
  }

  test("plan: BPE pair counting is a partial (map-side) aggregation") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val p = Bpe.pairCounts(Bpe.wordVocab(docs, col("text")))
      .queryExecution.executedPlan.toString
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2 &&
      p.contains("Exchange"), s"no partial aggregation:\n${p.take(2500)}")
  }

  // ----------------------------------------------------------- k-center

  test("greedy k-center picks maximally spread points, certificate holds") {
    def at(deg: Double): Array[Float] = {
      val r = math.toRadians(deg)
      Array(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    val pts = Seq(
      (1L, at(0)), (2L, at(5)), (3L, at(90)), (4L, at(180)))
      .toDF("vec_id", "embedding")
    val (centers, radius) = Coreset.kCenter(pts, "vec_id", "embedding", k = 3)
    // seed = min id (1, at 0°); farthest = 180°; then 90°
    assert(centers.map(_.id) === Seq(1L, 4L, 3L))
    // remaining point is 5° from the seed: radius = 1 − cos(5°)
    assert(math.abs(radius - (1.0 - math.cos(math.toRadians(5)))) < 1e-6)
    val (mono, sep) = Coreset.certificate(spark, centers, radius, pts,
      "vec_id", "embedding")
    assert(mono && sep)
  }

  test("k-center certificate FAILS for a wrong (non-greedy) selection") {
    def at(deg: Double): Array[Float] = {
      val r = math.toRadians(deg)
      Array(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    val pts = Seq(
      (1L, at(0)), (2L, at(5)), (3L, at(90)), (4L, at(180)))
      .toDF("vec_id", "embedding")
    // claim the clustered pair {0°, 5°} as centers with an understated
    // radius: separation check must reject it
    val fake = Seq(
      Coreset.Center(1, 1L, 0.0, at(0)),
      Coreset.Center(2, 2L, 1.0 - math.cos(math.toRadians(5)), at(5)))
    val trueRadius = 2.0 // the 180° point is uncovered this far
    val (_, sep) = Coreset.certificate(spark, fake, trueRadius, pts,
      "vec_id", "embedding")
    assert(!sep)
  }

  // -------------------------------------------------------- heavy hitters

  test("topKExact equals the full groupBy top-k; guarantee fails loud") {
    import graft.pipeline.Heavy
    // skewed stream with a long distinct tail (forces MG decrements:
    // slack*k = 16 slots vs tail cardinality 500)
    val items = (Seq.fill(200)("alpha") ++ Seq.fill(120)("beta") ++
      Seq.fill(40)("gamma") ++ (1 to 500).map(i => s"tail$i"))
    val df = items.toDF("item").repartition(7)
    val got = Heavy.topKExact(df, "item", k = 2, slack = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq === Seq(("alpha", 200L, 1), ("beta", 120L, 2)))
    // near-uniform data cannot honor the guarantee at tiny capacity: the
    // operator must refuse rather than return a plausible wrong answer
    val uniform = (1 to 400).flatMap(i => Seq.fill(3)(s"u$i")).toDF("item")
      .repartition(7)
    val e = intercept[IllegalArgumentException] {
      Heavy.topKExact(uniform, "item", k = 5, slack = 2)
    }
    assert(e.getMessage.contains("guarantee not met"), e.getMessage)
  }

  test("topKExact with fewer than k candidates: exact when candidates cover the " +
    "corpus, loud when decrement cascades dropped items") {
    import graft.pipeline.Heavy
    // 3 distinct items < k=5: short top-k is EXACT (everything is a candidate)
    val tiny = Seq("a", "a", "b", "c").toDF("item").repartition(2)
    val got = Heavy.topKExact(tiny, "item", k = 5, slack = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq === Seq(("a", 2L, 1), ("b", 1L, 2), ("c", 1L, 3)))
    // 23 singletons through one m=10 summary: items 11 and 22 trigger
    // decrement-all wipes, leaving ONE candidate — the operator must
    // refuse the silently-short answer (this skipped the guarantee check
    // entirely before the round-11 fix)
    val cascade = (1 to 23).map(i => s"s$i").toDF("item").repartition(1)
    val e2 = intercept[IllegalArgumentException] {
      Heavy.topKExact(cascade, "item", k = 5, slack = 2)
    }
    assert(e2.getMessage.contains("guarantee not met") &&
      e2.getMessage.contains("outside the candidate set"), e2.getMessage)
  }

  // ------------------------------------------------------------- release

  test("release bundle: data splits, card, pii scan, drift baseline, meta") {
    import graft.pipeline.Release
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("release").toString
    val m = Release.publish(docs, dir)
    assert(m.rows === docs.count())
    assert(m.splits.keySet === Set("train", "val", "test"))
    assert(m.splits.values.sum === m.rows)
    // data/ round-trips with the split column; per-split sizes agree
    val data = spark.read.parquet(s"$dir/data")
    assert(data.count() === m.rows)
    val sizes = data.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes === m.splits)
    // card: one row per source; pii: one row for the text column
    val card = spark.read.parquet(s"$dir/card")
    assert(card.count() === docs.select("source").distinct().count())
    val pii = spark.read.parquet(s"$dir/pii").collect()
    assert(pii.length === 1 && pii.head.getString(0) === "text")
    // drift baseline == bucketCounts over the same corpus
    val base = Release.driftBaseline(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = graft.streaming.DriftStream.bucketCounts(docs, Seq(
      "len" -> least(floor(length(col("text")) / 200).cast("long"), lit(9L)),
      "lang" -> col("lang"), "source" -> col("source")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(base === want)
    val meta = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/meta.json"))
    assert(meta.contains(s""""rows":${m.rows}""") && meta.contains(""""doc_id""""))
    // opt-in dedup index: the bundle carries a loadable near-dup index of
    // THIS release — the next crawl's incremental dedup starts warm
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/dedup_index")), "index must be opt-in")
    val dir2 = java.nio.file.Files.createTempDirectory("release2").toString
    Release.publish(docs, dir2, withDedupIndex = true)
    val idx = graft.streaming.DocStream.loadIndex(spark, s"$dir2/dedup_index")
    val probeText = docs.filter(col("doc_id") === 0L)
      .collect()(0).getAs[String]("text")
    import spark.implicits._
    val hits = graft.streaming.DocStream.matchAgainst(
      Seq((700000L, probeText)).toDF("doc_id", "text"), idx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits.contains((700000L, 0L)),
      s"release-bundled index missed a known document: $hits")
  }

  test("logistic classifier: separable planted labels reach accuracy 1, loss " +
    "descends, training is partitioning-invariant") {
    import graft.pipeline.Classifier
    val good = (1L to 12L).map(i =>
      (i, s"clean prose sentence number $i with informative words", 1))
    val bad = (13L to 24L).map(i =>
      (i, s"zzz spam garbage casino pills $i click buy now", 0))
    val docs = (good ++ bad).toDF("doc_id", "text", "label")
    val (model, losses) = Classifier.trainLogistic(docs, col("label") === 1,
      iters = 12)
    // descent certificate
    assert(losses.sliding(2).forall(w => w.size < 2 || w(1) <= w(0) + 1e-9),
      losses.toString)
    // separable vocabularies → training accuracy 1
    val pred = Classifier.predict(docs, model)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert((1L to 12L).forall(pred(_)), pred.toString)
    assert((13L to 24L).forall(!pred(_)), pred.toString)
    // decimal dot products: identical model from a reshuffled corpus
    val (m2, l2) = Classifier.trainLogistic(docs.repartition(7),
      col("label") === 1, iters = 12)
    assert(m2 === model && l2 === losses)
    // accuracyOn (r18's no-join accuracy scan) === the predictOn ⋈ labels
    // formulation it replaced, on a frame with zero-gram docs mixed in
    val withEmpty = docs.unionByName(
      Seq((25L, "", 1), (26L, "  ", 0)).toDF("doc_id", "text", "label"))
    val feats = Classifier.prepare(withEmpty, col("label") === 1, buckets = 512)
    try {
      val fast = Classifier.accuracyOn(feats, model)
      val joined = Classifier.predictOn(feats, model)
        .join(feats.select(col("doc_id"), col("y")), "doc_id")
        .agg(sum(when(col("pred") === (col("y") >= 0.5), 1L).otherwise(0L))
          .as("hit"), count(lit(1)).as("n")).collect()(0)
      val ref = joined.getLong(0).toDouble / math.max(joined.getLong(1), 1L)
      assert(fast === ref)
    } finally graft.rel.Checkpoint.PinOps(feats).unpin()
  }

  test("logistic classifier: zero-gram docs train the bias and appear in " +
    "predict (loss normalized over ALL docs)") {
    import graft.pipeline.Classifier
    // an all-empty corpus with y=1 has ONLY the bias to learn: the fixed
    // loss mean must fall below ln 2 and the bias must move positive —
    // with empty docs excluded from the gradient (the old bug) it stays 0
    val empties = (1L to 8L).map(i => (i, if (i % 2 == 0) "" else "  \t ", 1))
      .toDF("doc_id", "text", "label")
    val (m0, l0) = Classifier.trainLogistic(empties, col("label") === 1, iters = 6)
    assert(m0.bias > 0.0, s"bias did not learn from featureless docs: $m0")
    assert(l0.last < math.log(2.0), s"loss stuck at ln2: $l0")
    val pr = Classifier.predict(empties, m0).collect()
    assert(pr.length === 8 && pr.forall(_.getBoolean(2)), pr.mkString(","))
    // mixed corpus: an empty doc neither crashes nor breaks the descent
    // certificate, and every doc gets a prediction row
    val mixed = (Seq((100L, "   ", 1)) ++ (1L to 6L).map(i =>
      (i, s"real words here number $i", if (i <= 3) 1 else 0)))
      .toDF("doc_id", "text", "label")
    val (m1, l1) = Classifier.trainLogistic(mixed, col("label") === 1, iters = 8)
    assert(l1.sliding(2).forall(w => w.size < 2 || w(1) <= w(0) + 1e-9), l1.toString)
    assert(Classifier.predict(mixed, m1).count() === 7L)
  }

  test("dsirSelect: docs matching the planted target vocabulary outrank the rest") {
    import graft.pipeline.Selection
    val vocabA = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val vocabB = Seq("zork", "quux", "fnord", "blarg", "wibble")
    def doc(id: Long, vocab: Seq[String]): (Long, String) =
      id -> (0 until 12).map(i => vocab((i + id.toInt) % vocab.size)).mkString(" ")
    val raw = ((1L to 10L).map(doc(_, vocabA)) ++ (11L to 20L).map(doc(_, vocabB)))
      .toDF("doc_id", "text")
    val target = (101L to 103L).map(doc(_, vocabA)).toDF("doc_id", "text")
    val top = Selection.dsirSelect(raw, target, n = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getInt(3)))
    assert(top.map(_._1).forall(_ <= 10L), s"non-target-like doc selected: ${top.toSeq}")
    assert(top.map(_._3).toSeq === (1 to 5), "ranks must be dense 1-based")
    // full separation: every A-doc weight strictly above every B-doc weight
    val all = Selection.dsirWeights(raw, target)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(all.filter(_._1 <= 10).values.min > all.filter(_._1 > 10).values.max)
  }

  test("dsirSelect/dsirSample: string doc ids (URLs) carry through — the " +
    "result keeps the input id type") {
    import graft.pipeline.Selection
    val raw = Seq(("http://a/1", "alpha beta gamma alpha"),
      ("http://b/2", "zork quux fnord blarg"),
      ("http://a/3", "alpha gamma beta delta")).toDF("doc_id", "text")
    val target = Seq(("t1", "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val sel = Selection.dsirSelect(raw, target, n = 2)
    assert(sel.schema("doc_id").dataType.typeName === "string")
    val ids = sel.orderBy("rank").collect().map(_.getString(0)).toSeq
    assert(ids === Seq("http://a/1", "http://a/3"), ids.toString)
    val samp = Selection.dsirSample(raw, target, n = 3).collect()
    assert(samp.length === 3 && samp.forall(_.getString(0).startsWith("http://")))
  }

  // ------------------------------------------------------------ pagerank

  test("pageRank: 2-cycle is stationary at 0.5; star centre dominates") {
    val cycle = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val pr = graft.rel.Graph.pageRank(cycle, iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr === Map("a" -> 0.5, "b" -> 0.5))

    // star: one step moves the leaves' full mass to the hub
    // (hub = 0.0375 + 0.85·(3·0.25) = 0.675, each leaf = base 0.0375)
    val star = Seq(("a", "hub"), ("b", "hub"), ("c", "hub")).toDF("src", "dst")
    val ps = graft.rel.Graph.pageRank(star, iters = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ps("hub") === 0.675 && ps("a") === 0.0375)
    assert(ps("a") === ps("b") && ps("b") === ps("c"))
  }

  test("pageRank dangling=true: mass redistributes, ranks sum to 1") {
    // directed star: hub has no out-edges, so its whole rank is dangling
    // mass; iter 1: D = 0.25, base = 0.15/4 + 0.85·(0.25/4) = 0.090625,
    // hub = base + 0.85·(3·0.25) = 0.728125; leaves keep base
    val star = Seq(("a", "hub"), ("b", "hub"), ("c", "hub")).toDF("src", "dst")
    val pr = graft.rel.Graph.pageRank(star, iters = 1, dangling = true)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr("hub") === 0.728125 && pr("a") === 0.090625, pr.toString)
    assert(math.abs(pr.values.sum - 1.0) < 1e-9, s"ranks must sum to 1: $pr")
    // simple variant on the same graph leaks the dangling mass (sum < 1)
    val simple = graft.rel.Graph.pageRank(star, iters = 1)
      .collect().map(_.getDouble(1)).sum
    assert(simple < 1.0 - 1e-6)
  }

  test("pageRank tol: a stationary distribution stops the iteration early") {
    // 2-cycle is stationary from iter 1 → L1 delta 0 < tol; with the cap
    // at 50 this returns promptly and exactly
    val cycle = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val t0 = System.nanoTime()
    val pr = graft.rel.Graph.pageRank(cycle, iters = 50, tol = 1e-9)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val secs = (System.nanoTime() - t0) / 1e9
    assert(pr === Map("a" -> 0.5, "b" -> 0.5))
    // 50 pinned iterations of even a 2-node graph take far longer than 2
    assert(secs < 30.0, s"early termination did not kick in ($secs s)")
  }

  // ------------------------------------------------------ adaptive floor

  test("adaptiveFloor keeps each group's top part by its own quantile") {
    val df = ((1 to 10).map(v => ("a", v.toDouble)) ++
      Seq(("b", 5.0), ("b", 5.0), ("b", 5.0), ("b", 10.0)))
      .toDF("g", "v")
    val kept = Sampling.adaptiveFloor(df, col("g"), col("v"), 40, 100)
      .groupBy("g").agg(count(lit(1)).as("n"), min("v").as("lo"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // group a: P40 value = 4 → keep 4..10 (7 rows); group b: P40 = 5 → all 4
    assert(kept("a") === ((7L, 4.0)))
    assert(kept("b") === ((4L, 5.0)))
  }

  test("plan: adaptiveFloor joins thresholds by broadcast (no data shuffle)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val p = Sampling.adaptiveFloor(docs, col("source"),
      col("n_chars").cast("double"), 40, 100)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"threshold join not broadcast:\n$p")
  }
}
