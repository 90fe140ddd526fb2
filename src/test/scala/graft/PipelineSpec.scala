package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Training-data pipeline operators: dedup family, similarity search,
  * text analysis, multimodal plumbing. Uses planted near-duplicates so
  * recall is testable deterministically. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and runs far away home"),
    (2L, "the quick brown fox jumps over the lazy dog and runs far away house"), // near-dup of 1
    (3L, "completely different text about spark distributed computation engines"),
    (4L, "the quick brown fox jumps over the lazy dog and runs far away home"), // exact dup of 1
    (5L, "der schnelle braune fuchs springt nicht über den faulen hund und das ist gut"))
    .toDF("doc_id", "text")

  test("exact dedup groups identical normalized text") {
    val out = Dedup.exact(docs).collect()
    assert(out.length === 4) // 1&4 collapse
    val dupRow = out.find(_.getAs[Long]("doc_id") == 1L).get
    assert(dupRow.getAs[Long]("dup_count") === 2L)
  }

  test("native MinHashSig expression is bit-identical to the combinator formula") {
    // checkpoint the grams exactly like minhashPairs does — it also severs
    // the CodegenFallback shingle HOFs from the signature Project, so the
    // fused expression's stage is codegen-eligible
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), TextAnalysis.hashedShingles(col("text")).as("g"))
      .filter(size(col("g")) > 0)
      .localCheckpoint()
    val both = real.select(
      Dedup.minhashSignature(col("g")).as("fused"),
      Dedup.minhashSignatureReference(col("g")).as("ref"))
    assert(both.filter(!(col("fused") <=> col("ref"))).count() === 0)
    // and the fused path runs inside generated code, not CodegenFallback
    // (checked on a fused-only plan: the reference formula's higher-order
    // functions would force any shared Project out of codegen)
    val fusedOnly = real.select(Dedup.minhashSignature(col("g")).as("fused"))
    val cg = fusedOnly.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(cg.contains("minhash_sig") || cg.contains("MinHashSig"),
      s"fused expression not in generated code:\n${cg.take(1500)}")
  }

  test("minhash LSH finds planted near-dup pair") {
    val pairs = Dedup.minhashPairs(docs, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) || pairs.contains((1L, 4L)))
    assert(pairs.contains((1L, 4L))) // exact dup always collides
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated doc never pairs
  }

  test("simhash hamming pairs find near-dups, not unrelated docs") {
    val pairs = Dedup.simhashPairs(docs, maxDist = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("ngram jaccard pairs: recall on planted near-dups at threshold 0.7") {
    val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.7)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L))) // exact dup
    assert(pairs.contains((1L, 2L))) // planted near-dup (one word differs)
    assert(pairs.contains((2L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated never pairs
  }

  test("ngram LSH recall/precision vs exact ground truth (sf0.001)") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(length(col("text")) >= 5)
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(Dedup.ngramJaccardPairsExact(real, threshold = 0.7))
    val lsh = pairSet(Dedup.ngramJaccardPairs(real, threshold = 0.7))
    assert(lsh.subsetOf(exact)) // precision 1.0: every emitted pair is verified
    assert(exact.nonEmpty)
    assert(lsh.size.toDouble / exact.size >= 0.9) // banding recall ≈0.99 at 0.7
  }

  test("embedding LSH recall/precision vs exact ground truth (sf0.001)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(Dedup.embeddingPairsExact(emb, threshold = 0.4))
    val lsh = pairSet(Dedup.embeddingPairs(emb, threshold = 0.4))
    assert(lsh.subsetOf(exact))
    assert(exact.nonEmpty)
    assert(lsh.size.toDouble / exact.size >= 0.5) // 4-plane 1-bit multiprobe LSH
  }

  test("hot-bucket grid salting is pair-complete (salted == unsalted pair sets)") {
    // a tiny bucketCap forces g > 1 on every real bucket — every pair must
    // still meet exactly once, so the pair set cannot change
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(length(col("text")) >= 5)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet(Dedup.minhashPairs(real, threshold = 0.5, bucketCap = 3)) ===
      pairSet(Dedup.minhashPairs(real, threshold = 0.5)))
    assert(pairSet(Dedup.simhashPairs(real, maxDist = 3, bucketCap = 3)) ===
      pairSet(Dedup.simhashPairs(real, maxDist = 3)))
    assert(pairSet(Dedup.embeddingPairs(emb, threshold = 0.4, bucketCap = 3)) ===
      pairSet(Dedup.embeddingPairs(emb, threshold = 0.4)))
  }

  test("degenerate all-identical corpus: hot bucket resplits, bounded tasks, no cartesian") {
    // 300 identical docs → ONE bucket per band holding every doc. With
    // cap=50 the bucket grid-splits into 6×6 salt groups; output must be
    // the complete quadratic pair set (it IS the correct answer) and the
    // plan must stay a hash join on the salted key, never a cartesian.
    val n = 300
    val same = (1 to n).map(i => (i.toLong, "identical text repeated for the degenerate corpus case"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(same, threshold = 0.5, bucketCap = 50)
    val p = pairs.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(pairs.count() === n.toLong * (n - 1) / 2)
  }

  test("native shingle/ngram hashers are bit-identical to the combinator formulas") {
    val txt = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert(txt.filter(!(
      TextAnalysis.hashedShingles(col("text")) <=>
        TextAnalysis.hashedShinglesReference(col("text")))).count() === 0)
    assert(txt.filter(!(
      TextAnalysis.hashedCharNgrams(col("text")) <=>
        TextAnalysis.hashedCharNgramsReference(col("text")))).count() === 0)
    // degenerate inputs: shorter than k/n, empty string
    val edge = Seq("", "ab", "one two", "   ").toDF("text")
    assert(edge.filter(!(
      TextAnalysis.hashedShingles(col("text")) <=>
        TextAnalysis.hashedShinglesReference(col("text")))).count() === 0)
    assert(edge.filter(!(
      TextAnalysis.hashedCharNgrams(col("text")) <=>
        TextAnalysis.hashedCharNgramsReference(col("text")))).count() === 0)
  }

  test("native vec_dot and simhash64 are bit-identical to the combinator formulas") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("embedding").as("a"))
    val shifted = emb.withColumn("b", reverse(col("a")))
    assert(shifted.filter(
      !(Similarity.dot(col("a"), col("b")) <=> Similarity.dotReference(col("a"), col("b")))
    ).count() === 0)
    val txt = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert(txt.filter(
      !(Dedup.simhash(col("text")) <=> Dedup.simhashReference(col("text")))
    ).count() === 0)
    val sigs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assert(sigs.filter(
      !(Similarity.hyperplaneSig(col("embedding")) <=>
        Similarity.hyperplaneSigReference(col("embedding")))
    ).count() === 0)
  }

  test("cosine and dot on float arrays") {
    val df = Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
                 (Array(1.0f, 0.0f), Array(0.0f, 1.0f))).toDF("a", "b")
    val cos = df.select(Similarity.cosine(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(math.abs(cos(0) - 1.0) < 1e-9)
    assert(math.abs(cos(1)) < 1e-9)
    // ragged vectors are a data error: NULL, never a partial score
    val ragged = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f))).toDF("a", "b")
    assert(ragged.select(Similarity.dot(col("a"), col("b"))).collect()(0).isNullAt(0))
  }

  test("brute-force knn: self is nearest neighbour at cosine 1") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val knn = Similarity.bruteForceKnn(q, emb, k = 3)
    val top1 = knn.filter(col("rank") === 1)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(top1.forall { case (a, b) => a == b })
  }

  test("lsh knn recall: self always found (same bucket by construction)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val knn = Similarity.lshKnn(q, emb, k = 3)
    val top1 = knn.filter(col("rank") === 1)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(top1.forall { case (a, b) => a == b })
  }

  test("ivf knn recall: self always found (own list is always probed)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val knn = Similarity.ivfKnn(q, emb, k = 3)
    val top1 = knn.filter(col("rank") === 1)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(top1.length === 3)
    assert(top1.forall { case (a, b) => a == b })
  }

  test("two-phase top-k matches exact ranking (brute force, rank ordering)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val knn = Similarity.bruteForceKnn(q, emb, k = 5).collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(knn.length === 5)
    val cosines = knn.map(_.getAs[Double]("cosine"))
    assert(cosines.sameElements(cosines.sorted.reverse)) // descending
    assert(knn.head.getAs[Long]("vec_id") === 0L)        // self first
  }

  test("text analysis columns") {
    val r = docs.select(
      TextAnalysis.tokenCount(col("text")).as("nt"),
      TextAnalysis.langId(col("text")).as("lang"),
      TextAnalysis.fingerprint(col("text")).as("fp"),
      TextAnalysis.qualityScore(col("text")).as("q")).collect()
    assert(r(0).getAs[Int]("nt") === 14)
    assert(r(0).getAs[String]("lang") === "en")
    assert(r(4).getAs[String]("lang") === "de")
    assert(r(0).getAs[String]("fp") === r(3).getAs[String]("fp"))
    assert(r(0).getAs[Double]("q") > 0.0 && r(0).getAs[Double]("q") <= 1.0)
  }

  test("multimodal: asset wrap + stub decode + resize plan, deterministic") {
    val assets = Multimodal.toAssets(docs, "doc_id", "text", "image", "test")
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType.simpleString)).toSeq
    assert(shape(assets.schema) === shape(Multimodal.assetSchema))
    val decoded = Multimodal.decode(assets)
    val planned = Multimodal.resizePlan(decoded, maxSide = 256).collect()
    assert(planned.length === 5)
    planned.foreach { r =>
      assert(r.getAs[Int]("target_width") <= 256 && r.getAs[Int]("target_height") <= 256)
      assert(r.getAs[Seq[Float]]("feature").length === 8)
    }
    // determinism: same text → same decode
    val d = decoded.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d(1L) === d(4L))
  }
}
