package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Sampling, TextAnalysis}

/** Content-hash sampling: membership must be a pure function of the row —
  * invariant under partitioning and stable run-to-run — and the stratified
  * variant must honor per-stratum rates. Plus tf-idf on a hand-checked
  * corpus. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("hashSample is invariant under repartitioning (pure function of content)") {
    val a = Sampling.hashSample(docs.repartition(7), col("doc_id"), 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs.repartition(3).sort(desc("doc_id")),
        col("doc_id"), 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    assert(a.nonEmpty && a.size < docs.count())
  }

  test("complementary predicates partition the corpus (train/test split)") {
    val total = docs.count()
    val kept = Sampling.hashSample(docs, col("doc_id"), 0.3).count()
    val rest = docs.filter(Sampling.hashBucket(col("doc_id")) >= 30).count()
    assert(kept + rest == total)
  }

  test("hashSplit: labels partition the corpus, stable under repartition, near 80/10/10") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = graft.pipeline.Sampling.hashSplit(docs, col("doc_id"))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = graft.pipeline.Sampling.hashSplit(docs.repartition(13), col("doc_id"))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)                       // pure function of the key
    assert(a.size === docs.count())       // every doc exactly one label
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 500.0).toMap
    assert(math.abs(frac("train") - 0.8) < 0.08)
    assert(math.abs(frac("val") - 0.1) < 0.05)
    assert(math.abs(frac("test") - 0.1) < 0.05)
  }

  test("temperatureMix: α=0 equalizes expected counts (small sources capped), α=1 preserves shares") {
    import spark.implicits._
    val skewed = ((1 to 800).map(i => (i.toLong, "big")) ++
      (1001 to 1200).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source")
    def keptBySource(alpha: Double) =
      graft.pipeline.Sampling.temperatureMix(skewed,
          col("source"), col("doc_id"), alpha = alpha, target = 0.5)
        .groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    // α=0: r_small = min(1, 0.5·1000·(1/200)/2) = 1.25 → capped, ALL kept;
    // r_big = 0.5·1000·(1/800)/2 = 0.3125
    val flat = keptBySource(0.0)
    assert(flat("small") === 200L)
    assert(math.abs(flat("big") / 800.0 - 0.3125) < 0.06)
    // α=1: every source keeps ~target — shares preserved
    val prop = keptBySource(1.0)
    assert(math.abs(prop("big") / 800.0 - 0.5) < 0.06)
    assert(math.abs(prop("small") / 200.0 - 0.5) < 0.1)
    // deterministic under repartitioning
    val again = graft.pipeline.Sampling.temperatureMix(skewed.repartition(7),
        col("source"), col("doc_id"), alpha = 0.0, target = 0.5)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === flat)
  }

  test("rate lands near the target on uniform keys") {
    val n = 10000
    val keys = spark.range(n).toDF("k")
    val kept = Sampling.hashSample(keys, col("k"), 0.25).count()
    assert(math.abs(kept.toDouble / n - 0.25) < 0.03, s"kept $kept of $n")
  }

  test("stratified rates: full keep, fractional keep, and drop") {
    val df = Seq.tabulate(300)(i => (i.toLong, s"src${i % 3}"))
      .toDF("doc_id", "source")
    val out = Sampling.stratifiedHashSample(df, col("source"), col("doc_id"),
      Map("src0" -> 1.0, "src1" -> 0.5))
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") == 100)           // rate 1.0 keeps everything
    assert(bySrc.getOrElse("src2", 0L) == 0L) // unlisted stratum drops
    val frac = bySrc.getOrElse("src1", 0L).toDouble / 100
    assert(frac > 0.25 && frac < 0.75, s"src1 kept $frac")
  }

  test("scrub masks urls and emails, leaves clean text untouched") {
    val rows = Seq(
      (1L, "mail me at alice.smith+x@sub.example.org or bob@ex.co thanks"),
      (2L, "docs at https://ex.com/a?b=c#d and http://plain.io/x rest"),
      (3L, "no pii here at all")).toDF("doc_id", "text")
    val got = rows.select(col("doc_id"), TextAnalysis.scrub(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "mail me at <EMAIL> or <EMAIL> thanks")
    assert(got(2L) === "docs at <URL> and <URL> rest")
    assert(got(3L) === "no pii here at all")
  }

  test("topTokenRatio: repetition share of the dominant token") {
    val rows = Seq(
      (1L, "spam spam spam eggs"),             // 3/4
      (2L, "all words unique here")).toDF("doc_id", "text")
    val got = TextAnalysis.topTokenRatio(rows).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) === 0.75)
    assert(got(2L) === 0.25)
  }

  test("tfidf matches a hand-computed corpus") {
    val corpus = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry banana cherry"),
      (3L, "apple apple apple date")).toDF("doc_id", "text")
    // round away the 1-ulp gap between Spark's StrictMath.log and math.log
    def r12(d: Double) = BigDecimal(d).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val got = TextAnalysis.tfidf(corpus, minTf = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r12(r.getDouble(4)))).toSet
    // df: apple=2 docs, banana=2, cherry=1; N=3
    val ln32 = math.log(3.0 / 2)
    val ln31 = math.log(3.0 / 1)
    assert(got === Set(
      (1L, "apple", 2L, 2L, r12(2 * ln32)),
      (2L, "banana", 2L, 2L, r12(2 * ln32)),
      (2L, "cherry", 2L, 1L, r12(2 * ln31)),
      (3L, "apple", 3L, 2L, r12(3 * ln32))))
  }
}
