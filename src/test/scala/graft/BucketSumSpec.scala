package graft

import org.apache.spark.sql.functions._
import graft.functions.{BucketDotSums, BucketErrSumAgg}

/** Contracts for the classifier's fixed-point kernel expressions:
  * [[BucketDotSums]] (per-row multi-candidate dot products over a bucket
  * array) and [[BucketErrSumAgg]] (dense scatter-add gradient reduce).
  * Both must be exact over longs, ignore out-of-range buckets, treat the
  * empty array as zero, and agree between the interpreted eval path and
  * whatever path the planner actually runs. */
class BucketSumSpec extends SparkSpec {
  import spark.implicits._

  test("BucketDotSums: k candidates in one traversal, exact long sums") {
    val w = Array(Array(10L, 20L, 30L, 40L), Array(-1L, -2L, -3L, -4L))
    val df = Seq(
      (1, Seq(0, 2)),       // 10+30 = 40 ; -1-3 = -4
      (2, Seq(1, 2, 3)),    // 90 ; -9
      (3, Seq.empty[Int]),  // 0 ; 0
      (4, Seq(0, 0, 3))     // duplicates count twice: 10+10+40 = 60 ; -6
    ).toDF("id", "bs")
    val got = df.select(col("id"), BucketDotSums(spark, col("bs"), w).as("s"))
      .orderBy("id")
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1)))
    assert(got.map(_._2.toList).toList ===
      List(List(40L, -4L), List(90L, -9L), List(0L, 0L), List(60L, -6L)))
  }

  test("BucketDotSums: out-of-range buckets contribute zero, never throw") {
    val w = Array(Array(5L, 7L))
    val got = Seq((1, Seq(-1, 0, 1, 2, 99))).toDF("id", "bs")
      .select(BucketDotSums(spark, col("bs"), w).as("s"))
      .collect()(0).getSeq[Long](0)
    assert(got === Seq(12L)) // only buckets 0 and 1 land
  }

  test("BucketErrSumAgg: dense gradient with bias slot, partition-invariant") {
    val rows = Seq(
      (Seq(0, 2), 100L),
      (Seq(1), -50L),
      (Seq.empty[Int], 7L),  // featureless doc: bias slot only
      (Seq(2, 3), 10L))
    def gradOf(parts: Int): Seq[Long] =
      rows.toDF("bs", "e6").repartition(parts)
        .agg(BucketErrSumAgg(col("bs"), col("e6"), 4).as("g"))
        .collect()(0).getSeq[Long](0)
    val g = gradOf(1)
    // per-bucket sums ..., slot 4 = bias = sum of ALL e6
    assert(g === Seq(100L, -50L, 110L, 10L, 67L))
    assert(gradOf(7) === g, "gradient must not depend on partitioning")
  }

  test("BucketErrSumAgg: grouped use keeps per-group accumulators separate") {
    val g = Seq(("a", Seq(0), 1L), ("a", Seq(1), 2L), ("b", Seq(0), 5L))
      .toDF("k", "bs", "e6")
      .groupBy("k").agg(BucketErrSumAgg(col("bs"), col("e6"), 2).as("g"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(g("a") === Seq(1L, 2L, 3L))
    assert(g("b") === Seq(5L, 0L, 5L))
  }
}
