package graft

import org.apache.spark.sql.functions._
import graft.functions.Sketches

/** Sketch aggregates: structural guarantees (CMS never undercounts, Bloom
  * has no false negatives) and accuracy bounds, plus determinism across
  * repeated builds (fixed seeds). */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val nums = (1L to 5000L).map(i => i % 700).toDF("k")

  test("HLL distinct estimate within rsd bound and deterministic") {
    val est1 = nums.agg(Sketches.approxDistinct(col("k")).as("d")).collect()(0).getLong(0)
    val est2 = nums.agg(Sketches.approxDistinct(col("k")).as("d")).collect()(0).getLong(0)
    assert(est1 === est2)
    assert(math.abs(est1.toDouble / 700 - 1.0) <= 0.05)
  }

  test("approx quantile has bounded rank error") {
    val med = nums.agg(Sketches.approxQuantile(col("k"), 0.5).as("m"))
      .collect()(0).getLong(0)
    val below = nums.filter(col("k") <= med).count().toDouble / 5000
    assert(below >= 0.45 && below <= 0.55)
  }

  test("count-min never undercounts; overcount bounded by eps*N") {
    val cms = Sketches.countMin(nums, "k", eps = 0.001)
    val truth = nums.groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    truth.foreach { case (k, n) =>
      val est = cms.estimateCount(k)
      assert(est >= n && est <= n + (2 * 0.001 * 5000).toLong + 1)
    }
  }

  test("bloom filter has zero false negatives and bounded fp rate") {
    val bf = Sketches.bloom(nums, "k", 1000L, fpp = 0.01)
    (0L until 700L).foreach(k => assert(bf.mightContain(k)))
    val fps = (10000L until 20000L).count(bf.mightContain)
    assert(fps <= 10000 * 0.05) // 5x slack over the 1% target
  }

  test("HLL sketch state merges loss-free across groups") {
    // per-group sketch states unioned == one estimate over the whole set;
    // groups overlap (k % 700 repeats across g), so merge must dedupe
    val grouped = (1L to 5000L).map(i => (i % 7, i % 700)).toDF("g", "k")
    val merged = grouped.groupBy("g").agg(Sketches.hllState(col("k")).as("sk"))
      .agg(Sketches.hllEstimate(Sketches.hllMerge(col("sk"))).as("est"))
      .collect()(0).getLong(0)
    assert(math.abs(merged.toDouble / 700 - 1.0) <= 0.05, s"merged=$merged")
    // and lands within the same bound as the single-pass sketch (the union
    // re-encodes the sketch, so exact equality is NOT guaranteed)
    val direct = grouped.agg(Sketches.hllEstimate(
      Sketches.hllState(col("k"))).as("est")).collect()(0).getLong(0)
    assert(math.abs(direct.toDouble / 700 - 1.0) <= 0.05, s"direct=$direct")
  }
}
