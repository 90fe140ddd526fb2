package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Approximate/sketch aggregates for 100-TB-scale profiling — the "novel
  * sketch" tier of the pipeline surface (none exist in the reference, which
  * is exact-only; SURVEY §2.4 notes Spark-native approximates as the
  * extension point).
  *
  * All four are one-pass, mergeable, bounded-memory summaries: each
  * executor builds a partial sketch over its partitions and the partials
  * merge associatively — the only data movement is sketch-sized (KB), no
  * matter the corpus size. That is exactly the property that makes them
  * the right profiling primitives at 100 TB, where an exact distinct or
  * quantile would shuffle the full key set.
  *
  * Determinism: every sketch here is seeded/hash-based with fixed
  * parameters, so repeated runs over the same data give identical
  * estimates (the contract-check query relies on this).
  */
object Sketches {

  /** HyperLogLog++ distinct-count estimate (codegen'd native aggregate).
    * rsd = target relative standard deviation. */
  def approxDistinct(c: Column, rsd: Double = 0.02): Column =
    approx_count_distinct(c, rsd)

  /** One-pass approximate percentile (QuantileSummaries aggregate);
    * `acc` is the accuracy knob: rank error ≤ 1/acc. */
  def approxQuantile(c: Column, q: Double, acc: Int = 10000): Column =
    percentile_approx(c, lit(q), lit(acc))

  /** Count-Min frequency sketch over a column, built distributed (partial
    * sketch per partition, associative merge). Point lookups then run on
    * the driver against the KB-sized merged sketch. Guarantees: estimate ≥
    * true count; estimate ≤ true + eps·N with probability ≥ confidence. */
  def countMin(df: DataFrame, colName: String, eps: Double = 0.001,
               confidence: Double = 0.99, seed: Int = 42): CountMinSketch =
    df.stat.countMinSketch(colName, eps, confidence, seed)

  /** Bloom membership filter, built distributed the same way. No false
    * negatives; false-positive rate ≤ fpp at the stated capacity. */
  def bloom(df: DataFrame, colName: String, expectedItems: Long,
            fpp: Double = 0.01): BloomFilter =
    df.stat.bloomFilter(colName, expectedItems, fpp)

  // ------------------------------------------------- mergeable HLL state

  /** HLL sketch STATE as a binary column (Apache DataSketches HllSketch).
    * Unlike [[approxDistinct]] (which collapses to a number), the state is
    * persistable and MERGEABLE: build one sketch per partition/day/source,
    * store the KB-sized bytes, and union later — the pattern that lets a
    * 100-TB pipeline maintain distinct counts incrementally instead of
    * rescanning history on every question. */
  def hllState(c: Column, lgK: Int = 12): Column = hll_sketch_agg(c, lit(lgK))

  /** Merge previously-built sketch states (associative, loss-free). */
  def hllMerge(state: Column): Column = hll_union_agg(state)

  /** Distinct-count estimate from a sketch state. */
  def hllEstimate(state: Column): Column = hll_sketch_estimate(state)
}
