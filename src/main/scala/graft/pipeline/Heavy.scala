package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** EXACT top-k heavy hitters with bounded memory — the "most frequent
  * n-grams/URLs/tokens in the corpus" query at a cardinality where a
  * plain `groupBy(item).count` would shuffle the entire distinct item
  * space (at 100 TB: billions of n-grams, most seen once).
  *
  * Two passes, both safe at any scale:
  *
  *   1. CANDIDATES — each partition runs a Misra–Gries summary with
  *      capacity m (one bounded hash map per task, the textbook
  *      deterministic frequency sketch). Pigeonhole guarantee: any item
  *      with GLOBAL count > N/m exceeds its per-partition bound n_p/m in
  *      at least one partition, so it survives in at least one summary.
  *      ≤ m·P candidate items total — tiny — collected and broadcast.
  *   2. EXACT RECOUNT — one filtered aggregation counts ONLY the
  *      candidates; everything else is dropped map-side by the broadcast
  *      membership test. Top-k of the exact counts, ties broken by item.
  *
  * The result is bit-identical to the full groupBy top-k — PROVIDED the
  * k-th exact count clears the N/m guarantee threshold, which the
  * operator verifies and fails LOUDLY on (raise `slack` — candidates get
  * cheaper linearly, the exact pass is unchanged). This is the
  * candidates-then-verify pattern that turns a sketch into an exact
  * answer; the sketch bounds memory, never accuracy. */
object Heavy {

  /** Exact top `k` values of `itemCol` by occurrence count. Returns
    * (item, n, rank), rank 1-based by (count desc, item asc). */
  def topKExact(items: DataFrame, itemCol: String = "item", k: Int = 10,
                slack: Int = 32): DataFrame = {
    require(k >= 1 && slack >= 2, s"topKExact: bad k=$k slack=$slack")
    val m = k * slack
    val spark = items.sparkSession
    import spark.implicits._

    val ds = items.select(col(itemCol).cast("string").as("item")).as[String]
    // pass 1: per-partition Misra–Gries (bounded imperative state — the
    // one place a hash map beats any relational formulation)
    val candidates = ds.mapPartitions { it =>
      val counts = new scala.collection.mutable.HashMap[String, Long]
      it.foreach { item =>
        if (counts.contains(item)) counts(item) += 1
        else if (counts.size < m) counts(item) = 1
        else {
          // decrement-all step over a key snapshot; drop zeros
          counts.keys.toArray.foreach { key =>
            val c = counts(key) - 1
            if (c == 0) counts.remove(key) else counts(key) = c
          }
        }
      }
      counts.keysIterator
    }.distinct().collect()

    // pass 2: exact recount of the candidates only — a broadcast hash
    // join drops every non-candidate map-side (no UDF, codegen'd probe)
    val candDF = candidates.toSeq.toDF("item")
    val exact = ds.toDF("item").join(broadcast(candDF), "item")
      .groupBy("item").agg(count(lit(1)).as("n"))
    val top = exact.orderBy(desc("n"), asc("item")).limit(k)
      .collect()

    // guarantee check: the k-th count must clear the N/m threshold, else
    // an item outside the candidate set could in principle beat it.
    // When fewer than k candidates survive (near-uniform data can empty
    // the per-partition summaries via decrement cascades), the short
    // result is only exact if the candidates cover EVERY item in the
    // corpus — verified by a broadcast anti-join (one narrow pass, rare
    // path only); otherwise fail as loudly as the main path does.
    if (top.length < k) {
      val uncovered = ds.toDF("item")
        .join(broadcast(candDF), Seq("item"), "left_anti").count()
      require(uncovered == 0L,
        s"topKExact: guarantee not met (only ${top.length} < k=$k candidates " +
          s"survived and $uncovered rows are outside the candidate set); " +
          s"raise slack (=$slack)")
    } else {
      val total = ds.count()
      val kth = top.last.getAs[Long]("n")
      require(kth > total.toDouble / m,
        s"topKExact: guarantee not met (k-th count $kth <= N/m = ${total.toDouble / m}); " +
          s"raise slack (=$slack)")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(top.zipWithIndex.map { case (r, i) =>
        Row(r.getString(0), r.getLong(1), i + 1)
      }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("item",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.IntegerType, nullable = false))))
  }
}
