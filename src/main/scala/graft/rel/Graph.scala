package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.rel.Checkpoint.PinOps

/** Iterative graph analytics on DataFrames. Companion to the
  * pointer-doubling connected components in [[graft.pipeline.Cluster]]:
  * where that converges a LABEL per node, these run a fixed number of
  * power-method steps over edge weights — PageRank being the canonical
  * instance (authority scoring of domains/hosts in a crawl graph, seed
  * selection for a focused recrawl).
  *
  * Scale shape per iteration: one join of the rank vector with the edge
  * list on `src` and one map-side-combinable aggregation on `dst` — the
  * classic two-exchange step. The edge list is the REUSED side: it is
  * repartitioned on `src` once up front and pinned, so every iteration's
  * join co-locates against the same layout instead of reshuffling edges
  * (at 100 TB: bucket the edge table on src and the join is exchange-free
  * on that side; ranks — one double per node — are the only moving data).
  *
  * Determinism: per-edge contributions are 12dp-rounded then summed as
  * DECIMAL, so parallel aggregation order cannot change a rank — the same
  * discipline the LM-score and centered-norm operators use, and what lets
  * a SQL oracle replay the iterations bit-for-bit.
  */
object Graph {

  /** Fixed-iteration PageRank over a directed edge list (`src`, `dst`
    * string columns; duplicate edges are collapsed). Simple variant:
    * rank = (1−d)/N + d·Σ rank(in)/outdeg(in); dangling mass is not
    * redistributed (nodes with no in-edges keep the base term). Returns
    * (node, pr) with pr rounded to 6dp. */
  def pageRank(edges0: DataFrame, iters: Int = 3,
               damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "pageRank: iters must be >= 1")
    val edgesRaw = edges0.select(col("src"), col("dst")).distinct()
    val outdeg = edgesRaw.groupBy("src").agg(count(lit(1)).as("deg"))
    // fold the out-degree INTO the pinned edge layout up front — one join
    // per iteration instead of two, against an unchanging src-partitioned
    // artifact
    val edges = edgesRaw.join(outdeg, "src")
      .repartition(col("src")).pin()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst"))).distinct().pin()
    val n = nodes.count().toDouble

    var pr = nodes.withColumn("pr", round(lit(1.0) / n, 12)).pin()
    var i = 0
    while (i < iters) {
      val contrib = pr.join(edges, pr("node") === edges("src"))
        .select(col("dst"),
          round(col("pr") / col("deg"), 12)
            .cast(DecimalType(28, 12)).as("c"))
        .groupBy("dst").agg(sum(col("c")).cast("double").as("m"))
      // pin each iteration: measured FASTER than one deep dag here (the
      // rank vector is node-sized — tiny — while an unpinned tree makes
      // every AQE stage re-optimize the whole accumulated plan)
      pr = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          round(lit((1.0 - damping)) / n +
            lit(damping) * coalesce(col("m"), lit(0.0)), 12).as("pr"))
        .pin()
      i += 1
    }
    pr.select(col("node"), round(col("pr"), 6).as("pr"))
  }
}
