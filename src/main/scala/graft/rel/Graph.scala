package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
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
  * exact ×10¹² LONG integers (total rank mass is 1, so every sum stays
  * ~10¹² ≪ 2⁵³ — the long total and a decimal sum round to the SAME
  * double), so parallel aggregation order cannot change a rank, at
  * primitive-sum codegen speed; a SQL oracle replays the iterations
  * bit-for-bit with plain decimal sums.
  */
object Graph {

  /** Fixed-iteration PageRank over a directed edge list (`src`, `dst`
    * string columns; duplicate edges are collapsed). Simple variant
    * (`dangling = false`, the default): rank = (1−d)/N +
    * d·Σ rank(in)/outdeg(in); dangling mass is not redistributed (nodes
    * with no in-edges keep the base term), so ranks do NOT sum to 1.
    *
    * Canonical variant (`dangling = true`): each iteration also folds the
    * total rank sitting on out-degree-0 nodes back into every node's base
    * term — rank = (1−d)/N + d·(Σ rank(in)/outdeg(in) + D/N) where
    * D = Σ rank(dangling). One extra SCALAR aggregate per iteration over
    * the node-sized rank vector (a broadcast anti-join marks the dangling
    * set once, up front) — the edge-sized work is unchanged, and ranks
    * sum to 1 at every step. The D term is 12dp-rounded like every other
    * contribution so a SQL oracle replays it bit-for-bit.
    *
    * Early termination (`tol > 0`): stops when the L1 delta
    * Σ|pr_i − pr_{i-1}| (computed on the 12dp values, summed as exact
    * ×10¹² longs) drops below `tol` — one node-sized join per iteration,
    * only the scalar reaches the driver. `iters` stays the hard cap.
    *
    * Returns (node, pr) with pr rounded to 6dp. */
  def pageRank(edges0: DataFrame, iters: Int = 3,
               damping: Double = 0.85, dangling: Boolean = false,
               tol: Double = 0.0): DataFrame = {
    require(iters >= 1, "pageRank: iters must be >= 1")
    val edgesRaw = edges0.select(col("src"), col("dst")).distinct()
    val outdeg = edgesRaw.groupBy("src").agg(count(lit(1)).as("deg"))
    // fold the out-degree INTO the pinned edge layout up front — one join
    // per iteration instead of two, against an unchanging src-partitioned
    // artifact
    val edges = edgesRaw.join(outdeg, "src")
      .repartition(col("src")).pin()
    val nodes0 = edges.select(col("src").as("node"))
      .union(edges.select(col("dst"))).distinct()
    // mark the dangling set once (no out-edges = never appears as src);
    // per-iteration D is then a flat scalar aggregate, no join
    val nodes = nodes0.join(edges.select(col("src").as("node")).distinct(),
        Seq("node"), "left_anti")
      .withColumn("dang", lit(true))
      .unionByName(edges.select(col("src").as("node")).distinct()
        .withColumn("dang", lit(false)))
      .pin()
    val n = nodes.count().toDouble

    var pr = nodes.withColumn("pr", round(lit(1.0) / n, 12)).pin()
    var i = 0
    var converged = false
    while (i < iters && !converged) {
      // every rank term is 12dp-quantized, so ×10¹² it is an exact LONG
      // (total mass is 1 → any sum stays ≤ ~10¹², far under 2⁵³): plain
      // long sums add the identical totals order-invariantly on the
      // codegen primitive fast path, where the previous DecimalType(28,12)
      // aggregation paid decimal arithmetic on every edge row
      val base =
        if (!dangling) lit((1.0 - damping) / n)
        else {
          val d = pr.where(col("dang"))
            .agg(coalesce(sum(round(round(col("pr"), 12) * 1e12).cast("long")),
              lit(0L)))
            .collect()(0).getLong(0) / 1e12
          lit((1.0 - damping) / n) + lit(damping) * round(lit(d / n), 12)
        }
      val contrib = pr.join(edges, pr("node") === edges("src"))
        .select(col("dst"),
          round(round(col("pr") / col("deg"), 12) * 1e12).cast("long").as("c"))
        .groupBy("dst").agg((sum(col("c")).cast("double") / 1e12).as("m"))
      // pin each iteration: measured FASTER than one deep dag here (the
      // rank vector is node-sized — tiny — while an unpinned tree makes
      // every AQE stage re-optimize the whole accumulated plan)
      val prev = pr
      pr = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"), col("dang"),
          round(base + lit(damping) * coalesce(col("m"), lit(0.0)), 12)
            .as("pr"))
        .pin()
      if (tol > 0.0) {
        val delta = pr.select(col("node"), col("pr"))
          .join(prev.select(col("node"), col("pr").as("pp")), "node")
          .agg(sum(round(abs(col("pr") - col("pp")) * 1e12).cast("long")))
          .collect()(0).getLong(0) / 1e12
        converged = delta < tol
      }
      prev.unpin()
      i += 1
    }
    // the final `pr` pin (node-sized) is the bounded result pin; the
    // EDGE-sized layout and the node-set pin are dead once it exists —
    // leaving them resident is corpus-scale executor storage held until
    // the ContextCleaner (PinLedgerSpec)
    edges.unpin()
    nodes.unpin()
    val out = pr.select(col("node"), round(col("pr"), 6).as("pr"))
    out
  }
}
