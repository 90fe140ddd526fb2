package graft

// SCRATCH evidence-capture main for the r19 optimization round (not part
// of the library surface; see OPTIMIZATION_r19.md). Captures, on the
// sf0.1 bench inputs, the SHUFFLED-FALLBACK regime plans of the iterative
// graph operators — the 100 TB operating regime, invisible in the bench's
// tiny/broadcast tiers:
//   - q_pagerank_fallback_before.txt — the PRE-r19 fallback dataflow
//     replayed verbatim (per-iteration shuffled SortMergeJoins against an
//     UnknownPartitioning pin), forced by bc = identity;
//   - q_pagerank_fallback_after.txt — the live Graph.pageRank with
//     spark.graft.graph.broadcastBytes=1 (forced fallback) via PlanProbe:
//     per-iteration edge join against the bucketed-by-src scratch layout;
//   - q_cc_dist_{before,after}.txt — the connected-components distributed
//     round: pre-r19 replay (repartition+pin premise) vs the live loop
//     (driverEdgeCap=0) via Cluster.PlanProbe;
//   - q_while_dist_fallback_{before,after}.txt — one closure layer's join
//     plan: frontier ⋈ pinned edges (before) vs frontier ⋈ bucketed
//     scratch layout (after).
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode
import graft.rel.Checkpoint.PinOps
import java.nio.file.{Files, Paths}

object R19PlanCap {
  private def fmt(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // The fallback regime exists because at 100 TB NOTHING edge-sized can
    // broadcast — but at sf0.1 the planner would happily auto-broadcast
    // the 2 MB edge table and hide the join shape under test. Disabling
    // auto-broadcast (planner AND AQE) makes the captured plans show the
    // strategy the at-scale regime actually gets; explicit broadcast()
    // hints (the 1-row dangling scalar) still apply.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val dir = "/root/testdata/sf0.1"
    Files.createDirectories(Paths.get("plans/r19"))

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey"))
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .select(concat(lit("s"), col("l_suppkey")).as("s"),
        concat(lit("c"), col("o_custkey")).as("c"))
    val edgesSimple = joined.select(col("s").as("src"), col("c").as("dst"))
      .unionByName(joined.select(col("c").as("src"), col("s").as("dst")))

    // ---- PageRank fallback BEFORE: the pre-r19 dataflow with bc =
    // identity (what !tinyRanks executed), replayed verbatim
    {
      val sb = new StringBuilder
      val edgesRaw = edgesSimple.select(col("src"), col("dst")).distinct()
      val outdeg = edgesRaw.groupBy("src").agg(count(lit(1)).as("deg"))
      val edges = edgesRaw.repartition(col("src")).join(outdeg, "src").pin()
      val nodes0 = edges.select(col("src").as("node"))
        .union(edges.select(col("dst"))).distinct()
      val nodes = nodes0.join(edges.select(col("src").as("node")).distinct(),
          Seq("node"), "left_anti")
        .withColumn("dang", lit(true))
        .unionByName(edges.select(col("src").as("node")).distinct()
          .withColumn("dang", lit(false)))
        .pin()
      val n = nodes.count().toDouble
      val damping = 0.85
      var pr = nodes.withColumn("pr", round(lit(1.0) / n, 12)).pin()
      (1 to 2).foreach { i =>
        val contrib = pr.join(edges, pr("node") === edges("src"))
          .select(col("dst"),
            round(round(col("pr") / col("deg"), 12) * 1e12).cast("long").as("c"))
          .groupBy("dst").agg((sum(col("c")).cast("double") / 1e12).as("m"))
        val prNext = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
          .select(col("node"), col("dang"),
            round(lit((1.0 - damping) / n) +
              lit(damping) * coalesce(col("m"), lit(0.0)), 12).as("pr"))
        sb ++= s"== iteration_$i (pre-r19 fallback: shuffled joins against the UnknownPartitioning pin) ==\n${fmt(prNext)}\n"
        val prev = pr
        pr = prNext.pin()
        prev.unpin()
      }
      Files.writeString(Paths.get("plans/r19/q_pagerank_fallback_before.txt"),
        sb.toString)
      pr.unpin(); nodes.unpin(); edges.unpin()
    }

    // ---- PageRank fallback AFTER: the live operator, fallback forced
    {
      spark.conf.set("spark.graft.graph.broadcastBytes", "1")
      try {
        val probe = new graft.rel.Graph.PlanProbe
        graft.rel.Graph.pageRank(edgesSimple, iters = 2,
          planProbe = probe).count()
        val sb = new StringBuilder
        probe.plans.foreach { case (label, p) =>
          sb ++= s"== $label (r19 fallback: bucketed-by-src edge layout, bucketed-by-node node set) ==\n$p\n"
        }
        Files.writeString(Paths.get("plans/r19/q_pagerank_fallback_after.txt"),
          sb.toString)
      } finally spark.conf.unset("spark.graft.graph.broadcastBytes")
    }

    // ---- connected components distributed round, on the q_cc_dist edge
    // set (per-user event successor chains)
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("event_id")
    val ccPairs = ev.withColumn("dst", lead(col("event_id"), 1).over(w))
      .where(col("dst") > col("event_id"))
      .select(col("event_id"), col("dst"))

    // BEFORE: pre-r19 replay — repartition(src)+pin edges (premise the pin
    // does not keep), one label round's jump plan
    {
      val p = ccPairs.select(col("event_id").as("a"), col("dst").as("b")).pin()
      val edges = p.select(col("a").as("src"), col("b").as("dst"))
        .union(p.select(col("b").as("src"), col("a").as("dst")))
        .distinct()
        .repartition(col("src"))
        .pin()
      val labels = edges.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("lbl"))
        .pin()
      val nbrMin = edges.join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id")).agg(min(col("lbl")).as("nlbl"))
      val stepped = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
      val jump = stepped.alias("x")
        .join(stepped.select(col("id").as("lbl"), col("lbl").as("lbl2")).alias("y"),
          Seq("lbl"), "left")
        .select(col("id"), coalesce(col("lbl2"), col("lbl")).as("lbl"))
      Files.writeString(Paths.get("plans/r19/q_cc_dist_before.txt"),
        s"== round_1 (pre-r19: edge pin reports UnknownPartitioning — the neighbor-min join re-shuffles and re-sorts the edge set every round) ==\n${fmt(jump)}\n")
      labels.unpin(); edges.unpin(); p.unpin()
    }

    // AFTER: the live loop (driverEdgeCap = 0) via Cluster.PlanProbe
    {
      val probe = new graft.pipeline.Cluster.PlanProbe
      graft.pipeline.Cluster.connectedComponents(ccPairs, "event_id", "dst",
        driverEdgeCap = 0, planProbe = probe).count()
      val sb = new StringBuilder
      probe.plans.foreach { case (label, p) =>
        sb ++= s"== $label (r19: bucketed-by-src edge layout — edge side Exchange-free, Sort-free) ==\n$p\n"
      }
      Files.writeString(Paths.get("plans/r19/q_cc_dist_after.txt"), sb.toString)
    }

    // ---- WhileDist closure layer, edge side past the broadcast cap
    {
      val chainEdges = ev.withColumn("dst", lead(col("event_id"), 1).over(w))
        .where(col("dst") > col("event_id"))
        .select(col("event_id").as("src"), col("dst"))
      val frontier = ev.where(col("event_type") === "error")
        .select(col("event_id")).pin()
      // BEFORE: frontier ⋈ pinned edges (the pre-r19 non-broadcast branch)
      val pinned = chainEdges.pin()
      val layerBefore = frontier.alias("f")
        .join(pinned.alias("e"), col("f.event_id") === col("e.src"))
        .select(col("e.dst").as("event_id"))
      Files.writeString(Paths.get("plans/r19/q_while_dist_fallback_before.txt"),
        s"== closure layer (pre-r19 fallback: pinned edges, UnknownPartitioning — re-shuffled and re-sorted per LAYER) ==\n${fmt(layerBefore)}\n")
      pinned.unpin()
      // AFTER: frontier ⋈ bucketed scratch layout (the r19 fallback branch)
      val layout = graft.sources.ScratchBuckets.create(chainEdges, Seq("src"))
      graft.sources.ScratchBuckets.withSortedScans(spark) {
        val layerAfter = frontier.alias("f")
          .join(layout.df.alias("e"), col("f.event_id") === col("e.src"))
          .select(col("e.dst").as("event_id"))
        Files.writeString(Paths.get("plans/r19/q_while_dist_fallback_after.txt"),
          s"== closure layer (r19 fallback: bucketed-by-src scratch layout — edge side Exchange-free, Sort-free) ==\n${fmt(layerAfter)}\n")
      }
      layout.close(spark)
      frontier.unpin()
    }

    spark.stop()
  }
}
