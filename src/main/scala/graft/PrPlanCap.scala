package graft

// SCRATCH evidence-capture main for the r18 optimization round (not part
// of the library surface; see OPTIMIZATION_r18.md). Captures, on the
// sf0.1 bench inputs:
//   - q_pagerank{,_full}_before.txt — the PRE-r18 pageRank dataflow,
//     replayed verbatim from git ee1eeaa:src/main/scala/graft/rel/Graph.scala
//     (post-join repartition; shuffled rank joins; driver-collected D),
//   - q_pagerank{,_full}_after.txt — the live Graph.pageRank via PlanProbe.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode
import graft.rel.Checkpoint.PinOps
import java.nio.file.{Files, Paths}

object PrPlanCap {
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
    val dir = "/root/testdata/sf0.1"
    Files.createDirectories(Paths.get("plans/r18"))

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey"))
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .select(concat(lit("s"), col("l_suppkey")).as("s"),
        concat(lit("c"), col("o_custkey")).as("c"))
    val edgesSimple = joined.select(col("s").as("src"), col("c").as("dst"))
      .unionByName(joined.select(col("c").as("src"), col("s").as("dst")))
    val edgesFull = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .select(concat(lit("s"), col("l_suppkey")).as("src"),
        concat(lit("c"), col("o_custkey")).as("dst"))

    // ---- BEFORE: the pre-r18 dataflow, replayed
    def before(edges0: DataFrame, dangling: Boolean, out: String): Unit = {
      val sb = new StringBuilder
      val edgesRaw = edges0.select(col("src"), col("dst")).distinct()
      val outdeg = edgesRaw.groupBy("src").agg(count(lit(1)).as("deg"))
      val edgesPre = edgesRaw.join(outdeg, "src").repartition(col("src"))
      sb ++= s"== edges_setup (pre-r18) ==\n${fmt(edgesPre)}\n"
      val edges = edgesPre.pin()
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
      val pr = nodes.withColumn("pr", round(lit(1.0) / n, 12)).pin()
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
      val prNext = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"), col("dang"),
          round(base + lit(damping) * coalesce(col("m"), lit(0.0)), 12)
            .as("pr"))
      sb ++= s"== iteration_1 (pre-r18; D ${if (dangling) "collected on the driver — one extra job per iteration, not visible in this plan" else "n/a"}) ==\n${fmt(prNext)}\n"
      Files.writeString(Paths.get(out), sb.toString)
      pr.unpin(); nodes.unpin(); edges.unpin()
    }
    before(edgesSimple, dangling = false, "plans/r18/q_pagerank_before.txt")
    before(edgesFull, dangling = true, "plans/r18/q_pagerank_full_before.txt")

    // ---- AFTER: the live operator via PlanProbe
    def after(edges0: DataFrame, iters: Int, dangling: Boolean, out: String): Unit = {
      val probe = new graft.rel.Graph.PlanProbe
      graft.rel.Graph.pageRank(edges0, iters = iters, dangling = dangling,
        planProbe = probe).count()
      val sb = new StringBuilder
      probe.plans.foreach { case (label, p) =>
        sb ++= s"== $label (r18) ==\n$p\n"
      }
      Files.writeString(Paths.get(out), sb.toString)
    }
    after(edgesSimple, 3, dangling = false, "plans/r18/q_pagerank_after.txt")
    after(edgesFull, 2, dangling = true, "plans/r18/q_pagerank_full_after.txt")
    spark.stop()
  }
}
