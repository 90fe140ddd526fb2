package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Profile

/** Plan + semantics contracts for the corpus-profiling family
  * (pipeline/Profile.scala): these run BEFORE the expensive passes on a
  * 100 TB table, so they must themselves be single-scan / single-shuffle. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("prCurve: hand-computed counters, rounded p/r/f1, degenerate thresholds") {
    // scores 0.1..0.4, labels on the top two
    val df = Seq((0.1, false), (0.2, false), (0.3, true), (0.4, true))
      .toDF("s", "y")
    val out = Profile.prCurve(df, col("s"), col("y"), Seq(0.25, 0.9))
      .collect().map(r => r.getDouble(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    // thr 0.25: tp=2 fp=0 fn=0 → p=r=f1=1
    assert(out(0.25) === ((2L, 0L, 0L, 1.0, 1.0, 1.0)))
    // thr 0.9: nothing passes → tp=0 fp=0 fn=2; p=0 (guarded), r=0, f1=0
    assert(out(0.9) === ((0L, 0L, 2L, 0.0, 0.0, 0.0)))
    // single scan: the plan has exactly one aggregate pair over one source
    val plan = Profile.prCurve(df, col("s"), col("y"), Seq(0.25, 0.9))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), s"prCurve re-scans per threshold:\n$plan")
  }

  test("tableProfile: one scan, correct stats per column") {
    val df = Seq(("a", 1), ("b", 2), ("b", 3)).toDF("s", "n")
    val p = Profile.tableProfile(df, Seq("s", "n"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))).toMap
    assert(p("s") === ((3L, 2L, "a", "b")))
    assert(p("n") === ((3L, 3L, "1", "3")))
  }

  test("tableProfile plans a single scan of the input") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val q = Profile.tableProfile(docs, Seq("doc_id", "lang", "source"))
    // count scans textually: AdaptiveSparkPlan hides children from collect()
    val plan = q.queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(plan).length
    assert(scans === 1, s"profile rescans the table:\n$plan")
    // multi-distinct lowers to ONE Expand over the single scan, and only
    // the profiled columns are read
    assert(plan.contains("Expand"), s"expected Expand-based multi-distinct:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string,source:string>"),
      s"scan reads more than the profiled columns:\n$plan")
  }

  test("skewReport: deterministic top-k with exact shares, no window") {
    val df = (Seq.fill(6)("hot") ++ Seq.fill(3)("warm") ++ Seq("cold")).toDF("k")
    val got = Profile.skewReport(df, col("k"), k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq(("hot", 6L, 0.6), ("warm", 3L, 0.3)))

    val ev = spark.read.parquet(s"$sf/events.parquet")
    val q = Profile.skewReport(ev, col("user_id"), k = 20)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"skewReport planned a window:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k is not the distributed TakeOrderedAndProject:\n$plan")
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastNestedLoop"),
      s"grand total must broadcast onto the per-key aggregate:\n$plan")
  }

  test("skewReport tie-break is stable (count desc, key asc)") {
    val df = Seq("b", "b", "a", "a", "c").toDF("k")
    val got = Profile.skewReport(df, col("k"), k = 2)
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("a", "b"))
  }

  test("piiProfile: detectors fire per column, clean columns report zero") {
    val df = Seq(
      ("mail a@b.co now", "clean"),
      ("see https://x.io/y", "clean"),
      ("from 10.0.0.1", "clean"),
      ("call 555-123-4567", "clean")).toDF("t", "s")
    val got = Profile.piiProfile(df, Seq("t", "s")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got("t") === ((4L, 0.25, 0.25, 0.25, 0.25)))
    assert(got("s") === ((4L, 0.0, 0.0, 0.0, 0.0)))
  }

  test("driftReport: hand-computed PSI, zero for identical corpora") {
    val v1 = (Seq.fill(10)("a") ++ Seq.fill(10)("b")).toDF("k")
    val v2 = (Seq.fill(5)("a") ++ Seq.fill(15)("b")).toDF("k")
    val got = Profile.driftReport(v1, v2, Seq("k" -> col("k")))
      .collect().map(r => r.getAs[String]("bucket") ->
        (r.getAs[Long]("n1"), r.getAs[Long]("n2"), r.getAs[Double]("psi"))).toMap
    // psi_a = (0.25−0.5)·ln(0.250001/0.500001); psi_b = (0.75−0.5)·ln(1.5…)
    assert(got("a")._1 === 10L && got("a")._2 === 5L)
    assert(math.abs(got("a")._3 - 0.173286) < 1e-6)
    assert(math.abs(got("b")._3 - 0.101366) < 1e-6)

    val same = Profile.driftReport(v1, v1, Seq("k" -> col("k")))
      .select(sum(abs(col("psi")))).collect().head.getDouble(0)
    assert(same === 0.0)
  }

  test("driftReport: bucket present in only one version still reports") {
    val v1 = Seq("a", "a", "b").toDF("k")
    val v2 = Seq("a", "a", "c").toDF("k")
    val got = Profile.driftReport(v1, v2, Seq("k" -> col("k")))
      .collect().map(r => r.getAs[String]("bucket") ->
        (r.getAs[Long]("n1"), r.getAs[Long]("n2"))).toMap
    assert(got("b") === ((1L, 0L)) && got("c") === ((0L, 1L)))
  }
}
