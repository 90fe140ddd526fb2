package graft

import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.functions._

/** GraftExtensions: SQL exposure of the native codegen expressions. The
  * shared test session is built with
  * spark.sql.extensions=graft.plans.GraftExtensions, so this also proves
  * the extension loads through the standard config path. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("redundant dedup over a distinct child optimizes to one aggregate (native Catalyst)") {
    // documents WHY GraftExtensions carries no optimizer rule: Catalyst
    // already collapses dedup-over-aggregate (distinct-keys propagation +
    // RemoveRedundantAggregates) — the one rule the engine would need
    val base = Seq((1, "a"), (1, "a"), (2, "b")).toDF("k", "v")
    val agg = base.groupBy("k").agg(count(lit(1)).as("n"))
    val aggs = agg.dropDuplicates().queryExecution.optimizedPlan
      .collect { case a: Aggregate => a }
    assert(aggs.size === 1)
    assert(agg.dropDuplicates().count() === 2)
  }

  test("native expressions are callable from SQL") {
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val d = spark.sql("SELECT vec_dot(a, b) AS d FROM vecs").collect()(0).getDouble(0)
    assert(d === 11.0)
    val sh = spark.sql(
      "SELECT simhash64(array(xxhash64('spark'), xxhash64('graft'))) AS h")
      .collect()(0).getLong(0)
    val shCol = spark.range(1).select(graft.functions.SimHash64(
      array(xxhash64(lit("spark")), xxhash64(lit("graft"))))).collect()(0).getLong(0)
    assert(sh === shCol)
    val sig = spark.sql(
      "SELECT minhash_sig(array(CAST(7 AS BIGINT), CAST(11 AS BIGINT)), 8) AS s")
      .collect()(0).getSeq[Long](0)
    assert(sig.length === 8 && sig.forall(_ >= 0))
  }

  test("pipeline signal combinators are callable from SQL") {
    val r = spark.sql(
      "SELECT quality('the cat and the dog sat on the mat') AS q, " +
        "lang_id('der hund ist nicht da und das ist gut') AS lg, " +
        "scrub_all('mail a@b.co from 10.0.0.1') AS sc, " +
        "html_text('<p>one &amp; two</p><script>var a=1<2;</script>') AS ht, " +
        "url_canon('HTTPS://Example.COM:443/P?utm_source=x') AS u, " +
        "zorder_key(3, 5, 8) AS z").collect()(0)
    // SQL answers match the DataFrame-API combinators exactly
    import org.apache.spark.sql.functions.lit
    val df = spark.range(1).select(
      graft.pipeline.TextAnalysis.qualityScore(
        lit("the cat and the dog sat on the mat")).as("q"),
      graft.pipeline.TextAnalysis.langId(
        lit("der hund ist nicht da und das ist gut")).as("lg")).collect()(0)
    assert(r.getDouble(0) === df.getDouble(0))
    assert(r.getString(1) === df.getString(1) && r.getString(1) === "de")
    assert(r.getString(2) === "mail <EMAIL> from <IP>")
    assert(r.getString(3) === "one & two")
    assert(r.getString(4) === "https://example.com/P")
    assert(r.getLong(5) === 39L)
  }
}
