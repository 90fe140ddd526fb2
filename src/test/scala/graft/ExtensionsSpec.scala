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
}
