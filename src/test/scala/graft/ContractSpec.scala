package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Contract
import graft.pipeline.Contract._

/** Data-contract validation semantics: metric math, null discipline,
  * pass verdicts, the hard gate, and the one-scan plan shape. */
class ContractSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "alpha beta", "en", "s1"),
    (2L, "gamma", "fr", "s2"),
    (3L, null: String, "en", "s1"),
    (4L, "delta epsilon zeta", "xx", "s9"))
    .toDF("id", "text", "lang", "src")

  private def report = Contract.check(docs, Seq(
    NotNull("text", minFraction = 0.9),
    Matches("lang", "^[a-z]{2}$"),
    IsIn("lang", Seq("en", "fr"), minFraction = 0.7),
    Unique(Seq("id")),
    RowCount(2, 10),
    RefIn("src", Seq("s1", "s2").toDF("k"), "k", minFraction = 0.9)))
    .collect().map(r => (r.getString(0), r.getDouble(2), r.getBoolean(4))).toList

  test("metrics and verdicts: fractions over ALL rows, nulls fail checks") {
    assert(report === List(
      ("not_null", 0.75, false),            // 3/4 non-null < 0.9
      ("matches[^[a-z]{2}$]", 1.0, true),
      ("is_in[en|fr]", 0.75, true),         // 'xx' outside the set
      ("unique", 1.0, true),
      ("row_count[2,10]", 4.0, true),
      ("ref_in[k]", 0.75, false)))          // s9 not in the dim
  }

  test("unique catches duplicate keys; null key rows leave the distinct") {
    val dup = docs.union(docs.limit(1))
    val m = Contract.check(dup, Seq(Unique(Seq("id"))))
      .collect()(0)
    assert(m.getDouble(2) === 0.8 && !m.getBoolean(4)) // 4 distinct / 5 rows
  }

  test("validate throws listing every violated rule") {
    val e = intercept[IllegalArgumentException] {
      Contract.validate(docs, Seq(NotNull("text"), RowCount(100, 200)))
    }
    assert(e.getMessage.contains("not_null(text)"))
    assert(e.getMessage.contains("row_count[100,200](*)"))
    // and a passing contract is silent
    Contract.validate(docs, Seq(RowCount(1, 10), Unique(Seq("id"))))
  }

  test("empty table: fractions are vacuously 1.0, RowCount still bites") {
    val empty = docs.where(lit(false))
    val r = Contract.check(empty, Seq(
      NotNull("text"), Unique(Seq("id")), RowCount(1, 10)))
      .collect().map(x => (x.getString(0), x.getDouble(2), x.getBoolean(4)))
    assert(r(0) === ("not_null", 1.0, true))   // vacuous, never null
    assert(r(1) === ("unique", 1.0, true))
    assert(r(2) === ("row_count[1,10]", 0.0, false)) // emptiness caught here
    val e = intercept[IllegalArgumentException] {
      Contract.validate(empty, Seq(NotNull("text"), RowCount(1, 10)))
    }
    assert(e.getMessage.contains("row_count"))
  }

  test("plan: row-local expectations are ONE scan — no Expand, no join") {
    val p = Contract.check(docs, Seq(
      NotNull("text"), Matches("lang", "^[a-z]{2}$"),
      IsIn("lang", Seq("en")), RowCount(1, 10)))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Expand") && !p.contains("Join"),
      s"row-local contract not a single narrow scan:\n${p.take(3000)}")
  }

  test("plan: referential containment joins its dim by broadcast") {
    val p = Contract.check(docs,
      Seq(RefIn("src", Seq("s1").toDF("k"), "k")))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"RefIn dim not broadcast:\n${p.take(3000)}")
  }

  test("RefIn above the broadcast bound falls back to a shuffled join: " +
       "same report, no broadcast of the reference set, stream face equal") {
    val exps = Seq(RefIn("src", Seq("s1", "s2").toDF("k"), "k",
      minFraction = 0.9), NotNull("text", minFraction = 0.9))
    val small = Contract.check(docs, exps).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4))).toSeq
    // emulate a cluster-sized reference set: our hint is bounded out AND
    // the planner's own auto-broadcast (which a big dim's stats would
    // disqualify anyway) is off
    spark.conf.set("spark.graft.contract.refBroadcastBytes", "1")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val checked = Contract.check(docs, exps)
      val p = checked.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastHashJoin"),
        s"over-bound RefIn still broadcast:\n${p.take(3000)}")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"over-bound RefIn has no shuffled join:\n${p.take(3000)}")
      val big = checked.collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
          r.getDouble(3), r.getBoolean(4))).toSeq
      assert(big === small)
      // the streaming monitor rides the same refJoin — identical report
      val mon = new graft.streaming.ContractStream.Monitor(exps)
      mon.ingest(docs.limit(2), batchId = 0L)
      mon.ingest(docs.offset(2), batchId = 1L)
      assert(mon.report().map(r => (r._1, r._2, r._3, r._4, r._5)) === big)
    } finally {
      spark.conf.unset("spark.graft.contract.refBroadcastBytes")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
