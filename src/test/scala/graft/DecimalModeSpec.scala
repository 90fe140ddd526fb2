package graft

import org.apache.spark.sql.functions._
import graft.lang.{AndlInterp, AndlValues}
import graft.lang.AndlValues.NumV

/** Decimal-number mode differential (SURVEY §1.2): the reference's `number`
  * is .NET's 128-bit decimal (TypedValue.cs:294-346), ours defaults to
  * double. `spark.graft.decimalNumbers=true` switches the language's
  * numeric domain to DecimalType(38,18); this spec runs SuiteRelFold-shaped
  * money aggregations in BOTH modes and quantifies the double-mode drift
  * that decimal mode eliminates. */
class DecimalModeSpec extends SparkSpec {

  private val n = 100000L
  private def moneyTable = spark.range(0, n).toDF("id")
    .withColumn("amt", lit("0.10").cast("decimal(38,18)"))

  private def runFold(decimal: Boolean): (Double, Double) = {
    if (decimal) spark.conf.set("spark.graft.decimalNumbers", "true")
    else spark.conf.unset("spark.graft.decimalNumbers")
    try {
      val i = new AndlInterp(spark, "/tmp")
      i.defineRelvar("T", moneyTable)
      // fold(+, amt): 100k × $0.10 must be exactly $10,000
      i.run("total := T .select{ (fold(+,amt)) }", "dec-total")
      // per-row money arithmetic folded: amt*3 - amt - amt - amt ≡ 0
      i.run("resid := T .select{ (fold(+, amt*3 - amt - amt - amt)) }", "dec-resid")
      val total = i.global.lookup("total").get.asInstanceOf[NumV].d
      val resid = i.global.lookup("resid").get.asInstanceOf[NumV].d
      (total, resid)
    } finally {
      spark.conf.unset("spark.graft.decimalNumbers")
      AndlValues.decimalNumbers = false
    }
  }

  test("decimal mode: money folds are exact; double-mode drift quantified") {
    val (dTotal, dResid) = runFold(decimal = false)
    val (xTotal, xResid) = runFold(decimal = true)
    // decimal mode: bit-exact money arithmetic
    assert(xTotal === 10000.0, s"decimal total drifted: $xTotal")
    assert(xResid === 0.0, s"decimal residual nonzero: $xResid")
    // double mode: the drift the reference never shows — nonzero but tiny
    // (this is the documented deviation decimal mode exists to remove)
    val totalDrift = math.abs(dTotal - 10000.0)
    assert(totalDrift > 0.0, "expected double-mode drift on 100k × $0.10")
    assert(totalDrift < 1e-6, s"double drift implausibly large: $totalDrift")
    assert(math.abs(dResid) > 0.0 && math.abs(dResid) < 1e-6,
      s"double residual out of range: $dResid")
  }

  test("reference .andl suites pass under decimal-number mode") {
    // the strongest parity claim available: the reference's `number` IS
    // 128-bit decimal, so its own suites are decimal-semantics tests. They
    // must pass with the engine's numeric domain switched to decimal too.
    val dir = sys.env.getOrElse("ANDL_SUITE_DIR", "/root/reference/Test")
    assume(new java.io.File(s"$dir/SetupSuite.andl").isFile)
    spark.conf.set("spark.graft.decimalNumbers", "true")
    try {
      val results = graft.lang.AndlScript.runSuites(spark, dir, Seq(
        "SuiteBasic.andl", "SuiteDefer.andl", "SuiteRelBasic.andl",
        "SuiteRelDyadic.andl", "SuiteRelFold.andl", "SuiteRelNest.andl",
        "SuiteRelOrder.andl", "SuiteRelWhile.andl",
        "SuiteUpdateCat1.andl", "SuiteUpdateCat2.andl"))
      val failures = results.filter(_.errors > 0)
      assert(failures.isEmpty,
        failures.map(r => s"${r.file}: ${r.errors} failures\n${r.output}")
          .mkString("\n"))
      assert(results.map(_.tests).sum >= 400,
        s"expected the full assertion corpus, got ${results.map(_.tests).sum}")
    } finally {
      spark.conf.unset("spark.graft.decimalNumbers")
      AndlValues.decimalNumbers = false
    }
  }

  test("decimal mode: literals and relvar columns stay decimal end-to-end") {
    spark.conf.set("spark.graft.decimalNumbers", "true")
    try {
      val i = new AndlInterp(spark, "/tmp")
      i.defineRelvar("T", moneyTable.limit(10))
      i.run("r := T .select{ id, v := amt * 100 + 0.5 }", "dec-cols")
      val df = i.relvar("r")
      val vType = df.schema("v").dataType
      assert(vType.isInstanceOf[org.apache.spark.sql.types.DecimalType],
        s"arithmetic left the decimal domain: $vType")
      assert(df.select(sum(col("v"))).collect()(0).getDecimal(0)
        .compareTo(new java.math.BigDecimal("105.0")) === 0)
    } finally {
      spark.conf.unset("spark.graft.decimalNumbers")
      AndlValues.decimalNumbers = false
    }
  }

  test("two interpreters with OPPOSITE decimal modes coexist, interleaved: " +
       "each entry point runs in its own numeric domain") {
    // The modes are per-session (captured at construction, thread-scoped
    // per entry point) — a second interp under a different conf no longer
    // flips the first's domain.
    val dec = new AndlInterp(spark, "/tmp",
      AndlInterp.Modes(decimalNumbers = true, collation = None))
    val dbl = new AndlInterp(spark, "/tmp") // conf default: double
    val table = moneyTable.limit(10000)
    dec.defineRelvar("T", table)
    dbl.defineRelvar("T", table) // interleaved with dec's statements
    dec.run("total := T .select{ (fold(+,amt)) }", "mix-dec")
    dbl.run("total := T .select{ (fold(+,amt)) }", "mix-dbl")
    dec.run("r := T .select{ id, v := amt * 100 + 0.5 }", "mix-dec2")
    // the decimal session stays decimal end-to-end...
    assert(dec.relvar("r").schema("v").dataType
      .isInstanceOf[org.apache.spark.sql.types.DecimalType])
    val dTotal = dec.global.lookup("total").get.asInstanceOf[NumV].d
    assert(dTotal === 1000.0, s"decimal session drifted: $dTotal")
    // ...while the double session, interleaved, stays double
    dbl.run("r := T .select{ id, v := amt * 100 + 0.5 }", "mix-dbl2")
    assert(dbl.relvar("r").schema("v").dataType ===
      org.apache.spark.sql.types.DoubleType)
    val bTotal = dbl.global.lookup("total").get.asInstanceOf[NumV].d
    assert(math.abs(bTotal - 1000.0) < 1e-6)
  }
}
