package graft

import org.apache.spark.sql.functions._
import graft.lang.{AndlInterp, AndlValues}
import graft.lang.AndlValues.{NumV, RelV, LRelV, TextV, TupV}

/** Collation delta harness (SURVEY §1.2 documented deviation): the reference
  * sorts text with .NET `CurrentCulture`
  * (/root/reference/Andl.Runtime/TypedValue.cs:447-449); the engine's default
  * `.order()` is JVM/UTF8 binary. This spec
  *   1. enumerates exactly where the two orders diverge on a non-ASCII
  *      fixture (the documented-deltas table), and
  *   2. proves the opt-in `spark.graft.collation=UNICODE` restores
  *      culture-style ordering parity on BOTH the engine (Spark `collate`
  *      sort keys, including the segmented ungrouped-order path) and the
  *      driver-local small-relation sort (ICU collator in sortCompare).
  */
class CollationSpec extends SparkSpec {
  import spark.implicits._

  // mixed case + accents: every class of binary-vs-culture divergence —
  // uppercase-before-all-lowercase, accented-after-all-ASCII, and the
  // accent-weight tie-break (cote < coté < côte in ICU; bytewise coté > côte
  // because 'é' = 0xC3A9 > 'ô' = 0xC3B4 is FALSE: 0xA9 < 0xB4, still
  // divergent vs culture which ranks base letters first)
  private val words = Vector(
    "apple", "Äpfel", "banana", "cote", "coté", "côte", "éclair", "Échelle",
    "zebra", "Zebra")

  /** ICU root-collator order — the .NET CurrentCulture proxy the opt-in
    * targets (CurrentCulture on an invariant/English host ≈ UCA root). */
  private def icuOrder: Vector[String] = {
    val c = com.ibm.icu.text.Collator.getInstance(com.ibm.icu.util.ULocale.ROOT)
    words.sortWith((a, b) => c.compare(a, b) < 0)
  }

  /** Engine order of `words` under an optional collation: relvar-backed
    * (Spark sort keys) via the segmented ord() path. */
  private def engineOrder(collation: Option[String]): Vector[String] = {
    collation match {
      case Some(n) => spark.conf.set("spark.graft.collation", n)
      case None => spark.conf.unset("spark.graft.collation")
    }
    try {
      val i = new AndlInterp(spark, "/tmp")
      i.defineRelvar("T", words.toDF("w"))
      i.run("r := T .order(w) .select{ w, o := ord() }", "collation-engine")
      val rows = i.global.lookup("r") match {
        case Some(RelV(_, rel)) =>
          rel.df.select("w", "o").collect().map(r => (r.getString(0), r.getDouble(1)))
        case Some(LRelV(_, rs)) => rs.map { t =>
          val m = t.fields.toMap
          (m("w").asInstanceOf[TextV].s, m("o").asInstanceOf[NumV].d)
        }.toArray
        case other => fail(s"r is $other")
      }
      rows.sortBy(_._2).map(_._1).toVector
    } finally {
      spark.conf.unset("spark.graft.collation")
      AndlValues.collation = None
    }
  }

  /** Driver-local order: literal relation (LRelV) sorted by attachOrder /
    * sortCompare, observed through the stored-order concat fold. */
  private def driverOrder(collation: Option[String]): Vector[String] = {
    collation match {
      case Some(n) => spark.conf.set("spark.graft.collation", n)
      case None => spark.conf.unset("spark.graft.collation")
    }
    try {
      val i = new AndlInterp(spark, "/tmp")
      val lits = words.map(w => s"{w := '$w'}").mkString(",")
      i.run(s"T := {$lits}\ns := T .order(w) .select{ (fold(&, w & '|')) }",
        "collation-driver")
      val s = i.global.lookup("s").get.asInstanceOf[TextV].s
      s.split('|').toVector.filter(_.nonEmpty)
    } finally {
      spark.conf.unset("spark.graft.collation")
      AndlValues.collation = None
    }
  }

  test("default mode is binary: deltas vs culture order are exactly the documented ones") {
    val binary = engineOrder(None)
    assert(binary === words.sorted, s"default .order is not JVM-binary: $binary")

    val culture = icuOrder
    assert(binary !== culture, "fixture failed to expose any binary/culture delta")

    // the documented-deltas table: per word, (binary rank, culture rank)
    val deltas = words.map(w => (w, binary.indexOf(w), culture.indexOf(w)))
      .filter { case (_, b, c) => b != c }
    val moved = deltas.map(_._1).toSet
    // every divergence class is present…
    assert(moved.contains("Zebra"), "uppercase-before-lowercase delta missing")
    assert(moved.contains("Äpfel"), "accented-after-ASCII delta missing")
    assert(moved.intersect(Set("coté", "côte", "éclair", "Échelle")).nonEmpty,
      "accent-weight delta missing")
    // …and the shape is the known one: binary exiles every LEADING-accent
    // word past all ASCII words (UTF-8 multibyte first unit > 0x7F), while
    // culture files them next to their base letters
    val leadingAccent = Set("Äpfel", "Échelle", "éclair")
    assert(binary.takeRight(3).toSet === leadingAccent,
      s"binary order should end with the leading-accent words: $binary")
    assert(culture.take(2).toSet === Set("apple", "Äpfel"),
      s"culture order should file Äpfel beside apple: $culture")
    info(s"binary : ${binary.mkString(" < ")}")
    info(s"culture: ${culture.mkString(" < ")}")
    info(s"diverging words: ${deltas.map(_._1).mkString(", ")}")
  }

  test("opt-in spark.graft.collation=UNICODE: engine sort keys match culture order") {
    assert(engineOrder(Some("UNICODE")) === icuOrder)
  }

  test("opt-in collation: driver-local small-relation sort agrees with the engine") {
    assert(driverOrder(Some("UNICODE")) === icuOrder)
    assert(driverOrder(None) === words.sorted)
  }

  test("both parity modes compose: reference suites pass with decimal + collation on") {
    val dir = sys.env.getOrElse("ANDL_SUITE_DIR", "/root/reference/Test")
    assume(new java.io.File(s"$dir/SetupSuite.andl").isFile)
    spark.conf.set("spark.graft.decimalNumbers", "true")
    spark.conf.set("spark.graft.collation", "UNICODE")
    try {
      val results = graft.lang.AndlScript.runSuites(spark, dir, Seq(
        "SuiteBasic.andl", "SuiteRelBasic.andl", "SuiteRelDyadic.andl",
        "SuiteRelFold.andl", "SuiteRelOrder.andl", "SuiteRelWhile.andl"))
      val failures = results.filter(_.errors > 0)
      assert(failures.isEmpty,
        failures.map(r => s"${r.file}: ${r.errors} failures\n${r.output}")
          .mkString("\n"))
    } finally {
      spark.conf.unset("spark.graft.decimalNumbers")
      spark.conf.unset("spark.graft.collation")
      AndlValues.decimalNumbers = false
      AndlValues.collation = None
    }
  }

  test("two interpreters with OPPOSITE collation modes coexist, interleaved " +
    "(the per-session symmetry of the decimal-mode test)") {
    val icu = new AndlInterp(spark, "/tmp",
      AndlInterp.Modes(decimalNumbers = false, collation = Some("UNICODE")))
    val bin = new AndlInterp(spark, "/tmp") // conf default: binary
    def orderOf(i: AndlInterp, tag: String): Vector[String] = {
      i.defineRelvar("T", words.toDF("w"))
      i.run("r := T .order(w) .select{ w, o := ord() }", tag)
      i.relvar("r").collect().map(r => (r.getString(0), r.getDouble(1)))
        .sortBy(_._2).map(_._1).toVector
    }
    // interleaved entry points: each session keeps ITS ordering semantics
    val a1 = orderOf(icu, "mix-icu")
    val b1 = orderOf(bin, "mix-bin")
    val a2 = orderOf(icu, "mix-icu2")
    assert(b1 === words.sorted, s"binary session not JVM-binary: $b1")
    assert(a1 === icuOrder, s"ICU session not culture-ordered: $a1")
    assert(a1 === a2)
    assert(a1 !== b1, "fixture exposes no delta — test is vacuous")
  }
}
