package graft

import graft.lang.AndlInterp
import graft.lang.AndlValues._

/** Execute the reference's sample programs (the Sample directory) through
  * the language front end and assert observable results — the broad-surface
  * complement to ScriptSuiteSpec's assertion suites. Skips gracefully when
  * the reference checkout is absent. */
class SampleScriptSpec extends SparkSpec {

  private val dir = {
    val d = sys.env.getOrElse("ANDL_SUITE_DIR", "/root/reference/Test")
    new java.io.File(s"$d/../Sample").getCanonicalPath
  }
  private val available = new java.io.File(s"$dir/setup.andl").isFile

  private def fresh(): AndlInterp = {
    val i = new AndlInterp(spark, dir)
    i.runFile(s"$dir/setup.andl") // S/P/SP/J/SPJ catalog
    i
  }

  private def rel(i: AndlInterp, name: String): Vector[TupV] = {
    i.global.lookup(name) match {
      case Some(LRelV(_, rows)) => rows
      case Some(RelV(h, _)) =>
        i.relvar(name).select(h.map(f => org.apache.spark.sql.functions.col(f._1)): _*)
          .collect().toVector.map(r => rowToValue(r, h))
      case other => fail(s"$name is $other")
    }
  }

  test("sample3: image relation, nested folds, updates") {
    assume(available)
    val i = fresh()
    i.runFile(s"$dir/sample3.andl")
    // after up1/up2/up3: S9 inserted, S3 deleted, S4's STATUS set to -10
    val s = rel(i, "S").map(_.fields.toMap)
    val ids = s.map(_("S#")).collect { case TextV(x) => x }.toSet
    assert(ids == Set("S1", "S2", "S4", "S5", "S9"))
    assert(s.find(_("S#") == TextV("S4")).get("STATUS") == NumV(-10))
    assert(s.find(_("S#") == TextV("S9")).get("SNAME") == TextV("Moriarty"))
  }

  test("sample4: transitive closure + per-type demo") {
    assume(available)
    val i = fresh()
    i.runFile(s"$dir/sample4.andl")
    // tclosedemo is a defer: referencing it computes the closure of MM
    val closure = i.run("tc_result := tclosedemo", "probe")
    val rows = rel(i, "tc_result")
    assert(rows.length == 11) // 6 MM edges close to 11 reachable pairs
    val pairs = rows.map { t =>
      val m = t.fields.toMap
      (m("MAJOR_P#"), m("MINOR_P#"))
    }
    assert(pairs.contains((TextV("P1"), TextV("P6")))) // depth-3 path P1→P2→P4→P6
  }

  test("SPPsample1: correlated relational queries (Date's supplier corpus)") {
    assume(available)
    val i = fresh()
    // Q4: suppliers supplying ALL parts — division via per-tuple compare
    i.run("q4 := S .where( ({{*}} join SP) .select{ P# } = P .select{ P# } )  .select{ SNAME }",
      "probe")
    val q4 = rel(i, "q4").map(t => t.fields.toMap.apply("SNAME"))
    assert(q4 == Vector(TextV("Smith"))) // only S1 supplies P1..P6
    // Q1 via set membership (correlated sub)
    i.run("q1 := S .where({{ S# }} sub SP .where(P# = 'P2') .select{ S# }) .select{ SNAME }",
      "probe")
    val q1 = rel(i, "q1").map(t => t.fields.toMap.apply("SNAME")).collect { case TextV(x) => x }.toSet
    assert(q1 == Set("Smith", "Jones", "Blake", "Clark"))
  }

  test("recursive.andl: org chart closure through .while compose") {
    assume(available)
    val i = fresh()
    i.runFile(s"$dir/recursive.andl")
    val org = rel(i, "org")
    // Alice's whole reporting chain, with levels
    assert(org.exists(t => t.fields.toMap.get("level").contains(NumV(0))))
    assert(org.length > 1)
  }

  test("workbench catalog + workbench.andl (update-bodied functions, regex where)") {
    assume(available)
    val i = new AndlInterp(spark, dir)
    i.runFile(s"$dir/setup-workbench.andl")
    i.noisy = 1
    i.runFile(s"$dir/workbench.andl")
    val out = i.output.toString
    assert(out.contains("610")) // fib(15) through the catalog function
    assert(out.contains("Adams")) // suppliersbyname('a') regex match
    // addsuppliers is an update-bodied function: call it, S grows
    i.run("addsuppliers(VR)", "probe")
    val ids = rel(i, "S").map(t => t.fields.toMap.apply("S#"))
      .collect { case TextV(x) => x }.toSet
    assert(ids.contains("S99"))
  }

  test("99bottles: ordered fold lyric generation") {
    assume(available)
    val i = fresh()
    i.noisy = 0
    i.runFile(s"$dir/99bottles.andl")
    val out = i.output.toString
    assert(out.contains("99 bottles of beer on the wall, 99 bottles of beer."))
    assert(out.linesIterator.size > 150, s"song too short:\n${out.take(500)}")
  }
}
