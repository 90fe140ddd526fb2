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

  test("100doors: xor fold over seq, stored-order pp") {
    assume(available)
    val i = new AndlInterp(spark, dir)
    i.noisy = 1
    i.runFile(s"$dir/100doors.andl")
    val open = rel(i, "doors").map(_.fields.toMap)
      .filter(_("open") == BoolV(true))
      .collect { case m => m("N") }.collect { case NumV(n) => n.toInt }.toSet
    assert(open == (1 to 10).map(n => n * n).toSet) // the perfect squares
    // the trailing `.order(N)` renders numerically, not text-sorted
    val lines = i.output.toString.linesIterator.filter(_.startsWith("|")).toVector
    assert(lines.drop(2).take(3).map(_.replaceAll("[| ]", "")) == Vector("1", "4", "9"))
  }

  test("mandelbrot: stored .order drives later grouped concat folds") {
    assume(available)
    val i = new AndlInterp(spark, dir)
    i.runFile(s"$dir/mandelbrot.andl")
    val rows = rel(i, "a").map(_.fields.toMap)
    assert(rows.length == 22) // yaxis -1.0 .. 1.1 step 0.1 (fp accumulation)
    val byCy = rows.map(m => (m("cy").asInstanceOf[NumV].d, m("t").asInstanceOf[TextV].s))
    // every scanline concatenates exactly the 64 xaxis cells, in cx order
    assert(byCy.forall(_._2.length == 64))
    // the fractal shape: sparse at the top scanline, dense at cy≈0
    assert(byCy.minBy(_._1)._2.trim == "....#")
    val mid = byCy.minBy { case (cy, _) => math.abs(cy) }._2
    assert(mid.contains("#######################"), s"cy~0 line wrong: '$mid'")
  }

  test("sudoku: constraint propagation via row-independent do-block while") {
    assume(available)
    val i = new AndlInterp(spark, dir)
    i.noisy = 0
    i.runFile(s"$dir/sudoku.andl")
    val knowns = rel(i, "knowns").toSet
    val solution = rel(i, "solution").toSet
    assert(knowns.size == 30)
    // one full propagation round over static relvars — exactly the
    // reference's Recurse semantics (DataTableLocal.cs:631-646); the
    // script itself notes "after this need to guess"
    assert(solution.size == 46, s"got ${solution.size}")
    assert(knowns.subsetOf(solution))
  }

  test("sample2: relation literals, builtins, basic operations") {
    assume(available)
    val i = fresh()
    i.noisy = 1
    i.runFile(s"$dir/sample2.andl")
    val out = i.output.toString
    assert(out.nonEmpty)
    // r1: three-tuple literal relation survives round-trips
    val r1 = rel(i, "r1").map(_.fields.toMap)
    assert(r1.map(_("name")).collect { case TextV(s) => s }.toSet ==
      Set("Smith", "Jones", "Frankenstein"))
  }

  test("sample6: date subtype functions (deterministic slice)") {
    assume(available)
    val i = fresh()
    i.noisy = 1
    i.runFile(s"$dir/sample6.andl")
    val out = i.output.toString
    assert(out.contains("31/01/2015"))
    assert(out.contains("Year:2015 month:1 day:31 dow:7"))
  }

  test("family_tree: recursive transitive-closure function over UDT arg") {
    assume(available)
    val i = new AndlInterp(spark, dir)
    i.noisy = 1
    i.runFile(s"$dir/family_tree.andl")
    val out = i.output.toString
    // Chess reaches Karl through Charly and Carl (male line, depth 3)
    assert(out.contains("Chess"))
    assert(out.contains("Karl"))
    assert(out.contains("male ancestor"))
    assert(out.contains("female ancestor"))
  }

  test("test.andl: the reference's scratch script") {
    assume(available)
    val i = new AndlInterp(spark, dir)
    i.noisy = 1
    i.runFile(s"$dir/test.andl")
    val out = i.output.toString
    assert(out.contains("Hello world!"))
    assert(out.contains("12")) // v1.length
  }
}
