package graft

import graft.lang.AndlScript

/** Script parity harness: execute the reference's OWN .andl test suites
  * through the Andl front end (lexer → parser → interpreter → Spark
  * engine) and require every `test_true` to pass — the direct mirror of
  * the reference's runsuite.bat correctness contract
  * (/root/reference/Test/run.bat, SetupSuite.andl's test_true harness).
  *
  * Expected totals are the count of uncommented test_true( lines in each
  * file, so a suite that silently skips assertions fails the spec.
  * Skips gracefully when the reference checkout is absent. */
class ScriptSuiteSpec extends SparkSpec {

  private val dir = sys.env.getOrElse("ANDL_SUITE_DIR", "/root/reference/Test")
  private val available = new java.io.File(s"$dir/SetupSuite.andl").isFile

  private val suites = Seq(
    "SuiteBasic.andl", "SuiteDefer.andl", "SuiteRelBasic.andl",
    "SuiteRelDyadic.andl", "SuiteRelFold.andl", "SuiteRelNest.andl",
    "SuiteRelOrder.andl", "SuiteRelWhile.andl",
    "SuiteUpdateCat1.andl", "SuiteUpdateCat2.andl")

  private def expectedTests(file: String): Long = {
    val src = scala.io.Source.fromFile(s"$dir/$file")("UTF-8")
    try src.getLines().count(l => l.trim.takeWhile(_ != '/').contains("test_true("))
    finally src.close()
  }

  test("reference .andl suites: every test_true passes") {
    assume(available, s"reference suites not found under $dir")
    val results = AndlScript.runSuites(spark, dir, suites)
    val failures = results.filter(_.errors > 0)
    assert(failures.isEmpty,
      failures.map(r => s"${r.file}: ${r.errors} failures\n${r.output}").mkString("\n"))
    // totals must match the files' own test_true counts (nothing skipped)
    results.filter(_.file != "SetupSuite.andl").foreach { r =>
      assert(r.tests == expectedTests(r.file),
        s"${r.file}: ran ${r.tests} tests, file declares ${expectedTests(r.file)}")
    }
    val total = results.map(_.tests).sum
    assert(total >= 400, s"expected the full 424-assertion corpus, got $total")
  }

  test("catalog introspection tables (andl_variable/operator/member)") {
    val i = new graft.lang.AndlInterp(spark, dir)
    i.run(
      """v1 := 42
        |type ut(C1:0, C2:'')
        |def f(a:0, b:'') => a & b
        |vars := andl_variable()
        |ops := andl_operator()
        |mems := andl_member()
        |okv := vars .where(Name = 'v1') .select{ (Type) }
        |oko := ops .where(Name = 'f') .select{ (Arguments) }
        |okm := mems .where(MemberOf = 'ut') .count""".stripMargin, "introspect")
    import graft.lang.AndlValues._
    assert(i.global.lookup("okv").contains(TextV("number")))
    assert(i.global.lookup("oko").contains(TextV("a,b")))
    assert(i.global.lookup("okm").contains(NumV(2)))
  }

  test("sample1.andl executes headless") {
    assume(new java.io.File(s"$dir/../Sample/sample1.andl").isFile)
    val interp = new graft.lang.AndlInterp(spark, dir)
    interp.runFile(s"$dir/../Sample/sample1.andl")
    // #noisy 1 → free expressions echo; spot-check a few rendered values
    val out = interp.output.toString
    assert(out.contains("Hello world!"))
    assert(out.contains("2432902008176640000")) // fact(20), driver recursion
    assert(out.contains("n:42 t:Hello World! d:31/01/2015")) // UDT components
  }
}
