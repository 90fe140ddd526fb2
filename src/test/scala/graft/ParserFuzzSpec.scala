package graft

import graft.lang.AndlParser

/** Parser robustness fuzz: the front end must reject malformed scripts
  * with a controlled error (`sys.error` → RuntimeException), never a
  * StackOverflowError, infinite loop, or silent partial parse that
  * corrupts later statements. Deterministic mutations of a valid script
  * plus bounded random garbage — failures reproduce exactly from the
  * fixed seed. */
class ParserFuzzSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val valid =
    """var r := {{ a := 1, b := 'x' }, { a := 2, b := 'y' }}
      |def f(n:number) => n * 2
      |r .where(a > 1) .select{ a, c := f(a) }
      |r .order(a) .select{ a, t := fold(&, b) }
      |""".stripMargin

  private def parses(src: String): Either[Throwable, Int] =
    try Right(AndlParser.parse(src, "fuzz.andl").length)
    catch { case t: Throwable => Left(t) }

  private def clean(t: Throwable): Boolean =
    t.isInstanceOf[RuntimeException] || t.isInstanceOf[IllegalArgumentException]

  test("truncations of a valid script error cleanly or parse") {
    (1 until valid.length by 3).foreach { cut =>
      parses(valid.take(cut)) match {
        case Right(_) => ()
        case Left(t) => assert(clean(t),
          s"truncation at $cut raised ${t.getClass}: ${t.getMessage}")
      }
    }
  }

  test("random splices and garbage error cleanly, never hang or overflow") {
    val rnd = new scala.util.Random(42)
    val junk = Array("{", "}", "(", ")", ":=", ".where", "fold(", "'", "123",
      "def", "var", "=>", ",,", "..", "&&&", " ", "\u20ac", "%%")
    (0 until 60).foreach { i =>
      val src =
        if (i % 3 == 0) Seq.fill(1 + rnd.nextInt(40))(junk(rnd.nextInt(junk.length))).mkString(" ")
        else {
          val pos = rnd.nextInt(valid.length)
          valid.take(pos) + junk(rnd.nextInt(junk.length)) + valid.drop(pos)
        }
      parses(src) match {
        case Right(_) => ()
        case Left(t) => assert(clean(t),
          s"case $i raised ${t.getClass} for:\n$src")
      }
    }
  }

  test("named dyadic ops bind before a parenthesized right operand") {
    // the reference's ordinary dyadic form `S minus (expr)` — a round-3
    // carve-out mis-parsed `minus (` as a (nonexistent) function call
    Seq("minus", "rminus", "union", "intersect", "symdiff", "join").foreach { op =>
      val stmts = AndlParser.parse(
        s"a := {{k := 1}} $op ({{k := 2}} .where(k > 1))", "dyadic.andl")
      assert(stmts.length === 1, s"$op with parenthesized operand must parse")
    }
  }

  test("moderate expression nesting parses without stack overflow") {
    val deep = "var x := " + ("(" * 100) + "1" + (")" * 100) + "\n"
    parses(deep) match {
      case Right(n) => assert(n >= 1)
      case Left(t) => assert(clean(t), s"deep nesting raised ${t.getClass}")
    }
  }
}

/** Interpreter-level robustness: semantically-broken (but parseable)
  * scalar scripts must raise controlled errors, never corrupt interpreter
  * state for the NEXT script. Scalar-only bodies keep this Spark-cheap. */
class InterpFuzzSpec extends SparkSpec {

  private def run(src: String): Either[Throwable, String] = {
    val interp = new graft.lang.AndlInterp(spark, "/tmp")
    try { interp.run(src, "fuzz.andl"); Right(interp.output.toString) }
    catch { case t: Throwable => Left(t) }
  }

  private val broken = Seq(
    "x := y + 1",                       // unknown variable
    "def f(n:number) => f(n)\nf(1)",    // unbounded recursion
    "var a := 1\na := 'text'",          // type flip on assignment
    "def g(n:number) => n\ng(1, 2)",    // arity mismatch
    "var r := {{ a := 1 }}\nr .where(b = 1)", // unknown attribute
    "1 / 0",                            // division by zero
    "fold(+, 'x')"                      // fold outside aggregation scope
  )

  test("pipeline builtins: engine tier matches known values; driver tier mirrors") {
    import spark.implicits._
    val interp = new graft.lang.AndlInterp(spark, "/tmp")
    interp.defineRelvar("d", Seq("alpha  beta gamma").toDF("text"))
    interp.run(
      "result := d .{ ntok := tokens(text), fp := fingerprint(text), r := deflate(text) }",
      "t.andl")
    val row = interp.relvar("result").head
    assert(row.getDouble(row.fieldIndex("ntok")) === 3.0)
    val wantFp = java.security.MessageDigest.getInstance("MD5")
      .digest("alpha beta gamma".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(row.getString(row.fieldIndex("fp")) === wantFp)
    assert(row.getDouble(row.fieldIndex("r")) > 0.0)
    // driver tier: top-level scalar calls give the same answers
    val i2 = new graft.lang.AndlInterp(spark, "/tmp")
    i2.noisy = 1
    i2.run("tokens('a b  c')", "t.andl")
    assert(i2.output.toString.trim === "3", i2.output.toString)
    val i3 = new graft.lang.AndlInterp(spark, "/tmp")
    i3.noisy = 1
    i3.run("fingerprint(' Alpha  beta GAMMA ')", "t.andl")
    assert(i3.output.toString.trim === wantFp, i3.output.toString)
    // normalize: both tiers compose decomposed accents to the same string
    val interp4 = new graft.lang.AndlInterp(spark, "/tmp")
    interp4.defineRelvar("d", Seq("Cafe\u0301  DU   Marche\u0301").toDF("text"))
    interp4.run("result := d .{ n := normalize(text) }", "t.andl")
    val want = "caf\u00e9 du march\u00e9"
    assert(interp4.relvar("result").head.getString(0) === want)
    val i5 = new graft.lang.AndlInterp(spark, "/tmp")
    i5.noisy = 1
    i5.run("normalize('Cafe\u0301  DU   Marche\u0301')", "t.andl")
    assert(i5.output.toString.trim === want, i5.output.toString)
  }

  test("round-11 builtins: engine tier and driver tier agree exactly") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox is running to the old mill and it was fine",
      "der schnelle fuchs ist nicht mit dem hund",
      "mail a@b.co or see https://x.io/p and call 555-123-4567 from 10.0.0.1",
      "<p>one &amp; two</p><script>var a = 1 < 2;</script><div>tail</div>",
      "")
    // engine tier: builtins over a relvar
    val interp = new graft.lang.AndlInterp(spark, "/tmp")
    interp.defineRelvar("d",
      texts.zipWithIndex.map { case (t, i) => (i.toDouble, t) }.toDF("i", "text"))
    interp.run("result := d .{ i, q := quality(text), lg := langid(text), " +
      "sc := scrub(text), ht := htmltext(text) }", "t.andl")
    val engine = interp.relvar("result").collect()
      .map(r => r.getDouble(r.fieldIndex("i")).toInt ->
        (r.getDouble(r.fieldIndex("q")), r.getString(r.fieldIndex("lg")),
          r.getString(r.fieldIndex("sc")), r.getString(r.fieldIndex("ht"))))
      .toMap
    // driver tier: the same builtins as top-level scalar calls
    texts.zipWithIndex.foreach { case (t, i) =>
      def scalar(call: String): String = {
        val x = new graft.lang.AndlInterp(spark, "/tmp")
        x.noisy = 1
        x.run(call, "t.andl")
        x.output.toString.trim
      }
      val lit = "'" + t.replace("'", "''") + "'"
      assert(scalar(s"langid($lit)") === engine(i)._2, s"langid tier split on: $t")
      assert(scalar(s"scrub($lit)") === engine(i)._3, s"scrub tier split on: $t")
      def ws(s: String): String = s.replaceAll("\\s+", " ").trim
      assert(ws(scalar(s"htmltext($lit)")) === ws(engine(i)._4),
        s"htmltext tier split on: $t")
      val dq = scalar(s"quality($lit)").toDouble
      assert(math.abs(dq - engine(i)._1) < 1e-12, s"quality tier split on: $t")
    }
    // spot-check the engine answers themselves
    assert(engine(0)._2 === "en" && engine(1)._2 === "de")
    assert(engine(2)._3.contains("<EMAIL>") && engine(2)._3.contains("<URL>")
      && engine(2)._3.contains("<PHONE>") && engine(2)._3.contains("<IP>"))
    assert(engine(3)._4 === "one & two\ntail")
    assert(engine(4)._1 === 0.333333) // empty text: punct score 1, rest 0
  }

  test("broken scripts raise controlled errors and leave the next run clean") {
    broken.foreach { src =>
      run(src) match {
        case Left(t) =>
          assert(t.isInstanceOf[RuntimeException]
              || t.isInstanceOf[IllegalArgumentException]
              || t.isInstanceOf[StackOverflowError], // bounded: per-call stack, caught here
            s"${t.getClass} from:\n$src")
        case Right(_) => () // engines may define some of these (e.g. 1/0)
      }
      // interpreter state is per-instance: a fresh run still works
      assert(run("var ok := 41\nok + 1") match {
        case Right(_) => true
        case Left(t) => false
      }, s"follow-up run broken after:\n$src")
    }
  }
}
