package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.catalog.{Catalog, FunDef, UdtDef}

/** Mirror of Test/SuiteDefer.andl — deferred (stored) functions with
  * overloads and fold integration, and user-defined types with subtypes. */
class DeferSpec extends SparkSpec {

  test("def f(a:T)=>expr: stored function inlines into queries (SuiteDefer.andl:18-30)") {
    val cat = new Catalog(spark)
    cat.defineFun(FunDef("double_it", Seq("n" -> DoubleType), DoubleType, "n * 2"))
    val out = S.extend("d" -> cat.call("double_it", col("STATUS").cast("double")))
      .project("S#", "d").df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("S1") === 40.0 && out("S2") === 20.0)
  }

  test("overloads resolve by signature (SymbolTable.AddOverload:345-359)") {
    val cat = new Catalog(spark)
    cat.defineFun(FunDef("tag", Seq("t" -> StringType), StringType, "'s:' || t"))
    cat.defineFun(FunDef("tag", Seq("n" -> DoubleType), StringType,
      "'n:' || CAST(CAST(n AS BIGINT) AS STRING)"))
    val byType = cat.fun("tag", Seq(DoubleType))
    val row = S.transform(
      "a" -> cat.fun("tag", Seq(StringType))(col("CITY")),
      "b" -> byType(col("STATUS").cast("double")))
      .where(col("a") === "s:Paris" && col("b") === "n:10").df
    assert(row.count() === 1)
    // arity-based call is ambiguous with two unary overloads
    assertThrows[IllegalArgumentException](cat.call("tag", col("CITY")))
  }

  test("(T,T)→T function is foldable; fold matches reference chain (SuiteRelFold.andl:73-77)") {
    val cat = new Catalog(spark)
    // fcomma: if(a='', b, a & ', ' & b) — the reference's canonical user fold
    cat.defineFun(FunDef("fcomma",
      Seq("a" -> StringType, "b" -> StringType), StringType,
      "CASE WHEN a = '' THEN b ELSE a || ', ' || b END"))
    val rf = cat.fun("fcomma")
    assert(rf.fd.foldable)
    val got = S.aggregate(Nil, "s" -> rf.fold(col("SNAME"), ord = Seq(col("SNAME"))))
      .df.collect()(0).getString(0)
    assert(got === "Adams, Blake, Clark, Jones, Smith")
    // non-(T,T)→T is not foldable
    cat.defineFun(FunDef("lenf", Seq("t" -> StringType), IntegerType, "length(t)"))
    assert(!cat.fun("lenf").fd.foldable)
    assertThrows[IllegalArgumentException](cat.fun("lenf").fold(col("SNAME")))
  }

  test("UDT: constructor, component getter, value semantics (TypedValue.cs:631-709)") {
    val cat = new Catalog(spark)
    val point = UdtDef("point", Seq("x" -> DoubleType, "y" -> DoubleType))
    cat.defineType(point)
    val withP = P.extend("pos" -> point.construct(col("WEIGHT"), lit(1.0)))
    // selector round-trips
    val back = withP.extend("w2" -> point.get(col("pos"), "x"))
      .where(col("w2") =!= col("WEIGHT"))
    assert(back.count() === 0)
    // value semantics: equal components → equal values → project dedups
    assert(withP.project("pos").count() === P.project("WEIGHT").count())
    assertThrows[IllegalArgumentException](point.get(col("pos"), "z"))
  }

  test("subtype: single `super` component (AstFactory.SubType, date pattern)") {
    val cat = new Catalog(spark)
    val dateT = UdtDef.subtype("date", TimestampType)
    cat.defineType(dateT)
    assert(dateT.components === Seq("super" -> TimestampType))
    assert(cat.udt("date").name === "date")
    val r = ROQ5.extend("d" -> dateT.construct(col("A3").cast("timestamp")))
      .extend("back" -> dateT.get(col("d"), "super"))
    assert(r.where(col("back") =!= col("A3").cast("timestamp")).count() === 0)
  }

  test("introspection: andl_operator/andl_member analogues (Builtin.cs:824-838)") {
    val cat = new Catalog(spark)
    cat.defineFun(FunDef("f1", Seq("a" -> DoubleType, "b" -> DoubleType), DoubleType, "a + b"))
    cat.defineType(UdtDef("pt", Seq("x" -> DoubleType, "y" -> DoubleType)))
    val ops = cat.operators.collect().map(r => (r.getString(0), r.getBoolean(4)))
    assert(ops.contains(("f1", true)))
    val mem = cat.members.collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(mem.toSet === Set(("pt", "x", 0), ("pt", "y", 1)))
  }
}
