package graft

import org.apache.spark.sql.functions._
import graft.functions.Scalar
import graft.rel.Rel

/** Scalar library semantics vs the reference (Builtin.cs:900-975). */
class ScalarSpec extends SparkSpec {

  private def eval1(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c).collect()(0).get(0)

  test("left: pad or truncate to exact length (Builtin.cs:918-925)") {
    assert(eval1(Scalar.left(lit("hello"), lit(3))) === "hel")
    assert(eval1(Scalar.left(lit("hi"), lit(5))) === "hi   ")
    assert(eval1(Scalar.left(lit("hi"), lit(-1))) === "")
  }

  test("right: pad left or keep rightmost (Builtin.cs:928-934)") {
    assert(eval1(Scalar.right(lit("hello"), lit(3))) === "llo")
    assert(eval1(Scalar.right(lit("hi"), lit(5))) === "   hi")
  }

  test("fill: repeat to exact length (Builtin.cs:937-944)") {
    assert(eval1(Scalar.fill(lit("ab"), lit(5))) === "ababa")
    assert(eval1(Scalar.fill(lit("xyz"), lit(2))) === "xy")
  }

  test("before/after first occurrence (Builtin.cs:947-956)") {
    assert(eval1(Scalar.before(lit("a.b.c"), lit("."))) === "a")
    assert(eval1(Scalar.after(lit("a.b.c"), lit("."))) === "b.c")
    assert(eval1(Scalar.before(lit("abc"), lit("."))) === "abc") // not found → whole
    assert(eval1(Scalar.after(lit("abc"), lit("."))) === "")     // not found → empty
  }

  test("cat converts to text (Builtin.cs:907-909)") {
    assert(eval1(Scalar.cat(lit(12), lit("x"))) === "12x")
  }

  test("div/mod truncate toward zero (C# semantics)") {
    assert(eval1(Scalar.divTrunc(lit(7), lit(2))) === 3L)
    assert(eval1(Scalar.divTrunc(lit(-7), lit(2))) === -3L)
    assert(eval1(Scalar.modTrunc(lit(-7), lit(2)).cast("long")) === -1L)
    // exact past 2^53: the double formulation this replaced loses ulps here
    val big = (1L << 53) + 3L
    assert(eval1(Scalar.divTrunc(lit(big), lit(2))) === big / 2)
    assert(eval1(Scalar.divTrunc(lit(-big), lit(3))) === -big / 3)
    assert(eval1(Scalar.divTrunc(lit(Long.MaxValue - 1), lit(7))) === (Long.MaxValue - 1) / 7)
  }

  test("iif lazy branches") {
    assert(eval1(Scalar.iif(lit(true), lit("a"), lit("b"))) === "a")
  }

  test("no-NULL discipline: defaults by type (DataType.cs:152-155)") {
    import org.apache.spark.sql.types._
    assert(Rel.defaultValue(IntegerType) === 0)
    assert(Rel.defaultValue(StringType) === "")
    assert(Rel.defaultValue(BooleanType) === false)
  }
}
