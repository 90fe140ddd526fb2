package graft

import org.apache.spark.sql.functions._
import graft.functions.Builtins
import graft.rel.TupleOps

/** Small builtins: schema/seq, conversions incl. the pp golden, binary
  * ops, now/time, and driver-side tuple operations. */
class BuiltinsSpec extends SparkSpec {

  test("schema(r): heading as {Name, Type} relation (Builtin.cs:799-806)") {
    val sch = Builtins.schemaOf(S).df.collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(sch === Set(("S#", "text"), ("SNAME", "text"),
      ("STATUS", "int"), ("CITY", "text")))
  }

  test("seq(n): 0..n-1 relation (Builtin.cs:809-819)") {
    val s = Builtins.seq(spark, 5)
    assert(s.attrs === Seq("N"))
    assert(s.df.collect().map(_.getLong(0)).toSet === Set(0L, 1L, 2L, 3L, 4L))
    assert(Builtins.seq(spark, 0).count() === 0)
  }

  test("conversions: text/format/type (Builtin.cs:759-786)") {
    val row = S.transform(
      "t" -> Builtins.textOf(col("STATUS")),
      "f" -> Builtins.format("%s has status %03d", col("SNAME"), col("STATUS")))
      .where(col("t") === "20" && col("f") === "Smith has status 020").df
    assert(row.count() === 1)
    assert(Builtins.typeNameOf(S, "SNAME") === "text")
    assert(Builtins.typeNameOf(P, "WEIGHT") === "number")
  }

  test("pp(r): golden render (Builtin.cs:769-781)") {
    val got = Builtins.pp(S.where(col("CITY") === "Paris").project("S#", "SNAME"))
    val expect =
      """|| S# | SNAME |
         ||----|-------|
         || S2 | Jones |
         || S3 | Blake |""".stripMargin
    assert(got === expect)
  }

  test("binary: bget/bset/blength (Builtin.cs:883-899)") {
    import spark.implicits._
    val b = graft.rel.Rel.distinct(Seq("AbC").toDF("s"))
      .extend("bin" -> encode(col("s"), "UTF-8"))
    val row = b.extend(
      "len" -> Builtins.blength(col("bin")),
      "b0" -> Builtins.bget(col("bin"), lit(0)),
      "b1" -> Builtins.bget(col("bin"), lit(1)),
      "set0" -> Builtins.bget(Builtins.bset(col("bin"), lit(0), lit(90)), lit(0)),
      "setlen" -> Builtins.blength(Builtins.bset(col("bin"), lit(1), lit(33))))
      .df.collect()(0)
    assert(row.getAs[Int]("len") === 3)
    assert(row.getAs[Int]("b0") === 'A'.toInt)
    assert(row.getAs[Int]("b1") === 'b'.toInt)
    assert(row.getAs[Int]("set0") === 90) // 'Z'
    assert(row.getAs[Int]("setlen") === 3) // length preserved
  }

  test("bset masks v to its low byte like C# cast-to-byte (Builtin.cs:893-899)") {
    import spark.implicits._
    val b = graft.rel.Rel.distinct(Seq("AbC").toDF("s"))
      .extend("bin" -> encode(col("s"), "UTF-8"))
    val row = b.extend(
      "over" -> Builtins.bget(Builtins.bset(col("bin"), lit(0), lit(300)), lit(0)),
      "neg" -> Builtins.bget(Builtins.bset(col("bin"), lit(0), lit(-1)), lit(0)),
      "neg2" -> Builtins.bget(Builtins.bset(col("bin"), lit(0), lit(-2)), lit(0)))
      .df.collect()(0)
    assert(row.getAs[Int]("over") === 300 % 256) // (byte)300 = 44, not 0x12
    assert(row.getAs[Int]("neg") === 255)        // (byte)-1 = 0xFF
    assert(row.getAs[Int]("neg2") === 254)
  }

  test("now()/time(d) (Builtin.cs:968-971,1050-1055)") {
    val t = spark.range(1).select(Builtins.now().cast("long")).collect()(0).getLong(0)
    assert(math.abs(t - System.currentTimeMillis() / 1000) < 300)
    val d = ROQ5.extend("ts" -> Builtins.timeOf(col("A3").cast("date")))
    assert(d.schema("ts").dataType === org.apache.spark.sql.types.TimestampType)
  }

  test("tuple transform and set ops (Builtin.cs:520-528,575-583)") {
    val t1: TupleOps.Tup = Map("A" -> 1, "B" -> "x")
    val t2: TupleOps.Tup = Map("B" -> "y", "C" -> true)
    // transform: project + rename + extend in one expression list
    val tr = TupleOps.transform(t1,
      "A" -> (t => t("A")),
      "B2" -> (t => t("B")),
      "D" -> (t => t("A").asInstanceOf[Int] + 10))
    assert(tr === Map("A" -> 1, "B2" -> "x", "D" -> 11))
    // heading merge with LEFT value priority (DataRow.cs:189-192)
    assert(TupleOps.union(t1, t2) === Map("A" -> 1, "B" -> "x", "C" -> true))
    assert(TupleOps.intersect(t1, t2) === Map("B" -> "x"))
    assert(TupleOps.minus(t1, t2) === Map("A" -> 1))
    assert(TupleOps.symdiff(t1, t2) === Map("A" -> 1, "C" -> true))
    // order-insensitive tuple equality (DataHeading.cs:48-56)
    assert(Map("A" -> 1, "B" -> 2) === Map("B" -> 2, "A" -> 1))
    // round-trip from a Row
    val row = S.take(1, Seq(col("S#"))).df.collect()(0)
    val tup = TupleOps.fromRow(row)
    assert(tup("S#") === "S1" && tup("SNAME") === "Smith")
  }
}
