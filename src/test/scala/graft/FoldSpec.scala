package graft

import org.apache.spark.sql.functions._
import graft.rel.{Fold, Rel}

/** Mirror of Test/SuiteRelFold.andl — fold goldens over S:
  * fold(+,STATUS)=110, fold(max,STATUS)=30, fold_ave(STATUS)=22. */
class FoldSpec extends SparkSpec {

  test("scalar folds over S (SuiteRelFold.andl:13-21,70-71)") {
    val row = S.aggregate(Nil,
      "total" -> Fold.fold("+", col("STATUS")),
      "mx" -> Fold.fold("max", col("STATUS")),
      "mn" -> Fold.fold("min", col("STATUS")),
      "n" -> Fold.foldCount(),
      "ave" -> Fold.foldAvg(col("STATUS")).cast("int")).df.collect()(0)
    assert(row.getLong(0) === 110L)
    assert(row.getInt(1) === 30)
    assert(row.getInt(2) === 10)
    assert(row.getLong(3) === 5L)
    assert(row.getInt(4) === 22)
  }

  test("grouped fold: implicit group keys = non-fold attrs (DataTableSql.cs:491-497)") {
    val byCity = S.aggregate(Seq("CITY"), "total" -> Fold.fold("+", col("STATUS")))
    val m = byCity.df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("London" -> 40L, "Paris" -> 40L, "Athens" -> 30L))
  }

  test("bool folds and xor") {
    val r = Rel.distinct(spark.createDataFrame(Seq(
      ("a", true), ("b", true), ("c", false))).toDF("k", "v"))
    val row = r.aggregate(Nil,
      "all_v" -> Fold.fold("and", col("v")),
      "any_v" -> Fold.fold("or", col("v")),
      "xor_v" -> Fold.fold("xor", col("v"))).df.collect()(0)
    assert(row.getBoolean(0) === false)
    assert(row.getBoolean(1) === true)
    assert(row.getBoolean(2) === false) // two trues
  }

  test("product fold") {
    val r = Rel.distinct(spark.createDataFrame(Seq((1, 2.0), (2, 3.0), (3, 4.0)))
      .toDF("k", "v"))
    val row = r.aggregate(Nil, "p" -> Fold.fold("*", col("v"))).df.collect()(0)
    assert(row.getDouble(0) === 24.0)
  }

  test("hot group: product fold is O(1)-buffered; sequential folds fail loud past the cap") {
    // one key owning 1M rows — the degenerate-group shape that used to OOM
    // a collect_list buffer. ProductAgg streams it in constant memory.
    val hot = spark.range(0, 1000000).toDF("id")
      .withColumn("k", lit(1)).withColumn("v", lit(1.0))
    val p = hot.groupBy("k").agg(Fold.product(col("v")).as("p")).collect()(0)
    assert(p.getDouble(1) === 1.0)
    // plan: no collect_list buffer anywhere in the product aggregation
    val plan = hot.groupBy("k").agg(Fold.product(col("v")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list"), s"product still buffers the group:\n$plan")
    assert(plan.contains("graft_product"), s"native product agg missing:\n$plan")
    // inherently sequential concat on the same hot group must fail LOUD
    // with the knob name once past the cap, not OOM silently
    spark.conf.set("spark.graft.maxFoldGroupRows", "1000")
    try {
      val ex = intercept[Exception] {
        hot.groupBy("k")
          .agg(Fold.concatFold(Seq(col("id")), col("v").cast("string")).as("s"))
          .collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(ex).exists(_.contains("maxFoldGroupRows")),
        s"guard message missing: ${msgs(ex).mkString(" | ")}")
    } finally spark.conf.unset("spark.graft.maxFoldGroupRows")
    // and under the cap the same fold still answers exactly
    val small = spark.range(0, 5).toDF("id").withColumn("k", lit(1))
    val s = small.groupBy("k")
      .agg(Fold.concatFold(Seq(col("id")), col("id").cast("string")).as("s"))
      .collect()(0).getString(1)
    assert(s === "01234")
  }

  test("user-function fold via Aggregator (SuiteRelFold.andl:73-77, §2.9)") {
    implicit val de: org.apache.spark.sql.Encoder[Double] =
      org.apache.spark.sql.Encoders.scalaDouble
    val gcd = udaf(Fold.userFold[Double](0.0,
      (a, b) => { var x = math.abs(a).toLong; var y = math.abs(b).toLong
        while (y != 0) { val t = x % y; x = y; y = t }; x.toDouble }), de)
    val r = Rel.distinct(spark.createDataFrame(Seq((1, 12.0), (2, 18.0), (3, 30.0)))
      .toDF("k", "v"))
    val row = r.aggregate(Nil, "g" -> gcd(col("v"))).df.collect()(0)
    assert(row.getDouble(0) === 6.0)
  }

  test("fold(union, rva) — set union across groups (Sample/sample3.andl:30-33)") {
    val nested = graft.rel.Nest.nest(SP.project("S#", "P#"), "parts", Seq("P#"))
    val allParts = nested.aggregate(Nil, "u" -> Fold.foldUnionRva(col("parts")))
    val arr = allParts.df.collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(arr.map(_.getString(0)).toSet === Set("P1", "P2", "P3", "P4", "P5", "P6"))
  }

  test("empty global fold yields the seed, never NULL (SymbolTable.GetSeed)") {
    import org.apache.spark.sql.types.IntegerType
    val empty = S.where(lit(false))
    val row = empty.aggregate(Nil,
      "total" -> Fold.fold("+", col("STATUS")),
      "mx" -> Fold.fold("max", col("STATUS"), IntegerType),
      "mn" -> Fold.fold("min", col("STATUS"), IntegerType),
      "n" -> Fold.foldCount()).df.collect()(0)
    assert(!row.isNullAt(0) && row.getLong(0) === 0L)
    assert(!row.isNullAt(1) && row.getInt(1) === 0)
    assert(!row.isNullAt(2) && row.getInt(2) === 0)
    assert(row.getLong(3) === 0L)
    val b = empty.aggregate(Nil,
      "all_v" -> Fold.fold("and", col("STATUS") > 0),
      "any_v" -> Fold.fold("or", col("STATUS") > 0),
      "xor_v" -> Fold.fold("xor", col("STATUS") > 0)).df.collect()(0)
    assert(b.getBoolean(0) === true && b.getBoolean(1) === false && b.getBoolean(2) === false)
  }

  test("empty-relation algebra: DEE and DUM (SuiteBasic.andl:40-49)") {
    assert(Rel.dee(spark).count() === 1)
    assert(Rel.dum(spark).count() === 0)
    assert(Rel.dee(spark).degree === 0)
  }
}
