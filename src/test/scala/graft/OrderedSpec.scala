package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import graft.rel.{Fold, Ordered, OrderedFold, OrderSpec, Rel}

/** Mirror of Test/SuiteRelOrder.andl — ordered concat folds for every
  * asc/desc key combination, running sums, lag/lead/nth with DEFAULT (not
  * null) boundaries, and `%`-grouped variants. */
class OrderedSpec extends SparkSpec {

  private def concatUnder(spec: OrderSpec): String =
    ROQ5.transform("s" -> OrderedFold.concat(col("A1"), spec)).df
      .collect()(0).getString(0)

  test("ordered concat folds, all key combinations (SuiteRelOrder.andl:16-26)") {
    assert(concatUnder(OrderSpec(Nil, Seq(col("A1")))) === "abc-def-g-h-ijkl-")
    assert(concatUnder(OrderSpec(Nil, Seq(col("A1").desc))) === "ijkl-h-g-def-abc-")
    assert(concatUnder(OrderSpec(Nil, Seq(col("A2"), col("A1")))) === "def-g-h-abc-ijkl-")
    assert(concatUnder(OrderSpec(Nil, Seq(col("A2"), col("A1").desc))) === "h-g-def-abc-ijkl-")
    assert(concatUnder(OrderSpec(Nil, Seq(col("A2").desc, col("A1")))) === "ijkl-abc-def-g-h-")
    assert(concatUnder(OrderSpec(Nil, Seq(col("A2").desc, col("A1").desc))) === "ijkl-abc-h-g-def-")
    assert(concatUnder(OrderSpec(Nil, Seq(col("A3"), col("A1")))) === "g-abc-h-def-ijkl-")
    assert(concatUnder(OrderSpec(Nil, Seq(col("A3").desc, col("A1")))) === "ijkl-def-abc-h-g-")
    assert(concatUnder(OrderSpec(Nil, Seq(col("A3"), col("A2")))) === "g-h-abc-def-ijkl-")
    assert(concatUnder(OrderSpec(Nil, Seq(col("A3").desc, col("A2")))) === "ijkl-def-h-abc-g-")
  }

  test("groupBy-path ascending concat fold agrees (Fold.concatFold)") {
    val got = ROQ5.aggregate(Nil, "s" -> Fold.concatFold(Seq(col("A1")), col("A1")))
      .df.collect()(0).getString(0)
    assert(got === "abc-def-g-h-ijkl-")
  }

  private def nSet(spec: OrderSpec, c: org.apache.spark.sql.Column): Set[Int] =
    ROQ5.transform("N" -> c).df.collect().map(_.getInt(0)).toSet

  test("running sum (SuiteRelOrder.andl:32)") {
    val spec = OrderSpec(Nil, Seq(col("A1")))
    assert(nSet(spec, sum(col("A0")).over(spec.running).cast("int")) ===
      Set(1, 3, 6, 10, 15))
  }

  test("lag/lead/nth with type-default boundaries (SuiteRelOrder.andl:35-40)") {
    val spec = OrderSpec(Nil, Seq(col("A1")))
    assert(nSet(spec, Ordered.lagD(col("A0"), 1, IntegerType, spec)) === Set(0, 1, 2, 3, 4))
    assert(nSet(spec, Ordered.lagD(col("A0"), 2, IntegerType, spec)) === Set(0, 1, 2, 3))
    assert(nSet(spec, Ordered.leadD(col("A0"), 1, IntegerType, spec)) === Set(0, 2, 3, 4, 5))
    assert(nSet(spec, Ordered.leadD(col("A0"), 2, IntegerType, spec)) === Set(0, 3, 4, 5))
    assert(nSet(spec, Ordered.nthD(col("A0"), 3, IntegerType, spec)) === Set(4))
  }

  test("%-grouped lag/lead/nth (SuiteRelOrder.andl:43-47)") {
    val spec = OrderSpec(Seq("A2"), Seq(col("A1")))
    assert(nSet(spec, Ordered.lagD(col("A0"), 1, IntegerType, spec)) === Set(0, 2, 3))
    assert(nSet(spec, Ordered.lagD(col("A0"), 2, IntegerType, spec)) === Set(0, 2))
    assert(nSet(spec, Ordered.leadD(col("A0"), 1, IntegerType, spec)) === Set(0, 3, 4))
    assert(nSet(spec, Ordered.leadD(col("A0"), 2, IntegerType, spec)) === Set(0, 4))
    assert(nSet(spec, Ordered.nthD(col("A0"), 1, IntegerType, spec)) === Set(0, 3))
  }

  test("ordered transform group-collapse: subtotals (sample5.andl:7-18, DataTableLocal.cs:616-624)") {
    // S .order(%CITY) .select{CITY, SS := fold(+,STATUS)} → one row per city
    val spec = OrderSpec(Seq("CITY"), Seq(col("SNAME")))
    val sub = Ordered.transformOrdered(S, spec,
      Seq("CITY" -> col("CITY")), Seq(("SS", "+", col("STATUS"))))
    assert(sub.df.collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
      Set(("London", 40L), ("Paris", 40L), ("Athens", 30L)))
    // ungrouped, no non-fold attr → collapses to ONE total row
    val spec2 = OrderSpec(Nil, Seq(col("CITY"), col("SNAME")))
    val tot = Ordered.transformOrdered(S, spec2, Nil, Seq(("SS", "+", col("STATUS"))))
    assert(tot.df.collect().map(_.getLong(0)).toSeq === Seq(110L))
    // ordered concat fold collapses to the full concatenation, which is what
    // lets SuiteRelOrder.andl:17 lift it to a scalar
    val spec3 = OrderSpec(Nil, Seq(col("A1")))
    val cc = Ordered.transformOrdered(ROQ5, spec3, Nil, Seq(("s", "&", col("A1"))))
    assert(cc.df.collect()(0).getString(0) === "abc-def-g-h-ijkl-")
    // distinct non-fold value per row → nothing collapses: running sums
    // survive for every row (SuiteRelOrder.andl:32 cum sum)
    val cum = Ordered.transformOrdered(ROQ5, spec3,
      Seq("A0" -> col("A0")), Seq(("N", "+", col("A0"))))
    assert(cum.df.collect().map(_.getLong(1)).toSet === Set(1L, 3L, 6L, 10L, 15L))
  }

  test("ord/ordg/rank") {
    val spec = OrderSpec(Nil, Seq(col("A1")))
    assert(nSet(spec, Ordered.ord(spec)) === Set(1, 2, 3, 4, 5))
    val gspec = OrderSpec(Seq("A2"), Seq(col("A1")))
    assert(nSet(gspec, Ordered.rank(gspec)) === Set(1, 2, 3))
    // ordg: first-row ordinal under the full (A2, A1) order — sorted rows
    // are (5,def-)(5,g-)(5,h-)(6,abc-)(9,ijkl-), so groups start at 1/4/5;
    // every row of a group shares the group's first ordinal
    val perRow = Ordered.withOrdg(ROQ5.df, gspec, "g")
      .select(col("A0"), col("g").cast("int").as("g"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(perRow === Map(1 -> 4, 2 -> 1, 3 -> 1, 4 -> 1, 5 -> 5))
    // ungrouped ordg: the whole relation is one group → all 1
    assert(Ordered.withOrdg(ROQ5.df, OrderSpec(Nil, Seq(col("A1"))), "g")
      .select(col("g")).collect().map(_.getLong(0)).toSet === Set(1L))
  }

  test("withGlobalOrdinal: dense 1..N, no single-partition window (two-pass prefix-sum)") {
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("k", pmod(col("id") * 37, lit(1000)))
      .repartition(7) // force multiple input partitions
    val got = Ordered.withGlobalOrdinal(df, Seq(col("k")), "n")
    // ordinal is exactly the rank of k in 0..999 (+1, k values are a permutation)
    assert(got.select(col("k"), col("n")).collect()
      .forall(r => r.getLong(1) === r.getLong(0) + 1))
    // plan-level: every Window in the plan has a non-empty partition spec
    val wins = got.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty))
  }
}
