package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import graft.rel.{Fold, Ordered, OrderSpec, Rel, Segmented}

/** Mirror of Test/SuiteRelOrder.andl — ordered concat folds for every
  * asc/desc key combination, running sums, lag/lead/nth with DEFAULT (not
  * null) boundaries, and `%`-grouped variants. Ungrouped specs exercise the
  * SEGMENTED lowering (graft.rel.Segmented — global ordinal + partitioned
  * windows + prefix carry), the same path the language front end lowers to;
  * grouped specs exercise the plain partitioned-window path. */
class OrderedSpec extends SparkSpec {

  /** Ungrouped ordered concat collapsing to one total row — through
    * transformOrdered, which routes ungrouped specs via Segmented. */
  private def concatUnder(spec: OrderSpec): String =
    Ordered.transformOrdered(ROQ5, spec, Nil, Seq(("s", "&", col("A1")))).df
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

  /** Evaluate one segmented column over ROQ5 under `sort`. */
  private def segSet(sort: Seq[Column])(f: Segmented => Column): Set[Int] = {
    val (prep, seg) = Segmented.prepare(ROQ5.df, sort)
    val c = f(seg)
    seg.materialize(prep).select(c.cast("int").as("N"))
      .collect().map(_.getInt(0)).toSet
  }

  private def nSet(spec: OrderSpec, c: Column): Set[Int] =
    ROQ5.transform("N" -> c).df.collect().map(_.getInt(0)).toSet

  test("running sum (SuiteRelOrder.andl:32)") {
    assert(segSet(Seq(col("A1")))(_.runningFold("+", col("A0"))) ===
      Set(1, 3, 6, 10, 15))
  }

  test("lag/lead/nth with type-default boundaries (SuiteRelOrder.andl:35-40)") {
    val s = Seq(col("A1"))
    assert(segSet(s)(_.lagD(col("A0"), 1, IntegerType)) === Set(0, 1, 2, 3, 4))
    assert(segSet(s)(_.lagD(col("A0"), 2, IntegerType)) === Set(0, 1, 2, 3))
    assert(segSet(s)(_.leadD(col("A0"), 1, IntegerType)) === Set(0, 2, 3, 4, 5))
    assert(segSet(s)(_.leadD(col("A0"), 2, IntegerType)) === Set(0, 3, 4, 5))
    assert(segSet(s)(_.nthD(col("A0"), 3, IntegerType)) === Set(4))
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
    // ungrouped, no non-fold attr → collapses to ONE total row (segmented)
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
    assert(segSet(Seq(col("A1")))(_.ord) === Set(1, 2, 3, 4, 5))
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

  test("segmented running folds and offsets are exact across partition boundaries") {
    // 1,000 shuffled rows over many physical partitions: prefix carries and
    // ordinal self-joins must stitch partition boundaries exactly
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("k", pmod(col("id") * 37, lit(1000)))
      .repartition(7)
    val (prep, seg) = Segmented.prepare(df, Seq(col("k")))
    val run = seg.runningFold("+", col("k"))
    val mx = seg.runningFold("max", col("k"))
    val lag1 = seg.lagD(col("k"), 1, org.apache.spark.sql.types.LongType)
    val lead3 = seg.leadD(col("k"), 3, org.apache.spark.sql.types.LongType)
    val got = seg.materialize(prep)
      .select(col("k"), run.as("run"), mx.as("mx"), lag1.as("lag1"), lead3.as("lead3"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    got.foreach { case (k, runV, mxV, lag1V, lead3V) =>
      assert(runV === k * (k + 1) / 2, s"running sum at k=$k")
      assert(mxV === k, s"running max at k=$k")
      assert(lag1V === (if (k == 0) 0L else k - 1), s"lag1 at k=$k")
      assert(lead3V === (if (k >= 997) 0L else k + 3), s"lead3 at k=$k")
    }
    // plan contract: no unpartitioned window anywhere in the segmented plan
    val wins = seg.materialize(prep).select(run, lag1).queryExecution.optimizedPlan
      .collect { case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(wins.forall(_.partitionSpec.nonEmpty), "single-partition window found")
  }

  test("segmented generic (non-decomposable) fold matches sequential semantics, size-guarded") {
    // fold(/, …) must round per division step — runningGeneric path
    val (prep, seg) = Segmented.prepare(ROQ5.df, Seq(col("A1")))
    val c = seg.wholeGeneric(col("A0").cast("double"), lit(1.0), _ / _)
    val got = seg.materialize(prep).select(c).collect()(0).getDouble(0)
    assert(got === 1.0 / 1 / 2 / 3 / 4 / 5)
  }

  test("ungrouped OrderSpec refuses to build a single-partition window") {
    val ex = intercept[IllegalArgumentException](OrderSpec(Nil, Seq(col("k"))).window)
    assert(ex.getMessage.contains("Segmented"),
      "refusal must point the caller at the scale-safe lowering")
    // grouped specs still build the partitioned window
    OrderSpec(Seq("g"), Seq(col("k"))).window
  }

  test("segmented running * uses O(1) ProductAgg state and carries across partitions") {
    val df = spark.range(1, 21).toDF("k").withColumn("v", lit(2.0)).repartition(5)
    val (prep, seg) = Segmented.prepare(df, Seq(col("k")))
    val run = seg.runningFold("*", col("v"))
    val got = seg.materialize(prep).select(col("k"), run.as("p"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    got.foreach { case (k, p) => assert(p === math.pow(2.0, k.toDouble), s"2^$k at k=$k") }
    // plan contract: the running frame aggregates with graft_product, not a
    // collect_list prefix array (the O(n²) shape this replaced)
    val plan = seg.materialize(prep).select(run).queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_product"), "running * should window ProductAgg")
    assert(!plan.toLowerCase.contains("collect_list"), "running * must not buffer prefix lists")
  }

  test("segmented running & is size-guarded (fails loud, never silent driver OOM)") {
    spark.conf.set("spark.graft.maxFoldGroupRows", "100")
    try {
      val df = spark.range(0, 500).toDF("k").withColumn("s", lit("x")).repartition(4)
      val (prep, seg) = Segmented.prepare(df, Seq(col("k")))
      val c = seg.runningFold("&", col("s"))
      val ex = intercept[IllegalArgumentException] {
        seg.materialize(prep).select(c).collect()
      }
      assert(ex.getMessage.contains("maxFoldGroupRows"),
        s"guard must name the knob: ${ex.getMessage}")
    } finally spark.conf.unset("spark.graft.maxFoldGroupRows")
  }
}
