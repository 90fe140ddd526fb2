package graft

import org.apache.spark.sql.functions._
import graft.rel.{Rel, WhileFix}

/** Mirror of Test/SuiteRelWhile.andl + Sample/recursive.andl — generative
  * and recursive fixpoints. */
class WhileSpec extends SparkSpec {
  import spark.implicits._

  test("{{A1:=0}} while (A1<=10 → A1+1) has 11 rows (SuiteRelWhile.andl:11-14)") {
    val seed = Rel.distinct(Seq(0).toDF("A1"))
    val out = WhileFix.rel(seed, r => r.where(col("A1") < 10).transform("A1" -> (col("A1") + 1)))
    assert(out.count() === 11)
  }

  test("step sizes 6 and 99: 2 rows and 1 row (SuiteRelWhile.andl:12-13)") {
    val seed = Rel.distinct(Seq(0).toDF("A1"))
    val by6 = WhileFix.rel(seed, r => r.where(col("A1") <= 10 - 6).transform("A1" -> (col("A1") + 6)))
    assert(by6.count() === 2)
    val by99 = WhileFix.rel(seed, r => r.where(col("A1") <= 10 - 99).transform("A1" -> (col("A1") + 99)))
    assert(by99.count() === 1)
  }

  test("two-tuple step (relation-literal union): 21 rows (SuiteRelWhile.andl:14)") {
    // {{A1:=0, A2:=0}} while ({A1+1,0} ∪ {A1+1,1} where A1<=10): 1 seed +
    // 2 rows per A1 in 1..10 = 21
    val seed = Rel.distinct(Seq((0, 0)).toDF("A1", "A2"))
    val out = WhileFix.rel(seed, r => {
      val stepped = r.where(col("A1") < 10)
      stepped.transform("A1" -> (col("A1") + 1), "A2" -> lit(0))
        .union(stepped.transform("A1" -> (col("A1") + 1), "A2" -> lit(1)))
    })
    assert(out.count() === 21)
  }

  test("fibonacci: fib(15) = 610 (SuiteRelWhile.andl / Sample/fibonacci.andl)") {
    val seed = Rel.distinct(Seq((0, 0L, 1L)).toDF("N", "a", "b"))
    val out = WhileFix.rel(seed, r => r.where(col("N") < 15).transform(
      "N" -> (col("N") + 1), "a" -> col("b"), "b" -> (col("a") + col("b"))))
    val fib15 = out.where(col("N") === 15).df.collect()(0).getLong(1)
    assert(fib15 === 610L)
  }

  test("transitive closure over org chart (Sample/recursive.andl:18-23)") {
    // alice tree: who reports (directly or transitively) to alice
    val edges = Rel.distinct(Seq(
      ("bob", "alice"), ("carol", "alice"), ("dave", "bob"),
      ("eve", "bob"), ("frank", "carol"), ("grace", "dave")).toDF("name", "boss"))
    val seed = edges.where(col("boss") === "alice").project("name")
    // step: anyone whose boss is already in the closure
    val closure = WhileFix.rel(seed, r =>
      edges.semijoin(r.rename("name" -> "boss")).project("name"))
    assert(closure.df.collect().map(_.getString(0)).toSet ===
      Set("bob", "carol", "dave", "eve", "frank", "grace"))
  }

  test("q_while_dist runs the DISTRIBUTED regime on real data (seed > tinyRows)") {
    // sf0.01: ~2k error-event seeds against tinyRows=1000 — the data, not
    // a config constant, forces the bail-out; the probe proves the
    // distributed loop (not the driver shortcut) produced the rows
    val probe = new WhileFix.Probe
    val out = Queries.qWhileDist(spark, "/root/testdata/sf0.01", probe)
    val n = out.count()
    assert(probe.bailedToSpark, "expected the distributed tier to run")
    assert(probe.driverRounds === 0, "seed must exceed the driver tier up front")
    assert(probe.distributedRounds >= 5,
      s"chain depth ~90 at 8 steps/round should need >=5 rounds, got ${probe.distributedRounds}")
    assert(n === 9399L) // DuckDB recursive-CTE ground truth at sf0.01
    // the TINY fixture stays on the driver — the tiers coexist
    val tinyProbe = new WhileFix.Probe
    val seed = Rel.distinct(Seq(0).toDF("A1"))
    WhileFix(seed.df, d => d.filter(col("A1") < 10).select((col("A1") + 1).as("A1")),
      probe = tinyProbe).count()
    assert(!tinyProbe.bailedToSpark && tinyProbe.driverRounds > 0)
  }

  test("reliable-checkpoint knob: same fixpoint through directory checkpoints") {
    // spark.graft.reliableCheckpoint=true routes every Checkpoint.pin
    // through a DFS directory checkpoint (survives executor loss on a
    // cluster) — results must be identical to the local-pin default
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set("spark.graft.reliableCheckpoint", "true")
    // set the sticky global dir directly so this test's dir wins even if
    // another suite (PinLedgerSpec) configured one earlier in the JVM
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val seed = Seq(0).toDF("A1")
      val probe = new WhileFix.Probe
      // tinyRows=0 forces the DISTRIBUTED regime so the per-round pins
      // actually happen — and under the knob each becomes a directory
      // checkpoint that would survive executor loss on a preemptible
      // cluster
      val out = WhileFix(seed,
        d => d.filter(col("A1") < 10).select((col("A1") + 1).as("A1")),
        maxIter = 100, tinyRows = 0L, probe = probe)
      assert(out.count() === 11)
      assert(probe.bailedToSpark && probe.distributedRounds > 0)
      // the fixpoint's pins are REAL directory checkpoints: rdd-checkpoint
      // data must exist under the configured dir
      val written = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(written > 0, s"no checkpoint files under $dir — pins stayed local")
    } finally {
      spark.conf.set("spark.graft.reliableCheckpoint", "false")
    }
  }
}
