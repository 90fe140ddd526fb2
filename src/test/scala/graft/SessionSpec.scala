package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.api.Session
import graft.catalog.{FunDef, UdtDef}

/** Gateway-facade verbs (Gateway.cs:32-102) and catalog persistence across
  * two sessions (Test/SuiteUpdateCat1/2.andl as a two-run pair). */
class SessionSpec extends SparkSpec {

  test("gateway verbs: setValue/getValue/evaluate/runScript/sql") {
    val ses = Session.open(spark)
    ses.setValue("S", S)
    assert(ses.getValue("S").count() === 5)
    ses.setScalar("limit", 20)
    assert(ses.getScalar("limit") === 20)
    ses.defineFun(FunDef("hi_status", Seq("n" -> IntegerType), BooleanType, "n >= 20"))
    val hi = ses.getValue("S").where(ses.evaluate("hi_status", col("STATUS")))
    assert(hi.count() === 4)
    val viaScript = ses.runScript { s => s.getValue("S").project("CITY").count() }
    assert(viaScript === 3)
    val viaSql = ses.sql("SELECT CITY, count(*) AS n FROM S GROUP BY CITY")
    assert(viaSql.count() === 3)
  }

  test("driver-tier relation lift refuses past spark.graft.maxDriverRelRows") {
    import graft.lang.AndlValues
    import AndlValues.{RelV, TText}
    val rel = graft.rel.Rel.distinct {
      import spark.implicits._
      (1 to 10).map(i => f"row$i%02d").toDF("A")
    }
    val v = RelV(Seq("A" -> TText), rel)
    spark.conf.set("spark.graft.maxDriverRelRows", "5")
    try {
      val e = intercept[RuntimeException](AndlValues.toSpark(v))
      assert(e.getMessage.contains("spark.graft.maxDriverRelRows"), e.getMessage)
    } finally spark.conf.unset("spark.graft.maxDriverRelRows")
    // under the default cap the same lift succeeds
    val lifted = AndlValues.toSpark(v).asInstanceOf[Seq[Any]]
    assert(lifted.size === 10)
  }

  test("JSON verbs: setValueJson/getValueJson round-trip (Gateway.cs JsonCall)") {
    val ses = Session.open(spark)
    // inbound payload, schema inferred
    ses.setValueJson("P", """[{"id":1,"name":"bolt","price":2.5},
      {"id":2,"name":"nut","price":0.75},{"id":1,"name":"bolt","price":2.5}]""")
    val p = ses.getValue("P")
    assert(p.count() === 2, "relations are sets: the duplicate row collapses")
    assert(p.df.schema("id").dataType === LongType)
    // outbound: JSON array of row objects via the SQL codec
    val json = ses.getValueJson("P")
    assert(json.startsWith("[") && json.endsWith("]"))
    // full round-trip through a SECOND relvar: schema of the existing
    // target drives the parse, so values come back identical
    ses.setValue("P2", ses.getValue("P"))
    ses.setValueJson("P2", json)
    assert(ses.getValue("P2").relEquals(ses.getValue("P")))
    // bound fails loud, pointing at the paging escape
    val ex = intercept[IllegalArgumentException](ses.getValueJson("P", maxRows = 1))
    assert(ex.getMessage.contains("page"), ex.getMessage)
  }

  test("setValueJson round-trips to NULL-FREE relvars: explicit null and " +
    "missing fields coalesce to type defaults like the CSV reader " +
    "(no-NULL discipline at the one inlet whose codec emits real NULLs)") {
    val ses = Session.open(spark)
    // schema-driven parse: the existing relvar's types decide defaults
    ses.setValue("Q", graft.rel.Rel.distinct {
      import spark.implicits._
      Seq((1L, "seed", 1.5, true)).toDF("id", "name", "price", "live")
    })
    ses.setValueJson("Q", """[{"id":1,"name":"bolt","price":2.5,"live":true},
      {"id":2,"name":null,"price":null},
      {"id":3}]""")
    val q = ses.getValue("Q").df
    val nullCount = q.columns.map(c =>
      q.where(col(c).isNull).count()).sum
    assert(nullCount === 0, s"NULLs leaked through setValueJson:\n${q.collect().mkString("\n")}")
    val r3 = q.where(col("id") === 3).collect()(0)
    assert(r3.getString(r3.fieldIndex("name")) === "")
    assert(r3.getDouble(r3.fieldIndex("price")) === 0.0)
    assert(r3.getBoolean(r3.fieldIndex("live")) === false)
    // inferred-schema parse coalesces too
    ses.setValueJson("Q2", """[{"a":1,"b":"x"},{"a":null,"b":null}]""")
    val q2 = ses.getValue("Q2").df
    assert(q2.columns.map(c => q2.where(col(c).isNull).count()).sum === 0,
      "inferred-schema parse leaked NULLs")
    // COMPLEX-typed columns default structurally (empty array, struct of
    // component defaults) — a null-cast fallback would silently re-admit
    // NULLs for exactly the shapes RVAs use
    ses.setValueJson("Q3",
      """[{"id":1,"tags":["x","y"],"pt":{"x":1.5,"y":2.5}},
        |{"id":2,"tags":null},
        |{"id":3}]""".stripMargin)
    val q3 = ses.getValue("Q3").df
    assert(q3.columns.map(c => q3.where(col(c).isNull).count()).sum === 0,
      s"complex-typed NULLs leaked:\n${q3.collect().mkString("\n")}")
    val r2 = q3.where(col("id") === 2).collect()(0)
    assert(r2.getSeq[String](r2.fieldIndex("tags")) === Seq.empty,
      "null array did not default to empty")
    val r3pt = q3.where(col("id") === 3).select("pt.x", "pt.y").collect()(0)
    assert(r3pt.getDouble(0) === 0.0 && r3pt.getDouble(1) === 0.0,
      "missing struct did not default to component defaults")
    // NULLs NESTED INSIDE non-null containers fill too: a null struct
    // FIELD, a null array ELEMENT, a null map VALUE — the top-level
    // coalesce alone would pass all three through
    ses.setValueJson("Q4",
      """[{"id":1,"pt":{"x":1.5,"y":2.5},"tags":["a","b"],"kv":{"k1":"v1"}},
        |{"id":2,"pt":{"x":null,"y":3.5},"tags":["a",null],"kv":{"k1":null}}]"""
        .stripMargin)
    val q4 = ses.getValue("Q4").df
    val r4 = q4.where(col("id") === 2).collect()(0)
    val pt = r4.getStruct(r4.fieldIndex("pt"))
    assert(!pt.isNullAt(pt.fieldIndex("x")) &&
      pt.getDouble(pt.fieldIndex("x")) === 0.0, "null struct FIELD leaked")
    assert(r4.getSeq[String](r4.fieldIndex("tags")) === Seq("a", ""),
      "null array ELEMENT leaked")
    // JSON objects infer as structs, so kv.k1 rides the struct fill
    val kv = r4.getStruct(r4.fieldIndex("kv"))
    assert(kv.getString(kv.fieldIndex("k1")) === "", "nested object value leaked")
    // MAP values only arrive via a schema-driven parse — pin the fill
    // directly on a MapType frame
    val mdf = {
      import spark.implicits._
      Seq((1L, Map("a" -> Some(2.5), "b" -> Option.empty[Double])))
        .toDF("id", "kv")
    }
    val filled = graft.rel.Rel.fillDefaults(mdf).collect()(0)
    assert(filled.getMap[String, Double](1).get("b").contains(0.0),
      "null map VALUE leaked through fillDefaults")
  }

  test("two-session persistence: relvars, scalars, functions, types reload (SuiteUpdateCat1/2.andl)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cat").toString
    // SESSION 1: define everything, mutate a relvar, save
    val s1 = Session.open(spark)
    s1.setValue("S", S)
    s1.catalog.insert("S", graft.rel.Rel.distinct {
      import spark.implicits._
      Seq(("S6", "New", 40, "Oslo")).toDF("S#", "SNAME", "STATUS", "CITY")
    })
    s1.setScalar("answer", 42)
    s1.setScalar("label", "hello")
    s1.defineFun(FunDef("fmul", Seq("a" -> DoubleType, "b" -> DoubleType), DoubleType, "a * b"))
    s1.defineType(UdtDef("pt", Seq("x" -> DoubleType, "y" -> DoubleType)))
    s1.save(dir)

    // SESSION 2: a FRESH SparkSession (own temp-function registry and
    // catalog) — everything must come back from disk
    val spark2 = spark.newSession()
    val s2 = Session.open(spark2, dir)
    val loaded = s2.getValue("S")
    assert(loaded.count() === 6)
    assert(loaded.where(col("S#") === "S6").count() === 1)
    assert(s2.getScalar("answer") === 42)
    assert(s2.getScalar("label") === "hello")
    // function re-registered in the NEW session
    val prod = loaded.aggregate(Nil,
      "p" -> s2.evaluate("fmul", lit(6.0), lit(7.0))).df.collect()(0).getDouble(0)
    assert(prod === 42.0)
    assert(s2.catalog.udt("pt").components === Seq("x" -> DoubleType, "y" -> DoubleType))
    // loaded relvar equals what session 1 held (value equality both ways)
    assert(loaded.relEquals(s1.getValue("S")))
  }

  test("save -> close -> reopen: persisted state (bucketed layout included) " +
    "survives the session reclaiming its physical footprint") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sess_close").toString
    val s1 = Session.open(spark)
    val rows = graft.rel.Rel.distinct(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    s1.catalog.defineBucketed("B", rows, Seq("id"), 4)
    s1.setScalar("n", 7)
    s1.save(dir)
    s1.close() // drops s1's physical tables; the save dir is the survivor
    val s2 = Session.open(spark, dir)
    assert(s2.getValue("B").relEquals(rows))
    assert(s2.getScalar("n") === 7)
    // the reopened bucketed relvar still joins Exchange-free on its key
    val df = s2.getValue("B").df
    val p = df.hint("merge").join(df.select(col("id"), col("v").as("v2")), "id")
      .queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin") && !p.contains("Exchange"),
      s"bucketed layout lost across save/close/reopen:\n${p.take(3000)}")
    s2.close()
  }

  test("two sessions mutate ONE bucketed relvar through the verb surface: " +
    "interleaved insert/delete converge on the exact final set, a rival " +
    "holding the layout lease makes the verb fail LOUD (never a silent " +
    "interleave), and the refused mutation completes after release") {
    import spark.implicits._
    import graft.rel.Rel
    import graft.sources.WriterLease
    val dir = java.nio.file.Files.createTempDirectory("graft_sess_mut").toString
    val seed = Session.open(spark)
    seed.catalog.defineBucketed("R", Rel.distinct(
      (1L to 20L).map(i => (i, s"s$i")).toDF("k", "v")), Seq("k"), 2)
    seed.save(dir)
    seed.close()
    // the SuiteUpdateCat1/2 shape, concurrent: two programs on one catalog
    val a = Session.open(spark, dir)
    val b = Session.open(spark, dir)
    // interleaved verbs: a inserts, b deletes, a deletes, b inserts
    a.catalog.insert("R", Rel.distinct(Seq((101L, "a1")).toDF("k", "v")))
    b.catalog.deleteWhere("R", col("k") <= 5L)
    a.catalog.deleteWhere("R", col("k") === 6L)
    b.catalog.insert("R", Rel.distinct(Seq((102L, "b1")).toDF("k", "v")))
    // a rival holding the layout's writer lease: the verb fails LOUD
    val holding = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    // the saved layout both sessions are bound to (Catalog.save's
    // `_bucketed/<name>` convention — the path the mutation verbs lease)
    val rivalPath = s"$dir/_bucketed/R"
    assert(new java.io.File(rivalPath).isDirectory, s"no layout at $rivalPath")
    val rival = new Thread(() =>
      WriterLease.withLease(spark, rivalPath, "rival-program") {
        holding.countDown(); release.await()
      })
    rival.start(); holding.await()
    intercept[WriterLease.LeaseConflictException] {
      a.catalog.insert("R", Rel.distinct(Seq((103L, "a2")).toDF("k", "v")))
    }
    intercept[WriterLease.LeaseConflictException] {
      b.catalog.deleteWhere("R", col("k") === 7L)
    }
    release.countDown(); rival.join()
    // the refused verbs complete after release
    a.catalog.insert("R", Rel.distinct(Seq((103L, "a2")).toDF("k", "v")))
    b.catalog.deleteWhere("R", col("k") === 7L)
    // every mutation saw the rivals' committed state (lease + on-disk
    // listing): b (re-attached by its own delete) and a FRESH session
    // read the exact interleaved result …
    val expect = ((8L to 20L) ++ Seq(101L, 102L, 103L)).toSet
    val c = Session.open(spark, dir)
    Seq("b" -> b, "c" -> c).foreach { case (who, s) =>
      val got = s.getValue("R").df.select("k").collect().map(_.getLong(0)).toSet
      assert(got === expect, s"session $who diverged: ${got.toSeq.sorted}")
    }
    // … while a serves its CONSISTENT SNAPSHOT: its attachment predates
    // b's final delete (generation listings are pinned at attach — the
    // same reader-snapshot contract every bucketed attachment has), so a
    // sees exactly its own last re-attach: expect plus the still-undeleted 7
    val aGot = a.getValue("R").df.select("k").collect().map(_.getLong(0)).toSet
    assert(aGot === expect + 7L,
      s"session a's snapshot tore: ${aGot.toSeq.sorted}")
    a.close(); b.close(); c.close()
  }
}
