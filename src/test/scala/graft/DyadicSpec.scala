package graft

import org.apache.spark.sql.functions._
import graft.rel.Rel

/** Mirror of Test/SuiteRelDyadic.andl:13-48 — the count+degree matrix for
  * every join/set variant. This table IS the dyadic correctness contract. */
class DyadicSpec extends SparkSpec {

  private def cd(r: Rel): (Long, Int) = (r.count(), r.degree)

  test("join family counts and degrees (SuiteRelDyadic.andl:14-19,31-36)") {
    assert(cd(S.join(SP)) === ((12L, 6)))        // S join SP
    assert(cd(S.divide(SP)) === ((4L, 3)))       // S joinl SP
    assert(cd(S.rdivide(SP)) === ((9L, 2)))      // S joinr SP
    assert(cd(S.semijoin(SP)) === ((4L, 4)))     // S joinlc SP
    assert(cd(S.compose(SP)) === ((12L, 5)))     // S joinlr SP
    assert(cd(S.rsemijoin(SP)) === ((12L, 3)))   // S joincr SP
  }

  test("antijoin family (SuiteRelDyadic.andl:21-24,38-41)") {
    assert(cd(S.ajoin(SP)) === ((1L, 4)))        // S5 supplies nothing
    assert(cd(S.ajoinl(SP)) === ((1L, 3)))
    assert(cd(S.rajoin(SP)) === ((0L, 3)))
    assert(cd(S.rajoinr(SP)) === ((0L, 2)))
  }

  test("set ops on merged (common) heading (SuiteRelDyadic.andl:26-30,43-47)") {
    assert(cd(S.minus(SP)) === ((1L, 1)))
    assert(cd(S.intersect(SP)) === ((4L, 1)))
    assert(cd(S.rminus(SP)) === ((0L, 1)))
    assert(cd(S.symdiff(SP)) === ((1L, 1)))
    assert(cd(S.union(SP)) === ((5L, 1)))
  }

  test("set ops after where (SuiteRelDyadic.andl:52-60)") {
    val sr = P.where(col("COLOR") === "Red")
    val snr = P.where(col("PNAME") === "Screw")
    assert(sr.count() === 3)
    assert(snr.count() === 2)
    assert(sr.minus(snr).count() === 2)
    assert(sr.intersect(snr).count() === 1)
    assert(sr.rminus(snr).count() === 1)
    assert(sr.symdiff(snr).count() === 3)
    assert(sr.union(snr).count() === 4)
  }

  test("sub/sup/sep and relation equality (DataTableLocal.cs:665-721)") {
    val paris = S.where(col("CITY") === "Paris")
    assert(paris.sub(S))
    assert(S.sup(paris))
    assert(!S.sub(paris))
    assert(paris.sep(S.where(col("CITY") === "London")))
    assert(S.relEquals(S.where(lit(true))))
    assert(!S.relEquals(paris))
    // strict subset must NOT equal its superset in either direction
    // (reference checks both EXCEPT directions, DataTableLocal.cs:665-680)
    assert(!paris.relEquals(S))
  }

  test("join with no common attrs is cross join") {
    val a = Rel.distinct(S.df.select(col("S#")))
    val b = Rel.distinct(P.df.select(col("P#")))
    assert(cd(a.join(b)) === ((30L, 2)))
  }

  test("set semantics: union is idempotent, project dedups") {
    assert(S.union(S).count() === 5)
    assert(S.project("CITY").count() === 3)
    assert(S.join(SP).project("CITY").count() === 2) // only cities of suppliers with parts
  }
}
