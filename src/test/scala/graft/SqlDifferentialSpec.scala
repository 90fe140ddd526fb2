package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import scala.util.{Failure, Success, Try}

/** DSL ↔ SQL differential (SURVEY §5.2 item 4): every oracle whose SQL is
  * ANSI enough for Spark's own parser+analyzer is ALSO run through
  * `spark.sql` over the same sf0.001 tables, and its result must equal the
  * DSL formulation's — a second, in-engine differential independent of the
  * driver's DuckDB run (one engine, two frontends, one plan space; if the
  * DSL lowering and the SQL planner disagree, one of them is wrong).
  *
  * Oracles using DuckDB-only surface (string_split_regex, unnest,
  * generate_subscripts, bare VARCHAR casts, …) fail Spark ANALYSIS and are
  * skipped — but the relational core is ANSI, so a REQUIRED set pins the
  * queries that must never silently drop out of the differential, and a
  * floor on the total count stops erosion. */
class SqlDifferentialSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  private val sfDir = "/root/testdata/sf0.001"

  /** Core relational queries whose oracle MUST analyze in Spark SQL. */
  private val required = Set(
    "q1_agg", "q_project", "q_rename", "q_where", "q_extend", "q_take",
    "q_skip", "q_lift", "q_count_degree", "q_join", "q_compose",
    "q_semijoin", "q_rsemijoin", "q_ajoin", "q_rajoin", "q_divide",
    "q_rdivide", "q_ajoinl", "q_rajoinr", "q_union", "q_intersect",
    "q_minus", "q_rminus", "q_symdiff", "q_sub", "q_sup", "q_sep",
    "q_releq", "q_agg_scalar", "q_fold_minmax",
    // q_fold_product's oracle uses DuckDB's PRODUCT aggregate (no Spark
    // builtin) — covered by the DuckDB differential only
    "q_fold_bool", "q_running", "q_subtotal", "q_lag_lead", "q_nth",
    "q_rank", "q_ordg", "q_take", "q_import_jdbc", "q_semijoin")

  private def canon(v: Any): Any = v match {
    case null => null
    case b: Byte => b.toLong
    case s: Short => s.toLong
    case i: Int => i.toLong
    case l: Long => l
    case f: Float =>
      BigDecimal(f.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    case d: Double =>
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    case d: java.math.BigDecimal =>
      BigDecimal(d.doubleValue).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    case b: Boolean => b
    case other => other.toString
  }

  private def rowsOf(df: DataFrame): Seq[Seq[Any]] = {
    val cols = df.columns.sorted.toIndexedSeq
    df.selectExpr(cols.map(c => s"`$c`"): _*)
      .collect().toSeq
      .map(r => cols.indices.map(i => canon(r.get(i))))
      .sortBy(_.mkString(""))
  }

  test("every Spark-analyzable oracle matches its DSL formulation; the " +
    "relational core never drops out") {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)
    }
    // events/embeddings go through the SAME ingest normalization the DSL
    // loaders apply (ts precision → instant; embedding → float) so the
    // differential compares query semantics, not ingest coercion
    graft.sources.Sources.nanosTsToMicros(
      spark.read.parquet(s"$sfDir/events.parquet")).createOrReplaceTempView("events")
    graft.sources.Sources.embeddingToFloat(
      spark.read.parquet(s"$sfDir/embeddings.parquet")).createOrReplaceTempView("embeddings")
    var ran = List.empty[String]
    var skipped = List.empty[String]
    var failures = List.empty[String]
    Queries.oracleSql.toSeq.sortBy(_._1).foreach { case (name, sql) =>
      Try(spark.sql(sql)) match {
        case Failure(e) =>
          skipped ::= name
          if (required(name))
            failures ::= s"$name: REQUIRED oracle no longer analyzes in Spark SQL: ${e.getMessage.take(120)}"
        case Success(viaSql) =>
          val dsl = Try(rowsOf(Queries.queries(name)(spark, sfDir)))
          val sqlRows = Try(rowsOf(viaSql))
          (dsl, sqlRows) match {
            case (Success(a), Success(b)) =>
              if (a == b) ran ::= name
              else failures ::= s"$name: DSL ${a.size} rows vs SQL ${b.size} rows differ" +
                a.zip(b).find { case (x, y) => x != y }
                  .map { case (x, y) => s"; first diff DSL=$x SQL=$y" }.getOrElse("")
            case (Failure(e), _) => failures ::= s"$name: DSL run failed: ${e.getMessage}"
            case (_, Failure(e)) =>
              // runtime (not analysis) failure of the SQL side — treat as
              // skip only for known engine-runtime differences; loud list
              skipped ::= s"$name (runtime: ${e.getClass.getSimpleName})"
          }
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
    val missingCore = required.filterNot(r => ran.contains(r))
    assert(missingCore.isEmpty,
      s"core queries missing from the differential: $missingCore")
    assert(ran.size >= 40,
      s"differential coverage eroded: only ${ran.size} oracles ran (${skipped.size} skipped)")
    info(s"differential ran ${ran.size} oracles, skipped ${skipped.size} (DuckDB-only SQL)")
  }
}
