package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.rel.Rel
import scala.collection.concurrent.TrieMap

/** Named relvars, scalar vars and functions persisting across statements —
  * the reference's Catalog (Andl.Runtime/Catalog.cs:93-128; scopes
  * Catalog.cs:22) re-expressed for Spark.
  *
  * A relvar is a catalog entry pointing at an immutable DataFrame snapshot;
  * updates build a new snapshot and atomically swap the pointer (SURVEY
  * §2.6) — the same copy-on-write discipline Delta/Iceberg use, minus the
  * transaction log. `persist(dir)` writes each relvar as parquet so a later
  * session can `load` it (the reference's .sandl folder persistence,
  * Persist.cs:16-31).
  *
  * Introspection tables (andl_variable/andl_operator analogues,
  * Builtin.cs:824-838) are exposed as DataFrames via [[variables]].
  */
final class Catalog(val spark: SparkSession) {
  private val relvars = TrieMap.empty[String, Rel]
  private val scalars = TrieMap.empty[String, Any]
  private val funcs   = TrieMap.empty[String, AnyRef]

  // ------------------------------------------------------------- relvars

  def define(name: String, r: Rel): Unit = { relvars(name) = r }
  def relvar(name: String): Rel =
    relvars.getOrElse(name, throw new NoSuchElementException(s"relvar $name"))
  def names: Seq[String] = relvars.keys.toSeq.sorted

  /** update R union r — insert (Builtin.UpdateJoin:625-633). */
  def insert(name: String, rows: Rel): Unit =
    relvars(name) = relvar(name).union(rows)

  /** update R minus r — delete by value. */
  def deleteRows(name: String, rows: Rel): Unit =
    relvars(name) = relvar(name).minus(rows)

  /** update R .where(p) .{} — delete by predicate
    * (Builtin.cs:615-622, DataTableLocal.cs:834-857). */
  def deleteWhere(name: String, pred: Column): Unit =
    relvars(name) = relvar(name).where(!pred)

  /** update R .where(p) .{A:=e} — in-place update: rewrite matching rows,
    * keep the rest (same three-way split the reference does). */
  def updateWhere(name: String, pred: Column, sets: (String, Column)*): Unit = {
    val r = relvar(name)
    val updated = r.where(pred).extend(sets.map { case (n, c) => (s"__new_$n", c) }: _*)
      .transform(r.attrs.map(a =>
        a -> (if (sets.exists(_._1 == a)) col(s"__new_$a") else col(a))): _*)
    relvars(name) = r.where(!pred).union(updated)
  }

  // ------------------------------------------------- scalar vars & funcs

  def set(name: String, v: Any): Unit = { scalars(name) = v }
  def get(name: String): Any = scalars(name)
  def defineFun(name: String, f: AnyRef): Unit = { funcs(name) = f }
  def fun(name: String): AnyRef = funcs(name)

  // ----------------------------------------------------------- persistence

  def persist(dir: String): Unit =
    relvars.foreach { case (n, r) =>
      r.df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }

  def load(dir: String, name: String): Rel = {
    val r = Rel.parquet(spark, s"$dir/$name.parquet")
    define(name, r); r
  }

  /** andl_variable() analogue: the catalog as a relation. */
  def variables: DataFrame = {
    import spark.implicits._
    relvars.toSeq.map { case (n, r) => (n, "relvar", r.degree) }
      .toDF("name", "kind", "degree")
  }
}
