package graft.lang

import scala.collection.mutable

import AndlValues._

/** Environment + evaluator for the Andl surface language.
  *
  * Mirrors the reference's scoped catalog (Andl.Runtime/Catalog.cs:22 —
  * global scope plus push/pop function scopes) and expression evaluator
  * (Andl.Runtime/Evaluator.cs:238+), but lowers every relational operation
  * to the graft engine ([[graft.rel.Rel]] over Spark DataFrames) instead of
  * interpreting row-at-a-time.
  */
object AndlInterp {

  /** Lexically scoped mutable environment: function bodies evaluate in a
    * child of their defining scope (closures), the script runs in the
    * global scope. */
  final class Env(val parent: Option[Env]) {
    private val vars = mutable.LinkedHashMap[String, Value]()

    def lookup(name: String): Option[Value] =
      vars.get(name).orElse(parent.flatMap(_.lookup(name)))

    /** Bind in THIS scope (var decl, def, parameter). */
    def define(name: String, v: Value): Unit = vars(name) = v

    /** Rebind wherever the name is visible; defines here if new. */
    def assign(name: String, v: Value): Unit =
      if (vars.contains(name)) vars(name) = v
      else parent match {
        case Some(p) if p.lookupLocalChain(name) => p.assign(name, v)
        case _ => vars(name) = v
      }

    private def lookupLocalChain(name: String): Boolean =
      vars.contains(name) || parent.exists(_.lookupLocalChain(name))

    def child(): Env = new Env(Some(this))
  }

  def rootEnv(): Env = new Env(None)
}
