package graft.lang

/** AST for the Andl surface language (statement shapes from
  * Andl.Peg/Andl.grammar.peg:57-117, expression shapes :137-250). */
object AndlAst {

  // ------------------------------------------------------------ statements
  sealed trait Stmt { var line: Int = 0 }
  /** Free expression — evaluated, pretty-printed when noisy. */
  case class SExpr(e: Expr) extends Stmt
  /** `name := expr` (optionally `var name := expr`). */
  case class SAssign(name: String, e: Expr) extends Stmt
  /** `name => expr` — argless deferred (`defer=true`, re-evaluated at every
    * reference); `def name[:type](params) => body` (`defer=false`). */
  case class SDef(name: String, params: Seq[Param], body: Expr,
                  defer: Boolean = false) extends Stmt
  /** `type name(fields)`. */
  case class STypeDef(name: String, fields: Seq[(String, TypeRef)]) extends Stmt
  /** Several statements from one source statement (`type a(…), b(…)`). */
  case class SMulti(stmts: Seq[Stmt]) extends Stmt
  /** `var name:typeref` / `var name:heading(source)`. */
  case class SVarDecl(name: String, tref: Option[TypeRef], source: Option[String]) extends Stmt
  /** `#directive args` — catalog/noisy/etc. */
  case class SDirective(name: String, args: Seq[String]) extends Stmt
  case class SUpdate(name: String, action: UpdateAction) extends Stmt

  sealed trait UpdateAction
  case class UpSetop(op: String, e: Expr) extends UpdateAction
  case class UpWhere(pred: Option[Expr], terms: Option[(Boolean, Seq[Term])]) extends UpdateAction

  /** Function parameter: name + optional type (by name, literal example, or
    * variable example — resolved at def time). */
  case class Param(name: String, tref: Option[TypeRef])

  // ------------------------------------------------------------ type refs
  sealed trait TypeRef
  case class TRName(name: String) extends TypeRef // text/number/bool/time/binary/user type
  case class TRTupHeading(fields: Seq[(String, Option[TypeRef])]) extends TypeRef // {a:0, b}
  case class TRRelHeading(fields: Seq[(String, Option[TypeRef])]) extends TypeRef // {{a:0}}
  case class TRExample(e: Expr) extends TypeRef // typed by literal or variable

  // ----------------------------------------------------------- expressions
  sealed trait Expr { var line: Int = 0 }
  case class ENum(v: Double) extends Expr
  case class EText(s: String) extends Expr
  case class EBool(b: Boolean) extends Expr
  case class ETimeLit(s: String) extends Expr
  case class EBinLit(hex: String) extends Expr
  case class EVar(name: String) extends Expr
  case class EBinop(op: String, l: Expr, r: Expr) extends Expr
  case class EUnop(op: String, e: Expr) extends Expr
  /** name(args) — builtin or user function call. */
  case class ECall(name: String, args: Seq[Expr]) extends Expr
  case class EIf(c: Expr, a: Expr, b: Expr) extends Expr
  case class EFold(op: String, e: Expr) extends Expr
  case class EDo(stmts: Seq[Stmt]) extends Expr
  /** Tuple literal {a := e, …} / tup(a := e, …); bare field = copy attr. */
  case class ETuple(terms: Seq[Term]) extends Expr
  /** Relation from tuple rows: {{…},{…}} (rows are ETuple or EVar). */
  case class ERelRows(rows: Seq[Expr]) extends Expr
  /** Relation with heading + expression rows: rel:{h}((…),(…)) or {{h}(…)}.
    * Empty heading + no rows = DUM ({{:}}). */
  case class ERelHeaded(heading: Option[TypeRef], rows: Seq[Seq[Expr]]) extends Expr
  /** rel(tupexpr, …) — relation from tuple-valued expressions. */
  case class ERelOf(tuples: Seq[Expr]) extends Expr
  /** Postfix chain: recv .op .op … */
  case class EPostfix(recv: Expr, ops: Seq[PostOp]) extends Expr
  /** Function literal `def(a:'') => body` — a funval (grammar FunvalBody;
    * tested by SuiteDefer.andl funvals section). */
  case class EFunDef(params: Seq[Param], body: Expr) extends Expr

  // --------------------------------------------------------- postfix ops
  sealed trait PostOp
  case class PWhere(pred: Expr) extends PostOp
  case class PSelect(star: Boolean, terms: Seq[Term]) extends PostOp
  case class POrder(terms: Seq[OrderTerm]) extends PostOp
  case class PWhile(step: Expr) extends PostOp
  /** .name or .name(args): builtin/user function with recv as first arg,
    * or component access on tuples/UDTs. */
  case class PDot(name: String, args: Option[Seq[Expr]]) extends PostOp
  /** funval(args) — call the receiver as a function value. */
  case class PCall(args: Seq[Expr]) extends PostOp

  case class OrderTerm(field: String, desc: Boolean, group: Boolean)

  /** Transform term (grammar TransformPrel): project / rename / extend /
    * lift (unnamed expression). */
  sealed trait Term
  case class TProj(name: String) extends Term
  case class TRename(name: String, old: String) extends Term
  case class TExtend(name: String, e: Expr) extends Term
  case class TLift(e: Expr) extends Term
  /** `{*}` inside a tuple row: copy every attribute of the current tuple
    * (SuiteRelWhile.andl fibonacci2's `{{*}}` step). */
  case object TStar extends Term
}
