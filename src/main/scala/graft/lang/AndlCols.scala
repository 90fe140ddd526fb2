package graft.lang

import org.apache.spark.sql.{Column, functions => F}
import org.apache.spark.sql.types.DataType

import AndlAst._
import AndlValues._
import graft.rel.{Fold, Ordered, OrderedFold, OrderSpec, Rel, Segmented}
import graft.functions.{Builtins, Scalar}

/** Compiles Andl expressions that appear INSIDE relational operators —
  * `.where` predicates, `.select` terms, `.while` steps — to Spark
  * `Column`s, so the surface language executes on the engine's Catalyst
  * plans instead of row-at-a-time like the reference's evaluator
  * (Andl.Runtime/Evaluator.cs:238+ walks a postfix expression VM per row;
  * we emit one declarative expression per transform and let codegen run it).
  *
  * User functions are inlined at compile time (their bodies are pure
  * expressions — the reference stores them as compiled expression blocks,
  * Catalog.cs:93-128), so a call in a predicate costs nothing at runtime
  * and stays inside whole-stage codegen. Free variables from enclosing
  * scopes are evaluated driver-side and embedded as literals — the same
  * binding-time the reference gives them (closures capture values).
  */
final class AndlCols(interp: AndlInterp) {
  import AndlInterp.Env

  /** Where fold() calls are allowed and how they lower. */
  sealed trait FoldMode
  /** Plain row context (where, extend) — fold is an error. */
  case object NoFold extends FoldMode
  /** Global/grouped aggregation: fold → Spark aggregate function. */
  case object AggFold extends FoldMode
  /** Ordered transform: fold → running window aggregate. */
  final case class RunFold(spec: OrderSpec) extends FoldMode
  /** Ordered lift: fold → whole-frame window aggregate. */
  final case class WholeFold(spec: OrderSpec) extends FoldMode

  /** A compiled expression: the Column plus its inferred Andl type. */
  final case class CExpr(col: Column, t: AType)

  /** Compile context. `binds` holds inlined function parameters and
    * do-block locals (they shadow attributes, which shadow the env).
    * `seg` is the segmented-window builder for UNGROUPED order specs —
    * when present, window functions and ordered folds lower through it
    * instead of a single-partition window ([[graft.rel.Segmented]]). */
  final case class Ctx(heading: Map[String, AType], binds: Map[String, CExpr],
                       env: Env, spec: Option[OrderSpec], mode: FoldMode,
                       depth: Int = 0, seg: Option[Segmented] = None) {
    def bound(more: Seq[(String, CExpr)]): Ctx = copy(binds = binds ++ more)
  }

  // ---------------------------------------------------------------- probe

  /** Does `e` contain a fold() once user functions are inlined? Decides
    * whether a transform term is an aggregate or a per-row value. */
  def containsFold(e: Expr, env: Env,
                   seen: Set[Long] = Set.empty): Boolean = e match {
    case _: EFold => true
    case EBinop(_, l, r) => containsFold(l, env, seen) || containsFold(r, env, seen)
    case EUnop(_, x) => containsFold(x, env, seen)
    case EIf(c, a, b) =>
      containsFold(c, env, seen) || containsFold(a, env, seen) || containsFold(b, env, seen)
    case ECall(name, args) =>
      args.exists(containsFold(_, env, seen)) || (env.lookup(name) match {
        case Some(FunsV(_, ovs)) =>
          ovs.exists(f => !seen(f.uid) && containsFold(f.body, f.closure, seen + f.uid))
        case Some(f: FunV) =>
          !seen(f.uid) && containsFold(f.body, f.closure, seen + f.uid)
        case _ => false
      })
    case EDo(stmts) => stmts.exists {
      case SExpr(x) => containsFold(x, env, seen)
      case SAssign(_, x) => containsFold(x, env, seen)
      case SDef(_, _, b, _) => containsFold(b, env, seen)
      case _ => false
    }
    case EPostfix(recv, ops) =>
      containsFold(recv, env, seen) || ops.exists {
        case PDot(_, Some(args)) => args.exists(containsFold(_, env, seen))
        case PCall(args) => args.exists(containsFold(_, env, seen))
        case PWhere(p) => containsFold(p, env, seen)
        case _ => false
      }
    case _ => false
  }

  // -------------------------------------------------------------- compile

  /** Numeric literal under the session's numeric domain: double by default,
    * DecimalType(38,18) in decimal-number mode — emitted AS decimal so the
    * literal doesn't silently coerce decimal arithmetic back to double. */
  private def numLit(v: Double): Column =
    if (AndlValues.decimalNumbers)
      F.lit(java.math.BigDecimal.valueOf(v))
        .cast(org.apache.spark.sql.types.DecimalType(38, 18))
    else F.lit(v)

  def compile(e: Expr, ctx: Ctx): CExpr = e match {
    case ENum(v)     => CExpr(numLit(v), TNum)
    case EText(s)    => CExpr(F.lit(s), TText)
    case EBool(b)    => CExpr(F.lit(b), TBool)
    case ETimeLit(s) => CExpr(F.lit(parseTime(s)), TTime)
    case EBinLit(h)  => CExpr(F.lit(parseBinary(h)), TBin)

    case EVar(n) =>
      ctx.binds.get(n)
        .orElse(ctx.heading.get(n).map(t => CExpr(F.col(n), t)))
        .getOrElse(litOf(interp.evalVar(n, ctx.env, e.line)))

    case EUnop("not", x) =>
      val c = compile(x, ctx); CExpr(!c.col, TBool)
    case EUnop("-", x) =>
      val c = compile(x, ctx); CExpr(-c.col, TNum)
    case EUnop(op, _) => sys.error(s"unknown unary $op")

    case EBinop(op, l, r) => binop(op, compile(l, ctx), compile(r, ctx))

    case EIf(c, a, b) =>
      val cc = compile(c, ctx); val ca = compile(a, ctx); val cb = compile(b, ctx)
      CExpr(F.when(cc.col, ca.col).otherwise(cb.col), ca.t)

    case EFold(op, v) => foldCol(op, v, ctx)

    case ECall(name, args) => call(name, args, ctx, e.line)

    case EDo(stmts) =>
      var binds = ctx.binds
      var last: Option[CExpr] = None
      stmts.foreach {
        case SAssign(n, x) => binds += n -> compile(x, ctx.copy(binds = binds))
        case SDef(n, Nil, b, _) => binds += n -> compile(b, ctx.copy(binds = binds))
        case SExpr(x) => last = Some(compile(x, ctx.copy(binds = binds)))
        case other => sys.error(s"statement not supported in relational context: $other")
      }
      last.getOrElse(sys.error("do-block with no result expression in relational context"))

    case EPostfix(recv, ops) =>
      ops.foldLeft(compile(recv, ctx)) { (c, op) =>
        (op, c.t) match {
          case (PDot(n, argsOpt), _) => dotOp(c, n, argsOpt.getOrElse(Nil), ctx)
          case (PSelect(_, Seq(TLift(e))), TRel(fields)) => nestedLift(c, fields, e, ctx)
          case (other, _) => sys.error(s"postfix $other not supported in relational context")
        }
      }

    case ETuple(terms) =>
      // {*} / {a := e, …}: current tuple (or parts of it) as a struct
      val fields = tupleTermCols(terms, ctx)
      CExpr(F.struct(fields.map { case (n, c) => c.col.as(n) }: _*),
        TTup(fields.map { case (n, c) => (n, c.t) }))

    case ERelRows(rows) =>
      // {{*}} / {{a := e}, …}: tuple rows as a (canonically sorted) RVA
      val structs = rows.map {
        case ETuple(terms) =>
          val fields = tupleTermCols(terms, ctx)
          (F.struct(fields.map { case (n, c) => c.col.as(n) }: _*),
            TTup(fields.map { case (n, c) => (n, c.t) }))
        case other => sys.error(s"relation row must be a tuple literal, got $other")
      }
      CExpr(F.array_sort(F.array_distinct(F.array(structs.map(_._1): _*))),
        TRel(structs.head._2.fields))

    case other =>
      sys.error(s"expression not supported in relational context: ${other.getClass.getSimpleName}")
  }

  /** Tuple-literal terms (sorted canonically) as named Columns. */
  private def tupleTermCols(terms: Seq[Term], ctx: Ctx): Seq[(String, CExpr)] = {
    val raw = terms.flatMap {
      case TStar => ctx.heading.toSeq.map { case (n, t) => (n, CExpr(F.col(n), t)) }
      case TProj(n) => Seq((n, compile(EVar(n), ctx)))
      case TRename(n, o) => Seq((n, compile(EVar(o), ctx)))
      case TExtend(n, e) => Seq((n, compile(e, ctx)))
      case other => sys.error(s"bad tuple term $other")
    }
    // later terms replace earlier ones of the same name ({* a := e})
    val m = scala.collection.mutable.LinkedHashMap[String, CExpr]()
    raw.foreach { case (n, c) => m(n) = c }
    m.toSeq.sortBy(_._1)
  }

  /** Embed a driver value as a literal Column. */
  def litOf(v: Value): CExpr = v match {
    case TextV(s) => CExpr(F.lit(s), TText)
    case NumV(d)  => CExpr(numLit(d), TNum)
    case BoolV(b) => CExpr(F.lit(b), TBool)
    case TimeV(t) => CExpr(F.lit(t), TTime)
    case BinV(b)  => CExpr(F.lit(b), TBin)
    case t: TupV  => CExpr(structLit(t.fields), typeOf(t))
    case u: UdtV  => CExpr(structLit(u.fields), typeOf(u))
    case other => sys.error(s"cannot embed ${other.getClass.getSimpleName} in a relational expression")
  }

  private def structLit(fields: Seq[(String, Value)]): Column =
    F.struct(fields.map { case (n, x) => litOf(x).col.as(n) }: _*)

  // ----------------------------------------------------------------- ops

  private def binop(op: String, l: CExpr, r: CExpr): CExpr = op match {
    case "+"   => CExpr(l.col + r.col, TNum)
    case "-"   => CExpr(l.col - r.col, TNum)
    case "*"   => CExpr(l.col * r.col, TNum)
    case "/"   => CExpr(l.col / r.col, TNum)
    case "**"  => CExpr(Scalar.power(l.col, r.col), TNum)
    case "div" => CExpr(Scalar.divTrunc(l.col, r.col).cast(AndlValues.numType), TNum)
    case "mod" => CExpr(Scalar.modTrunc(l.col.cast("long"), r.col.cast("long")).cast(AndlValues.numType), TNum)
    case "&"   => CExpr(F.concat(textCol(l), textCol(r)), TText)
    case "="   => CExpr(l.col === r.col, TBool)
    case "<>"  => CExpr(l.col =!= r.col, TBool)
    case "<"   => CExpr(l.col < r.col, TBool)
    case "<="  => CExpr(l.col <= r.col, TBool)
    case ">"   => CExpr(l.col > r.col, TBool)
    case ">="  => CExpr(l.col >= r.col, TBool)
    case "=~"  => CExpr(F.regexp_like(l.col, r.col), TBool)
    case "and" => (l.t, r.t) match {
      case (TBool, _) => CExpr(l.col && r.col, TBool)
      case _ => CExpr(l.col.cast("long").bitwiseAND(r.col.cast("long")).cast(AndlValues.numType), TNum)
    }
    case "or" => (l.t, r.t) match {
      case (TBool, _) => CExpr(l.col || r.col, TBool)
      case _ => CExpr(l.col.cast("long").bitwiseOR(r.col.cast("long")).cast(AndlValues.numType), TNum)
    }
    case "xor" => (l.t, r.t) match {
      case (TBool, _) => CExpr(l.col =!= r.col, TBool)
      case _ => CExpr(l.col.cast("long").bitwiseXOR(r.col.cast("long")).cast(AndlValues.numType), TNum)
    }
    case other => sys.error(s"operator $other not supported in relational context")
  }

  /** Text conversion with the reference's rendering (numbers print without
    * trailing `.0`, bools as true/false) — the Column mirror of
    * [[AndlValues.render]]. */
  def textCol(c: CExpr): Column = c.t match {
    case TText => c.col
    case TNum =>
      F.when(c.col === F.round(c.col) && F.abs(c.col) < 1e15,
        c.col.cast("long").cast("string")).otherwise(c.col.cast("string"))
    case TBool => F.when(c.col, "true").otherwise("false")
    case TTime => F.when(
        F.date_format(c.col, "HH:mm:ss.SSS") === "00:00:00.000",
        F.date_format(c.col, "d/MM/yyyy"))
      .otherwise(F.concat(F.date_format(c.col, "d/MM/yyyy H:mm:ss"),
        F.when(F.date_format(c.col, "SSS") === "000", F.lit(""))
          .otherwise(F.concat(F.lit("."), F.date_format(c.col, "SSS")))))
    case TBin => F.lower(F.hex(c.col))
    case other => c.col.cast("string")
  }

  // --------------------------------------------------------------- calls

  private def call(name: String, args: Seq[Expr], ctx: Ctx, line: Int): CExpr = {
    // window offset functions need the order spec and a literal offset
    def spec: OrderSpec = ctx.spec.getOrElse(ctx.mode match {
      case RunFold(s) => s
      case WholeFold(s) => s
      case _ => sys.error(s"$name needs an ordered context (.order before .select) at line $line")
    })
    def litArg(i: Int): Int = interp.eval(args(i), ctx.env) match {
      case NumV(d) => d.toInt
      case other => sys.error(s"$name expects a literal number, got $other")
    }
    name match {
      case "lag" | "lead" | "nth" =>
        val c = compile(args(0), ctx)
        val dt = sparkType(c.t)
        val n = litArg(1)
        val col = (ctx.seg, spec.groupBy.isEmpty) match {
          case (Some(seg), true) => name match {
            case "lag"  => seg.lagD(c.col, n, dt)
            case "lead" => seg.leadD(c.col, n, dt)
            case "nth"  => seg.nthD(c.col, n, dt)
          }
          case _ => name match {
            case "lag"  => Ordered.lagD(c.col, n, dt, spec)
            case "lead" => Ordered.leadD(c.col, n, dt, spec)
            case "nth"  => Ordered.nthD(c.col, n, dt, spec)
          }
        }
        CExpr(col, c.t)
      case "ord" if ctx.spec.isEmpty && !ctx.mode.isInstanceOf[RunFold] &&
          !ctx.mode.isInstanceOf[WholeFold] =>
        // unordered ord(): the reference's input ordinal. Consecutive only
        // within one partition (literals/CSV load as one) — ordered use
        // sites should .order first, like every reference test does.
        CExpr((F.monotonically_increasing_id() + 1).cast(AndlValues.numType), TNum)
      case "ord" if ctx.seg.isDefined && spec.groupBy.isEmpty =>
        CExpr(ctx.seg.get.ord.cast(AndlValues.numType), TNum)
      case "ord"  => CExpr(Ordered.ord(spec).cast(AndlValues.numType), TNum)
      case "ordg" => ctx.binds.getOrElse("__ordg__",
        sys.error(s"ordg() needs an ordered context at line $line"))
      case "rank" if ctx.seg.isDefined && spec.groupBy.isEmpty =>
        CExpr(ctx.seg.get.rank(spec.rawSort).cast(AndlValues.numType), TNum)
      case "rank" => CExpr(Ordered.rank(spec).cast(AndlValues.numType), TNum)
      case _ =>
        val cargs = args.map(compile(_, ctx))
        scalarBuiltin(name, cargs).getOrElse {
          interp.lookupFun(name, cargs.map(_.t), ctx.env) match {
            case Some(f) => inlineCall(f, cargs, ctx, line)
            case None =>
              // user type constructor?
              ctx.env.lookup(name) match {
                case Some(TypeV(TUdt(un, fields))) =>
                  require(cargs.length == fields.length, s"$un expects ${fields.length} args")
                  CExpr(F.struct(cargs.zip(fields).map { case (c, (fn, ft)) =>
                    c.col.cast(sparkType(ft)).as(fn) }: _*), TUdt(un, fields))
                case _ => sys.error(s"unknown function $name at line $line")
              }
          }
        }
    }
  }

  /** Builtin scalar functions as Columns (no UDFs — SURVEY §2.9). */
  def scalarBuiltin(name: String, a: Seq[CExpr]): Option[CExpr] = (name, a) match {
    case ("length", Seq(s))       => Some(CExpr(F.length(s.col).cast(AndlValues.numType), TNum))
    case ("trim", Seq(s))         => Some(CExpr(F.trim(s.col), TText))
    case ("toupper", Seq(s))      => Some(CExpr(F.upper(s.col), TText))
    case ("tolower", Seq(s))      => Some(CExpr(F.lower(s.col), TText))
    case ("left", Seq(s, n))      => Some(CExpr(Scalar.left(s.col, n.col.cast("int")), TText))
    case ("right", Seq(s, n))     => Some(CExpr(Scalar.right(s.col, n.col.cast("int")), TText))
    case ("fill", Seq(s, n))      => Some(CExpr(Scalar.fill(s.col, n.col.cast("int")), TText))
    case ("before", Seq(s, t))    => Some(CExpr(Scalar.before(s.col, t.col), TText))
    case ("after", Seq(s, t))     => Some(CExpr(Scalar.after(s.col, t.col), TText))
    case ("mod", Seq(a, b))       => Some(binop("mod", a, b))
    case ("div", Seq(a, b))       => Some(binop("div", a, b))
    case ("max", Seq(x, y))       => Some(CExpr(F.greatest(x.col, y.col), x.t))
    case ("min", Seq(x, y))       => Some(CExpr(F.least(x.col, y.col), x.t))
    case ("abs", Seq(x))          => Some(CExpr(F.abs(x.col), TNum))
    case ("number", Seq(s))       => Some(CExpr(s.col.cast(AndlValues.numType), TNum))
    case ("text", Seq(x))         => Some(CExpr(textCol(x), TText))
    case ("format", Seq(x))       => Some(CExpr(textCol(x), TText))
    case ("pp", Seq(x))           => Some(CExpr(textCol(x), TText))
    case ("now", Seq())           => Some(CExpr(F.current_timestamp(), TTime))
    // pipeline signals exposed to the language (engine-tier Columns —
    // same expressions the gated pipeline queries use)
    case ("tokens", Seq(s)) => Some(CExpr(
      graft.pipeline.TextAnalysis.tokenCount(s.col).cast(AndlValues.numType), TNum))
    case ("fingerprint", Seq(s)) => Some(CExpr(
      graft.pipeline.TextAnalysis.fingerprint(s.col), TText))
    case ("deflate", Seq(s)) => Some(CExpr(
      graft.functions.DeflateRatio(s.col).cast(AndlValues.numType), TNum))
    case ("normalize", Seq(s)) => Some(CExpr(
      graft.pipeline.TextAnalysis.normalizeText(s.col), TText))
    case ("quality", Seq(s)) => Some(CExpr(
      graft.pipeline.TextAnalysis.qualityScore(s.col).cast(AndlValues.numType), TNum))
    case ("langid", Seq(s)) => Some(CExpr(
      graft.pipeline.TextAnalysis.langId(s.col), TText))
    case ("scrub", Seq(s)) => Some(CExpr(
      graft.pipeline.TextAnalysis.scrubAll(s.col), TText))
    case ("htmltext", Seq(s)) => Some(CExpr(
      graft.pipeline.TextAnalysis.htmlToText(s.col), TText))
    case ("blength", Seq(b))      => Some(CExpr(Builtins.blength(b.col).cast(AndlValues.numType), TNum))
    case ("bget", Seq(b, i))      => Some(CExpr(Builtins.bget(b.col, i.col.cast("int")).cast(AndlValues.numType), TNum))
    case ("bset", Seq(b, i, v))   => Some(CExpr(Builtins.bset(b.col, i.col.cast("int"), v.col), TBin))
    case _ => None
  }

  /** Inline a user function call: bind params to the argument Columns and
    * compile the body in the function's defining env. */
  def inlineCall(f: FunV, args: Seq[CExpr], ctx: Ctx, line: Int): CExpr = {
    require(ctx.depth < 64,
      s"recursive function ${f.name} cannot run inside a relational expression (line $line)")
    require(f.params.length == args.length,
      s"${f.name} expects ${f.params.length} args, got ${args.length} at line $line")
    val binds = f.params.map(_._1).zip(args)
    compile(f.body, ctx.copy(binds = ctx.binds ++ binds, env = f.closure,
      depth = ctx.depth + 1))
  }

  /** Lift-with-fold over a NESTED relation column: `rva .select{ sum(X) }`
    * (Sample/sample3.andl's image-relation report) → `functions.aggregate`
    * over the array — the fold runs inside codegen, per row, no join. */
  private def nestedLift(recv: CExpr, fields: Seq[(String, AType)], e: Expr,
                         ctx: Ctx): CExpr = {
    def unwrap(x: Expr): Expr = x match {
      case EDo(stmts) => stmts.collect { case SExpr(y) => y }.lastOption
        .getOrElse(sys.error("empty do-block in nested lift"))
      case other => other
    }
    val (op, innerE) = unwrap(e) match {
      case EFold(o, v) => (o, v)
      case ECall(fn, Seq(arg)) =>
        (ctx.env.lookup(fn) match {
          case Some(FunsV(_, ovs)) => ovs.find(_.params.length == 1)
          case Some(f: FunV) if f.params.length == 1 => Some(f)
          case _ => None
        }).map(f => unwrap(f.body)) match {
          case Some(EFold(o, EVar(_))) => (o, arg)
          case other => sys.error(s"nested lift needs a fold, got $other")
        }
      case other => sys.error(s"nested lift needs a fold, got $other")
    }
    def bindsOf(x: Column) = fields.map { case (n, t) => n -> CExpr(x.getField(n), t) }
    val t = compile(innerE, ctx.bound(bindsOf(F.lit(null))).copy(mode = NoFold)).t
    val step = stepFor(op, t, ctx)
    val col = F.aggregate(recv.col, seedFor(op, t), (acc, x) =>
      step(acc, compile(innerE, ctx.bound(bindsOf(x)).copy(mode = NoFold)).col))
    CExpr(col, if (op == "&") TText else t)
  }

  /** Dot ops on columns: struct component access, nested-relation
    * cardinality, or unary builtin. */
  private def dotOp(recv: CExpr, name: String, args: Seq[Expr], ctx: Ctx): CExpr =
    recv.t match {
      case TTup(fields) if fields.exists(_._1 == name) =>
        CExpr(recv.col.getField(name), fields.find(_._1 == name).get._2)
      case TUdt(_, fields) if fields.exists(_._1 == name) =>
        CExpr(recv.col.getField(name), fields.find(_._1 == name).get._2)
      case TRel(fields) => name match {
        case "count" => CExpr(F.size(recv.col).cast(AndlValues.numType), TNum)
        case "degree" => CExpr(numLit(fields.length.toDouble), TNum)
        case other => sys.error(s"unknown method .$other on a nested relation")
      }
      case _ =>
        val cargs = recv +: args.map(compile(_, ctx))
        scalarBuiltin(name, cargs).getOrElse {
          interp.lookupFun(name, cargs.map(_.t), ctx.env) match {
            case Some(f) => inlineCall(f, cargs, ctx, 0)
            case None => sys.error(s"unknown method .$name in relational context")
          }
        }
    }

  // ---------------------------------------------------------------- fold

  /** Seed for a fold: per-op seeds from the reference's SymbolTable.GetSeed
    * (SymbolTable.cs:221-256); user functions seed with the type default.
    * `*` and `/` seed plain double even in decimal mode — see [[stepFor]]:
    * multiplicative folds stay in the double domain. */
  private def seedFor(op: String, t: AType): Column = op match {
    case "+" | "-" => numLit(0.0)
    case "*" | "/" => F.lit(1.0)
    case "&" => F.lit("")
    case "and" => F.lit(true)
    case "or" | "xor" => F.lit(false)
    case _ => Rel.defaultCol(sparkType(t))
  }

  /** Left-step of a fold as a Column binary function. Decimal-number mode:
    * additive/extremal numeric steps cast back to DecimalType(38,18) each
    * step (Spark decimal arithmetic widens scale per operation, and
    * `functions.aggregate` requires the merge lambda to return exactly the
    * accumulator's type — without the re-cast the plan fails analysis);
    * `*` and `/` folds stay in the DOUBLE domain (seed 1.0, operands cast
    * per step) — fixed-scale decimal is strictly worse there (Spark caps a
    * decimal product's scale at 6, and quotient chains never terminate, so
    * per-step re-quantization would diverge from both the double chain and
    * the reference's 28-digit decimal), and it keeps driver-evaluated
    * scalar chains (double) equal to engine folds, as the reference's
    * uniform numeric domain guarantees. */
  private def stepFor(op: String, t: AType, ctx: Ctx): (Column, Column) => Column = {
    val f = stepFor0(op, t, ctx)
    if (t == TNum && AndlValues.decimalNumbers) op match {
      case "*" | "/" => (a, x) => f(a, x.cast("double"))
      case _ => (a, x) => f(a, x).cast(AndlValues.numType)
    } else f
  }

  private def stepFor0(op: String, t: AType, ctx: Ctx): (Column, Column) => Column =
    op match {
      case "+" => _ + _
      case "-" => _ - _
      case "*" => _ * _
      case "/" => _ / _
      case "&" => (acc, x) => F.concat(acc, x)
      case "max" => F.greatest(_, _)
      case "min" => F.least(_, _)
      case "and" => if (t == TBool) (a, x) => a && x
        else (a, x) => a.cast("long").bitwiseAND(x.cast("long")).cast(AndlValues.numType)
      case "or" => if (t == TBool) (a, x) => a || x
        else (a, x) => a.cast("long").bitwiseOR(x.cast("long")).cast(AndlValues.numType)
      case "xor" => if (t == TBool) (a, x) => a =!= x
        else (a, x) => a.cast("long").bitwiseXOR(x.cast("long")).cast(AndlValues.numType)
      case userFn =>
        val f = interp.lookupFun(userFn, Seq(t, t), ctx.env)
          .getOrElse(sys.error(s"not a foldable operator: $userFn"))
        (a, x) => inlineCall(f, Seq(CExpr(a, t), CExpr(x, t)), ctx, 0).col
    }

  private val commutative = Set("+", "*", "max", "min", "and", "or", "xor")

  /** Lower fold(op, v) for the current mode. `&` values are rendered to
    * text first (the reference's concat converts operands). */
  private def foldCol(op: String, v: Expr, ctx: Ctx): CExpr = {
    if (op == "union" || op == "intersect") {
      // RVA folds (Sample/sample3.andl:14-35): set-combine nested relations
      val inner = compile(v, ctx.copy(mode = NoFold))
      require(inner.t.isInstanceOf[TRel], s"fold($op,…) needs a relation-valued attribute")
      val agg = op match {
        case "union" => Fold.foldUnionRva(inner.col)
        case "intersect" => F.aggregate(F.collect_list(inner.col),
          F.element_at(F.collect_list(inner.col), 1),
          (acc, x) => F.array_intersect(acc, x))
      }
      return CExpr(agg, inner.t)
    }
    val inner0 = compile(v, ctx.copy(mode = NoFold))
    val inner = if (op == "&") CExpr(textCol(inner0), TText) else inner0
    val outT = op match {
      case "&" => TText
      case "and" | "or" | "xor" if inner.t == TBool => TBool
      case _ => inner.t
    }
    ctx.mode match {
      case NoFold => sys.error("fold() is only allowed inside a transform")
      case AggFold =>
        if (commutative.contains(op) && (inner.t == TBool || inner.t == TNum ||
            inner.t == TText || inner.t == TTime))
          op match {
            case "and" | "or" | "xor" if inner.t != TBool =>
              // bitwise fold over numbers — reduce the collected group
              CExpr(F.aggregate(F.collect_list(inner.col),
                seedFor(op, inner.t), stepFor(op, inner.t, ctx)), outT)
            case _ => CExpr(Fold.fold(op, inner.col, sparkType(inner.t)), outT)
          }
        else
          // order-dependent or user fold: left-fold the group in input order
          // (the reference folds stored order; local plans preserve it)
          CExpr(F.aggregate(F.collect_list(inner.col),
            seedFor(op, outT), stepFor(op, outT, ctx)), outT)
      case RunFold(spec) if ctx.seg.isDefined && spec.groupBy.isEmpty =>
        // ungrouped ordered transform: segmented running folds — per-
        // partition windows + prefix carry, never one global partition
        val seg = ctx.seg.get
        op match {
          // "/" is NOT here: 1/product rounds differently than the
          // reference's sequential division chain (IEEE rounding per step)
          case "+" | "max" | "min" | "&" | "*" | "-" =>
            CExpr(seg.runningFold(op, inner.col), outT)
          case "and" | "or" | "xor" if inner.t == TBool =>
            CExpr(seg.runningBool(op, inner.col), TBool)
          case "and" | "or" | "xor" =>
            CExpr(seg.runningBits(op, inner.col), TNum)
          case _ =>
            CExpr(seg.runningGeneric(inner.col, seedFor(op, outT),
              stepFor(op, outT, ctx)), outT)
        }
      case RunFold(spec) =>
        op match {
          case "+" | "max" | "min" => CExpr(Ordered.runningFold(op, inner.col, spec), outT)
          case "&" => CExpr(Ordered.runningFold("&", inner.col, spec), TText)
          case _ => CExpr(F.aggregate(F.collect_list(inner.col).over(spec.running),
            seedFor(op, outT), stepFor(op, outT, ctx)), outT)
        }
      case WholeFold(spec) if ctx.seg.isDefined && spec.groupBy.isEmpty =>
        // ungrouped ordered lift: whole-relation folds are ordinary one-row
        // aggregates joined back broadcast (order matters only for & / user
        // folds, which sort by the global ordinal inside the buffer)
        val seg = ctx.seg.get
        op match {
          // "/" excluded for the same sequential-rounding reason as above
          case "+" | "max" | "min" | "&" | "*" | "-" =>
            CExpr(seg.wholeFold(op, inner.col, sparkType(outT)), outT)
          case "and" | "or" | "xor" if inner.t == TBool =>
            CExpr(seg.wholeBool(op, inner.col), TBool)
          case "and" | "or" | "xor" =>
            CExpr(seg.wholeBits(op, inner.col), TNum)
          case _ =>
            CExpr(seg.wholeGeneric(inner.col, seedFor(op, outT),
              stepFor(op, outT, ctx)), outT)
        }
      case WholeFold(spec) =>
        op match {
          case "&" => CExpr(OrderedFold.concat(inner.col, spec), TText)
          case _ => CExpr(F.aggregate(F.collect_list(inner.col).over(spec.whole),
            seedFor(op, outT), stepFor(op, outT, ctx)), outT)
        }
    }
  }
}
