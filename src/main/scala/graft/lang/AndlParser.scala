package graft.lang

import AndlLexer._
import AndlAst._

/** Recursive-descent parser for the Andl surface language, shaped after the
  * reference PEG (Andl.Peg/Andl.grammar.peg). Statements are line-
  * terminated; newlines are transparent inside parentheses, after commas,
  * after binary operators and before a postfix `.` (the grammar's WSC/WSL
  * rules). Do-bodies keep newlines as statement separators.
  */
final class AndlParser(toks: Vector[Tok]) {
  private var p = 0

  private def peek(k: Int = 0): Tok = toks(math.min(p + k, toks.length - 1))
  private def next(): Tok = { val t = peek(); if (p < toks.length - 1) p += 1; t }
  private def at(sym: String): Boolean = peek() match {
    case TOp(s) => s == sym
    case _ => false
  }
  private def atIdent(name: String): Boolean = peek() match {
    case TIdent(n) => n == name
    case _ => false
  }
  private def eat(sym: String): Unit = {
    require(at(sym), s"expected '$sym' at line ${peek().line}, got ${peek()}")
    next()
  }
  private def eatIdent(): String = next() match {
    case TIdent(n) => n
    case t => sys.error(s"expected identifier at line ${t.line}, got $t")
  }
  private def skipNl(): Unit = while (peek().isInstanceOf[TNewline]) next()
  private def atNl: Boolean = peek().isInstanceOf[TNewline] || peek().isInstanceOf[TEof]

  /** First non-newline token at or after offset k (newlines are transparent
    * inside braces — grammar WSC). */
  private def peekThroughNl(k: Int): Tok = {
    var i = p + k
    while (i < toks.length - 1 && toks(i).isInstanceOf[TNewline]) i += 1
    toks(math.min(i, toks.length - 1))
  }

  // ---------------------------------------------------------------- script

  def parseScript(): Seq[Stmt] = {
    val out = Seq.newBuilder[Stmt]
    skipNl()
    while (!peek().isInstanceOf[TEof]) {
      out += statement()
      skipNl()
    }
    out.result()
  }

  private def statement(): Stmt = {
    val ln = peek().line
    val s = peek() match {
      case TOp("#") => directive()
      case TIdent("type") => next(); typedef()
      case TIdent("def") => next(); deffun()
      case TIdent("update") => next(); update()
      case TIdent("var") =>
        // var name := expr  → assignment; else declaration list
        if (peek(1).isInstanceOf[TIdent] && (peek(2) match {
          case TOp(":=") => true; case _ => false
        })) { next(); assignment() }
        else { next(); vardecl() }
      case TIdent(n) if !keywords(n) && (peek(1) match {
        case TOp(":=") => true; case _ => false
      }) => assignment()
      case TIdent(n) if !keywords(n) && (peek(1) match {
        case TOp("=>") => true; case _ => false
      }) =>
        val name = eatIdent(); eat("=>"); skipNl()
        // a defer body may be an update statement (sample3's up1/up2/up3)
        if (atIdent("update")) { next(); SDef(name, Nil, EDo(Seq(update())), defer = true) }
        else SDef(name, Nil, expression(), defer = true)
      case _ => SExpr(expression())
    }
    s.line = ln
    s
  }

  private def directive(): Stmt = {
    eat("#")
    val name = eatIdent()
    val args = Seq.newBuilder[String]
    while (!atNl) next() match {
      case TIdent(n) => args += n
      case TNum(v) => args += v.toLong.toString
      case TText(t) => args += t
      case _ => ()
    }
    SDirective(name, args.result())
  }

  private def typedef(): Stmt = {
    def one(): Stmt = {
      val name = eatIdent()
      eat("(")
      skipNl()
      val fields = Seq.newBuilder[(String, TypeRef)]
      while (!at(")")) {
        val fn = eatIdent()
        val tr = if (at(":")) { eat(":"); typeRef() } else TRName("text")
        fields += ((fn, tr))
        if (at(",")) { eat(","); skipNl() }
      }
      eat(")")
      STypeDef(name, fields.result())
    }
    val first = one()
    if (!at(",")) first
    else {
      val all = Seq.newBuilder[Stmt]
      all += first
      while (at(",")) { eat(","); skipNl(); all += one() } // type a(…), b(…)
      SMulti(all.result())
    }
  }

  private def vardecl(): Stmt = {
    // var name[:typeref][(source)] — single decl is all the scripts use
    val name = eatIdent()
    val tref = if (at(":")) { eat(":"); Some(typeRef()) } else None
    val source = if (at("(")) {
      eat("("); val s = eatIdent(); eat(")"); Some(s)
    } else None
    SVarDecl(name, tref, source)
  }

  private def assignment(): Stmt = {
    val name = eatIdent()
    eat(":=")
    skipNl()
    SAssign(name, expression())
  }

  private def deffun(): Stmt = {
    val name = eatIdent()
    // recursion type hint `def fact:0(...)`: a SINGLE literal or name token
    // (a full typeRef would swallow the parameter list as a call)
    if (at(":")) { eat(":"); next() }
    val params = Seq.newBuilder[Param]
    eat("(")
    skipNl()
    while (!at(")")) {
      val pn = eatIdent()
      val tr = if (at(":")) { eat(":"); Some(typeRef()) } else None
      params += Param(pn, tr)
      if (at(",")) { eat(","); skipNl() }
    }
    eat(")")
    eat("=>")
    skipNl()
    // a function body may be an update statement (setup-workbench.andl's
    // addsuppliers)
    if (atIdent("update")) { next(); SDef(name, params.result(), EDo(Seq(update()))) }
    else SDef(name, params.result(), expression())
  }

  private def update(): Stmt = {
    val name = eatIdent()
    peek() match {
      case TIdent(op) if AndlParser.dyadicOps(op) =>
        next(); skipNl()
        SUpdate(name, UpSetop(op, expression()))
      case _ =>
        // .where(pred)? then .select{...} / .{...} (delete when empty)
        var pred: Option[Expr] = None
        var terms: Option[(Boolean, Seq[Term])] = None
        var go = true
        while (go && at(".")) {
          eat(".")
          peek() match {
            case TIdent("where") =>
              next(); eat("("); skipNl(); pred = Some(expression()); skipNl(); eat(")")
            case TIdent("select") =>
              next()
              val (st, ts) = transformBody()
              terms = Some((st, ts)); go = false
            case TOp("{") =>
              val (st, ts) = transformBody()
              terms = Some((st, ts)); go = false
            case t => sys.error(s"bad update action at line ${t.line}")
          }
        }
        SUpdate(name, UpWhere(pred, terms))
    }
  }

  // ------------------------------------------------------------- type refs

  private def typeRef(): TypeRef = peek() match {
    case TIdent("rel") | TIdent("relation") =>
      next()
      if (at("(")) { eat("("); val t = typeRef(); eat(")"); t match {
        case TRTupHeading(f) => TRRelHeading(f)
        case other => other
      }} else if (at(":")) { eat(":"); typeRef() }
      else TRRelHeading(Nil)
    case TIdent("tup") | TIdent("tuple") =>
      next()
      if (at("(")) { eat("("); val t = typeRef(); eat(")"); t }
      else TRTupHeading(Nil)
    case TOp("{") if (peekThroughNl(1) match {
      case TOp("{") => true; case _ => false
    }) => // {{a:0, …}} relation heading
      eat("{"); skipNl(); eat("{")
      val h = heading()
      eat("}"); skipNl(); eat("}")
      TRRelHeading(h)
    case TOp("{") => TRTupHeading(headingBraced())
    case TIdent("def") if (peek(1) match {
      case TOp("(") => true; case _ => false
    }) => TRExample(funLiteral()) // function-typed component (SuiteDefer tfnv)
    case TIdent(n) if AndlParser.typeNames(n) => next(); TRName(n)
    case TIdent(n) => next(); TRName(n) // user type or variable example
    case _ => TRExample(expression()) // literal example: 0, '', false, t'…'
  }

  /** `def(params) => body` funval literal (the `def` token not yet eaten). */
  private def funLiteral(): Expr = {
    next() // def
    val params = Seq.newBuilder[Param]
    eat("(")
    skipNl()
    while (!at(")")) {
      val pn = eatIdent()
      val tr = if (at(":")) { eat(":"); Some(typeRef()) } else None
      params += Param(pn, tr)
      if (at(",")) { eat(","); skipNl() }
    }
    eat(")")
    eat("=>")
    skipNl()
    EFunDef(params.result(), expression())
  }

  /** `{a:0, b}`-style heading including the braces. */
  private def headingBraced(): Seq[(String, Option[TypeRef])] = {
    eat("{")
    val h = heading()
    eat("}")
    h
  }

  /** Fields after `{`: `:`→empty, else name[:type] list (no closing brace). */
  private def heading(): Seq[(String, Option[TypeRef])] = {
    skipNl()
    if (at(":")) { eat(":"); return Nil }
    val fields = Seq.newBuilder[(String, Option[TypeRef])]
    while (!at("}")) {
      val fn = eatIdent()
      val tr = if (at(":")) { eat(":"); Some(typeRef()) } else None
      fields += ((fn, tr))
      if (at(",")) { eat(","); skipNl() }
    }
    fields.result()
  }

  // ----------------------------------------------------------- expressions

  def expression(): Expr = binop(2)

  private def binop(minPrec: Int): Expr = {
    var left = primary()
    var go = true
    while (go) {
      opSymbol() match {
        case Some(op) if AndlParser.precedence(op) >= minPrec =>
          val prec = AndlParser.precedence(op)
          next() // consume op (single token)
          skipNl()
          val right = binopRight(prec)
          val e = EBinop(op, left, right)
          e.line = left.line
          left = e
        case _ => go = false
      }
    }
    left
  }

  private def binopRight(prec: Int): Expr = {
    // left-assoc: right side binds strictly tighter
    var right = primary()
    var go = true
    while (go) {
      opSymbol() match {
        case Some(op) if AndlParser.precedence(op) > prec =>
          next(); skipNl()
          val r2 = binopRight(AndlParser.precedence(op))
          right = EBinop(op, right, r2)
        case _ => go = false
      }
    }
    right
  }

  /** The binary operator at the cursor, if any (ops are single tokens;
    * named ops like `and`/`union` are identifiers). */
  private def opSymbol(): Option[String] = peek() match {
    case TOp(s) if AndlParser.precedence.contains(s) => Some(s)
    // named ops stay dyadic even before `(`: `S minus (SP join P)` is the
    // reference's ordinary dyadic-op-with-parenthesized-operand form
    // (SymbolTable.cs:539 AddDyadic "minus"); no call named like a dyadic
    // op exists in the reference surface, so there is no ambiguity
    case TIdent(n) if AndlParser.precedence.contains(n) => Some(n)
    case _ => None
  }

  private def primary(): Expr = {
    val ln = peek().line
    val e = peek() match {
      case TIdent("not") => next(); EUnop("not", primary())
      // unary minus binds at precedence 8, below `**` at 9
      // (SymbolTable.cs:456-457): -2**2 parses as -(2**2).
      case TOp("-") => next(); EUnop("-", binopRight(8))
      case _ => postfixed()
    }
    e.line = ln
    e
  }

  private def postfixed(): Expr = {
    var e = simple()
    var go = true
    while (go) {
      // WSL DOT: a newline directly before `.` continues the chain
      val save = p
      skipNl()
      if (at(".")) {
        eat(".")
        e = EPostfix(e, Seq(dotOp()))
      } else if (at("(") && save == p) {
        // funval call — only immediately adjacent (no newline crossed)
        e = EPostfix(e, Seq(PCall(argList())))
      } else {
        p = save
        go = false
      }
    }
    e
  }

  private def dotOp(): PostOp = peek() match {
    case TIdent("where") =>
      next(); eat("("); skipNl(); val pr = expression(); skipNl(); eat(")"); PWhere(pr)
    case TIdent("while") =>
      next(); eat("("); skipNl(); val st = expression(); skipNl(); eat(")"); PWhile(st)
    case TIdent("order") =>
      next(); eat("("); skipNl()
      val terms = Seq.newBuilder[OrderTerm]
      while (!at(")")) {
        val grp = if (at("%")) { eat("%"); true } else false
        val desc = if (at("-")) { eat("-"); true } else false
        terms += OrderTerm(eatIdent(), desc, grp)
        if (at(",")) { eat(","); skipNl() }
      }
      eat(")")
      POrder(terms.result())
    case TIdent("select") =>
      next()
      val (star, terms) = transformBody()
      PSelect(star, terms)
    case TOp("{") =>
      val (star, terms) = transformBody()
      PSelect(star, terms)
    case TIdent(n) =>
      next()
      if (at("(")) PDot(n, Some(argList())) else PDot(n, None)
    case t => sys.error(s"expected postfix op at line ${t.line}, got $t")
  }

  /** `{ [*] term, … }` or `( [*] term, … )` transform body. */
  private def transformBody(): (Boolean, Seq[Term]) = {
    val close = if (at("(")) { eat("("); ")" } else { eat("{"); "}" }
    skipNl()
    var star = false
    if (at("*")) { star = true; next(); if (at(",")) eat(","); skipNl() }
    val terms = Seq.newBuilder[Term]
    while (!at(close)) {
      terms += transformTerm(close)
      if (at(",")) { eat(","); skipNl() }
      skipNl()
    }
    eat(close)
    (star, terms.result())
  }

  private def transformTerm(close: String): Term = peek() match {
    case TIdent(n) if !keywords(n) && (peek(1) match {
      case TOp(s) => s == "," || s == close
      case _: TNewline => true
      case _ => false
    }) => next(); TProj(n)
    case TIdent(n) if !keywords(n) && (peek(1) match {
      case TOp(":=") => true; case _ => false
    }) =>
      next(); eat(":="); skipNl()
      val e = expression()
      e match {
        case EVar(old) if at(",") || at(close) => TRename(n, old)
        case _ => TExtend(n, e)
      }
    case _ => TLift(expression())
  }

  private def argList(): Seq[Expr] = {
    eat("(")
    skipNl()
    val args = Seq.newBuilder[Expr]
    while (!at(")")) {
      args += expression()
      skipNl()
      if (at(",")) { eat(","); skipNl() }
    }
    eat(")")
    args.result()
  }

  // ------------------------------------------------------------- primaries

  private def simple(): Expr = {
    val ln = peek().line
    val e = peek() match {
      case TNum(v) => next(); ENum(v)
      case TText(s) => next(); EText(s)
      case TTime(s) => next(); ETimeLit(s)
      case TBin(h) => next(); EBinLit(h)
      case TIdent("true") => next(); EBool(true)
      case TIdent("false") => next(); EBool(false)
      case TIdent("def") if (peek(1) match {
        case TOp("(") => true; case _ => false
      }) => funLiteral()
      case TIdent("do") if peek(1) == TOp("{") || (peek(1) match {
        case TOp("{") => true; case _: TNewline => true; case _ => false
      }) => next(); doBlock()
      case TIdent("if") if peek(1) == TOp("(") || (peek(1) match {
        case TOp("(") => true; case _ => false
      }) =>
        next(); eat("("); skipNl()
        val c = expression(); skipNl(); eat(","); skipNl()
        val a = expression(); skipNl(); eat(","); skipNl()
        val b = expression(); skipNl(); eat(")")
        EIf(c, a, b)
      case TIdent("fold") if (peek(1) match {
        case TOp("(") => true; case _ => false
      }) =>
        next(); eat("("); skipNl()
        val op = next() match {
          case TOp(s) => s
          case TIdent(n) => n
          case t => sys.error(s"foldable operator expected at line ${t.line}")
        }
        skipNl(); eat(","); skipNl()
        val v = expression(); skipNl(); eat(")")
        EFold(op, v)
      case TIdent("rel") | TIdent("relation") =>
        next()
        if (at(":")) {
          eat(":")
          val tr = typeRef()
          eat("(")
          skipNl()
          val rows = exprRows()
          eat(")")
          ERelHeaded(Some(tr), rows)
        } else {
          eat("(")
          skipNl()
          val tuples = Seq.newBuilder[Expr]
          while (!at(")")) {
            tuples += expression()
            if (at(",")) { eat(","); skipNl() }
          }
          eat(")")
          ERelOf(tuples.result())
        }
      case TIdent("tup") | TIdent("tuple") =>
        next(); eat("("); skipNl()
        val terms = rowTerms(")")
        eat(")")
        ETuple(terms)
      case TOp("{") if (peekThroughNl(1) match {
        case TOp("{") => true; case _ => false
      }) => tableLiteral()
      case TOp("{") =>
        eat("{"); skipNl()
        val terms = rowTerms("}")
        eat("}")
        ETuple(terms)
      case TOp("(") =>
        eat("("); skipNl()
        val e0 = expression()
        skipNl(); eat(")")
        e0
      case TIdent(n) if !keywords(n) =>
        next()
        if (at("(")) ECall(n, argList()) else EVar(n)
      case t => sys.error(s"unexpected token at line ${t.line}: $t")
    }
    e.line = ln
    e
  }

  /** `{{…}}` family (outer `{` not yet consumed). */
  private def tableLiteral(): Expr = {
    eat("{") // outer
    skipNl()
    // inner starts with `{`
    require(at("{"), s"table literal expected at line ${peek().line}")
    // {{:}} or {{:}(rows)} — empty heading
    if (peek(1) == TOp(":") || (peek(1) match { case TOp(":") => true; case _ => false })) {
      eat("{"); eat(":"); eat("}")
      val rows = if (at("(")) exprRows() else Nil
      skipNl(); eat("}")
      return ERelHeaded(Some(TRTupHeading(Nil)), rows.map(_.toSeq))
    }
    // {{ name : … }} → headed body; else row list
    val headed = peek(1) match {
      case TIdent(_) => peek(2) match {
        case TOp(":") => true
        case _ => false
      }
      case _ => false
    }
    if (headed) {
      eat("{")
      val h = heading()
      eat("}")
      skipNl()
      val rows = exprRows()
      skipNl(); eat("}")
      ERelHeaded(Some(TRTupHeading(h)), rows)
    } else {
      // row list: {…},{…} or variable names
      val rows = Seq.newBuilder[Expr]
      var go = true
      while (go) {
        skipNl()
        peek() match {
          case TOp("{") =>
            eat("{"); skipNl()
            val terms = rowTerms("}")
            eat("}")
            rows += ETuple(terms)
          case TIdent(n) => next(); rows += EVar(n)
          case t => sys.error(s"row expected at line ${t.line}")
        }
        skipNl()
        if (at(",")) { eat(","); skipNl(); if (at("}")) go = false } // trailing comma
        else go = false
      }
      skipNl()
      eat("}")
      ERelRows(rows.result())
    }
  }

  /** `(a, b), (c, d), …` expression rows (trailing comma ok). */
  private def exprRows(): Seq[Seq[Expr]] = {
    val rows = Seq.newBuilder[Seq[Expr]]
    skipNl()
    while (at("(")) {
      eat("(")
      skipNl()
      val vals = Seq.newBuilder[Expr]
      while (!at(")")) {
        vals += expression()
        if (at(",")) { eat(","); skipNl() }
      }
      eat(")")
      rows += vals.result()
      skipNl()
      if (at(",")) { eat(","); skipNl() }
    }
    rows.result()
  }

  /** Tuple-literal terms `a := e, …` (bare field copies are legal too). */
  private def rowTerms(close: String): Seq[Term] = {
    val terms = Seq.newBuilder[Term]
    while (!at(close)) {
      peek() match {
        case TOp("*") => next(); terms += TStar
        case TIdent(n) if (peek(1) match {
          case TOp(":=") => true; case _ => false
        }) =>
          next(); eat(":="); skipNl()
          terms += TExtend(n, expression())
        case TIdent(n) if (peek(1) match {
          case TOp(s) => s == "," || s == close
          case _ => false
        }) => next(); terms += TProj(n)
        case t => sys.error(s"tuple term expected at line ${t.line}: $t")
      }
      skipNl()
      if (at(",")) { eat(","); skipNl() }
    }
    terms.result()
  }

  private def doBlock(): Expr = {
    skipNl()
    eat("{")
    val stmts = Seq.newBuilder[Stmt]
    skipNl()
    while (!at("}")) {
      stmts += statement()
      skipNl()
    }
    eat("}")
    EDo(stmts.result())
  }
}

object AndlParser {
  /** Binary-operator precedence (SymbolTable.cs:455-541). */
  val precedence: Map[String, Int] = Map(
    "**" -> 9,
    "*" -> 7, "/" -> 7, "div" -> 7, "mod" -> 7,
    "+" -> 6, "-" -> 6,
    "&" -> 5,
    "join" -> 5, "compose" -> 5, "divide" -> 5, "rdivide" -> 5,
    "semijoin" -> 5, "rsemijoin" -> 5, "ajoin" -> 5, "rajoin" -> 5,
    "ajoinl" -> 5, "rajoinr" -> 5, "union" -> 5, "intersect" -> 5,
    "symdiff" -> 5, "minus" -> 5, "rminus" -> 5,
    "matching" -> 5, "notmatching" -> 5, "joinlr" -> 5, "joinlc" -> 5,
    "joinl" -> 5, "joincr" -> 5, "joinr" -> 5,
    "=" -> 4, "<>" -> 4, ">" -> 4, ">=" -> 4, "<" -> 4, "<=" -> 4,
    "=~" -> 4, "sub" -> 4, "sup" -> 4, "sep" -> 4,
    "and" -> 3,
    "or" -> 2, "xor" -> 2)

  val dyadicOps: Set[String] = Set("union", "intersect", "symdiff", "minus", "rminus")

  val typeNames: Set[String] = Set("text", "number", "bool", "time", "binary")

  def parse(src: String, filename: String): Seq[Stmt] =
    new AndlParser(AndlLexer.lex(src, filename)).parseScript()
}
