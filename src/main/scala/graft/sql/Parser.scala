package graft.sql

import Ast._

/** Hand-written lexer + recursive-descent parser for the SELECT subset of
  * the reference's SQL dialect (grammar
  * engine/src/main/antlr4/.../SQLParser.g4; the reference parses with
  * ANTLR + an AST builder, query/sql/antlr/SQLAntlrParser.java — a
  * recursive-descent parser keeps this library dependency-free and the
  * subset is LL(1) except the one-token lookaheads handled inline).
  *
  * Precedence (low→high): OR, AND, NOT, comparison/predicate,
  * additive, multiplicative, unary minus, postfix (.method()), primary.
  */
object Parser {

  final case class ParseException(msg: String) extends RuntimeException(msg)

  // ---------------- lexer ----------------
  sealed trait Tok
  final case class TId(s: String)    extends Tok // identifier or keyword (upper-matched)
  final case class TNum(s: String)   extends Tok
  final case class TStr(s: String)   extends Tok
  final case class TOp(s: String)    extends Tok
  case object TEof                   extends Tok

  /** `dashComments`: treat `-- …` as a line comment — the SQL dialect's
    * standard form (QueryTest.scan). MUST stay off for shared-lexer
    * front-ends: openCypher patterns use `--` for undirected edges. */
  private[graft] def lex(input: String, dashComments: Boolean = false): Vector[Tok] =
    lexWithOffsets(input, dashComments)._1

  /** Lex plus each token's start offset in `input` (TEof → length) — lets
    * a front-end recover an expression's verbatim source span (openCypher
    * default column names are the item's source text). */
  private[graft] def lexWithOffsets(input: String,
      dashComments: Boolean = false): (Vector[Tok], Vector[Int]) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Tok]
    val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    val n = input.length
    while (i < n) {
      val tokStart = i
      val c = input(i)
      if (c.isWhitespace) i += 1
      // `//` and `--` line comments plus `/* */` blocks (openCypher; the
      // reference's SQL grammar accepts the SQL `--` and C-style forms —
      // QueryTest.scan embeds a `-- comment` mid-statement)
      else if (c == '/' && i + 1 < n && input(i + 1) == '/') {
        while (i < n && input(i) != '\n') i += 1
      }
      else if (dashComments && c == '-' && i + 1 < n && input(i + 1) == '-' &&
          (i + 2 >= n || input(i + 2) == ' ' || input(i + 2) == '\t' ||
            input(i + 2) == '\r' || input(i + 2) == '\n')) {
        // `-- comment` needs trailing whitespace/EOL so the MATCH
        // statement's anonymous arrows `-->` / `<--` still lex as operators
        while (i < n && input(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && input(i + 1) == '*') {
        val j = input.indexOf("*/", i + 2)
        if (j < 0) throw ParseException("unterminated block comment")
        i = j + 2
      }
      else if (c.isLetter || c == '_' || c == '@' || c == '$' || c == '`') {
        if (c == '`') { // quoted identifier
          val j = input.indexOf('`', i + 1)
          if (j < 0) throw ParseException("unterminated quoted identifier")
          out += TId(input.substring(i + 1, j)); i = j + 1
        } else {
          var j = i + 1
          while (j < n && (input(j).isLetterOrDigit || input(j) == '_')) j += 1
          out += TId(input.substring(i, j)); i = j
        }
      } else if (c.isDigit) {
        // hex / octal integer literals (reference SQL + openCypher forms)
        if (c == '0' && i + 1 < n && (input(i + 1) == 'x' || input(i + 1) == 'X')) {
          var j = i + 2
          while (j < n && (input(j).isDigit || ('a' to 'f').contains(input(j).toLower))) j += 1
          if (j == i + 2) throw ParseException("invalid hex literal")
          // magnitude as decimal text — 64-bit range enforcement happens
          // at translation where a unary minus is visible (-0x8000… is
          // the valid smallest long, +0x8000… is an overflow)
          out += TNum(BigInt(input.substring(i + 2, j), 16).toString); i = j
        } else if (c == '0' && i + 1 < n && (input(i + 1) == 'o' || input(i + 1) == 'O')) {
          var j = i + 2
          while (j < n && input(j) >= '0' && input(j) <= '7') j += 1
          if (j == i + 2) throw ParseException("invalid octal literal")
          out += TNum(BigInt(input.substring(i + 2, j), 8).toString); i = j
        } else {
          var j = i + 1
          // a `..` pair is the range operator, not part of the number
          while (j < n && (input(j).isDigit ||
            (input(j) == '.' && !(j + 1 < n && input(j + 1) == '.')))) j += 1
          // scientific exponent: 1e5 / 2.5E-3 — consumed only when a
          // well-formed exponent actually follows, so `1 eq` still lexes
          // as number + identifier
          if (j < n && (input(j) == 'e' || input(j) == 'E')) {
            var k = j + 1
            if (k < n && (input(k) == '+' || input(k) == '-')) k += 1
            if (k < n && input(k).isDigit) {
              while (k < n && input(k).isDigit) k += 1
              j = k
            }
          }
          out += TNum(input.substring(i, j)); i = j
        }
      } else if (c == '\'' || c == '"') {
        // single- or double-quoted string (PromQL uses double quotes; the
        // reference SQL accepts both); '' / "" escape the quote char
        val sb = new StringBuilder
        var j = i + 1
        var closed = false
        while (j < n && !closed) {
          if (input(j) == c && j + 1 < n && input(j + 1) == c) { sb += c; j += 2 }
          else if (input(j) == c) { closed = true; j += 1 }
          else if (input(j) == '\\' && j + 1 < n) {
            // backslash escapes (openCypher string grammar). Unknown
            // escapes keep the backslash so regex-bearing dialect strings
            // ('\d' etc.) pass through unchanged; \u demands 4 hex digits.
            input(j + 1) match {
              case '\\' => sb += '\\'; j += 2
              case '\'' => sb += '\''; j += 2
              case '"'  => sb += '"'; j += 2
              case 'n'  => sb += '\n'; j += 2
              case 'r'  => sb += '\r'; j += 2
              case 't'  => sb += '\t'; j += 2
              case 'b'  => sb += '\b'; j += 2
              case 'f'  => sb += '\f'; j += 2
              case 'u'  =>
                if (j + 5 >= n || !input.substring(j + 2, j + 6).forall(ch =>
                    ch.isDigit || ('a' to 'f').contains(ch.toLower)))
                  throw ParseException(s"invalid unicode escape in string literal")
                sb += Integer.parseInt(input.substring(j + 2, j + 6), 16).toChar; j += 6
              case other => sb += '\\'; sb += other; j += 2
            }
          }
          else { sb += input(j); j += 1 }
        }
        if (!closed) throw ParseException("unterminated string literal")
        out += TStr(sb.toString); i = j
      } else if (c == '.' && i + 1 < n && input(i + 1).isDigit) {
        // fraction-only float literal `.5` (both dialects allow it)
        var j = i + 1
        while (j < n && input(j).isDigit) j += 1
        if (j < n && (input(j) == 'e' || input(j) == 'E')) {
          var k = j + 1
          if (k < n && (input(k) == '+' || input(k) == '-')) k += 1
          if (k < n && input(k).isDigit) { while (k < n && input(k).isDigit) k += 1; j = k }
        }
        out += TNum(input.substring(i, j)); i = j
      } else {
        val three = if (i + 2 < n) input.substring(i, i + 3) else ""
        val two = if (i + 1 < n) input.substring(i, i + 2) else ""
        if (three == "<=>") { out += TOp(three); i += 3 } // null-safe equals
        else if (three == "...") { out += TOp(three); i += 3 } // inclusive range
        else if (Seq("<>", "<=", ">=", "!=", "||", "=~", "!~", "..").contains(two)) { out += TOp(two); i += 2 }
        else { out += TOp(c.toString); i += 1 }
      }
      while (offs.length < out.length) offs += tokStart
    }
    out += TEof
    offs += n
    (out.toVector, offs.toVector)
  }

  // ---------------- parser state ----------------
  private[graft] final class P(toks: Vector[Tok]) {
    var pos = 0
    /** Set together (by [[lexWithOffsets]] callers) to enable
      * [[spanFrom]] — verbatim source recovery for default column
      * labels. Slice-parsers that re-tokenize leave them null. */
    var src: String = null
    var offs: Vector[Int] = null
    /** Verbatim source text of tokens [startTok, pos), outer-trimmed. */
    def spanFrom(startTok: Int): String =
      src.substring(offs(startTok), offs(pos)).trim
    def peek: Tok = toks(pos)
    /** Lookahead without consuming; clamped to EOF. */
    def peekAt(n: Int): Tok = toks(math.min(pos + n, toks.length - 1))
    def next(): Tok = { val t = toks(pos); pos += 1; t }
    def kw(s: String): Boolean = peek match {
      case TId(id) if id.equalsIgnoreCase(s) => pos += 1; true
      case _ => false
    }
    def peekKw(s: String): Boolean = peek match {
      case TId(id) => id.equalsIgnoreCase(s)
      case _ => false
    }
    def expectKw(s: String): Unit =
      if (!kw(s)) throw ParseException(s"expected $s, found $peek")
    def op(s: String): Boolean = peek match {
      case TOp(o) if o == s => pos += 1; true
      case _ => false
    }
    def expectOp(s: String): Unit =
      if (!op(s)) throw ParseException(s"expected '$s', found $peek")
  }

  /** Parse one SELECT statement. */
  def parse(sql: String): Select = {
    val p = new P(lex(sql, dashComments = true))
    val sel = parseSelect(p)
    if (p.peek != TEof) throw ParseException(s"trailing input at ${p.peek}")
    sel
  }

  /** Substitute positional `?` and named `:name` parameters with literal
    * tokens ahead of parsing (reference selectFromStringParam /
    * namedParams — BaseExpression PARAM forms). A `:` opens a named
    * parameter only after an operator token (never after an identifier or
    * a closer), which keeps map literals `{k: v}` and nested projections
    * `e:{...}` untouched. */
  private[graft] def bindParams(toks: Vector[Tok], pos: Seq[Any],
      named: Map[String, Any]): Vector[Tok] = {
    def litTok(v: Any): Tok = v match {
      case null                => TId("null")
      case s: String           => TStr(s)
      case b: java.lang.Boolean => TId(b.toString)
      case n: java.lang.Number => TNum(n.toString)
      case other               => TStr(other.toString)
    }
    val out = Vector.newBuilder[Tok]
    var i = 0
    var p = 0
    def prevOpensParam: Boolean = i == 0 || (toks(i - 1) match {
      case TOp(")" | "]" | "}") => false
      case TOp(_)               => true
      case _                    => false
    })
    while (i < toks.length) {
      toks(i) match {
        case TOp("?") =>
          if (p >= pos.length)
            throw ParseException(s"missing positional parameter #${p + 1}")
          out += litTok(pos(p)); p += 1; i += 1
        case TOp(":") if i + 1 < toks.length && prevOpensParam &&
            (toks(i + 1) match { case TId(n) => named.contains(n); case _ => false }) =>
          out += litTok(named(toks(i + 1).asInstanceOf[TId].s)); i += 2
        case t => out += t; i += 1
      }
    }
    out.result()
  }

  /** Substitute parameters directly in SQL TEXT (for the statement/DML
    * path, which re-lexes per dispatch arm): literal splicing at the
    * lexer's token offsets, so string bodies and comments are never
    * touched. Same opener rule as [[bindParams]]. */
  private[graft] def substituteParams(sql: String, pos: Seq[Any],
      named: Map[String, Any]): String = {
    val (toks, offs) = lexWithOffsets(sql, dashComments = true)
    def render(v: Any): String = v match {
      case null                 => "null"
      case s: String            => "'" + s.replace("'", "''") + "'"
      case b: java.lang.Boolean => b.toString
      case n: java.lang.Number  => n.toString
      case m: scala.collection.Map[_, _] =>
        // map payloads (UPDATE … MERGE :payload) render as embedded-doc
        // literals; the reference rejects non-string keys
        // (UpdateMergeTest.updateMergeWithNonStringKeyMapFails)
        m.map { case (k, mv) =>
          if (!k.isInstanceOf[String])
            throw ParseException(s"map parameter keys must be strings, got $k")
          "'" + k.toString.replace("'", "''") + "': " + render(mv)
        }.mkString("{", ", ", "}")
      case s: scala.collection.Seq[_] => s.map(render).mkString("[", ", ", "]")
      case other                => "'" + other.toString.replace("'", "''") + "'"
    }
    val sb = new StringBuilder
    var cursor = 0
    var i = 0
    var p = 0
    // keywords that directly precede a value position (`MERGE :payload`,
    // `CONTENT :doc`, `FROM :rid`, `RETURN :x`) also open a parameter
    val kwOpeners = Set("MERGE", "CONTENT", "VALUES", "RETURN", "FROM",
      "WHERE", "AND", "OR", "NOT", "IN", "LIKE", "ILIKE", "BETWEEN",
      "THEN", "ELSE", "WHEN", "SET", "TO")
    def prevOpensParam: Boolean = i == 0 || (toks(i - 1) match {
      case TOp(")" | "]" | "}") => false
      case TOp(_)               => true
      case TId(s)               => kwOpeners.contains(s.toUpperCase)
      case _                    => false
    })
    while (i < toks.length) {
      toks(i) match {
        case TOp("?") =>
          if (p >= pos.length)
            throw ParseException(s"missing positional parameter #${p + 1}")
          sb.append(sql.substring(cursor, offs(i))).append(render(pos(p)))
          cursor = offs(i) + 1; p += 1; i += 1
        case TOp(":") if i + 1 < toks.length && prevOpensParam &&
            (toks(i + 1) match { case TId(n) => named.contains(n); case _ => false }) =>
          val name = toks(i + 1).asInstanceOf[TId].s
          sb.append(sql.substring(cursor, offs(i))).append(render(named(name)))
          cursor = offs(i + 1) + name.length; i += 2
        case _ => i += 1
      }
    }
    sb.append(sql.substring(cursor)).toString
  }

  /** Parse a SELECT from pre-substituted tokens (the parameter-binding
    * path). */
  private[graft] def parseSelectTokens(toks: Vector[Tok]): Select = {
    val p = new P(toks)
    val sel = parseSelect(p)
    if (p.peek != TEof) throw ParseException(s"trailing input at ${p.peek}")
    sel
  }

  /** Parse one statement: SELECT or a DML statement (INSERT/UPDATE/DELETE
    * — reference grammar SQLParser.g4 insertStatement:312,
    * updateStatement:284, deleteStatement:334). */
  def parseStatement(sql: String): Either[Select, Stmt] = {
    val p = new P(lex(sql, dashComments = true))
    val r = parseOneStatement(p)
    if (p.peek != TEof) throw ParseException(s"trailing input at ${p.peek}")
    r
  }

  /** One SELECT/INSERT/UPDATE/DELETE from the current position (shared by
    * [[parseStatement]] and the script executor). */
  private[graft] def parseOneStatement(p: P): Either[Select, Stmt] = {
    val r: Either[Select, Stmt] =
      if (p.peekKw("SELECT")) Left(parseSelect(p))
      else if (p.kw("INSERT")) {
        p.expectKw("INTO")
        val t = ident(p)
        val cols = if (p.op("(")) {
          val b = Seq.newBuilder[String]
          b += ident(p)
          while (p.op(",")) b += ident(p)
          p.expectOp(")")
          b.result()
        } else Seq.empty
        val ins: Either[Select, Stmt] = if (p.kw("VALUES")) {
          val rows = Seq.newBuilder[Seq[Expr]]
          var more = true
          while (more) {
            p.expectOp("(")
            rows += parseExprList(p)
            p.expectOp(")")
            more = p.op(",")
          }
          Right(InsertStmt(t, cols, rows.result(), None))
        } else if (p.kw("SET")) {
          // `INSERT INTO t SET a = 1, b = 'x'` — the reference's dominant
          // insert form (InsertStatementExecutionTest and most others)
          val pairs = Seq.newBuilder[(String, Expr)]
          var more = true
          while (more) {
            val c = ident(p)
            p.expectOp("=")
            pairs += c -> parseExpr(p)
            more = p.op(",")
          }
          val ps = pairs.result()
          Right(InsertStmt(t, ps.map(_._1), Seq(ps.map(_._2)), None))
        } else if (p.kw("CONTENT")) {
          // `INSERT INTO t CONTENT {…}` or `CONTENT [{…}, {…}]` — each
          // embedded document becomes one row (InsertContent* tests)
          val e = parseExpr(p)
          val docs = e match { case ArrayLit(es) => es; case x => Seq(x) }
          Right(InsertStmt(t, Seq.empty, Seq.empty, None, docs))
        } else {
          p.kw("FROM") // the dialect's optional `INSERT INTO t FROM SELECT …`
          Right(InsertStmt(t, cols, Seq.empty, Some(parseSelect(p))))
        }
        // optional `RETURN @this` (InsertReturnTest.java): INSERT already
        // returns the inserted records — accept and discard the clause
        if (p.kw("RETURN")) {
          p.op("@") // tokenizers may split `@this` into `@` + `this`
          val what = ident(p)
          if (!what.equalsIgnoreCase("this") && !what.equalsIgnoreCase("@this"))
            throw ParseException(s"INSERT RETURN supports @this, got $what")
        }
        ins
      } else if (p.kw("UPDATE")) {
        val t = ident(p)
        // operation clauses in any order: SET / REMOVE / CONTENT / MERGE
        // (the reference grammar allows a sequence of update operations)
        val sets = Seq.newBuilder[(String, Expr)]
        val removes = Seq.newBuilder[UpdateRemove]
        var content: Option[Expr] = None
        var mergeE: Option[Expr] = None
        var ops = true
        while (ops) {
          if (p.kw("SET")) {
            var more = true
            while (more) {
              val c = ident(p)
              // compound assignment `x += n` / `x -= n`
              // (SQLScriptTest.incrementAndLet; grammar updateItem)
              if (p.op("+")) { p.expectOp("="); sets += c -> Bin("+", Ident(c), parseExpr(p)) }
              else if (p.op("-")) { p.expectOp("="); sets += c -> Bin("-", Ident(c), parseExpr(p)) }
              else { p.expectOp("="); sets += c -> parseExpr(p) }
              more = p.op(",")
            }
          } else if (p.kw("REMOVE")) {
            // `REMOVE m = k` (map key / list value), `REMOVE l[i, …]`
            // (map key(s) / list index(es)), bare `REMOVE p` (whole prop)
            var more = true
            while (more) {
              val c = ident(p)
              if (p.op("=")) removes += UpdateRemove(c, "eq", Seq(parseExpr(p)))
              else if (p.op("[")) {
                val ks = parseExprList(p); p.expectOp("]")
                removes += UpdateRemove(c, "bracket", ks)
              }
              else removes += UpdateRemove(c, "all", Seq.empty)
              more = p.op(",")
            }
          } else if (p.kw("CONTENT")) content = Some(parseExpr(p))
          else if (p.kw("MERGE")) mergeE = Some(parseExpr(p))
          else ops = false
        }
        // trailing modifiers in any order (the reference grammar fixes an
        // order; accepting any is a superset)
        var upsert = false
        var ret = "COUNT"
        var where: Option[Expr] = None
        var go = true
        while (go) {
          if (p.kw("UPSERT")) upsert = true
          else if (p.kw("RETURN")) {
            ret =
              if (p.kw("BEFORE")) "BEFORE"
              else if (p.kw("AFTER")) "AFTER"
              else { p.expectKw("COUNT"); "COUNT" }
            // optional record selector `RETURN AFTER @this` — the images
            // returned ARE the whole records (SQLScriptTest.incrementAndLet).
            // `@this` lexes as ONE identifier ('@' starts identifiers).
            p.peek match {
              case TId(id) if id.equalsIgnoreCase("@this") => p.next()
              case _ => ()
            }
          } else if (p.kw("WHERE")) where = Some(parseExpr(p))
          else go = false
        }
        Right(UpdateStmt(t, sets.result(), upsert, ret, where, removes.result(),
          content, mergeE))
      } else if (p.kw("DELETE")) {
        p.expectKw("FROM")
        val t = ident(p)
        val where = if (p.kw("WHERE")) Some(parseExpr(p)) else None
        Right(DeleteStmt(t, where))
      } else throw ParseException(s"expected SELECT/INSERT/UPDATE/DELETE, found ${p.peek}")
    r
  }

  private val Keywords = Set(
    "FROM", "WHERE", "GROUP", "HAVING", "ORDER", "SKIP", "OFFSET", "LIMIT",
    "BY", "ASC", "DESC", "AND", "OR", "NOT", "IN", "BETWEEN", "LIKE", "ILIKE",
    "MATCHES", "IS", "NULL", "TRUE", "FALSE", "DISTINCT", "SELECT", "AS",
    "UNWIND", "CONTAINS", "CONTAINSALL", "CONTAINSANY", "LET", "TIMEOUT")

  private[graft] def parseSelect(p: P): Select = {
    p.expectKw("SELECT")
    val distinct = p.kw("DISTINCT")
    // `SELECT From AS f FROM t`: a leading FROM followed by AS is a
    // PROPERTY named like the keyword, not the target clause (reference
    // ReservedKeywordPropertyNameTest, issue #5092)
    def fromIsProjection = p.peekKw("FROM") && (p.peekAt(1) match {
      case TId(id) => id.equalsIgnoreCase("AS")
      case _ => false
    })
    var excludes = Seq.empty[String]
    val projections =
      if (p.peekKw("FROM") && !fromIsProjection) Seq.empty
      else if (p.op("*")) {
        // `SELECT *, !a, !b` — star with exclusions (reference exclude(),
        // the top-level sibling of the nested `{*, !f}` projection)
        val exc = Seq.newBuilder[String]
        while (p.op(",")) { p.expectOp("!"); exc += ident(p) }
        excludes = exc.result()
        Seq.empty
      }
      else {
        val b = Seq.newBuilder[Projection]
        var more = true
        while (more) {
          val e = parseExpr(p)
          val alias = if (p.kw("AS")) Some(ident(p)) else p.peek match {
            case TId(id) if !Keywords.contains(id.toUpperCase) => p.pos += 1; Some(id)
            case _ => None
          }
          b += Projection(e, alias)
          more = p.op(",")
        }
        b.result()
      }
    // FROM is optional (reference selectNoTarget*): a target-less SELECT
    // evaluates its projections once against a one-row dual
    val (from, fromSub) =
      if (p.kw("FROM")) {
        // type name, or a derived table `FROM (SELECT …)`
        val t =
          if (p.op("(")) {
            val sub = parseSelect(p)
            p.expectOp(")")
            ("", Some(sub))
          } else {
            // `FROM schema:types|properties|indexes` — the introspection
            // pseudo-types (FetchFromSchemaTypesStep and siblings)
            val base = ident(p)
            if (base.equalsIgnoreCase("schema") && p.op(":"))
              (s"schema:${ident(p)}", None)
            else (base, None)
          }
        // optional target alias `FROM v [AS] v1` — parsed and discarded,
        // matching the reference exactly (FromAliasTest.java: "alias
        // parsing works, but execution engine doesn't use it yet"); a bare
        // identifier is an alias only when it isn't a clause keyword
        if (p.kw("AS")) ident(p)
        else p.peek match {
          case TId(id) if !Keywords.contains(id.toUpperCase) => ident(p)
          case _ => ()
        }
        t
      } else ("", None)
    val lets = if (p.kw("LET")) {
      val b = Seq.newBuilder[(String, Expr)]
      var more = true
      while (more) {
        val n = ident(p)
        p.expectOp("=")
        b += n -> parseExpr(p)
        more = p.op(",")
      }
      b.result()
    } else Seq.empty
    val where = if (p.kw("WHERE")) Some(parseExpr(p)) else None
    // GROUP BY [ROLLUP(...) | CUBE(...) | GROUPING SETS ((...), ...)] | exprs
    var groupKind = "plain"
    var groupSets: Seq[Seq[Expr]] = Seq.empty
    val groupBy = if (p.kw("GROUP")) {
      p.expectKw("BY")
      if (p.kw("ROLLUP")) {
        groupKind = "rollup"
        p.expectOp("("); val es = parseExprList(p); p.expectOp(")"); es
      } else if (p.kw("CUBE")) {
        groupKind = "cube"
        p.expectOp("("); val es = parseExprList(p); p.expectOp(")"); es
      } else if (p.kw("GROUPING")) {
        p.expectKw("SETS")
        groupKind = "sets"
        p.expectOp("(")
        val sets = Seq.newBuilder[Seq[Expr]]
        var more = true
        while (more) {
          p.expectOp("(")
          sets += (if (p.op(")")) Seq.empty else { val es = parseExprList(p); p.expectOp(")"); es })
          more = p.op(",")
        }
        p.expectOp(")")
        groupSets = sets.result()
        groupSets.flatten.distinct
      } else parseExprList(p)
    } else Seq.empty
    val having = if (p.kw("HAVING")) Some(parseExpr(p)) else None
    val unwind = if (p.kw("UNWIND")) Some(ident(p)) else None
    val orderBy = if (p.kw("ORDER")) {
      p.expectKw("BY")
      val b = Seq.newBuilder[OrderItem]
      var more = true
      while (more) {
        val e = parseExpr(p)
        // boolean direction parameters: `ORDER BY x true` = ASC, `false` =
        // DESC (reference OrderByDirectionParameterTest.java)
        val asc = if (p.kw("DESC") || p.kw("FALSE")) false
                  else { p.kw("ASC") || p.kw("TRUE"); true }
        b += OrderItem(e, asc)
        more = p.op(",")
      }
      b.result()
    } else Seq.empty
    val skip = if (p.kw("SKIP") || p.kw("OFFSET")) Some(longLit(p)) else None
    val limit = if (p.kw("LIMIT")) Some(longLit(p)) else None
    // TIMEOUT <ms> [RETURN|EXCEPTION] (reference Timeout.java) is accepted
    // and recorded nowhere: a Spark plan is lazy — wall-clock enforcement
    // belongs to the ACTION (job-group cancellation / spark.task.reaper),
    // not the plan, so the clause parses for compatibility and the caller's
    // scheduler owns the budget
    if (p.kw("TIMEOUT")) { longLit(p); if (!p.kw("RETURN")) p.kw("EXCEPTION") }
    Select(projections, from, where, groupBy, having, orderBy, skip, limit, distinct, unwind, lets,
      groupKind, groupSets, fromSub, excludes)
  }

  private[graft] def ident(p: P): String = p.next() match {
    case TId(s) => s
    case t => throw ParseException(s"expected identifier, found $t")
  }

  private[graft] def longLit(p: P): Long = p.next() match {
    case TNum(s) => s.toLong
    case t => throw ParseException(s"expected number, found $t")
  }

  private[graft] def parseExprList(p: P): Seq[Expr] = {
    val b = Seq.newBuilder[Expr]
    b += parseExpr(p)
    while (p.op(",")) b += parseExpr(p)
    b.result()
  }

  /** Bracket-extension hook: a front-end (Cypher) may install a handler
    * that is consulted right after a `[` is consumed, before core
    * list-literal parsing. The handler must restore `p.pos` and return
    * None when the bracket isn't its construct (e.g. a Cypher pattern
    * comprehension `[(a)-[:T]->(b) | …]`, which only the Cypher grammar
    * can recognize). ThreadLocal: parsing is per-query, driver-side. */
  private[graft] val bracketExt = new ThreadLocal[P => Option[Expr]]

  /** Brace-extension hook, consulted when `{` directly follows a parsed
    * identifier (before map-projection parsing): Cypher's
    * `EXISTS { <pattern> }` / `COUNT { <pattern> }` subquery blocks.
    * Same backtracking contract as [[bracketExt]]. */
  private[graft] val braceExt = new ThreadLocal[(P, Expr) => Option[Expr]]

  /** Paren-extension hook, consulted right after a `(` is consumed in
    * primary position, before ordinary parenthesized-expression parsing:
    * Cypher pattern predicates in general boolean positions
    * (`… OR (a)-[:T]->(b)`). The handler sees the cursor just past the
    * `(`; it must restore `p.pos` and return None when the construct
    * isn't its own. Same backtracking contract as [[bracketExt]]. */
  private[graft] val parenExt = new ThreadLocal[P => Option[Expr]]

  // precedence climbing
  private[graft] def parseExpr(p: P): Expr = parseOr(p)

  private def parseOr(p: P): Expr = {
    var l = parseXor(p)
    while (p.kw("OR")) l = Bin("OR", l, parseXor(p))
    l
  }

  /** openCypher XOR: binds between OR and AND (Cypher25Parser.g4
    * expression10/11; the SQL dialect simply never produces the token). */
  private def parseXor(p: P): Expr = {
    var l = parseAnd(p)
    while (p.kw("XOR")) l = Bin("XOR", l, parseAnd(p))
    l
  }

  private def parseAnd(p: P): Expr = {
    var l = parseNot(p)
    while (p.kw("AND")) l = Bin("AND", l, parseNot(p))
    l
  }

  private def parseNot(p: P): Expr =
    if (p.kw("NOT")) Not(parseNot(p)) else parseComparison(p)

  /** Comparison level. openCypher chains comparisons conjunctively:
    * `a < b < c` ≡ `a < b AND b < c`, and `x IS NULL = y IS NULL`
    * compares the two (tighter-binding) null predicates — TCK
    * Precedence1 [8][21][22], Boolean1 [5][7]. */
  private def parseComparison(p: P): Expr = {
    def nextOp(): Option[String] =
      if (p.op("=")) Some("=")
      else if (p.op("<=>")) Some("<=>") // null-safe equals (QueryTest)
      else if (p.op("<>") || p.op("!=")) Some("<>")
      else if (p.op("<=")) Some("<=")
      else if (p.op(">=")) Some(">=")
      else if (p.op("<")) Some("<")
      else if (p.op(">")) Some(">")
      else None
    var prev = parsePredicate(p)
    var acc: Expr = null
    var go = true
    while (go) nextOp() match {
      case Some(op) =>
        val r = parsePredicate(p)
        val cmp = Bin(op, prev, r)
        acc = if (acc == null) cmp else Bin("AND", acc, cmp)
        prev = r
      case None => go = false
    }
    if (acc == null) prev else acc
  }

  /** Postfix predicates — IS [NOT] NULL, IN, BETWEEN, LIKE, STARTS/ENDS
    * WITH, CONTAINS — bind tighter than comparison (openCypher
    * nullPredicate/listPredicate precedence, TCK Precedence1 [8][11])
    * and may stack (`x IS NULL IS NULL`). */
  private def parsePredicate(p: P): Expr = {
    var l = parseAdditive(p)
    var go = true
    while (go) {
      if (p.peekKw("NOT")) { // NOT IN / NOT LIKE / NOT BETWEEN
        p.pos += 1
        if (p.kw("IN")) {
          // `IN (e1, e2)` — SQL value list; `IN (SELECT …)` — subquery
          // membership; `IN <expr>` — openCypher list membership
          if (p.op("(")) {
            if (p.peekKw("SELECT")) {
              val s = parseSelect(p); p.expectOp(")")
              l = InList(l, Seq(Subquery(s)), negated = true)
            } else { val es = parseExprList(p); p.expectOp(")"); l = InList(l, es, negated = true) }
          }
          else l = Not(FnCall("list_in", Seq(l, parseAdditive(p))))
        }
        else if (p.kw("LIKE")) l = Not(LikeOp(l, parseAdditive(p), caseInsensitive = false))
        else if (p.kw("BETWEEN")) { val lo = parseAdditive(p); p.expectKw("AND"); l = Not(Between(l, lo, parseAdditive(p))) }
        else { p.pos -= 1; go = false } // the NOT belongs to an outer level
      }
      else if (p.kw("IN")) {
        if (p.op("(")) {
          if (p.peekKw("SELECT")) {
            val s = parseSelect(p); p.expectOp(")")
            l = InList(l, Seq(Subquery(s)), negated = false)
          } else { val es = parseExprList(p); p.expectOp(")"); l = InList(l, es, negated = false) }
        }
        else l = FnCall("list_in", Seq(l, parseAdditive(p)))
      }
      else if (p.kw("BETWEEN")) { val lo = parseAdditive(p); p.expectKw("AND"); l = Between(l, lo, parseAdditive(p)) }
      else if (p.kw("LIKE")) l = LikeOp(l, parseAdditive(p), caseInsensitive = false)
      else if (p.kw("ILIKE")) l = LikeOp(l, parseAdditive(p), caseInsensitive = true)
      else if (p.kw("MATCHES")) l = Matches(l, parseAdditive(p))
      // openCypher string predicates (Cypher25Parser.g4 stringPredicate) —
      // desugared to the registered starts_with/ends_with/str_contains fns
      else if (p.kw("STARTS")) { p.expectKw("WITH"); l = FnCall("starts_with", Seq(l, parseAdditive(p))) }
      else if (p.kw("ENDS")) { p.expectKw("WITH"); l = FnCall("ends_with", Seq(l, parseAdditive(p))) }
      else if (p.kw("CONTAINSALL")) l = ContainsOp(l, "ALL", parseAdditive(p))
      else if (p.kw("CONTAINSANY")) l = ContainsOp(l, "ANY", parseAdditive(p))
      else if (p.kw("CONTAINS")) l = ContainsOp(l, "ONE", parseAdditive(p))
      else if (p.kw("IS")) {
        val neg = p.kw("NOT")
        // `IS [NOT] DEFINED` (reference isDefined()/isNotDefined()): on
        // this engine's columnar records "defined" approximates to
        // non-null — a property explicitly set to null and an absent one
        // are the same stored state (the reference's document bags can
        // tell them apart; Parquet columns cannot)
        if (p.kw("DEFINED")) l = IsNull(l, negated = !neg)
        else { p.expectKw("NULL"); l = IsNull(l, negated = neg) }
      }
      else go = false
    }
    l
  }

  private def parseAdditive(p: P): Expr = {
    var l = parseMultiplicative(p)
    var go = true
    while (go) {
      if (p.op("+")) l = Bin("+", l, parseMultiplicative(p))
      else if (p.op("-")) l = Bin("-", l, parseMultiplicative(p))
      else if (p.op("||")) l = Bin("||", l, parseMultiplicative(p))
      else go = false
    }
    l
  }

  private def parseMultiplicative(p: P): Expr = {
    var l = parsePower(p)
    var go = true
    while (go) {
      if (p.op("*")) l = Bin("*", l, parsePower(p))
      else if (p.op("/")) l = Bin("/", l, parsePower(p))
      else if (p.op("%")) l = Bin("%", l, parsePower(p))
      else go = false
    }
    l
  }

  /** `^` exponentiation — binds tighter than `*`, LEFT-associative
    * (`4 ^ 6 ^ 3` ≡ `(4 ^ 6) ^ 3`, TCK Precedence2 [2][3]; openCypher
    * powerOfExpression; the SQL dialect has no `^`). */
  private def parsePower(p: P): Expr = {
    var l = parseUnary(p)
    while (p.op("^")) l = Bin("^", l, parseUnary(p))
    l
  }

  private def parseUnary(p: P): Expr =
    if (p.op("-")) Neg(parseUnary(p))
    else if (p.op("+")) parseUnary(p) // unary plus is a no-op (reference UnaryOperationsTest)
    else parsePostfix(p)

  private def parsePostfix(p: P): Expr = {
    var e = parsePrimary(p)
    var go = true
    while (go) {
      if (p.op(".")) {
        val m = ident(p)
        if (p.op("(")) {
          val args = if (p.op(")")) Seq.empty else { val a = parseExprList(p); p.expectOp(")"); a }
          e = MethodCall(e, m, args)
        } else e = PropAccess(e, m)
      } else if (p.peek == TOp("{") && e.isInstanceOf[Ident] &&
          Option(braceExt.get()).flatMap(h => h(p, e)).map { e2 => e = e2; true }
            .getOrElse(false)) {
        // front-end brace construct consumed (EXISTS{}/COUNT{}); continue
      } else if (p.peek == TOp("{") && e.isInstanceOf[Ident]) {
        // Cypher map projection `n{.name, key: expr}` (Cypher25Parser.g4
        // mapProjection) — desugars to a struct literal; only valid
        // immediately after a variable, so it never collides with the
        // primary-position document literal `{'k': v}`
        p.expectOp("{")
        val b = Seq.newBuilder[(String, Expr)]
        if (!p.op("}")) {
          var more = true
          while (more) {
            if (p.op(".")) { val f = ident(p); b += f -> PropAccess(e, f) }
            else { val k = ident(p); p.expectOp(":"); b += k -> parseExpr(p) }
            more = p.op(",")
          }
          p.expectOp("}")
        }
        e = StructLit(b.result())
      } else if (p.peek == TOp("[")) {
        // subscript `e[i]` (0-based, openCypher) / slice `e[lo..hi]`
        // (end-exclusive; negatives count from the end; open ends default
        // to 0/size; any expression can bound a slice — `l[$from..$to]`)
        p.expectOp("[")
        val sizeE = FnCall("size", Seq(e))
        def sliceOf(lo: Expr, hi: Expr): Expr = FnCall("list_slice", Seq(e, lo, hi))
        def hiOrEnd(): Expr = if (p.peek == TOp("]")) sizeE else parseExpr(p)
        // `...` is the reference's END-INCLUSIVE range (testEllipsis:
        // name[0...2] keeps 3 elements) vs end-exclusive `..`
        def incl(hi: Expr): Expr =
          Bin("+", hi, NumLit(1, isIntegral = true))
        // condition selectors keep matching ELEMENTS (reference
        // simpleCollectionFiltering: coll[='foo'], coll[<'ccc'],
        // coll[LIKE 'ba%'], coll[in ['bar']]) — compiled to the list
        // comprehension (→ higher-order filter, stays in codegen)
        def elemComp(mk: Expr => Expr): Expr =
          ListComp("__sel", e, Some(mk(Ident("__sel"))), None)
        def binSel(op: String): Expr = elemComp(x => Bin(op, x, parseAdditive(p)))
        val condSel: Option[Expr] =
          if (p.op("=")) Some(binSel("="))
          else if (p.op("<>") || p.op("!=")) Some(binSel("<>"))
          else if (p.op("<=")) Some(binSel("<="))
          else if (p.op(">=")) Some(binSel(">="))
          else if (p.op("<")) Some(binSel("<"))
          else if (p.op(">")) Some(binSel(">"))
          else if (p.kw("LIKE"))
            Some(elemComp(x => LikeOp(x, parseAdditive(p), caseInsensitive = false)))
          else if (p.kw("ILIKE"))
            Some(elemComp(x => LikeOp(x, parseAdditive(p), caseInsensitive = true)))
          else if (p.kw("IN"))
            Some(elemComp(x => FnCall("list_in", Seq(x, parseAdditive(p)))))
          else None
        val out = condSel.getOrElse {
          if (p.op("...")) sliceOf(NumLit(0, isIntegral = true), incl(hiOrEnd()))
          else if (p.op("..")) sliceOf(NumLit(0, isIntegral = true), hiOrEnd())
          else {
            val ix = parseExpr(p)
            if (p.op("...")) sliceOf(ix, incl(hiOrEnd()))
            else if (p.op("..")) sliceOf(ix, hiOrEnd())
            else ix match {
              case s: StrLit => FnCall("map_index", Seq(e, s))
              case _ => FnCall("list_index", Seq(e, ix))
            }
          }
        }
        p.expectOp("]")
        e = out
      } else {
        // nested projection suffix `:{f1, f2 AS a}` / `:{*, !f}`
        // (NestedProjection.java) — only when ':' is followed by '{'
        val mark = p.pos
        if (p.op(":") && p.peek == TOp("{")) {
          p.expectOp("{")
          var star = false
          val inc = Seq.newBuilder[(String, Option[String])]
          val exc = Seq.newBuilder[String]
          var more = true
          while (more) {
            if (p.op("*")) star = true
            else if (p.op("!")) exc += ident(p)
            else {
              val f = ident(p)
              val al = if (p.kw("AS")) Some(ident(p)) else None
              inc += f -> al
            }
            more = p.op(",")
          }
          p.expectOp("}")
          e = NestedProj(e, inc.result(), exc.result(), star)
        } else if (labelTestExt.get != null && labelTestExt.get &&
            p.pos == mark + 1 && e.isInstanceOf[Ident] &&
            (p.peek match { case TId(_) => true; case _ => false })) {
          // Cypher label-test `v:Label` (expression position — WHERE
          // `n:Foo`, RETURN `(n:Foo)`; Cypher25Parser.g4 labelExpression)
          val labelVar = e
          e = FnCall("__labeltest", Seq(labelVar, StrLit(ident(p))))
          // conjunctive chain `v:A:B` — every label must match (TCK
          // Graph5 [3][4]; repeated labels collapse under AND)
          var chain = true
          while (chain) {
            val m2 = p.pos
            if (p.op(":") && (p.peek match { case TId(_) => true; case _ => false }))
              e = Bin("AND", e, FnCall("__labeltest", Seq(labelVar, StrLit(ident(p)))))
            else { p.pos = m2; chain = false }
          }
        } else { p.pos = mark; go = false }
      }
    }
    e
  }

  /** Enables the Cypher label-test postfix `v:Label` in [[parsePostfix]];
    * the SQL dialect keeps ':' exclusively for nested projections. */
  private[graft] val labelTestExt = new ThreadLocal[java.lang.Boolean]

  private def parsePrimary(p: P): Expr = p.next() match {
    // a '.' or an exponent marks a float literal (1e5 is float in both
    // dialects); bare digit runs are integral
    case TNum(s) => NumLit(BigDecimal(s), !s.contains('.') && !s.toLowerCase.contains('e'))
    case TStr(s) => StrLit(s)
    case TOp("(") =>
      Option(parenExt.get()).flatMap(ext => ext(p)) match {
        case Some(e) => e
        case None =>
          if (p.peekKw("SELECT")) { val s = parseSelect(p); p.expectOp(")"); Subquery(s) }
          else { val e = parseExpr(p); p.expectOp(")"); e }
      }
    case TOp("[") => // list literal | list comprehension | front-end ext
      Option(bracketExt.get()).flatMap(ext => ext(p)) match {
        case Some(e) => e
        case None =>
          // `[v IN list [WHERE p] [| m]]` — a leading identifier followed
          // by IN (with no parenthesized value list) is a comprehension
          val mark = p.pos
          val compVar = p.peek match {
            case TId(v) =>
              p.next()
              if (p.kw("IN")) Some(v) else { p.pos = mark; None }
            case _ => None
          }
          compVar match {
            case Some(v) =>
              val listE = parseExpr(p)
              val whereE = if (p.kw("WHERE")) Some(parseExpr(p)) else None
              val mapE = if (p.op("|")) Some(parseExpr(p)) else None
              p.expectOp("]")
              ListComp(v, listE, whereE, mapE)
            case None =>
              if (p.op("]")) ArrayLit(Seq.empty)
              else { val es = parseExprList(p); p.expectOp("]"); ArrayLit(es) }
          }
      }
    case TOp("{") => // embedded-document literal {'k': v, …} → struct
      val b = Seq.newBuilder[(String, Expr)]
      if (!p.op("}")) {
        var more = true
        while (more) {
          val k = p.next() match {
            case TStr(s) => s
            case TId(s)  => s
            case t => throw ParseException(s"expected field name, found $t")
          }
          p.expectOp(":")
          b += k -> parseExpr(p)
          more = p.op(",")
        }
        p.expectOp("}")
      }
      StructLit(b.result())
    case TId(id) if id.equalsIgnoreCase("CASE") =>
      // searched: CASE WHEN c THEN v ... | simple: CASE x WHEN w THEN v ...
      val operand = if (p.peekKw("WHEN")) None else Some(parseExpr(p))
      val branches = Seq.newBuilder[(Expr, Expr)]
      while (p.kw("WHEN")) {
        val w = parseExpr(p)
        p.expectKw("THEN")
        branches += w -> parseExpr(p)
      }
      val els = if (p.kw("ELSE")) Some(parseExpr(p)) else None
      p.expectKw("END")
      val bs = branches.result()
      if (bs.isEmpty) throw ParseException("CASE needs at least one WHEN branch")
      CaseExpr(operand, bs, els)
    case TId(id) if id.equalsIgnoreCase("NULL")  => NullLit
    case TId(id) if id.equalsIgnoreCase("TRUE")  => BoolLit(true)
    case TId(id) if id.equalsIgnoreCase("FALSE") => BoolLit(false)
    case TId(id) if Set("all", "any", "none", "single")(id.toLowerCase) && p.peek == TOp("(") =>
      // quantifier `all(v IN list WHERE p)` — only when the arg shape is
      // `ident IN …`; otherwise fall through to a plain function call
      val mark = p.pos
      p.expectOp("(")
      val q = p.peek match {
        case TId(v) =>
          p.next()
          if (p.kw("IN")) {
            val listE = parseExpr(p)
            p.expectKw("WHERE")
            val pred = parseExpr(p)
            p.expectOp(")")
            Some(Quantifier(id.toLowerCase, v, listE, pred))
          } else { p.pos = mark; None }
        case _ => p.pos = mark; None
      }
      q.getOrElse {
        p.expectOp("(")
        if (p.op(")")) FnCall(id, Seq.empty)
        else { val args = parseExprList(p); p.expectOp(")"); FnCall(id, args) }
      }
    case TId(id) =>
      if (p.op("(")) { // function call; DISTINCT folds into the fn name
        if (p.op("*")) { p.expectOp(")"); FnCall(id, Seq.empty, star = true) }
        else if (p.op(")")) FnCall(id, Seq.empty)
        else if (p.kw("DISTINCT")) {
          val args = parseExprList(p); p.expectOp(")"); FnCall(id + "_distinct", args)
        }
        else { val args = parseExprList(p); p.expectOp(")"); FnCall(id, args) }
      } else Ident(id)
    case t => throw ParseException(s"unexpected token $t")
  }
}
