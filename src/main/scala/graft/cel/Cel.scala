package graft.cel

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiler for the CEL subset the reference's conditionals and `set_field`
  * values actually use (`lc-lib/processor/cel.go:37-78`; documented surface
  * `docs/log-carver/Configuration.md:259-289`):
  *
  *   - single bound variable `event` with field access `event.f`,
  *     `event["f"]`, nested paths;
  *   - literals: string ('...' / "..."), int, float, bool, null, lists;
  *   - operators: `|| && ! == != < <= > >= + - * / %`, parentheses,
  *     ternary `?:`;
  *   - macros: `has(event.f)`, `x.map(v, expr)`, `x.filter(v, expr)`;
  *   - functions: `int() double() string() size()` — `size()` is
  *     polymorphic per `ext.Strings()` (code points on strings, element
  *     count on lists/maps), dispatched statically via the schema;
  *   - string methods: `startsWith endsWith contains matches` plus the
  *     `ext.Strings()` set: `charAt indexOf lastIndexOf lowerAscii
  *     upperAscii replace split join substring trim format quote`
  *     (0-based CEL indices; `format` supports the `%s %d %f %e %x %X
  *     %o %b` verbs with optional f/e precision on literal format
  *     strings (`%b` = Go binary, spliced as a conv() chain);
  *     bounded-count 3-arg `replace` is complete — fully dynamic
  *     operands and Go's empty-search insert-between-runes case, via
  *     the fused [[graft.functions.GoStrReplace]] expression);
  *   - `json.encode/decode` and `base64.encode/decode` (the custom json
  *     lib + `ext.Encoders()`, `cel.go:40-44`).
  *
  * Compiles directly to a Catalyst Column tree — no per-row interpreter —
  * so conditional pipelines stay inside whole-stage codegen. Branch
  * evaluation errors in the reference make the branch false, never fatal
  * (`lc-lib/processor/ast.go:111-118`); the Column analog is null
  * propagation: a null predicate is treated as false by `when`.
  */
object Cel {

  // ---------------- AST ----------------
  sealed trait Expr
  case class Lit(v: Any) extends Expr
  case class ListLit(items: List[Expr]) extends Expr
  case class Ident(name: String) extends Expr // includes dotted paths rooted at event
  case class Index(target: Expr, key: Expr) extends Expr
  case class Unary(op: String, e: Expr) extends Expr
  case class Binary(op: String, l: Expr, r: Expr) extends Expr
  case class Ternary(cond: Expr, t: Expr, f: Expr) extends Expr
  case class Call(fn: String, args: List[Expr]) extends Expr
  case class Method(target: Expr, name: String, args: List[Expr]) extends Expr
  case class Macro(target: Expr, name: String, varName: String, body: Expr) extends Expr

  // ---------------- Lexer ----------------
  private case class Tok(kind: String, text: String)

  private def lex(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c.isDigit || (c == '.' && i + 1 < n && s.charAt(i + 1).isDigit)) {
        val start = i
        while (i < n && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
        out += Tok("num", s.substring(start, i))
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
        out += Tok("ident", s.substring(start, i))
      } else if (c == '"' || c == '\'') {
        val q = c
        val sb = new java.lang.StringBuilder
        i += 1
        while (i < n && s.charAt(i) != q) {
          if (s.charAt(i) == '\\' && i + 1 < n) {
            s.charAt(i + 1) match {
              case 'n' => sb.append('\n'); case 't' => sb.append('\t')
              case 'r' => sb.append('\r'); case other => sb.append(other)
            }
            i += 2
          } else { sb.append(s.charAt(i)); i += 1 }
        }
        require(i < n, s"unterminated string literal in CEL: $s")
        i += 1
        out += Tok("str", sb.toString)
      } else {
        val two = if (i + 1 < n) s.substring(i, i + 2) else ""
        if (Set("==", "!=", "<=", ">=", "&&", "||").contains(two)) {
          out += Tok("op", two); i += 2
        } else {
          out += Tok("op", c.toString); i += 1
        }
      }
    }
    out.result()
  }

  // ---------------- Parser (precedence climbing) ----------------
  private class Parser(toks: Vector[Tok]) {
    private var pos = 0
    private def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    private def next(): Tok = {
      require(pos < toks.length, "unexpected end of CEL expression")
      val t = toks(pos); pos += 1; t
    }
    private def expect(text: String): Unit = {
      val t = next()
      require(t.text == text, s"expected '$text' but found '${t.text}'")
    }

    def parseExpr(): Expr = parseTernary()

    private def parseTernary(): Expr = {
      val c = parseOr()
      if (peek.exists(_.text == "?")) {
        next(); val t = parseTernary(); expect(":"); val f = parseTernary()
        Ternary(c, t, f)
      } else c
    }
    private def parseOr(): Expr = {
      var l = parseAnd()
      while (peek.exists(_.text == "||")) { next(); l = Binary("||", l, parseAnd()) }
      l
    }
    private def parseAnd(): Expr = {
      var l = parseCmp()
      while (peek.exists(_.text == "&&")) { next(); l = Binary("&&", l, parseCmp()) }
      l
    }
    private def parseCmp(): Expr = {
      var l = parseAdd()
      while (peek.exists(t =>
          Set("==", "!=", "<", "<=", ">", ">=").contains(t.text) || t.text == "in")) {
        val op = next().text; l = Binary(op, l, parseAdd())
      }
      l
    }
    private def parseAdd(): Expr = {
      var l = parseMul()
      while (peek.exists(t => t.text == "+" || t.text == "-")) {
        val op = next().text; l = Binary(op, l, parseMul())
      }
      l
    }
    private def parseMul(): Expr = {
      var l = parseUnary()
      while (peek.exists(t => Set("*", "/", "%").contains(t.text))) {
        val op = next().text; l = Binary(op, l, parseUnary())
      }
      l
    }
    private def parseUnary(): Expr =
      peek match {
        case Some(Tok("op", "!")) => next(); Unary("!", parseUnary())
        case Some(Tok("op", "-")) => next(); parseUnary() match {
          // fold negative numeric literals so `-1` IS a literal (the
          // literal-only surfaces — split/join separators — see it as one)
          case Lit(l: Long) => Lit(-l)
          case Lit(d: Double) => Lit(-d)
          case e => Unary("-", e)
        }
        case _ => parsePostfix()
      }

    private def parsePostfix(): Expr = {
      var e = parsePrimary()
      var continue = true
      while (continue) {
        peek match {
          case Some(Tok("op", ".")) =>
            next()
            val name = next().text
            if (peek.exists(_.text == "(")) {
              next()
              if (name == "map" || name == "filter" || name == "exists" || name == "all") {
                val v = next().text
                expect(",")
                val body = parseExpr()
                expect(")")
                e = Macro(e, name, v, body)
              } else {
                val args = parseArgs()
                e = Method(e, name, args)
              }
            } else e = e match {
              case Ident(p) => Ident(s"$p.$name")
              case other    => Index(other, Lit(name))
            }
          case Some(Tok("op", "[")) =>
            next(); val k = parseExpr(); expect("]")
            e = (e, k) match {
              case (Ident(p), Lit(s: String)) => Ident(s"$p.$s")
              case _ => Index(e, k)
            }
          case _ => continue = false
        }
      }
      e
    }

    private def parseArgs(): List[Expr] = {
      val args = scala.collection.mutable.ListBuffer.empty[Expr]
      if (!peek.exists(_.text == ")")) {
        args += parseExpr()
        while (peek.exists(_.text == ",")) { next(); args += parseExpr() }
      }
      expect(")")
      args.toList
    }

    private def parsePrimary(): Expr =
      next() match {
        case Tok("num", t) => if (t.contains('.')) Lit(t.toDouble) else Lit(t.toLong)
        case Tok("str", t) => Lit(t)
        case Tok("ident", "true") => Lit(true)
        case Tok("ident", "false") => Lit(false)
        case Tok("ident", "null") => Lit(null)
        case Tok("ident", name) =>
          if (peek.exists(_.text == "(")) { next(); Call(name, parseArgs()) }
          else Ident(name)
        case Tok("op", "(") => val e = parseExpr(); expect(")"); e
        case Tok("op", "[") =>
          val items = scala.collection.mutable.ListBuffer.empty[Expr]
          if (!peek.exists(_.text == "]")) {
            items += parseExpr()
            while (peek.exists(_.text == ",")) { next(); items += parseExpr() }
          }
          expect("]")
          ListLit(items.toList)
        case t => throw new IllegalArgumentException(s"unexpected CEL token: ${t.text}")
      }
  }

  def parse(src: String): Expr = new Parser(lex(src)).parseExpr()

  // ---------------- Column compiler ----------------

  /** @param resolve maps an `event.`-rooted field path (dots joined) to a
    *                Column; the pipeline supplies envelope-aware resolution
    *                (top-level columns vs the `fields` map vs `tags`).
    * @param typeOf  optional static type of an `event.`-rooted path (the
    *                pipeline supplies `Pipeline.typeOf(df)`) — used to
    *                dispatch the polymorphic `size()` (code points on
    *                strings vs element count on lists/maps, the
    *                `ext.Strings()` surface `cel.go:40-44`).
    */
  def compile(src: String, resolve: String => Column,
      typeOf: String => Option[org.apache.spark.sql.types.DataType] = _ => None): Column =
    toColumn(parse(src), resolve, Map.empty, typeOf)

  private def toColumn(e: Expr, resolve: String => Column,
      vars: Map[String, Column],
      typeOf: String => Option[org.apache.spark.sql.types.DataType]): Column = {
    def go(x: Expr): Column = toColumn(x, resolve, vars, typeOf)
    e match {
      case Lit(null) => lit(null)
      case Lit(v) => lit(v)
      case ListLit(items) => array(items.map(go): _*)
      case Ident(name) =>
        val root = name.split('.').head
        if (vars.contains(root)) {
          val rest = name.split('.').drop(1)
          rest.foldLeft(vars(root))((c, f) => c.getField(f))
        } else if (root == "event") {
          resolve(name.stripPrefix("event").stripPrefix("."))
        } else throw new IllegalArgumentException(s"unknown CEL identifier: $name")
      case Index(t, k) =>
        // CEL list indexing is 0-BASED and out-of-range is an eval error
        // (-> null under the branch-false contract); Spark's element_at
        // is 1-based on arrays and THROWS on 0. Dispatch on the static
        // type; with no schema info, a numeric key means list semantics
        // (map keys in the reference configs are strings).
        (staticType(t, typeOf), k) match {
          case (Some(_: org.apache.spark.sql.types.ArrayType), _) =>
            get(go(t), go(k).cast("int"))
          case (Some(_: org.apache.spark.sql.types.MapType), _) =>
            element_at(go(t), go(k))
          case (None, Lit(_: Long)) => get(go(t), go(k).cast("int"))
          case _ => element_at(go(t), go(k))
        }
      case Unary("!", x) => !go(x)
      case Unary("-", x) => -go(x)
      case Unary(op, _) => throw new IllegalArgumentException(s"bad unary op $op")
      case Binary(op, l, r) =>
        val (lc, rc) = (go(l), go(r))
        op match {
          case "||" => lc || rc
          case "&&" => lc && rc
          case "==" => lc === rc
          case "!=" => lc =!= rc
          case "<"  => lc < rc
          case "<=" => lc <= rc
          case ">"  => lc > rc
          case ">=" => lc >= rc
          // CEL standard `e in list` membership (langdef list-of-standard-
          // definitions); list operand only (map-key membership is the
          // documented subset divergence)
          case "in" => array_contains(rc, lc)
          // CEL `+` is typed: strings concatenate, lists concatenate,
          // numbers add. Detect strings structurally OR from the schema
          // (two untyped STRING event fields would otherwise compile to
          // numeric Add, whose ANSI string->double cast aborts the job);
          // lists only from the schema/literal shape.
          case "+" =>
            def st(e: Expr) = staticType(e, typeOf)
            val stringy = isStringy(l) || isStringy(r) ||
              st(l).contains(org.apache.spark.sql.types.StringType) ||
              st(r).contains(org.apache.spark.sql.types.StringType)
            val listy = Seq(st(l), st(r)).exists {
              case Some(_: org.apache.spark.sql.types.ArrayType) => true
              case _ => false
            }
            if (stringy) concat(lc.cast("string"), rc.cast("string"))
            else if (listy) concat(lc, rc)
            else lc + rc
          case "-" => lc - rc
          case "*" => lc * rc
          // CEL eval errors make the branch false, never fatal
          // (`ast.go:111-118`); under Spark 4's default ANSI mode a plain
          // `/` or `%` raises DIVIDE_BY_ZERO — try_divide/try_mod return
          // null, which the null-safe guards treat as false.
          case "/" =>
            // cel-go `/` on two ints is TRUNCATING integer division
            // (7/2 = 3); try_divide is always floating-point. When both
            // operands are statically integral, emit the TRY-mode
            // integral divide (exact at any magnitude, null on /0 like
            // the eval-error contract); otherwise float try_divide.
            def intType(e: Expr) = staticType(e, typeOf).exists {
              case org.apache.spark.sql.types.LongType
                 | org.apache.spark.sql.types.IntegerType
                 | org.apache.spark.sql.types.ShortType
                 | org.apache.spark.sql.types.ByteType => true
              case _ => false
            }
            if (intType(l) && intType(r))
              // TryEval is the try_* null-on-error wrapper; EvalMode.TRY
              // alone still raises DIVIDE_BY_ZERO from DivModLike.eval
              org.apache.spark.sql.graftbridge.ColumnBridge.column(
                org.apache.spark.sql.catalyst.expressions.TryEval(
                  org.apache.spark.sql.catalyst.expressions.IntegralDivide(
                    org.apache.spark.sql.graftbridge.ColumnBridge.expression(lc),
                    org.apache.spark.sql.graftbridge.ColumnBridge.expression(rc),
                    org.apache.spark.sql.catalyst.expressions.EvalMode.TRY)))
            else try_divide(lc, rc)
          case "%" => try_mod(lc, rc)
          case other => throw new IllegalArgumentException(s"bad binary op $other")
        }
      case Ternary(c, t, f) => when(go(c), go(t)).otherwise(go(f))
      case Call("has", List(arg)) => go(arg).isNotNull
      // try_cast, not cast: ANSI-mode cast of a malformed string throws
      // CAST_INVALID_INPUT and kills the job; the reference's CEL eval
      // error just falsifies the branch (`ast.go:111-118`).
      case Call("int", List(arg)) => go(arg).try_cast("long")
      case Call("double", List(arg)) => go(arg).try_cast("double")
      case Call("string", List(arg)) => go(arg).cast("string")
      case Call("size", List(arg)) =>
        // CEL size() is polymorphic (cel.go loads ext.Strings()): code
        // points on strings, element count on lists/maps. Dispatch
        // statically: structurally-string expressions and event paths the
        // schema types as STRING get `length` (Spark's length counts code
        // points, same as CEL); everything else gets collection size.
        val isStringArg = isStringy(arg) || (arg match {
          case Ident(name) if name == "event" || name.startsWith("event.") =>
            typeOf(name.stripPrefix("event").stripPrefix("."))
              .contains(org.apache.spark.sql.types.StringType)
          case _ => false
        })
        if (isStringArg) length(go(arg)) else size(go(arg))
      case Call(fn, _) => throw new IllegalArgumentException(s"unsupported CEL function: $fn")
      // the reference's custom json CEL library
      // (`lc-lib/processor/ext/json.go:41-77`)
      case Method(Ident("json"), "encode", List(a)) => to_json(go(a))
      case Method(Ident("json"), "decode", List(a)) =>
        org.apache.spark.sql.graftbridge.ColumnBridge.column(
          graft.functions.JsonFlatten(
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(go(a))))
      // ext.Encoders() (`cel.go:40-44`): base64.encode(bytes) → string,
      // base64.decode(string) → bytes. CEL bytes map to BINARY columns;
      // a string operand to encode is coerced (CEL configs usually write
      // base64.encode(b"..."), but a column carries the bytes either way).
      case Method(Ident("base64"), "encode", List(a)) => base64(go(a).cast("binary"))
      case Method(Ident("base64"), "decode", List(a)) => unbase64(go(a))
      case Method(t, "startsWith", List(a)) => go(t).startsWith(go(a))
      case Method(t, "endsWith", List(a)) => go(t).endsWith(go(a))
      case Method(t, "contains", List(a)) => go(t).contains(go(a))
      case Method(t, "matches", List(Lit(re: String))) => go(t).rlike(re)
      // ---- ext.Strings() surface (cel.go:40-44; cel-go strings ext) ----
      // 0-based code-point indices throughout (CEL), mapped onto Spark's
      // 1-based character functions.
      case Method(t, "charAt", List(i)) =>
        // cel-go: index == len(s) yields "", out-of-range is an error
        // (-> null); a negative index must NOT reach substr (position 0
        // and negatives count from the wrong places)
        val (tc, ic) = (go(t), go(i).cast("int"))
        when(ic >= 0 && ic <= length(tc), tc.substr(ic + lit(1), lit(1)))
      case Method(t, "indexOf", List(a)) =>
        (locate_dyn(go(a), go(t), lit(1)) - lit(1)).cast("long")
      case Method(t, "indexOf", List(a, off)) =>
        // negative offset is a cel-go eval error -> null
        val offc = go(off).cast("int")
        when(offc >= 0,
          (locate_dyn(go(a), go(t), offc + lit(1)) - lit(1)).cast("long"))
      case Method(t, "lastIndexOf", List(a)) => {
        val (s, sub) = (go(t), go(a))
        val revPos = locate_dyn(reverse(sub), reverse(s), lit(1))
        when(revPos === 0, lit(-1L))
          .otherwise((length(s) - revPos - length(sub) + lit(1)).cast("long"))
      }
      case Method(t, "lowerAscii", List()) =>
        translate(go(t), "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz")
      case Method(t, "upperAscii", List()) =>
        translate(go(t), "abcdefghijklmnopqrstuvwxyz", "ABCDEFGHIJKLMNOPQRSTUVWXYZ")
      case Method(t, "replace", List(o, n)) =>
        // strings.ReplaceAll — LITERAL search/replacement (regexp_replace
        // would misread `$`/`\` in the replacement)
        replace(go(t), go(o).cast("string"), go(n).cast("string"))
      // bounded-count replace (Go strings.Replace): first `cnt`
      // occurrences only, via the fused [[graft.functions.GoStrReplace]]
      // expression — fully dynamic operands, and the empty-search
      // insert-between-runes case, with exact Go semantics (cnt < 0 =
      // replace-all, cnt = 0 = unchanged).
      case Method(t, "replace", List(o, nw, cnt)) =>
        // cel-go type-checks the count as int — reject a non-integer
        // LITERAL at compile (a double would silently truncate, a string
        // would cast to NULL). A dynamic count keeps the documented
        // fail-closed runtime contract: cast("long") makes a non-numeric
        // value NULL, which nullIntolerant propagates to a NULL result.
        cnt match {
          case Lit(_: Long) | Lit(_: Int) => ()
          case Lit(v) => throw new IllegalArgumentException(
            s"CEL replace() count must be an int literal or expression, got: $v")
          case _ => ()
        }
        org.apache.spark.sql.graftbridge.ColumnBridge.column(
          graft.functions.GoStrReplace(
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(go(t).cast("string")),
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(go(o).cast("string")),
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(go(nw).cast("string")),
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(go(cnt).cast("long"))))
      case Method(t, "split", List(Lit(sep: String))) =>
        // cel split is a LITERAL separator; Spark's is a regex — quote it.
        // Trailing empties kept both sides (Go strings.Split semantics).
        split(go(t), java.util.regex.Pattern.quote(sep))
      case Method(t, "join", List()) => array_join(go(t), "")
      case Method(t, "join", List(Lit(sep: String))) => array_join(go(t), sep)
      case Method(t, "substring", List(s)) => {
        // cel-go: 0 <= start <= len(s), else eval error -> null (the
        // classic s.substring(s.indexOf(x)) with x absent must null out,
        // not return the whole string via substr's position-0 quirk)
        val (tc, sc) = (go(t), go(s).cast("int"))
        when(sc >= 0 && sc <= length(tc), tc.substr(sc + lit(1), length(tc)))
      }
      case Method(t, "substring", List(s, e)) =>
        // cel-go: 0 <= start <= end <= len(s), else eval error -> null
        val (tc, sc, ec) = (go(t), go(s).cast("int"), go(e).cast("int"))
        when(sc >= 0 && ec >= sc && ec <= length(tc),
          tc.substr(sc + lit(1), ec - sc))
      case Method(t, "trim", List()) =>
        // cel-go trim follows unicode.IsSpace — (?U) switches java's \s to
        // the Unicode White_Space property (NBSP, NEL, U+2000-range, ...),
        // which matches Go's set; bare \s would be ASCII-only
        regexp_replace(go(t), "(?U)^\\s+|\\s+$", "")
      // cel-go ext.Strings format(): "%s=%d".format([a, b]). The format
      // string must be a literal (it defines the plan shape) and the args
      // a list literal; verbs map onto java.util.Formatter via Spark's
      // format_string, which agrees with cel-go on the supported set
      // (%f default precision is 6 in both).
      case Method(Lit(fmt: String), "format", List(ListLit(args))) =>
        validateFormat(fmt, args.length)
        compileLiteralFormat(fmt, args.map(go))
      // Dynamic (non-literal) format string — cel-go's Strings() accepts
      // any expression here (`lc-lib/processor/cel.go:41` loads the full
      // ext.Strings), so a computed format compiles too: the verb set is
      // statically unknown, so it skips compile-time validation and
      // formats per row via java.util.Formatter (Catalyst FormatString) —
      // identical to cel-go on the validated subset (%s %d %x %X %o %f
      // %e), divergent-or-throwing outside it (documented residue; the
      // literal-format path above stays fail-closed). The arg list must
      // still be a list literal: it fixes the expression's arity.
      case Method(t, "format", List(ListLit(args))) =>
        org.apache.spark.sql.graftbridge.ColumnBridge.column(
          org.apache.spark.sql.catalyst.expressions.FormatString(
            (go(t).cast("string") +: args.map(go))
              .map(org.apache.spark.sql.graftbridge.ColumnBridge.expression): _*))
      case Method(_, "format", _) =>
        throw new IllegalArgumentException(
          "CEL format() needs a list literal of args (the format string may be any string expression)")
      // cel-go ext.Strings quote() = Go strconv.Quote, as ONE fused
      // expression — the earlier replace-chain escaped only 9 characters
      // and let other control bytes (ANSI codes, NUL) through raw inside
      // the quoted output, which is not a valid Go quoted literal
      case Method(t, "quote", List()) =>
        org.apache.spark.sql.graftbridge.ColumnBridge.column(
          graft.functions.GoQuote(
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(go(t))))
      case Method(t, name, _) => throw new IllegalArgumentException(s"unsupported CEL method: $name")
      case Macro(t, "map", v, body) =>
        transform(go(t), x => toColumn(body, resolve, vars + (v -> x), typeOf))
      case Macro(t, "filter", v, body) =>
        filter(go(t), x => toColumn(body, resolve, vars + (v -> x), typeOf))
      case Macro(t, "exists", v, body) =>
        exists(go(t), x => toColumn(body, resolve, vars + (v -> x), typeOf))
      case Macro(t, "all", v, body) =>
        forall(go(t), x => toColumn(body, resolve, vars + (v -> x), typeOf))
      case other => throw new IllegalArgumentException(s"unsupported CEL expr: $other")
    }
  }

  /** Accept only the format verbs where the compiled form matches cel-go
    * (`%s %d %f %e %x %X %o` via java.util.Formatter, where the two
    * agree; `%b` via the Go-semantics binary spelling below — literal
    * formats only; precision only where the Formatter allows it —
    * `%.Nf`/`%.Ne`; `%%` escape), and check the arg count matches the
    * verb count — anything else (positional args, precision on d/x/o)
    * fails closed at compile time rather than diverging at run time.
    * Argument TYPE mismatches (e.g. `%x` fed a string column) still
    * surface at execution — a Column's runtime type isn't always
    * statically known here; documented residue.
    */
  private val FormatVerb =
    java.util.regex.Pattern.compile("%(?:%|(?:\\.\\d+)?[fe]|[sdxXob])")

  private def validateFormat(fmt: String, nargs: Int): Unit = {
    val m = FormatVerb.matcher(fmt)
    var count = 0
    while (m.find()) if (!m.group().equals("%%")) count += 1
    // strip every recognized verb; any '%' left is an unsupported one
    require(FormatVerb.matcher(fmt).replaceAll("").indexOf('%') < 0,
      s"unsupported CEL format verb in '$fmt' (supported: %s %d %x %X %o %b, %f %e with optional precision)")
    require(count == nargs,
      s"CEL format '$fmt' has $count verbs but ${nargs} args")
  }

  /** `%b` the way cel-go renders it (Go `strconv.FormatInt(v, 2)`):
    * sign + magnitude bits — NOT java.util.Formatter's `%b`, which is
    * Boolean.toString and would silently print "true" for any non-null
    * int. Spark's `conv` treats negatives as unsigned 64-bit two's
    * complement, so the sign is handled explicitly; Long.MinValue can't
    * be negated in-range and gets its literal spelling. Bools arrive as
    * the long cast 0/1, matching cel-go's binary clause.
    */
  private def goBinary(a: Column): Column = {
    val v = a.cast("long")
    when(v === Long.MinValue, lit("-1" + "0" * 63))
      .when(v < 0, concat(lit("-"), conv((-v).cast("string"), 10, 2)))
      .otherwise(conv(v.cast("string"), 10, 2))
  }

  /** Compile a LITERAL format: runs between `%b` verbs go through one
    * `format_string` each (java.util.Formatter semantics, validated
    * subset); each `%b` arg is spliced in via [[goBinary]]. No `%b` →
    * exactly the plain `format_string` call.
    */
  private def compileLiteralFormat(fmt: String, args: Seq[Column]): Column = {
    if (!fmt.contains("%b")) return format_string(fmt, args: _*)
    val pieces = scala.collection.mutable.ArrayBuffer.empty[Column]
    val seg = new StringBuilder
    val segArgs = scala.collection.mutable.ArrayBuffer.empty[Column]
    var argI = 0
    var pos = 0
    def flush(): Unit = {
      if (seg.nonEmpty || segArgs.nonEmpty) {
        // an arg-less segment can still hold %% escapes — route any
        // segment containing '%' through the Formatter so %% renders
        // as one percent sign (a bare lit would emit it verbatim)
        pieces += (if (segArgs.isEmpty && !seg.toString.contains('%'))
                     lit(seg.toString)
                   else format_string(seg.toString, segArgs.toSeq: _*))
        seg.clear(); segArgs.clear()
      }
    }
    val m = FormatVerb.matcher(fmt)
    while (m.find()) {
      seg.append(fmt.substring(pos, m.start()))
      pos = m.end()
      m.group() match {
        case "%%" => seg.append("%%")
        case "%b" => flush(); pieces += goBinary(args(argI)); argI += 1
        case v => seg.append(v); segArgs += args(argI); argI += 1
      }
    }
    seg.append(fmt.substring(pos))
    flush()
    concat(pieces.toSeq: _*)
  }

  /** `locate` with fully dynamic operands (the sql.functions overloads
    * require literal substring/position).
    */
  private def locate_dyn(sub: Column, s: Column, pos: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.StringLocate(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(sub),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(s),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(pos)))

  /** Best-effort static type of an expression: literals, cast calls,
    * structurally-string shapes, and `event.`-rooted paths through the
    * caller's schema callback. `None` = unknown (macro variables,
    * un-schema'd resolvers) — callers fall back to the legacy behavior.
    */
  private def staticType(e: Expr,
      typeOf: String => Option[org.apache.spark.sql.types.DataType])
      : Option[org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.types._
    e match {
      case Lit(_: String) => Some(StringType)
      case Lit(_: Long) => Some(LongType)
      case Lit(_: Double) => Some(DoubleType)
      case Lit(_: Boolean) => Some(BooleanType)
      case ListLit(_) => Some(ArrayType(NullType))
      case Call("int", _) => Some(LongType)
      case Call("double", _) => Some(DoubleType)
      case Call("string", _) => Some(StringType)
      case Call("size", _) => Some(LongType)
      case Ident(name) if name == "event" || name.startsWith("event.") =>
        typeOf(name.stripPrefix("event").stripPrefix("."))
      case Method(t, "split", _) => Some(ArrayType(StringType))
      // Arithmetic composes: cel-go's truncating int division must fire
      // for NESTED integer arithmetic too — (event.n + 1) / 2 and 7/2/2
      // keep integer types in cel-go, so the compiled Spark expression
      // must not fall back to floating try_divide just because an operand
      // is itself a Binary node.
      case Binary(op @ ("+" | "-" | "*" | "/" | "%"), l, r) =>
        val lt = staticType(l, typeOf)
        val rt = staticType(r, typeOf)
        def integral(t: Option[DataType]): Boolean = t.exists {
          case LongType | IntegerType | ShortType | ByteType => true
          case _ => false
        }
        if (op == "+" && (lt.contains(StringType) || rt.contains(StringType)))
          Some(StringType)
        else if (op == "+" && Seq(lt, rt).exists(_.exists(_.isInstanceOf[ArrayType])))
          lt.orElse(rt)
        else if (integral(lt) && integral(rt)) Some(LongType)
        else if (lt.contains(DoubleType) || rt.contains(DoubleType)) Some(DoubleType)
        else None
      case _ if isStringy(e) => Some(StringType)
      case _ => None
    }
  }

  private def isStringy(e: Expr): Boolean = e match {
    case Lit(_: String) => true
    case Binary("+", l, r) => isStringy(l) || isStringy(r)
    case Call("string", _) => true
    case Method(Ident("json"), "encode", _) => true
    case Method(Ident("base64"), "encode", _) => true
    case Method(_, "charAt" | "lowerAscii" | "upperAscii" | "replace"
                   | "substring" | "trim" | "join" | "format" | "quote", _) => true
    case _ => false
  }
}
