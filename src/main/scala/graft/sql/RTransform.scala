package graft.sql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** R-expression transform compiler (SURVEY §2.11 / "What's missing" #1;
  * reference: flink/src/main/scala/io/ddf/flink/etl/TransformationHandler.scala:70-128
  * `transformNativeRserve`, which ships each partition to an Rserve
  * process and evaluates base R `transform(df.partition, <expr>)`).
  *
  * Spark-first replacement: the R expression sub-language that covers
  * the reference's documented usage (`"newcol = V5 / V7"`-style mutate
  * expressions — TransformationHandlerSpec.scala:14) is COMPILED to
  * native Catalyst `Column`s — whole-stage codegen, zero serialization
  * boundary, no R process — instead of interpreted per-partition. An R
  * user's mutate expressions run unchanged; genuinely imperative R
  * (loops, model fits, arbitrary functions) stays out of scope and goes
  * through the typed Scala hatches ([[graft.operators.Transforms]]).
  *
  * Base-R `transform()` semantics, faithfully:
  *  - ALL right-hand sides are evaluated against the ORIGINAL frame
  *    (`transform(df, a = b+1, c = a+1)` sees the OLD `a` in `c`'s
  *    expression — not dplyr `mutate`'s sequential rebinding). One
  *    `withColumns` projection gives exactly that.
  *  - assigned columns replace an existing column in place; new names
  *    append in assignment order.
  *  - `/` is always double division (R has no integer `/`); `^` is
  *    double `pow`; `+ - *` keep integer types when both sides are
  *    integral (Spark's coercion = R's).
  *  - `%%` follows R's sign-of-DIVISOR contract (`-7 %% 3 == 2`,
  *    `7 %% -3 == -2`) — compiled to `((a % b) + b) % b` (Spark's
  *    `pmod` is always non-negative, which is NOT R), staying integral
  *    on integral inputs.
  *  - `%/%` is floor division (`floor(a / b)`, integral when both
  *    sides are).
  *  - `round(x, digits)` is BANKER'S rounding (R rounds half to even) —
  *    compiled to `bround`, not `round`.
  *  - `ifelse(test, yes, no)` returns NA where `test` is NA (Spark's
  *    bare `when(test, yes).otherwise(no)` would take the `no` branch).
  *  - `substr(x, start, stop)` is 1-based INCLUSIVE of `stop`.
  *  - `x %in% c(...)` is never NA (R returns FALSE for NA inputs) —
  *    `isin` coalesced to false.
  *  - `& |` are the vectorized logical ops; R's three-valued NA logic
  *    is Spark's null logic, unchanged. `&& ||` are accepted as
  *    synonyms (their R scalar-only behavior has no column meaning).
  *  - literals: `2` is double, `2L` integer (as in R); `NA`, `TRUE`/
  *    `FALSE` (`T`/`F`), `NaN`, `Inf`.
  *
  * Documented deviations (Scaladoc is the contract, RTransformSpec
  * pins them): regex functions (`grepl`/`gsub`) take Java regex syntax
  * rather than R's POSIX flavor (R callers using PCRE via `perl=TRUE`
  * are closest); `paste` of a double column uses Spark's cast-to-string
  * formatting (`"2.0"`), not R's 15-significant-digit print (`"2"`) —
  * paste integers or pre-`format` instead.
  */
object RTransform {

  // ---------------------------------------------------------------- AST

  private sealed trait Expr
  private case class Num(text: String, isInt: Boolean) extends Expr
  private case class Str(v: String) extends Expr
  private case class BoolLit(v: Boolean) extends Expr
  private case object NaLit extends Expr
  private case object NanLit extends Expr
  private case object InfLit extends Expr
  private case class Ident(name: String) extends Expr
  private case class Un(op: String, e: Expr) extends Expr
  private case class Bin(op: String, l: Expr, r: Expr) extends Expr
  private case class Call(fn: String, args: Seq[(Option[String], Expr)]) extends Expr
  private case class Dollar(owner: String, field: String) extends Expr // part$col

  // ------------------------------------------------------------- lexer

  private sealed trait Tok { def pos: Int }
  private case class TNum(text: String, isInt: Boolean, pos: Int) extends Tok
  private case class TStr(v: String, pos: Int) extends Tok
  private case class TId(name: String, pos: Int) extends Tok
  private case class TOp(sym: String, pos: Int) extends Tok
  private case class TEnd(pos: Int) extends Tok

  private def fail(src: String, pos: Int, msg: String): Nothing =
    throw new IllegalArgumentException(
      s"transformR: $msg at position $pos: ...${src.drop(pos).take(25)}")

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
        if (i < n && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
          i += 1
          if (i < n && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
          while (i < n && s.charAt(i).isDigit) i += 1
        }
        val isInt = i < n && s.charAt(i) == 'L'
        val text = s.substring(start, i)
        if (isInt) i += 1
        out += TNum(text, isInt, start)
      } else if (c == '\'' || c == '"') {
        val start = i; i += 1
        val sb = new StringBuilder
        var closed = false
        while (i < n && !closed) {
          val ch = s.charAt(i)
          if (ch == '\\' && i + 1 < n) {
            s.charAt(i + 1) match {
              case 'n' => sb += '\n'; case 't' => sb += '\t'
              case other => sb += other
            }
            i += 2
          } else if (ch == c) { closed = true; i += 1 }
          else { sb += ch; i += 1 }
        }
        if (!closed) fail(s, start, "unterminated string")
        out += TStr(sb.toString, start)
      } else if (c.isLetter || c == '.' || c == '_') { // leading _ : not R, but Spark column names need it
        val start = i
        while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '.' ||
          s.charAt(i) == '_')) i += 1
        out += TId(s.substring(start, i), start)
      } else if (c == '%') {
        val start = i
        val end = s.indexOf('%', i + 1)
        if (end < 0) fail(s, start, "unterminated %op%")
        val sym = s.substring(start, end + 1)
        if (sym != "%%" && sym != "%/%" && sym != "%in%")
          fail(s, start, s"unsupported operator $sym (have %% %/% %in%)")
        out += TOp(sym, start)
        i = end + 1
      } else {
        val two = if (i + 1 < n) s.substring(i, i + 2) else ""
        val sym = two match {
          case "<-" | "<=" | ">=" | "==" | "!=" | "&&" | "||" => two
          case _ => c.toString
        }
        if (!Set("+", "-", "*", "/", "^", "(", ")", ",", "<", ">", "!",
            "&", "|", "=", "$", "<-", "<=", ">=", "==", "!=", "&&", "||").contains(sym))
          fail(s, i, s"unexpected character '$c'")
        out += TOp(sym, i)
        i += sym.length
      }
    }
    out += TEnd(n)
    out.result()
  }

  // ------------------------------------------------------------ parser

  private final class Parser(src: String, toks: Vector[Tok]) {
    private var p = 0
    private def cur: Tok = toks(p)
    private def advance(): Tok = { val t = toks(p); p += 1; t }
    private def expectOp(sym: String): Unit = cur match {
      case TOp(`sym`, _) => p += 1
      case t => fail(src, t.pos, s"expected '$sym'")
    }

    /** A single full expression (map/reduce function bodies). */
    def expression(): Expr = {
      val e = orExpr()
      cur match {
        case TEnd(_) => e
        case t => fail(src, t.pos, "unexpected trailing input")
      }
    }

    /** `name = expr [, name = expr ...]` — base-R transform arg list. */
    def assignments(): Seq[(String, Expr)] = {
      val out = Seq.newBuilder[(String, Expr)]
      var done = false
      while (!done) {
        val name = cur match {
          case TId(nm, _) => advance(); nm
          case t => fail(src, t.pos, "expected a column name to assign")
        }
        cur match {
          case TOp("=", _) | TOp("<-", _) => p += 1
          case t => fail(src, t.pos, s"expected '=' after '$name'")
        }
        out += name -> orExpr()
        cur match {
          case TOp(",", _) => p += 1
          case TEnd(_) => done = true
          case t => fail(src, t.pos, "expected ',' or end of expression")
        }
      }
      out.result()
    }

    def orExpr(): Expr = {
      var l = andExpr()
      while (cur match { case TOp("|" | "||", _) => true; case _ => false }) {
        advance(); l = Bin("|", l, andExpr())
      }
      l
    }
    private def andExpr(): Expr = {
      var l = notExpr()
      while (cur match { case TOp("&" | "&&", _) => true; case _ => false }) {
        advance(); l = Bin("&", l, notExpr())
      }
      l
    }
    private def notExpr(): Expr = cur match {
      case TOp("!", _) => advance(); Un("!", notExpr())
      case _ => cmpExpr()
    }
    private def cmpExpr(): Expr = {
      val l = addExpr()
      cur match {
        case TOp(op @ ("==" | "!=" | "<" | "<=" | ">" | ">="), _) =>
          advance(); Bin(op, l, addExpr())
        case _ => l
      }
    }
    private def addExpr(): Expr = {
      var l = mulExpr()
      while (cur match { case TOp("+" | "-", _) => true; case _ => false }) {
        val TOp(op, _) = advance(): @unchecked
        l = Bin(op, l, mulExpr())
      }
      l
    }
    private def mulExpr(): Expr = {
      var l = specExpr()
      while (cur match { case TOp("*" | "/", _) => true; case _ => false }) {
        val TOp(op, _) = advance(): @unchecked
        l = Bin(op, l, specExpr())
      }
      l
    }
    private def specExpr(): Expr = {
      var l = unaryExpr()
      while (cur match { case TOp("%%" | "%/%" | "%in%", _) => true; case _ => false }) {
        val TOp(op, _) = advance(): @unchecked
        l = Bin(op, l, unaryExpr())
      }
      l
    }
    private def unaryExpr(): Expr = cur match {
      case TOp("-", _) => advance(); Un("-", unaryExpr())
      case TOp("+", _) => advance(); unaryExpr()
      case _ => powExpr()
    }
    private def powExpr(): Expr = {
      val base = atom()
      cur match {
        // right side of ^ may itself be unary (2^-3) and ^ is
        // right-associative (2^3^2 = 2^(3^2)) — recursing into
        // unaryExpr gives both
        case TOp("^", _) => advance(); Bin("^", base, unaryExpr())
        case _ => base
      }
    }
    private def atom(): Expr = advance() match {
      case TNum(t, isInt, _) => Num(t, isInt)
      case TStr(v, _) => Str(v)
      case TId("TRUE" | "T", _) => BoolLit(true)
      case TId("FALSE" | "F", _) => BoolLit(false)
      case TId("NA" | "NA_integer_" | "NA_real_" | "NA_character_", _) => NaLit
      case TId("NaN", _) => NanLit
      case TId("Inf", _) => InfLit
      case TId(name, _) => cur match {
        case TOp("$", _) =>
          advance()
          cur match {
            case TId(f, _) => advance(); Dollar(name, f)
            case t => fail(src, t.pos, s"expected a field name after '$name$$'")
          }
        case TOp("(", _) =>
          advance()
          val args = Seq.newBuilder[(Option[String], Expr)]
          cur match {
            case TOp(")", _) => advance()
            case _ =>
              var more = true
              while (more) {
                // a named arg is ID '=' not followed by '=' (else it is
                // an equality comparison inside a positional arg)
                val named = (cur, toks.lift(p + 1), toks.lift(p + 2)) match {
                  case (TId(_, _), Some(TOp("=", _)), Some(TOp("==", _))) => None
                  case (TId(arg, _), Some(TOp("=", _)), _) =>
                    p += 2; Some(arg)
                  case _ => None
                }
                args += named -> orExpr()
                cur match {
                  case TOp(",", _) => advance()
                  case TOp(")", _) => advance(); more = false
                  case t => fail(src, t.pos, "expected ',' or ')' in call")
                }
              }
          }
          Call(name, args.result())
        case _ => Ident(name)
      }
      case TOp("(", _) =>
        val e = orExpr(); expectOp(")"); e
      case t => fail(src, t.pos, "expected a value")
    }
  }

  // ---------------------------------------------------------- compiler

  /** The compiler's view of R's type lattice — just enough to place
    * R's numeric rules (int preserved by + - * %% %/%, everything else
    * double) and to resolve `is.na` on doubles (NaN counts).
    */
  private sealed trait RType
  private case object RInt extends RType
  private case object RDbl extends RType
  private case object RStr extends RType
  private case object RBool extends RType
  private case object ROther extends RType

  private case class Typed(col: Column, t: RType)

  /** TRY-mode cast (NULL on malformed/overflowing input — R's NA
    * coercion), the Column-level twin of SQL try_cast.
    */
  private def tryCast(c: Column, dt: DataType): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.Cast(
        org.apache.spark.sql.graftbridge.Bridge.expression(c), dt, None,
        org.apache.spark.sql.catalyst.expressions.EvalMode.TRY))

  private def rTypeOf(dt: DataType): RType = dt match {
    case ByteType | ShortType | IntegerType | LongType => RInt
    case FloatType | DoubleType | _: DecimalType => RDbl
    case StringType => RStr
    case BooleanType => RBool
    case _ => ROther
  }

  private def numeric(t: Typed, op: String): Typed = t.t match {
    case RInt | RDbl => t
    case RBool => Typed(t.col.cast(IntegerType), RInt) // R: TRUE + 1 == 2
    case _ => throw new IllegalArgumentException(
      s"transformR: non-numeric operand for '$op'")
  }

  /** R double division under ANSI Spark: a zero divisor yields
    * Inf/-Inf/NaN (computed as `a * b^-1`, which also honors -0.0's
    * sign and propagates NA/NaN dividends) instead of Spark's ANSI
    * DIVIDE_BY_ZERO error; every non-zero divisor is a true IEEE
    * divide, bit-exact with any other engine's.
    */
  private def rDivide(a: Column, b: Column): Column = {
    val az = a.cast(DoubleType)
    val bz = b.cast(DoubleType)
    when(bz === 0.0, az * pow(bz, lit(-1.0))).otherwise(az / bz)
  }

  private def compile(e: Expr, df: DataFrame,
                      special: PartialFunction[Expr, Typed] = PartialFunction.empty): Typed = {
    val fields = df.schema.fields.map(f => f.name -> f.dataType).toMap
    def go(e: Expr): Typed = special.applyOrElse(e, goDefault)
    def goDefault(e: Expr): Typed = e match {
      case Num(t, true) => Typed(lit(t.toInt), RInt)
      case Num(t, false) =>
        // a whole-number literal stays double (R: `2` is numeric) but
        // keep the exact integral value through the double
        Typed(lit(t.toDouble), RDbl)
      case Str(v) => Typed(lit(v), RStr)
      case BoolLit(v) => Typed(lit(v), RBool)
      case NaLit => Typed(lit(null), ROther)
      case NanLit => Typed(lit(Double.NaN), RDbl)
      case InfLit => Typed(lit(Double.PositiveInfinity), RDbl)
      case Ident(name) =>
        val dt = fields.getOrElse(name, throw new IllegalArgumentException(
          s"transformR: unknown column '$name' (have ${df.columns.mkString(", ")})"))
        Typed(df(name), rTypeOf(dt))
      case Un("-", x) =>
        val t = numeric(go(x), "-"); Typed(-t.col, t.t)
      case Un("!", x) => Typed(!go(x).col, RBool)
      case Un(op, _) => throw new IllegalArgumentException(
        s"transformR: unsupported unary '$op'")
      case Bin("%in%", l, Call("c", items)) =>
        val lc = go(l).col
        val vals = items.map {
          case (None, it) => go(it).col
          case (Some(nm), _) => throw new IllegalArgumentException(
            s"transformR: named argument '$nm' in c()")
        }
        // R: %in% never returns NA (match() against a set is FALSE for
        // NA) — Spark's isin is null for null inputs
        Typed(coalesce(lc.isin(vals: _*), lit(false)), RBool)
      case Bin("%in%", _, _) => throw new IllegalArgumentException(
        "transformR: %in% requires a c(...) right-hand side")
      case Bin(op, l0, r0) =>
        val (l, r) = (go(l0), go(r0))
        op match {
          case "+" | "-" | "*" =>
            val (ln, rn) = (numeric(l, op), numeric(r, op))
            val c = op match {
              case "+" => ln.col + rn.col
              case "-" => ln.col - rn.col
              case _ => ln.col * rn.col
            }
            Typed(c, if (ln.t == RInt && rn.t == RInt) RInt else RDbl)
          case "/" => // R division is always double
            Typed(rDivide(numeric(l, op).col, numeric(r, op).col), RDbl)
          case "^" =>
            Typed(pow(numeric(l, op).col.cast(DoubleType),
              numeric(r, op).col.cast(DoubleType)), RDbl)
          case "%%" =>
            // R's %% carries the DIVISOR's sign (-7 %% 3 == 2,
            // 7 %% -3 == -2). Spark's pmod is always non-negative, so
            // build it from %: ((a % b) + b) % b — integral on ints.
            // x %% 0 is NA for ints, NaN for doubles (R), never an
            // ANSI divide-by-zero error.
            val (ln, rn) = (numeric(l, op), numeric(r, op))
            val bothInt = ln.t == RInt && rn.t == RInt
            val zeroCase =
              if (bothInt) lit(null).cast(LongType)
              else lit(Double.NaN)
            Typed(when(rn.col === 0, zeroCase)
              .otherwise(((ln.col % rn.col) + rn.col) % rn.col),
              if (bothInt) RInt else RDbl)
          case "%/%" =>
            // floor division; x %/% 0 is NA for ints, ±Inf/NaN for
            // doubles (floor of the guarded division), as in R
            val (ln, rn) = (numeric(l, op), numeric(r, op))
            val f = floor(rDivide(ln.col, rn.col))
            if (ln.t == RInt && rn.t == RInt)
              Typed(when(rn.col === 0, lit(null).cast(LongType))
                .otherwise(f.cast(LongType)), RInt)
            // Spark floor(double) returns BIGINT; R's %/% on doubles
            // is double
            else Typed(f.cast(DoubleType), RDbl)
          case "==" => Typed(l.col === r.col, RBool)
          case "!=" => Typed(l.col =!= r.col, RBool)
          case "<" => Typed(l.col < r.col, RBool)
          case "<=" => Typed(l.col <= r.col, RBool)
          case ">" => Typed(l.col > r.col, RBool)
          case ">=" => Typed(l.col >= r.col, RBool)
          case "&" => Typed(l.col && r.col, RBool)
          case "|" => Typed(l.col || r.col, RBool)
          case other => throw new IllegalArgumentException(
            s"transformR: unsupported operator '$other'")
        }
      case Call(fn, args) => callFn(fn, args, go)
      case Dollar(o, f) => throw new IllegalArgumentException(
        s"transformR: '$o$$$f' — $$-access is only meaningful on the map "
          + "function's frame parameter in transformMapReduceNative")
    }
    go(e)
  }

  private def callFn(fn: String, args: Seq[(Option[String], Expr)],
                     go: Expr => Typed): Typed = {
    def pos(i: Int): Typed = go(args.collect { case (None, e) => e }.apply(i))
    def posCount: Int = args.count(_._1.isEmpty)
    def named(name: String): Option[Typed] =
      args.collectFirst { case (Some(`name`), e) => go(e) }
    def arity(n: Int): Unit = if (posCount != n)
      throw new IllegalArgumentException(
        s"transformR: $fn expects $n argument(s), got $posCount")
    def one: Column = { arity(1); pos(0).col }
    def oneNum: Typed = { arity(1); numeric(pos(0), fn) }

    fn match {
      case "ifelse" =>
        arity(3)
        val (t, y, n) = (pos(0), pos(1), pos(2))
        // R: ifelse(NA, a, b) is NA; a bare otherwise() would take `no`
        val c = when(isnull(t.col), lit(null)).when(t.col, y.col).otherwise(n.col)
        Typed(c, if (y.t == n.t) y.t else if (Set(y.t, n.t) == Set[RType](RInt, RDbl)) RDbl else ROther)
      case "is.na" =>
        arity(1)
        val t = pos(0)
        // R: is.na(NaN) is TRUE
        val c = if (t.t == RDbl) isnull(t.col) || isnan(t.col.cast(DoubleType))
                else isnull(t.col)
        Typed(c, RBool)
      case "log" =>
        require(posCount == 1 || posCount == 2,
          s"transformR: log expects 1-2 arguments, got $posCount")
        val x = numeric(pos(0), fn).col.cast(DoubleType)
        named("base").orElse(if (posCount > 1) Some(pos(1)) else None) match {
          case Some(b) => Typed(log(x) / log(b.col.cast(DoubleType)), RDbl)
          case None => Typed(log(x), RDbl)
        }
      case "log2" => Typed(log2(oneNum.col.cast(DoubleType)), RDbl)
      case "log10" => Typed(log10(oneNum.col.cast(DoubleType)), RDbl)
      case "log1p" => Typed(log1p(oneNum.col.cast(DoubleType)), RDbl)
      case "exp" => Typed(exp(oneNum.col.cast(DoubleType)), RDbl)
      case "sqrt" => Typed(sqrt(oneNum.col.cast(DoubleType)), RDbl)
      case "abs" => val t = oneNum; Typed(abs(t.col), t.t)
      case "sign" => Typed(signum(oneNum.col.cast(DoubleType)), RDbl)
      // Spark's floor/ceil return BIGINT on double input; R returns
      // double — cast back
      case "floor" => Typed(floor(oneNum.col.cast(DoubleType)).cast(DoubleType), RDbl)
      case "ceiling" => Typed(ceil(oneNum.col.cast(DoubleType)).cast(DoubleType), RDbl)
      case "trunc" =>
        val x = oneNum.col.cast(DoubleType)
        Typed(when(x >= 0, floor(x)).otherwise(ceil(x)).cast(DoubleType), RDbl)
      case "round" =>
        // R rounds half to EVEN — bround, never round
        val digits = named("digits")
          .orElse(if (posCount > 1) Some(pos(1)) else None)
        val x = numeric(pos(0), fn)
        val d = digits.map(_.col.cast(IntegerType))
        d match {
          case None => Typed(bround(x.col.cast(DoubleType)), RDbl)
          case Some(dc) => Typed(bround(x.col.cast(DoubleType), dc), RDbl)
        }
      case "pmin" | "pmax" =>
        val cols = args.collect { case (None, e) => go(e).col }
        require(cols.size >= 2, s"transformR: $fn needs >= 2 arguments")
        Typed(if (fn == "pmin") least(cols: _*) else greatest(cols: _*), RDbl)
      case "nchar" => Typed(length(one), RInt)
      case "toupper" => Typed(upper(one), RStr)
      case "tolower" => Typed(lower(one), RStr)
      case "trimws" => Typed(trim(one), RStr)
      case "substr" | "substring" =>
        arity(3)
        val (x, start, stop) = (pos(0).col, pos(1).col, pos(2).col)
        // R: 1-based, stop-inclusive, silently clipped to the string
        Typed(x.substr(start.cast(IntegerType),
          greatest(stop.cast(IntegerType) - start.cast(IntegerType) + 1, lit(0))), RStr)
      case "paste" | "paste0" =>
        val sep = named("sep").map(_.col) .getOrElse(lit(if (fn == "paste") " " else ""))
        val parts = args.collect { case (None, e) => go(e).col.cast(StringType) }
        require(parts.nonEmpty, s"transformR: $fn needs at least one argument")
        // R pastes NA as the string "NA" (concat() would null the result)
        val safe = parts.map(p => coalesce(p, lit("NA")))
        Typed(safe.reduce((a, b) => concat(a, sep.cast(StringType), b)), RStr)
      case "grepl" =>
        arity(2)
        // R argument order: grepl(pattern, x); Java regex (documented)
        Typed(pos(1).col.rlike_pattern(pos(0)), RBool)
      case "gsub" =>
        arity(3)
        val (pat, x) = (pos(0), pos(2))
        // translate R backrefs on a LITERAL replacement at the AST level;
        // a computed replacement column passes through untouched
        val repl = args.collect { case (None, e) => e }.apply(1) match {
          case Str(v) => lit(rBackrefsToJava(v))
          case other => go(other).col.cast(StringType)
        }
        Typed(regexp_replace(x.col, pat.col.cast(StringType), repl), RStr)
      case "startsWith" =>
        arity(2); Typed(pos(0).col.startsWith(pos(1).col), RBool)
      case "endsWith" =>
        arity(2); Typed(pos(0).col.endsWith(pos(1).col), RBool)
      case "as.integer" =>
        arity(1)
        // R coerces to NA (with a warning) on non-parsable or
        // overflowing input — never an error — so this must be TRY cast,
        // not the ANSI cast that throws CAST_INVALID_INPUT on one bad
        // cell (r14 review; the Dialect try_cast rule). String input
        // parses through double first: R as.integer("2.5") == 2L.
        val x = pos(0)
        Typed(x.t match {
          case RStr => tryCast(tryCast(x.col, DoubleType), LongType)
          case _ => tryCast(x.col, LongType) // truncates toward 0, like R
        }, RInt)
      case "as.numeric" | "as.double" => Typed(tryCast(one, DoubleType), RDbl)
      case "as.character" => Typed(one.cast(StringType), RStr)
      case "c" => throw new IllegalArgumentException(
        "transformR: c(...) is only supported as the right side of %in%")
      case other => throw new IllegalArgumentException(
        s"transformR: unsupported function '$other'")
    }
  }

  /** grepl compiles to `rlike`, whose pattern argument is a Column here
    * (R allows a computed pattern).
    */
  private implicit class RlikeCol(private val c: Column) extends AnyVal {
    def rlike_pattern(pat: Typed): Column =
      regexp_like(c, pat.col.cast(StringType))
  }

  /** R replacement backrefs are `\\1`..`\\9` (a single backslash after
    * string-escape processing); Java's are `$1`. Literal `$` must be
    * escaped for Java.
    */
  private def rBackrefsToJava(s: String): String =
    s.replace("$", "\\$").replaceAll("""\\(\d)""", """\$$1""")

  // -------------------------------------------------------------- API

  // ------------------------------------------------- map-reduce idiom

  /** Structural AST rewrite (bottom-up). */
  private def rewrite(e: Expr)(f: PartialFunction[Expr, Expr]): Expr = {
    val r = e match {
      case Un(op, x) => Un(op, rewrite(x)(f))
      case Bin(op, l, rr) => Bin(op, rewrite(l)(f), rewrite(rr)(f))
      case Call(fn, args) =>
        Call(fn, args.map { case (n, a) => (n, rewrite(a)(f)) })
      case leaf => leaf
    }
    f.applyOrElse(r, identity[Expr])
  }

  private def mentions(e: Expr, name: String): Boolean = e match {
    case Ident(`name`) => true
    case Un(_, x) => mentions(x, name)
    case Bin(_, l, r) => mentions(l, name) || mentions(r, name)
    case Call(_, args) => args.exists { case (_, a) => mentions(a, name) }
    case _ => false
  }

  /** `function(p1, …) { body }` → (params, body AST). The body must be a
    * single expression (the keyval idiom is exactly that).
    */
  private def parseFunction(src: String, what: String): (Seq[String], Expr) = {
    val m = """(?s)\s*function\s*\(([^)]*)\)\s*(.*)""".r
    src match {
      case m(params, body0) =>
        var body = body0.trim
        if (body.startsWith("{")) {
          require(body.endsWith("}"),
            s"transformMapReduceNative: unbalanced braces in the $what function")
          body = body.substring(1, body.length - 1).trim
        }
        val ps = params.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        (ps, new Parser(body, lex(body)).expression())
      case _ => throw new IllegalArgumentException(
        s"transformMapReduceNative: the $what definition must be an R function, got: $src")
    }
  }

  private def keyvalArgs(e: Expr, what: String, fnNames: Set[String]): (Expr, Expr) = e match {
    case Call(fn, args) if fnNames(fn) =>
      def arg(name: String, idx: Int): Expr =
        args.collectFirst { case (Some(`name`), a) => a }
          .orElse(args.collect { case (None, a) => a }.lift(idx))
          .getOrElse(throw new IllegalArgumentException(
            s"transformMapReduceNative: $fn needs a '$name' argument"))
      (arg("key", 0), arg("val", 1))
    case _ => throw new IllegalArgumentException(
      s"transformMapReduceNative: the $what body must be a single " +
        s"${fnNames.mkString("/")}(key=…, val=…) call")
  }

  /** The aggregate vocabulary of the reduce side: R reductions over the
    * grouped value vector `vv`, as Spark aggregate functions. `length`
    * counts every element (R's does not skip NA), the others follow
    * their R namesakes' NA-free semantics on NA-free input; `mean`/`sd`/
    * `var`/`median` are the sample statistics, as in R.
    */
  private val aggregateFns: Map[String, Column => Column] = Map(
    "sum" -> (c => sum(c)),
    "mean" -> (c => avg(c)),
    "max" -> (c => max(c)),
    "min" -> (c => min(c)),
    "length" -> (_ => count(lit(1))),
    "sd" -> (c => stddev_samp(c)),
    "var" -> (c => var_samp(c)),
    "median" -> (c => median(c)))

  /** The reference's `transformMapReduceNative(mapDef, reduceDef)`
    * (TransformationHandler.scala:16-66: R map emitting
    * `keyval(key=…, val=…)` per partition, shuffle on the string key,
    * R reduce emitting `keyval.row(key=key, val=…)`), compiled: the
    * keyval idiom — the reference's only documented usage
    * (TransformationHandlerSpec.scala:20-33) — IS a grouped
    * aggregation, so the map key/val expressions compile like
    * [[transform]] bodies (with `part$col` field access) and the reduce
    * value compiles to Spark aggregate functions over the value column
    * (`sum`/`mean`/`max`/`min`/`length`/`sd`/`var`/`median`, combined
    * arithmetically at will — e.g. `sum(vv) / length(vv)` — with `vv`
    * usable inside an aggregate's argument: `sum(vv * vv)`). One hash
    * shuffle with map-side partial aggregation; output columns are
    * `key`, `val` like the reference's FlinkRList round-trip. R reduce
    * bodies that are not a single keyval over aggregates of `vv` are
    * out of scope — use the typed [[graft.operators.Transforms.mapReduce]].
    */
  def mapReduceR(df: DataFrame, mapFuncDef: String, reduceFuncDef: String): DataFrame = {
    val (mParams, mBody) = parseFunction(mapFuncDef, "map")
    require(mParams.size == 1,
      s"transformMapReduceNative: map takes one frame parameter, got $mParams")
    val part = mParams.head
    val (kAst0, vAst0) = keyvalArgs(mBody, "map", Set("keyval"))
    def strip(e: Expr): Expr = rewrite(e) { case Dollar(`part`, c) => Ident(c) }
    val keyCol = compile(strip(kAst0), df).col
    val valCol = compile(strip(vAst0), df).col

    val (rParams, rBody) = parseFunction(reduceFuncDef, "reduce")
    require(rParams.size == 2,
      s"transformMapReduceNative: reduce takes (key, values), got $rParams")
    val Seq(keyName, vvName) = rParams
    val (rkAst, rvAst) = keyvalArgs(rBody, "reduce", Set("keyval.row", "keyval"))
    require(rkAst == Ident(keyName),
      s"transformMapReduceNative: the reduce key must be the grouping key '$keyName' unchanged")

    val mapped = df.select(keyCol.as("key"), valCol.as("__v"))
    lazy val err = new IllegalArgumentException(
      s"transformMapReduceNative: '$vvName' may only appear inside an " +
        s"aggregate (${aggregateFns.keys.toSeq.sorted.mkString(", ")})")
    val special: PartialFunction[Expr, Typed] = {
      case Call(fn, args) if aggregateFns.contains(fn) =>
        val inner = args match {
          case Seq((None, a)) => a
          case _ => throw new IllegalArgumentException(
            s"transformMapReduceNative: $fn takes one positional argument")
        }
        val innerCol = compile(
          rewrite(inner) { case Ident(`vvName`) => Ident("__v") }, mapped)
        val c = aggregateFns(fn)(innerCol.col)
        fn match {
          case "length" => Typed(c, RInt)
          case "sum" | "max" | "min" => Typed(c, innerCol.t)
          case _ => Typed(c.cast(DoubleType), RDbl)
        }
      case Ident(`vvName`) => throw err
      case Dollar(o, f) => throw new IllegalArgumentException(
        s"transformMapReduceNative: '$o$$$f' in the reduce body — the " +
          "reduce sees (key, values), not the frame")
    }
    val valAgg = compile(rvAst, mapped, special).col
    mapped.groupBy(col("key")).agg(valAgg.as("val"))
  }

  /** Base-R `transform(df, <assignments>)`, compiled to one Catalyst
    * projection. See object Scaladoc for semantics and deviations.
    */
  def transform(df: DataFrame, rExpression: String): DataFrame = {
    require(rExpression.trim.nonEmpty, "transformR: empty expression")
    val toks = lex(rExpression)
    val assigns = new Parser(rExpression, toks).assignments()
    val names = assigns.map(_._1)
    require(names.distinct == names,
      s"transformR: duplicate assignment target(s): ${names.diff(names.distinct).distinct.mkString(", ")}")
    val cols = assigns.map { case (_, e) => compile(e, df).col }
    // ListMap: the Map overload is the public API; insertion order is
    // what places NEW columns in assignment order after the originals
    df.withColumns(scala.collection.immutable.ListMap(names.zip(cols): _*))
  }
}
