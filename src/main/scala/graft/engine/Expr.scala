package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Compiler for the reference's three expression grammars to Spark `Column`
 * trees (whole-stage-codegen friendly — no UDFs):
 *
 *  - arithmetic w/ aggregates  (ref: modules/api/app/tuktu/api/Parsing/Parsing.scala:13-170)
 *  - boolean predicates        (ref: Parsing.scala:290-440)
 *  - `${field}` interpolation  (ref: modules/api/app/tuktu/api/utils.scala:137)
 *
 * Comparison semantics follow the reference exactly (Parsing.scala:299-364):
 * numbers compare as Double with epsilon `nearlyEqual` (utils.scala:583-597),
 * null==null is true, null<=/>=null is true, any one-sided-null or
 * type-mismatched comparison is false except != which is true.
 *
 * This is a brand-new implementation: recursive-descent parser over a small
 * token stream, AST compiled to `Column` against a DataFrame schema so
 * dot-paths and types resolve statically (Catalyst then folds/pushes down).
 */
object Expr {

  // ---------------------------------------------------------------- AST
  sealed trait Ast
  final case class Num(v: Double)                           extends Ast
  final case class Str(v: String)                           extends Ast
  final case class BoolLit(v: Boolean)                      extends Ast
  case object NullLit                                       extends Ast
  final case class Field(path: String)                      extends Ast
  final case class Neg(e: Ast)                              extends Ast
  final case class Not(e: Ast)                              extends Ast
  final case class Bin(op: String, l: Ast, r: Ast)          extends Ast // + - * / ^
  final case class Cmp(op: String, l: Ast, r: Ast)          extends Ast // < > <= >= == != in
  final case class And(es: List[Ast])                       extends Ast
  final case class Or(es: List[Ast])                        extends Ast
  final case class Call(name: String, args: List[Ast])      extends Ast

  // ---------------------------------------------------------------- Lexer
  private sealed trait Tok
  private final case class TNum(v: Double)    extends Tok
  private final case class TStr(v: String)    extends Tok
  private final case class TField(p: String)  extends Tok
  private final case class TIdent(s: String)  extends Tok
  private final case class TOp(s: String)     extends Tok
  private case object TLParen                 extends Tok
  private case object TRParen                 extends Tok
  private case object TComma                  extends Tok

  private def lex(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = s.length
    def peek(k: Int): Char = if (i + k < n) s.charAt(i + k) else '\u0000'
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') { out += TLParen; i += 1 }
      else if (c == ')') { out += TRParen; i += 1 }
      else if (c == ',') { out += TComma; i += 1 }
      else if (c == '$' && peek(1) == '{') {
        val end = s.indexOf('}', i + 2)
        require(end > 0, s"unterminated field ref in: $s")
        out += TField(s.substring(i + 2, end)); i = end + 1
      } else if (c == '"' || c == '\'') {
        val sb = new StringBuilder; i += 1
        while (i < n && s.charAt(i) != c) {
          if (s.charAt(i) == '\\' && i + 1 < n) { sb += s.charAt(i + 1); i += 2 }
          else { sb += s.charAt(i); i += 1 }
        }
        require(i < n, s"unterminated string in: $s")
        i += 1; out += TStr(sb.toString)
      } else if (c.isDigit || (c == '.' && peek(1).isDigit)) {
        val start = i
        while (i < n && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
        if (i < n && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
          i += 1
          if (i < n && (s.charAt(i) == '-' || s.charAt(i) == '+')) i += 1
          while (i < n && s.charAt(i).isDigit) i += 1
        }
        out += TNum(s.substring(start, i).toDouble)
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_' || s.charAt(i) == '.')) i += 1
        out += TIdent(s.substring(start, i))
      } else {
        val two = if (i + 1 < n) s.substring(i, i + 2) else ""
        two match {
          case "&&" | "||" | "<=" | ">=" | "==" | "!=" => out += TOp(two); i += 2
          case _ =>
            c match {
              case '<' | '>' | '!' | '+' | '-' | '*' | '/' | '^' => out += TOp(c.toString); i += 1
              case _ => throw new IllegalArgumentException(s"unexpected char '$c' in: $s")
            }
        }
      }
    }
    out.result()
  }

  // ---------------------------------------------------------------- Parser
  private final class P(toks: Vector[Tok]) {
    private var pos = 0
    def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    def next(): Tok = { val t = toks(pos); pos += 1; t }
    def eat(t: Tok): Unit = {
      require(peek.contains(t), s"expected $t got $peek at $pos"); pos += 1
    }
    def atEnd: Boolean = pos >= toks.length
    def save: Int = pos
    def restore(p: Int): Unit = pos = p

    // ---- predicate grammar (ref Parsing.scala:422-436)
    def or(): Ast = {
      val head = and()
      var es = List(head)
      while (peek.contains(TOp("||"))) { next(); es = and() :: es }
      if (es.length == 1) head else Or(es.reverse)
    }
    def and(): Ast = {
      val head = factor()
      var es = List(head)
      while (peek.contains(TOp("&&"))) { next(); es = factor() :: es }
      if (es.length == 1) head else And(es.reverse)
    }
    // factor := comparison | '!'* '(' or ')' | boolFn | boolLit
    def factor(): Ast = {
      val mark = save
      try comparison()
      catch {
        case _: Exception =>
          restore(mark)
          var negs = 0
          while (peek.contains(TOp("!"))) { next(); negs += 1 }
          val base = peek match {
            case Some(TLParen) => next(); val e = or(); eat(TRParen); e
            case Some(TIdent("true"))  => next(); BoolLit(true)
            case Some(TIdent("false")) => next(); BoolLit(false)
            case Some(TIdent(f)) => boolCall(f)
            case other => throw new IllegalArgumentException(s"bad predicate factor: $other")
          }
          if (negs % 2 == 1) Not(base) else base
      }
    }
    private def boolCall(f: String): Ast = {
      next() // ident
      eat(TLParen)
      val args = List.newBuilder[Ast]
      if (!peek.contains(TRParen)) {
        args += value()
        while (peek.contains(TComma)) { next(); args += value() }
      }
      eat(TRParen)
      Call(f, args.result())
    }
    def comparison(): Ast = {
      val l = value()
      val op = peek match {
        case Some(TOp(o)) if Set("<", ">", "<=", ">=", "==", "!=").contains(o) => next(); o
        case Some(TIdent("in")) => next(); "in"
        case other => throw new IllegalArgumentException(s"expected comparison op, got $other")
      }
      val r = value()
      Cmp(op, l, r)
    }
    // value := null | string | strFn | boolLit | boolFn | arith
    def value(): Ast = peek match {
      case Some(TIdent("null"))  => next(); NullLit
      case Some(TIdent("true"))  => next(); BoolLit(true)
      case Some(TIdent("false")) => next(); BoolLit(false)
      case Some(TStr(v))         => next(); Str(v)
      case Some(TIdent(f)) if Set("toLowerCase", "toUpperCase", "capitalize", "SplitGet",
        "JSON.stringify", "SQL", "GetOrNull", "containsFields", "isNumeric",
        "isNull", "isJSON", "containsSubstring", "isEmptyValue", "isEmpty").contains(f) => boolCall(f)
      case _ => addSub()
    }

    // ---- arithmetic grammar (ref Parsing.scala:32-72)
    def addSub(): Ast = {
      var l = divMul()
      while (peek.exists { case TOp("+") | TOp("-") => true; case _ => false }) {
        val TOp(op) = next(): @unchecked
        l = Bin(op, l, divMul())
      }
      l
    }
    def divMul(): Ast = {
      var l = pow()
      while (peek.exists { case TOp("*") | TOp("/") => true; case _ => false }) {
        val TOp(op) = next(): @unchecked
        l = Bin(op, l, pow())
      }
      l
    }
    def pow(): Ast = {
      val negated = peek.contains(TOp("-")) && { next(); true }
      val base = arithFactor()
      var rhs = List.empty[Ast]
      while (peek.contains(TOp("^"))) { next(); rhs = arithFactor() :: rhs }
      // right-associative fold (ref Parsing.scala:93-96)
      val e = (base :: rhs.reverse).reduceRight((a, b) => Bin("^", a, b))
      if (negated) Neg(e) else e
    }
    def arithFactor(): Ast = peek match {
      case Some(TNum(v))   => next(); Num(v)
      case Some(TField(p)) => next(); Field(p)
      case Some(TOp("-"))  => next(); Neg(arithFactor())
      case Some(TLParen)   => next(); val e = addSub(); eat(TRParen); e
      case Some(TIdent(f)) if Expr.aggFns.contains(f) || Expr.numFns.contains(f) || f == "size" =>
        boolCall(f)
      // bare identifier ⇒ field reference (aggregate args like sum(l_quantity))
      case Some(TIdent(f)) if f != "true" && f != "false" && f != "null" && f != "in" =>
        next(); Field(f)
      case other => throw new IllegalArgumentException(s"bad arithmetic factor: $other")
    }
  }

  val aggFns = Set("count", "distinct", "avg", "median", "sum", "max", "min", "stdev")
  val numFns = Set("abs", "floor", "ceil", "round", "sqrt", "log", "exp",
    "sin", "cos", "tan", "asin", "acos", "atan", "sinh", "cosh", "tanh")

  def parsePredicate(s: String): Ast = {
    val p = new P(lex(s)); val a = p.or(); require(p.atEnd, s"trailing tokens in: $s"); a
  }
  def parseArith(s: String): Ast = {
    val p = new P(lex(s)); val a = p.addSub(); require(p.atEnd, s"trailing tokens in: $s"); a
  }

  // ---------------------------------------------------------------- Compile
  /** Epsilon equality of the reference (utils.scala:583-597). */
  def nearlyEqual(a: Column, b: Column, eps: Double = 1e-9): Column = {
    val diff = abs(a - b)
    val minNormal = java.lang.Double.MIN_NORMAL
    when(a === b, lit(true))
      .when(a === 0d or b === 0d or (diff < minNormal), diff < eps * minNormal)
      .otherwise(diff / least(abs(a) + abs(b), lit(Double.MaxValue)) < eps)
  }

  /** Reference's first-char-only capitalize (utils.scala:81-131) — differs from initcap. */
  def capitalize(c: Column): Column =
    concat(upper(substring(c, 1, 1)), c.substr(lit(2), length(c)))

  /** escapeJava(s.replace("'", "''")) as expressions (ref utils.scala:103;
    * commons-lang StringEscapeUtils.escapeJava): named control escapes,
    * `"`/`\` escaped, anything outside printable ASCII → `\uXXXX` with
    * 4-digit uppercase hex, astral code points as surrogate-pair escapes.
    * `split(s, "")` iterates code points, so supplementary chars arrive
    * whole and are re-split into UTF-16 surrogates arithmetically. */
  def escapeJavaSql(c: Column): Column = {
    def u(cp: Column): Column = concat(lit("\\u"), lpad(hex(cp), 4, "0"))
    val escChar = (ch: Column) => {
      val cp = ascii(ch)
      when(ch === "", lit("")) // split artifacts; ascii("")=0 must not escape
        .when(ch === "\\", lit("\\\\"))
        .when(ch === "\"", lit("\\\""))
        .when(ch === "\b", lit("\\b"))
        .when(ch === "\n", lit("\\n"))
        .when(ch === "\t", lit("\\t"))
        .when(ch === "\f", lit("\\f"))
        .when(ch === "\r", lit("\\r"))
        .when(cp > 0xFFFF, // UTF-16 surrogate pair, as Java would emit
          concat(u(lit(0xD800) + floor((cp - 0x10000) / 1024).cast(IntegerType)),
                 u(lit(0xDC00) + pmod(cp - 0x10000, lit(1024)))))
        .when(cp < 32 || cp > 127, u(cp))
        .otherwise(ch)
    }
    array_join(transform(split(regexp_replace(c, "'", "''"), ""), escChar), "")
  }

  private def isStringType(df: DataFrame, path: String): Boolean =
    resolveType(df, path).exists(_.isInstanceOf[StringType])
  private def isArrayType(df: DataFrame, path: String): Boolean =
    resolveType(df, path).exists(_.isInstanceOf[ArrayType])

  private def resolveType(df: DataFrame, path: String): Option[DataType] = {
    def walk(dt: DataType, parts: List[String]): Option[DataType] = (dt, parts) match {
      case (t, Nil) => Some(t)
      case (s: StructType, h :: t) => s.fields.find(_.name == h).flatMap(f => walk(f.dataType, t))
      case _ => None
    }
    walk(StructType(df.schema.fields), path.split('.').toList)
  }

  private def isLiteral(a: Ast): Boolean = a match {
    case Num(_) | Str(_) | BoolLit(_) => true
    case _                            => false
  }

  private def stringy(df: DataFrame, a: Ast): Boolean = a match {
    case Str(_)                                    => true
    case Field(p)                                  => isStringType(df, p)
    case Call("toLowerCase" | "toUpperCase" | "capitalize" | "SplitGet" | "JSON.stringify"
              | "SQL" | "GetOrNull", _) => true
    case _                                         => false
  }
  private def booly(a: Ast): Boolean = a match {
    case BoolLit(_) | Not(_) | And(_) | Or(_) => true
    case Call(f, _) => Set("containsFields", "isNumeric", "isNull", "isJSON",
      "containsSubstring", "isEmptyValue", "isEmpty").contains(f)
    case _ => false
  }

  /** Compile a value AST to a Column; `num=true` coerces to double. */
  private def compileValue(df: DataFrame, a: Ast, num: Boolean = false): Column = a match {
    case Num(v)     => lit(v)
    case Str(v)     => lit(v)
    case BoolLit(v) => lit(v)
    case NullLit    => lit(null)
    case Field(p)   => if (num) col(p).cast(DoubleType) else col(p)
    case Neg(e)     => -compileValue(df, e, num = true)
    case Bin("^", l, r) => pow(compileValue(df, l, num = true), compileValue(df, r, num = true))
    case Bin(op, l, r) =>
      val (lc, rc) = (compileValue(df, l, num = true), compileValue(df, r, num = true))
      op match {
        case "+" => lc + rc
        case "-" => lc - rc
        case "*" => lc * rc
        case "/" => lc / rc
      }
    case Call(f, args) => compileCall(df, f, args)
    case Not(e)   => !compileBool(df, e)
    case And(_) | Or(_) | Cmp(_, _, _) => compileBool(df, a)
  }

  private def compileCall(df: DataFrame, f: String, args: List[Ast]): Column = {
    def a0 = compileValue(df, args.head)
    def a0num = compileValue(df, args.head, num = true)
    def fieldOf(ast: Ast): String = ast match {
      case Field(p) => p
      case Str(p)   => p
      case other    => throw new IllegalArgumentException(s"$f expects a field, got $other")
    }
    f match {
      // numeric scalar fns (ref Parsing.scala:51-53, 98-113)
      case "abs" => abs(a0num)          case "floor" => floor(a0num).cast(DoubleType)
      case "ceil" => ceil(a0num).cast(DoubleType)
      case "round" => round(a0num, 0).cast(DoubleType)
      case "sqrt" => sqrt(a0num)        case "log" => log(a0num)
      case "exp" => exp(a0num)          case "sin" => sin(a0num)
      case "cos" => cos(a0num)          case "tan" => tan(a0num)
      case "asin" => asin(a0num)        case "acos" => acos(a0num)
      case "atan" => atan(a0num)        case "sinh" => sinh(a0num)
      case "cosh" => cosh(a0num)        case "tanh" => tanh(a0num)
      // aggregates over a field path (ref Parsing.scala:44, 114-166); usable
      // inside groupBy().agg(...) — Spark's partial/final agg replaces the
      // reference's packet-scoped fold.
      case "count"    => count(col(fieldOf(args.head)))
      case "distinct" => count_distinct(col(fieldOf(args.head)))
      case "avg"      => avg(col(fieldOf(args.head)).cast(DoubleType))
      case "median"   => median(col(fieldOf(args.head)).cast(DoubleType))
      case "sum"      => sum(col(fieldOf(args.head)).cast(DoubleType))
      case "max"      => max(col(fieldOf(args.head)).cast(DoubleType))
      case "min"      => min(col(fieldOf(args.head)).cast(DoubleType))
      case "stdev"    => stddev_pop(col(fieldOf(args.head)).cast(DoubleType))
      // string fns (ref Parsing.scala:385-388; utils.scala:81-131)
      case "toLowerCase" => lower(a0)
      case "toUpperCase" => upper(a0)
      case "capitalize"  => Expr.capitalize(a0)
      // SplitGet(field, sep, idx): ref utils.scala SplitGet does
      // rv.split(splitChar)(splitIndex) — 0-based index, separator is a REGEX
      // (passed through to String.split unquoted); element_at is 1-based.
      case "SplitGet" =>
        val sep = args(1) match { case Str(v) => v; case other => other.toString }
        val idx = args(2) match { case Num(v) => v.toInt; case Str(v) => v.toInt; case _ => 0 }
        element_at(split(a0, sep), idx + 1)
      // GetOrNull(field): value rendered as string, absent → "null"
      // (ref utils.scala:123-127)
      case "GetOrNull" => coalesce(a0.cast(StringType), lit("null"))
      // SQL(value): render as a SQL literal (ref utils.scala:97-106):
      // null → NULL, booleans → 1/0, strings `'` + escapeJava(s.replace("'",
      // "''")) + `'`, numbers verbatim. escapeJava semantics (commons-lang):
      // \b \n \t \f \r short forms, `"`→\" and `\`→\\, every other char
      // outside 0x20-0x7f → \uXXXX (4-digit UPPERCASE hex; astral code
      // points become a UTF-16 surrogate pair of escapes). Implemented as a
      // per-char transform — O(n) per string, no UDF.
      case "SQL" =>
        val dt = df.select(a0).schema.head.dataType
        dt match {
          case BooleanType =>
            when(a0.isNull, lit("NULL")).otherwise(when(a0, lit("1")).otherwise(lit("0")))
          case _: org.apache.spark.sql.types.StringType =>
            when(a0.isNull, lit("NULL"))
              .otherwise(concat(lit("'"), Expr.escapeJavaSql(a0), lit("'")))
          case _ =>
            when(a0.isNull, lit("NULL")).otherwise(a0.cast(StringType))
        }
      case "JSON.stringify" => to_json(a0)
      // size(field): array length / string length (ref Parsing.scala:396-399)
      case "size" =>
        val p = fieldOf(args.head)
        if (isArrayType(df, p)) size(col(p)).cast(DoubleType) else length(col(p)).cast(DoubleType)
      // predicate fns (ref Parsing.scala:409-418)
      case "containsFields" => args.map(x => col(fieldOf(x)).isNotNull).reduce(_ && _)
      case "isNumeric"      => col(fieldOf(args.head)).cast(DoubleType).isNotNull
      case "isNull"         => col(fieldOf(args.head)).isNull
      case "isJSON" =>
        args.map { x =>
          from_json(col(fieldOf(x)), MapType(StringType, StringType)).isNotNull
        }.reduce(_ && _)
      case "containsSubstring" => // haystack contains every listed substring
        args.tail.map(x => a0.contains(compileValue(df, x))).reduce(_ && _)
      case "isEmptyValue" =>
        val p = fieldOf(args.head)
        if (isArrayType(df, p)) size(col(p)) === 0 else col(p) === ""
      case "isEmpty" => df.columns.map(c => col(c).isNull).reduce(_ && _)
      case other     => throw new IllegalArgumentException(s"unknown function: $other")
    }
  }

  /** Compile comparison with the reference's null/epsilon table (Parsing.scala:299-364). */
  private def compileCmp(df: DataFrame, op: String, l: Ast, r: Ast): Column = {
    val bothNullable = (l == NullLit) || (r == NullLit)
    if (op == "in") {
      val lc = compileValue(df, l)
      r match {
        case Field(p) if isArrayType(df, p) => array_contains(col(p), lc)
        case _ =>
          val rc = compileValue(df, r)
          rc.contains(lc) // (String, String) in = substring (Parsing.scala:338)
      }
    } else if (stringy(df, l) || stringy(df, r)) {
      val (lc, rc) = (compileValue(df, l), compileValue(df, r))
      val base = op match {
        case "==" => lc === rc   case "!=" => lc =!= rc
        case "<"  => lc < rc     case ">"  => lc > rc
        case "<=" => lc <= rc    case ">=" => lc >= rc
      }
      // a literal operand is never null, so the null table collapses and the
      // plain (pushdown-friendly) comparison is exact — except != where a
      // one-sided null must yield true
      if ((isLiteral(l) || isLiteral(r)) && l != NullLit && r != NullLit) {
        if (op == "!=") coalesce(base, lit(true)) else base
      } else {
        val nullCase = op match {
          case "==" | "<=" | ">=" => lc.isNull && rc.isNull
          case "!=" => lc.isNull =!= rc.isNull // one-sided null → true
          case _    => lit(false)
        }
        when(lc.isNull || rc.isNull, nullCase).otherwise(base)
      }
    } else if (booly(l) || booly(r)) {
      val (lc, rc) = (compileBool(df, l), compileBool(df, r))
      coalesce(op match {
        case "==" => lc === rc   case "!=" => lc =!= rc
        case "<"  => lc < rc     case ">"  => lc > rc
        case "<=" => lc <= rc    case ">=" => lc >= rc
      }, lit(op == "!="))
    } else {
      val (lc, rc) = (compileValue(df, l, num = true), compileValue(df, r, num = true))
      val ne = nearlyEqual(lc, rc)
      val bothNull = lc.isNull && rc.isNull
      val anyNull = lc.isNull || rc.isNull
      val litSide = (isLiteral(l) || isLiteral(r)) &&
        l != NullLit && r != NullLit // non-null literal → bothNull impossible
      op match {
        case "==" if litSide => ne
        case "!=" if litSide => coalesce(!ne, lit(true))
        case "<=" if litSide => lc < rc || ne
        case ">=" if litSide => lc > rc || ne
        case "==" => when(bothNull, lit(true)).when(anyNull, lit(false)).otherwise(ne)
        case "!=" => when(bothNull, lit(false)).when(anyNull, lit(true)).otherwise(!ne)
        case "<=" => when(bothNull, lit(true)).when(anyNull, lit(false)).otherwise(lc < rc || ne)
        case ">=" => when(bothNull, lit(true)).when(anyNull, lit(false)).otherwise(lc > rc || ne)
        // plain conjunction (null → null → false in a filter, matching the
        // reference's false) so Catalyst can split the `<`/`>` conjunct and
        // push it to the parquet scan; the CASE form would block pushdown
        case "<"  => lc < rc && !ne
        case ">"  => lc > rc && !ne
      }
    }
  }

  private def compileBool(df: DataFrame, a: Ast): Column = a match {
    case BoolLit(v)     => lit(v)
    case Not(e)         => !compileBool(df, e)
    case And(es)        => es.map(compileBool(df, _)).reduce(_ && _)
    case Or(es)         => es.map(compileBool(df, _)).reduce(_ || _)
    case Cmp(op, l, r)  => compileCmp(df, op, l, r)
    case Call(f, args)  => compileCall(df, f, args)
    case other          => throw new IllegalArgumentException(s"not a predicate: $other")
  }

  // ---------------------------------------------------------------- API
  /** Compile a Tuktu predicate string to a boolean Column bound to `df`. */
  def predicate(df: DataFrame, s: String): Column = compileBool(df, parsePredicate(s))

  /** Compile a Tuktu arithmetic string (row context — no aggregates). */
  def arithmetic(df: DataFrame, s: String): Column = compileValue(df, parseArith(s), num = true)

  /** Compile a Tuktu arithmetic string with aggregate fns, for use in agg(). */
  def aggregate(df: DataFrame, s: String): Column = compileValue(df, parseArith(s), num = true)

  /** `evaluateTuktuString`: "${a} x ${b}" → concat of lits and columns
    * (ref utils.scala:137). */
  def interpolate(s: String): Column = {
    val parts = List.newBuilder[Column]
    var i = 0
    val sb = new StringBuilder
    while (i < s.length) {
      if (s.charAt(i) == '$' && i + 1 < s.length && s.charAt(i + 1) == '{') {
        val end = s.indexOf('}', i + 2)
        require(end > 0, s"unterminated interpolation in: $s")
        if (sb.nonEmpty) { parts += lit(sb.toString); sb.clear() }
        parts += col(s.substring(i + 2, end)).cast(StringType)
        i = end + 1
      } else { sb += s.charAt(i); i += 1 }
    }
    if (sb.nonEmpty) parts += lit(sb.toString)
    val ps = parts.result()
    if (ps.isEmpty) lit("") else if (ps.length == 1) ps.head else concat(ps: _*)
  }
}
