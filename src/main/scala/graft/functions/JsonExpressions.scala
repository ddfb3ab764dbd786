package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * json_key_long(json) — the codegen form of
 * `get_json_object(json, '$.<key>').cast(LongType)` for ONE literal
 * top-level key: a single strict byte-scan over the JSON text instead of
 * a full Jackson parse per row (GetJsonObject builds a JsonParser and a
 * JsonGenerator for every value — measured at ~1.9 µs/row on the events
 * props column, ~0.2 s per evaluation at sf0.1, paid by the ~13 query
 * paths that derive the event graph).
 *
 * Semantics are the COMPOSED chain's, not "a reasonable JSON reader's":
 * strict JSON validation on the traversed prefix (malformed → NULL, as
 * Jackson's throw does), first occurrence of the key wins, bool/null/
 * object/array values → NULL (their text never casts to a long), string
 * values cast with Spark's exact string→long rule
 * (`UTF8String.toLong`), integer literals overflow to NULL the same way
 * the digit-string cast does, and non-integer numbers reproduce
 * Jackson's double round-trip before the cast. JsonKeyLongSpec asserts
 * bit-equality against the real get_json_object+cast chain over an
 * adversarial corpus (escapes, duplicates, nesting, overflow, float
 * forms, malformed tails); any divergence found there is a bug HERE.
 */
object JsonKernels {

  /** End index (exclusive) of the JSON value starting at i, with strict
    * validation of everything traversed; -1 = malformed. */
  private def endOfValue(b: Array[Byte], i0: Int): Int = {
    val n = b.length
    var i = i0
    if (i >= n) return -1
    b(i) match {
      case q if isQuote(q) =>
        val e = scanString(b, i + 1, q)
        if (e < 0) -1 else e + 1
      case '{' =>
        i += 1
        i = skipWs(b, i)
        if (i < n && b(i) == '}') return i + 1
        var first = true
        while (i < n) {
          if (!first) {
            if (b(i) != ',') return -1
            i = skipWs(b, i + 1)
          }
          first = false
          if (i >= n || !isQuote(b(i))) return -1
          val ke = scanString(b, i + 1, b(i))
          if (ke < 0) return -1
          i = skipWs(b, ke + 1)
          if (i >= n || b(i) != ':') return -1
          i = skipWs(b, i + 1)
          val ve = endOfValue(b, i)
          if (ve < 0) return -1
          i = skipWs(b, ve)
          if (i < n && b(i) == '}') return i + 1
        }
        -1
      case '[' =>
        i += 1
        i = skipWs(b, i)
        if (i < n && b(i) == ']') return i + 1
        var first = true
        while (i < n) {
          if (!first) {
            if (b(i) != ',') return -1
            i = skipWs(b, i + 1)
          }
          first = false
          val ve = endOfValue(b, i)
          if (ve < 0) return -1
          i = skipWs(b, ve)
          if (i < n && b(i) == ']') return i + 1
        }
        -1
      case 't' => if (isLit(b, i, "true")) i + 4 else -1
      case 'f' => if (isLit(b, i, "false")) i + 5 else -1
      case 'n' => if (isLit(b, i, "null")) i + 4 else -1
      case _ => scanNumber(b, i)
    }
  }

  private def skipWs(b: Array[Byte], i0: Int): Int = {
    var i = i0
    while (i < b.length &&
      (b(i) == ' ' || b(i) == '\t' || b(i) == '\n' || b(i) == '\r')) i += 1
    i
  }

  private def isLit(b: Array[Byte], i: Int, s: String): Boolean = {
    if (i + s.length > b.length) return false
    var j = 0
    while (j < s.length) { if (b(i + j) != s.charAt(j)) return false; j += 1 }
    true
  }

  /** Index of the closing quote of a string whose content starts at i
    * (after the opening quote `q`); validates escapes the way Spark's
    * GetJsonObject Jackson factory does (ALLOW_SINGLE_QUOTES and
    * ALLOW_UNESCAPED_CONTROL_CHARS are enabled there, so both quote
    * styles parse and raw control bytes pass). -1 = malformed. */
  private def scanString(b: Array[Byte], i0: Int, q: Byte): Int = {
    val n = b.length
    var i = i0
    while (i < n) {
      val c = b(i)
      if (c == q) return i
      if (c == '\\') {
        if (i + 1 >= n) return -1
        val e = b(i + 1)
        e match {
          case '"' | '\\' | '/' | 'b' | 'f' | 'n' | 'r' | 't' | '\'' => i += 2
          case 'u' =>
            if (i + 5 >= n) return -1
            var j = i + 2
            while (j < i + 6) {
              val h = b(j)
              val ok = (h >= '0' && h <= '9') || (h >= 'a' && h <= 'f') ||
                (h >= 'A' && h <= 'F')
              if (!ok) return -1
              j += 1
            }
            i += 6
          case _ => return -1
        }
      } else {
        i += 1
      }
    }
    -1
  }

  private def isQuote(c: Byte): Boolean = c == '"' || c == '\''


  /** Strict JSON number token end; -1 = malformed (incl. leading zeros,
    * bare '+', trailing '.', exponent without digits). */
  private def scanNumber(b: Array[Byte], i0: Int): Int = {
    val n = b.length
    var i = i0
    if (i < n && b(i) == '-') i += 1
    if (i >= n) return -1
    if (b(i) == '0') {
      i += 1
      if (i < n && b(i) >= '0' && b(i) <= '9') return -1 // leading zero
    } else if (b(i) >= '1' && b(i) <= '9') {
      while (i < n && b(i) >= '0' && b(i) <= '9') i += 1
    } else return -1
    if (i < n && b(i) == '.') {
      i += 1
      if (i >= n || b(i) < '0' || b(i) > '9') return -1
      while (i < n && b(i) >= '0' && b(i) <= '9') i += 1
    }
    if (i < n && (b(i) == 'e' || b(i) == 'E')) {
      i += 1
      if (i < n && (b(i) == '+' || b(i) == '-')) i += 1
      if (i >= n || b(i) < '0' || b(i) > '9') return -1
      while (i < n && b(i) >= '0' && b(i) <= '9') i += 1
    }
    i
  }

  /** JSON string unescape; null = invalid (cannot happen after
    * scanString validated, kept defensive). */
  private def unescape(b: Array[Byte], s: Int, e: Int): String = {
    val raw = new String(b, s, e - s, java.nio.charset.StandardCharsets.UTF_8)
    if (raw.indexOf('\\') < 0) return raw
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '\\' && i + 1 < raw.length) {
        raw.charAt(i + 1) match {
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '/' => sb.append('/'); i += 2
          case '\'' => sb.append('\''); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'u' =>
            if (i + 6 > raw.length) return null
            sb.append(Integer.parseInt(raw.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case _ => return null
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Spark's string→long cast under the SESSION's eval mode. The
    * declared queries run under Spark 4's default ANSI cast, which
    * THROWS on non-castable text (overflow digits, floats, booleans,
    * struct JSON) — the kernel preserves that failure mode via the same
    * `UTF8StringUtils.toLongExact` the Cast expression calls (exception
    * message may lack the query context; class and behavior match).
    * `ansi = false` callers get the legacy null-on-failure cast. */
  private def castStr(s: String, ansi: Boolean): java.lang.Long = {
    val u = UTF8String.fromString(s)
    if (ansi) {
      java.lang.Long.valueOf(
        org.apache.spark.sql.catalyst.util.UTF8StringUtils.toLongExact(u, null))
    } else {
      val w = new UTF8String.LongWrapper
      if (u.toLong(w)) java.lang.Long.valueOf(w.value) else null
    }
  }

  def jsonKeyLong(json: UTF8String, key: UTF8String,
                  ansi: Boolean): java.lang.Long = {
    val b = json.getBytes
    val n = b.length
    val kb = key.getBytes
    val keyStr = key.toString
    var i = skipWs(b, 0)
    if (i >= n || b(i) != '{') return null
    i = skipWs(b, i + 1)
    if (i < n && b(i) == '}') return null
    var first = true
    // Deferred result: GetJsonObject keeps parsing to the END of the root
    // object after a match (a malformed sibling AFTER the matched value
    // still nulls the whole extraction, spec-verified), so the matched
    // value's slice is recorded and the cast runs only once the object
    // closes cleanly. First occurrence wins (also spec-verified).
    var mStart = -1
    var mEnd = -1
    def finish(): java.lang.Long = {
      if (mStart < 0) return null // key absent
      val vs = mStart
      val ve = mEnd
      b(vs) match {
        case q if isQuote(q) =>
          val dec = unescape(b, vs + 1, ve - 1)
          if (dec == null) null else castStr(dec, ansi)
        case 'n' => null // JSON null → SQL NULL → cast(NULL) = NULL
        case 't' | 'f' =>
          // "true"/"false": ANSI cast throws, legacy nulls
          castStr(new String(b, vs, ve - vs,
            java.nio.charset.StandardCharsets.US_ASCII), ansi)
        case '{' | '[' =>
          // struct text never casts to a long: ANSI throws (message
          // carries the raw slice, not Jackson's re-minified form —
          // behavior and class identical), legacy nulls
          castStr(new String(b, vs, ve - vs,
            java.nio.charset.StandardCharsets.UTF_8), ansi)
        case _ =>
          val tok = new String(b, vs, ve - vs,
            java.nio.charset.StandardCharsets.US_ASCII)
          var pureInt = true
          var j = if (tok.charAt(0) == '-') 1 else 0
          if (j >= tok.length) pureInt = false
          while (pureInt && j < tok.length) {
            val c = tok.charAt(j)
            if (c < '0' || c > '9') pureInt = false
            j += 1
          }
          if (pureInt) castStr(tok, ansi)
          // float/exponent form: Jackson's copyCurrentEvent re-emits the
          // value through its double serialization (≈ Double.toString)
          // before the cast sees it
          else castStr(java.lang.Double.toString(
            java.lang.Double.parseDouble(tok)), ansi)
      }
    }
    while (i < n) {
      if (!first) {
        if (b(i) != ',') return null
        i = skipWs(b, i + 1)
      }
      first = false
      if (i >= n || !isQuote(b(i))) return null
      val ks = i + 1
      val ke = scanString(b, ks, b(i))
      if (ke < 0) return null
      val matches = mStart < 0 && {
        // fast path: raw bytes equal and escape-free
        var eq = ke - ks == kb.length
        var hadEsc = false
        var j = ks
        while (j < ke) { if (b(j) == '\\') { hadEsc = true }; j += 1 }
        if (!hadEsc) {
          var j2 = 0
          while (eq && j2 < kb.length) { if (b(ks + j2) != kb(j2)) eq = false; j2 += 1 }
          eq
        } else {
          val dec = unescape(b, ks, ke)
          dec != null && dec == keyStr
        }
      }
      i = skipWs(b, ke + 1)
      if (i >= n || b(i) != ':') return null
      i = skipWs(b, i + 1)
      if (i >= n) return null
      val vs = i
      val ve = endOfValue(b, vs)
      if (ve < 0) return null
      if (matches) { mStart = vs; mEnd = ve }
      i = skipWs(b, ve)
      if (i < n && b(i) == '}') return finish() // object closed cleanly
    }
    null // ran off the end before the root object closed
  }
}

/** See [[JsonKernels.jsonKeyLong]]. `key` must be a plain field name
  * (no dots/quotes/wildcards — the '$.<key>' single-step path).
  * `ansi` is captured from the session at construction, exactly as the
  * Cast expression this mirrors captures its eval mode at analysis. */
case class JsonKeyLong(child: Expression, key: String,
                       ansi: Boolean =
                         org.apache.spark.sql.internal.SQLConf.get.ansiEnabled)
    extends UnaryExpression {
  require(key.nonEmpty && !key.exists(c => c == '.' || c == '\'' ||
    c == '"' || c == '[' || c == '*' || c == '$'),
    s"json_key_long needs a plain top-level field name, got '$key'")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"json_key_long expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "json_key_long"

  @transient private lazy val keyU: UTF8String = UTF8String.fromString(key)

  override def nullSafeEval(v: Any): Any =
    JsonKernels.jsonKeyLong(v.asInstanceOf[UTF8String], keyU, ansi)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keyRef = ctx.addReferenceObj("key", keyU,
      classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Long $r = graft.functions.JsonKernels.jsonKeyLong($v, $keyRef, $ansi);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): JsonKeyLong =
    copy(child = newChild)
}

object JsonExpressions {
  /** Column binding: exactly `get_json_object(c, s"$$.$key").cast("long")`. */
  def jsonKeyLong(c: Column, key: String): Column =
    ColumnBridge.column(JsonKeyLong(ColumnBridge.expression(c), key))
}
