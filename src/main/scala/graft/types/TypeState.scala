package graft.types

/** Per-column inferred-type state — a mergeable monoid threaded through
  * the scan, mirroring the reference's typestate record
  * {status, type, size, arraycount, nMin, nMax, MaxSigFigs, MaxDecimals}
  * (/root/reference/lib/json2pgtypes.js:1006, merge semantics
  * /root/reference/lib/pgtypes_reduce.js:162-277).
  *
  * `tpe` is one of: unknown, boolean, integer, real, timestamptz, uuid,
  * macaddr, inet, jsonb, varchar. Arrays are tracked via `arrayCount`
  * (max observed element count; 0 = never saw an array) — singleton
  * arrays of non-varchar types unwrap to scalars at output
  * (json2pgtypes.js:832-837).
  */
case class TypeState(
    status: String = "unk", // unk = never saw a non-null value; tmp = live
    tpe: String = "unknown",
    size: Int = 0,          // max observed UTF-8 byte length
    arrayCount: Int = 0,
    nMin: Long = Long.MaxValue,
    nMax: Long = Long.MinValue,
    maxSigFigs: Int = 0,
    maxDecimals: Int = 0)

object TypeInference {

  // integer→timestamptz promotion window (reference constants,
  // /root/reference/lib/outputpgtypes.js:94-109 and
  // /root/reference/lib/json2pgtypes.js:354-371)
  val EpochWindowLow: Long = 1262332800000L          // 2010-01-01 UTC millis
  val UfdsSentinel: Long = 253406000000000000L       // "neverending" passwdendtime
  def epochWindowHigh: Long = 4102444800000L         // 2100-01-01: stable stand-in for "now"

  private val NullForms = Set("null", "", "\\N", "\\\\n", "[\"\"]", "{}", "[]", "NaN", "default")
  def isNullForm(s: String): Boolean = s == null || NullForms.contains(s.trim)

  private val UuidRe = "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$".r
  private val MacRe = "^([0-9a-fA-F]{1,2}:){5}[0-9a-fA-F]{1,2}$".r
  private val Ip4Re = "^((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\.){3}(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)(/[0-9]{1,2})?$".r
  private val Ip6Re = "^[0-9a-fA-F:]+(:[0-9a-fA-F]*)+(/[0-9]{1,3})?$".r
  private val IntRe = "^-?[0-9]+$".r
  private val RealRe = "^-?([0-9]+\\.[0-9]*|[0-9]*\\.[0-9]+|[0-9]+)([eE][+-]?[0-9]+)?$".r
  private val IsoTsRe = ("^[0-9]{4}-[0-9]{2}-[0-9]{2}([T ][0-9]{2}:[0-9]{2}(:[0-9]{2}(\\.[0-9]+)?)?" +
    "(Z|[+-][0-9]{2}:?[0-9]{2})?)?$").r

  def utf8Len(s: String): Int = s.getBytes("UTF-8").length

  /** Leading-zero guard: "007" is data, not a number
    * (json2pgtypes.js:575-593). */
  private def isInteger(s: String): Boolean =
    IntRe.matches(s) && !(s.length > 1 && s.startsWith("0")) &&
      !(s.length > 2 && s.startsWith("-0")) &&
      (s.stripPrefix("-").length <= 19)

  private def isReal(s: String): Boolean =
    RealRe.matches(s) && (s.contains('.') || s.toLowerCase.contains('e'))

  private def isBooleanStrict(s: String): Boolean =
    Set("TRUE", "FALSE", "T", "F").contains(s.toUpperCase)

  /** sigfig / decimal analysis incl. exponent forms (reference F4,
    * json2pgtypes.js:473-563). */
  def digitsOf(s: String): (Int, Int) = {
    val lower = s.toLowerCase
    val (mant, exp) = lower.indexOf('e') match {
      case -1 => (lower, 0)
      case i => (lower.substring(0, i), lower.substring(i + 1).toInt)
    }
    val digits = mant.replace("-", "").replace(".", "").dropWhile(_ == '0')
    val sigFigs = math.max(1, digits.length)
    val decIdx = mant.indexOf('.')
    val rawDecimals = if (decIdx == -1) 0 else mant.length - decIdx - 1
    val decimals = math.max(0, rawDecimals - exp)
    (sigFigs, decimals)
  }

  /** First-sight classification (reference matchType,
    * json2pgtypes.js:648-894). Order matters. */
  def matchType(s: String): String = {
    val v = s.trim
    if (isBooleanStrict(v)) "boolean"
    else if (isInteger(v)) "integer"
    else if (isReal(v)) "real"
    else if (IsoTsRe.matches(v) && v.length >= 10) "timestamptz"
    else if (UuidRe.matches(v)) "uuid"
    else if (MacRe.matches(v)) "macaddr"
    else if (Ip4Re.matches(v) || (v.count(_ == ':') >= 2 && Ip6Re.matches(v))) "inet"
    else if (isJsonbShape(v)) "jsonb"
    else "varchar"
  }

  /** `{...}`, `[{...}]`, `[[...]]` → jsonb (json2pgtypes.js:769-810). */
  def isJsonbShape(v: String): Boolean = {
    val t = v.trim
    t.startsWith("{") || t.startsWith("[{") || t.startsWith("[[")
  }

  /** Does a value fit an already-chosen type? Weaker than match — e.g.
    * "0"/"1" validate boolean but would never match it
    * (json2pgtypes.js:321-413,329-342). */
  def validateType(tpe: String, s: String): Boolean = {
    val v = s.trim
    tpe match {
      case "boolean" => isBooleanStrict(v) || v == "0" || v == "1"
      case "integer" => isInteger(v)
      case "real" => isReal(v) || isInteger(v)
      case "timestamptz" => IsoTsRe.matches(v) || isInteger(v)
      case "uuid" => UuidRe.matches(v)
      case "macaddr" => MacRe.matches(v)
      case "inet" => Ip4Re.matches(v) || Ip6Re.matches(v)
      case "jsonb" => isJsonbShape(v)
      case "varchar" => true
      case _ => false
    }
  }

  /** The promotion lattice (reference typeThatWins,
    * json2pgtypes.js:613-643): varchar absorbs everything;
    * {real,integer}→real; {boolean,integer}→integer;
    * {timestamptz,integer}→timestamptz; any other mix → varchar. */
  def typeThatWins(a: String, b: String): String = (a, b) match {
    case (x, y) if x == y => x
    case ("unknown", y) => y
    case (x, "unknown") => x
    case ("varchar", _) | (_, "varchar") => "varchar"
    case ("real", "integer") | ("integer", "real") => "real"
    case ("boolean", "integer") | ("integer", "boolean") => "integer"
    case ("timestamptz", "integer") | ("integer", "timestamptz") => "timestamptz"
    case _ => "varchar"
  }

  /** Split a JSON array literal of scalars into element strings.
    * Only called on values that look like arrays of scalars. */
  def splitArray(v: String): Option[Seq[String]] = {
    val t = v.trim
    if (!t.startsWith("[") || !t.endsWith("]")) return None
    val inner = t.substring(1, t.length - 1).trim
    if (inner.startsWith("{") || inner.startsWith("[")) return None // array-of-object/array → jsonb
    if (inner.isEmpty) return Some(Nil)
    // split on commas outside quotes
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inQ = false
    var i = 0
    while (i < inner.length) {
      val c = inner.charAt(i)
      if (c == '"' && (i == 0 || inner.charAt(i - 1) != '\\')) { inQ = !inQ }
      else if (c == ',' && !inQ) { out += sb.toString.trim; sb.clear() }
      else sb.append(c)
      i += 1
    }
    out += sb.toString.trim
    Some(out.toSeq.map(_.stripPrefix("\"").stripSuffix("\"")))
  }

  /** Fold one observed value string into the state (reference driver,
    * json2pgtypes.js:1000-1103). */
  def update(st: TypeState, raw: String): TypeState = {
    if (raw == null || isNullForm(raw)) return st
    val v = raw.trim
    // array handling (json2pgtypes.js:776-878)
    if (v.startsWith("[") && !isJsonbShape(v)) {
      splitArray(v) match {
        case Some(elems) if elems.nonEmpty =>
          val merged = elems.foldLeft(st.copy(status = "tmp",
            arrayCount = math.max(st.arrayCount, elems.length)))(updateScalar)
          return merged
        case _ => // [] empty → null form; unparseable → fall through as varchar
      }
      if (v == "[]") return st
    }
    updateScalar(st, v)
  }

  private def updateScalar(st0: TypeState, v0: String): TypeState = {
    val v = v0.trim
    if (isNullForm(v)) return st0
    var st = st0
    val seen = if (st.status == "unk") matchType(v)
      else if (validateType(st.tpe, v)) st.tpe
      else typeThatWins(st.tpe, matchType(v)) // streaming re-match + promote
    st = st.copy(status = "tmp", tpe = seen, size = math.max(st.size, utf8Len(v)))
    if (seen == "integer" || (seen == "timestamptz" && isInteger(v))) {
      val n = try v.toLong catch { case _: NumberFormatException => 0L }
      st = st.copy(nMin = math.min(st.nMin, n), nMax = math.max(st.nMax, n))
    }
    if (seen == "real" && (isReal(v) || isInteger(v))) {
      val (sf, dec) = digitsOf(v)
      st = st.copy(maxSigFigs = math.max(st.maxSigFigs, sf),
        maxDecimals = math.max(st.maxDecimals, dec))
    }
    st
  }

  /** Distributed partial-state merge (reference pgtypes_reduce.js:162-277):
    * tmp beats unk; varchar wins; real beats integer; integer merges
    * into timestamptz; sizes/bounds take max/min. */
  def merge(a: TypeState, b: TypeState): TypeState = {
    if (a.status == "unk") return b.copy(size = math.max(a.size, b.size))
    if (b.status == "unk") return a.copy(size = math.max(a.size, b.size))
    val tpe = typeThatWins(a.tpe, b.tpe)
    TypeState(
      status = "tmp", tpe = tpe,
      size = math.max(a.size, b.size),
      arrayCount = math.max(a.arrayCount, b.arrayCount),
      nMin = math.min(a.nMin, b.nMin),
      nMax = math.max(a.nMax, b.nMax),
      maxSigFigs = math.max(a.maxSigFigs, b.maxSigFigs),
      maxDecimals = math.max(a.maxDecimals, b.maxDecimals))
  }

  /** Finalize a column to its PostgreSQL DDL type (reference
    * outputPGTypes, /root/reference/lib/outputpgtypes.js:12-273). */
  def toPgType(name: String, st: TypeState, money: Boolean = false): String = {
    val base: String = st.tpe match {
      case "unknown" => "varchar(5)" // unknown_min_size (outputpgtypes.js:10,236-247)
      case "boolean" => "boolean"
      case "integer" =>
        // name-hint → bigint (outputpgtypes.js:67-75)
        if (name.toUpperCase.contains("_BYTES")) "bigint"
        // epoch-millis window or ufds sentinel → timestamptz (:94-109)
        else if ((st.nMax >= EpochWindowLow && st.nMax <= epochWindowHigh &&
          st.nMin >= EpochWindowLow) || st.nMax >= UfdsSentinel) "timestamptz"
        else if (st.nMin >= Short.MinValue && st.nMax <= Short.MaxValue) "smallint"
        else if (st.nMin >= Int.MinValue && st.nMax <= Int.MaxValue) "integer"
        else "bigint"
      case "real" =>
        if (money && st.maxDecimals == 2) "money"
        else if (st.maxSigFigs <= 6) "real"
        else "double precision"
      case "timestamptz" => "timestamptz"
      case "uuid" =>
        // demoted if any observed size > 36 (outputpgtypes.js:186-193)
        if (st.size > 36) s"varchar(${st.size})" else "uuid"
      case "macaddr" => "macaddr"
      case "inet" => "inet"
      case "jsonb" => "jsonb"
      case "varchar" => s"varchar(${math.max(st.size, 1)})"
    }
    // singleton arrays unwrap to scalars; ARRAY suffix only when a
    // multi-element array was observed (json2pgtypes.js:832-837; golden
    // /root/reference/test/json2pgtypes_test2.sql)
    if (st.arrayCount > 1 && st.tpe != "jsonb") s"$base ARRAY" else base
  }

  /** Full DDL for a table (reference S7: lib/outputpgtypes.js). */
  def toDdl(table: String, cols: Seq[(String, TypeState)], money: Boolean = false): String =
    cols.map { case (n, st) => s"$n ${toPgType(n, st, money)}" }
      .mkString(s"CREATE TABLE $table (\n  ", ",\n  ", "\n);")
}
