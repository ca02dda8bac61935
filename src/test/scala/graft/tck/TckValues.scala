package graft.tck

/** Canonical value domain for TCK result comparison: both the expected
  * table cells (TCK literal syntax — `(:L {k: 1})`, `[:T]`, `[1, 'a']`,
  * `{k: v}`) and the engine's collected Spark rows map into these, then
  * compare structurally. Integers and floats are distinct (TCK
  * semantics); node labels compare as sets; null-valued props drop
  * (schema-evolved columns hold null for every node that lacks the key).
  */
sealed trait TV
case object VNull extends TV
final case class VBool(b: Boolean) extends TV
final case class VInt(v: Long) extends TV
final case class VFloat(v: Double) extends TV {
  // case-class equality on Double uses primitive == (NaN ≠ NaN); result
  // comparison needs NaN cells to match NaN expectations
  override def equals(o: Any): Boolean = o match {
    case VFloat(w) => java.lang.Double.compare(v, w) == 0 || v == w
    case _ => false
  }
  // equals treats 0.0 == -0.0 (via `|| v == w`); normalize the zero sign
  // so hashCode agrees — hash-based bag comparison must not split them
  override def hashCode: Int = java.lang.Double.hashCode(v + 0.0)
}
final case class VStr(s: String) extends TV
final case class VList(xs: Vector[TV]) extends TV
final case class VMap(m: Map[String, TV]) extends TV
final case class VNode(labels: Set[String], props: Map[String, TV]) extends TV
final case class VRel(tpe: String, props: Map[String, TV]) extends TV
/** A path: nodes plus (rel, forward?) steps — `<(:A)-[:T]->(:B)>`. */
final case class VPath(nodes: Vector[TV], steps: Vector[(TV, Boolean)]) extends TV

final class TckUnsupported(msg: String) extends RuntimeException(msg)

object TckValues {

  // ---------------- expected-cell parser ----------------

  def parse(s: String): TV = {
    val p = new P(s.trim)
    val v = p.value()
    p.ws()
    if (!p.eof) throw new TckUnsupported(s"trailing content in value: $s")
    v
  }

  private final class P(s: String) {
    var i = 0
    def eof: Boolean = i >= s.length
    def ws(): Unit = while (!eof && s(i).isWhitespace) i += 1
    def peek: Char = s(i)
    def expect(c: Char): Unit = {
      if (eof || s(i) != c) throw new TckUnsupported(s"expected '$c' at $i in: $s")
      i += 1
    }

    def value(): TV = {
      ws()
      if (eof) throw new TckUnsupported(s"empty value in: $s")
      peek match {
        case '\'' => str()
        case '[' =>
          // `[:T ...]` is a relationship, `[v, ...]` a list
          val save = i
          i += 1; ws()
          if (!eof && peek == ':') { i = save; rel() } else { i = save; list() }
        case '(' => node()
        case '{' => map()
        case '<' => path()
        case _ => atom()
      }
    }

    def str(): TV = {
      expect('\''); val b = new StringBuilder
      while (!eof && peek != '\'') {
        if (peek == '\\' && i + 1 < s.length) {
          s(i + 1) match {
            case '\'' => b += '\''; i += 2
            case '\\' => b += '\\'; i += 2
            case 'n' => b += '\n'; i += 2
            case 't' => b += '\t'; i += 2
            case other => b += '\\'; b += other; i += 2
          }
        } else { b += peek; i += 1 }
      }
      expect('\'')
      VStr(b.toString)
    }

    def atom(): TV = {
      val start = i
      while (!eof && !", ]})|".contains(peek)) i += 1
      val tok = s.substring(start, i).trim
      tok match {
        case "null" => VNull
        case "true" => VBool(true)
        case "false" => VBool(false)
        case "NaN" => VFloat(Double.NaN)
        case t if t.matches("-?\\d+") => VInt(t.toLong)
        case t if t.matches("-?\\d*\\.?\\d+([eE][+-]?\\d+)?") || t.matches("-?\\d+\\.\\d*") =>
          VFloat(t.toDouble)
        case t => throw new TckUnsupported(s"unrecognized atom: $t")
      }
    }

    def list(): TV = {
      expect('['); ws()
      val xs = Vector.newBuilder[TV]
      if (!eof && peek != ']') {
        xs += value(); ws()
        while (!eof && peek == ',') { i += 1; xs += value(); ws() }
      }
      expect(']')
      VList(xs.result())
    }

    def map(): TV = { expect('{'); val m = mapBody(); expect('}'); VMap(m) }

    /** key: value pairs up to the closing brace (not consumed). */
    def mapBody(): Map[String, TV] = {
      ws()
      val m = Map.newBuilder[String, TV]
      var more = !eof && peek != '}'
      while (more) {
        ws()
        val ks = i
        while (!eof && (peek.isLetterOrDigit || peek == '_')) i += 1
        val k = s.substring(ks, i)
        ws(); expect(':')
        m += k -> value()
        ws()
        if (!eof && peek == ',') { i += 1; more = true } else more = false
      }
      m.result()
    }

    def node(): TV = {
      expect('('); ws()
      val labels = Set.newBuilder[String]
      while (!eof && peek == ':') {
        i += 1
        val ks = i
        while (!eof && (peek.isLetterOrDigit || peek == '_')) i += 1
        labels += s.substring(ks, i)
        ws()
      }
      ws()
      val props = if (!eof && peek == '{') { expect('{'); val m = mapBody(); expect('}'); m }
        else Map.empty[String, TV]
      ws(); expect(')')
      VNode(labels.result(), props)
    }

    /** `<(:A)-[:T {k: 1}]->(:B)<-[:X]-(:C)>` — nodes joined by directed
      * or reversed steps. */
    def path(): TV = {
      expect('<'); ws()
      val nodes = Vector.newBuilder[TV]
      val steps = Vector.newBuilder[(TV, Boolean)]
      nodes += node()
      ws()
      while (!eof && peek != '>') {
        val back = peek == '<'
        if (back) { i += 1; ws() }
        expect('-'); ws()
        val r = if (!eof && peek == '[') rel() else VRel("", Map.empty)
        ws(); expect('-'); ws()
        val fwd = !eof && peek == '>'
        if (fwd) { i += 1; ws() }
        if (back == fwd) throw new TckUnsupported("undirected step in path literal")
        steps += ((r, fwd))
        nodes += node()
        ws()
      }
      expect('>')
      VPath(nodes.result(), steps.result())
    }

    def rel(): TV = {
      expect('['); ws(); expect(':')
      val ks = i
      while (!eof && (peek.isLetterOrDigit || peek == '_')) i += 1
      val t = s.substring(ks, i)
      ws()
      val props = if (!eof && peek == '{') { expect('{'); val m = mapBody(); expect('}'); m }
        else Map.empty[String, TV]
      ws(); expect(']')
      VRel(t, props)
    }
  }

  // ---------------- Spark-result conversion ----------------

  def fromSpark(v: Any): TV = v match {
    case null => VNull
    case b: Boolean => VBool(b)
    case x: Byte => VInt(x.toLong)
    case x: Short => VInt(x.toLong)
    case x: Int => VInt(x.toLong)
    case x: Long => VInt(x)
    case x: Float => VFloat(x.toDouble)
    case x: Double => VFloat(x)
    case x: java.math.BigDecimal =>
      if (x.scale <= 0) VInt(x.longValueExact()) else VFloat(x.doubleValue())
    case s: String => VStr(s)
    // temporal values render as their ISO text — the TCK's expected cells
    // quote them as strings ('1910-05-06')
    case d: java.sql.Date => VStr(d.toLocalDate.toString)
    case d: java.time.LocalDate => VStr(d.toString)
    case t: java.sql.Timestamp => VStr(t.toLocalDateTime.toString)
    case t: java.time.LocalDateTime => VStr(t.toString)
    case t: java.time.Instant => VStr(t.toString)
    case xs: scala.collection.Seq[_] => VList(xs.map(fromSpark).toVector)
    case m: scala.collection.Map[_, _] =>
      VMap(m.map { case (k, x) => k.toString -> fromSpark(x) }.toMap)
    case r: org.apache.spark.sql.Row =>
      val names = r.schema.fieldNames
      val fields = names.zipWithIndex.map { case (f, ix) => f -> fromSpark(r.get(ix)) }.toMap
      // engine-internal metadata fields (_eid/_src/_dst/…) are not
      // user-visible properties
      def props(m: Map[String, TV]): Map[String, TV] =
        m.filter { case (k, v) => !k.startsWith("_") && v != VNull }
      if (names.contains("_vrank") && names.contains("_vtck")) {
        // dynamic-typed (variant) struct: rank 8 is the null value;
        // anything else renders through its canonical openCypher literal
        // text, which this file's own parser reads back — so a variant
        // result compares exactly like a natively-typed one
        if (r.getAs[Int]("_vrank") == 8) VNull
        else parse(r.getAs[String]("_vtck"))
      } else if (names.contains("_tkind") && names.contains("_iso")) {
        // tagged temporal struct (zoned datetime/time/duration — kinds
        // Spark types can't carry): renders as its ISO text, exactly how
        // the TCK quotes temporal expectations
        VStr(r.getAs[String]("_iso"))
      } else if (names.contains("_pathn") && names.contains("_pathr")) {
        // whole-path struct: aligned node structs + rel structs; per-step
        // direction recovered from the rel's true _src vs the node order
        val nodes = fields("_pathn") match { case VList(xs) => xs; case _ => Vector.empty }
        val nrows = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("_pathn")
        val rrows = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("_pathr")
        if (nrows == null || rrows == null || nrows.exists(_ == null) || rrows.exists(_ == null))
          VNull
        else {
          val nodeIds = nrows.map(n => n.getAs[Long]("id")).toVector
          val steps = rrows.toVector.zipWithIndex.map { case (rr, i) =>
            val fwd = rr.getAs[Long]("_src") == nodeIds(i)
            (fromSpark(rr), fwd)
          }
          VPath(nodes, steps)
        }
      } else if (fields.get("_eid").exists(_ != VNull) && names.contains("label")) {
        // rel struct (possibly in a unified node/rel element type where
        // the node-only `id` field is a typed null). Unlike nodes, a rel's
        // identity is `_eid` — an `id` field IS a user property (With3
        // [1]); in the unified element type a rel's node-only `id` is a
        // typed null and drops with the other null-valued fields.
        val t = fields("label") match { case VStr(l) => l; case _ => "" }
        VRel(t, props(fields.removed("label")))
      } else if (names.contains("id") && names.contains("label")) {
        // whole-node struct: id is identity, label is the label set,
        // null-valued columns are absent properties
        val labels = fields("label") match {
          case VStr(l) => l.split(':').filter(_.nonEmpty).toSet
          case _ => Set.empty[String]
        }
        // a user `id` property lives in the hidden `_uid` slot (the `id`
        // field is internal identity, never user-visible)
        val userId = fields.get("_uid").filter(_ != VNull)
        val base = fields.removedAll(Seq("id", "label"))
        VNode(labels, props(userId.fold(base)(u => base.updated("id", u))))
      } else if (names.contains("label")) {
        val t = fields("label") match { case VStr(l) => l; case _ => "" }
        VRel(t, props(fields.removed("label")))
      } else VMap(fields)
    case other => throw new TckUnsupported(s"unconvertible result value: $other (${other.getClass})")
  }
}
