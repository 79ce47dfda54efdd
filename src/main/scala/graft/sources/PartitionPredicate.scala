package graft.sources

import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._

/** Decide pushed predicates PER FILE from directory-encoded partition
  * values — the metadata half of `SELECT count(*) … WHERE dt = …`:
  * when every pushed filter references only partition columns, each
  * current file's `k=v` path segments decide it wholesale (all rows of
  * a file share its partition values), so the aggregate reduces to a
  * sum over the selected files' sidecar entries. Zero data I/O.
  *
  * Correctness stance: this evaluator may only ever say "decidable,
  * and the answer is X" when X is EXACTLY what the scan would compute
  * — any doubt (unsupported type, non-ASCII string ordering, an
  * unparseable dir, a filter shape outside the supported set) returns
  * None and the caller falls back to the real scan. Getting this wrong
  * is a wrong query answer, so every branch defaults to bailing:
  *  - string ORDERING comparisons only when both sides are pure ASCII
  *    (catalyst compares UTF-8 bytes; Java compares UTF-16 units —
  *    they agree exactly on ASCII);
  *  - numeric comparisons only for integral partition columns;
  *  - dates via LocalDate parsing (exact);
  *  - three-valued logic throughout — `__HIVE_DEFAULT_PARTITION__`
  *    is NULL, and a NULL-valued predicate excludes the file (zero of
  *    its rows can match), matching the scan's semantics.
  */
object PartitionPredicate {

  private val HiveDefault = "__HIVE_DEFAULT_PARTITION__"

  /** The file subset of `cur` selected by `filters`, or None when the
    * predicate set is not partition-decidable. Empty filters select
    * everything. */
  def select(cur: Seq[String], partCols: Seq[String], schema: StructType,
             filters: Seq[Filter]): Option[Seq[String]] = {
    if (filters.isEmpty) return Some(cur)
    if (partCols.isEmpty) return None
    val pset = partCols.toSet
    if (!filters.forall(f =>
        f.references.nonEmpty && f.references.forall(pset))) return None
    val types = schema.fields.map(f => f.name -> f.dataType).toMap
    val decided = cur.map { rel =>
      valuesOf(rel).flatMap { vals =>
        // conjunction of pushed filters; Some(true) = file selected
        filters.foldLeft(Option(Option(true)): Option[Option[Boolean]]) {
          case (None, _) => None
          case (Some(acc), f) =>
            eval(f, vals, types).map(v => and3(acc, v))
        }
      }
    }
    if (decided.exists(_.isEmpty)) None
    else Some(cur.zip(decided).collect {
      case (rel, Some(Some(true))) => rel
    })
  }

  /** A file's decoded partition values — public for the grouped
    * metadata-aggregate path (`GROUP BY <partition col>` answered
    * per dir). */
  def partitionValues(rel: String): Option[Map[String, Option[String]]] =
    valuesOf(rel)

  /** Decode a dir-encoded partition value to its CATALYST form under
    * the column's type (None = not safely decodable — bail). A null
    * partition value (`__HIVE_DEFAULT_PARTITION__`) decodes to
    * catalyst null: the null group is a real group. */
  def catalystValue(raw: Option[String], dt: DataType): Option[Any] =
    raw match {
      case None => Some(null)
      case Some(s) => dt match {
        case _: StringType =>
          Some(org.apache.spark.unsafe.types.UTF8String.fromString(s))
        case _: LongType => s.toLongOption
        case _: IntegerType => s.toIntOption
        case _: DateType =>
          try Some(java.time.LocalDate.parse(s).toEpochDay.toInt)
          catch { case _: Exception => None }
        case _ => None
      }
    }

  /** Parse a file's `k=v` path segments (Hive-escaped) to values;
    * None when a segment fails to parse. Missing keys read as absent
    * (eval bails on them). */
  private def valuesOf(rel: String): Option[Map[String, Option[String]]] = {
    val segs = rel.split('/').dropRight(1).filter(_.contains('='))
    val parsed = segs.map { seg =>
      val i = seg.indexOf('=')
      val k = seg.substring(0, i)
      unescape(seg.substring(i + 1)).map { v =>
        k -> (if (v == HiveDefault) None else Some(v))
      }
    }
    if (parsed.exists(_.isEmpty)) None
    else Some(parsed.map(_.get).toMap)
  }

  /** Hive path unescaping: `%XX` hex — exact inverse of the escaping
    * Spark's partitioned writers apply. A malformed escape bails. */
  private[sources] def unescape(s: String): Option[String] = {
    if (!s.contains('%')) return Some(s)
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%') {
        if (i + 2 >= s.length) return None
        val hex = s.substring(i + 1, i + 3)
        val v = try Integer.parseInt(hex, 16) catch {
          case _: NumberFormatException => return None
        }
        sb.append(v.toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    Some(sb.toString)
  }

  private def and3(a: Option[Boolean], b: Option[Boolean]): Option[Boolean] =
    (a, b) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }

  private def or3(a: Option[Boolean], b: Option[Boolean]): Option[Boolean] =
    (a, b) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }

  private def isAscii(s: String): Boolean = s.forall(_ < 128)

  /** Compare a dir-encoded value against a filter literal under the
    * column's type; None = not safely comparable (bail). Returns the
    * sign of (value - literal). */
  private def cmp(raw: String, lit: Any, dt: DataType): Option[Int] =
    (dt, lit) match {
      case (_: ByteType | _: ShortType | _: IntegerType | _: LongType, n)
          if n.isInstanceOf[Number] =>
        raw.toLongOption.map(v =>
          java.lang.Long.compare(v, n.asInstanceOf[Number].longValue()))
      case (_: StringType, s: String)
          if isAscii(raw) && isAscii(s) =>
        Some(Integer.signum(raw.compareTo(s)))
      case (_: DateType, d) =>
        val litDay = d match {
          case x: java.sql.Date => Some(x.toLocalDate)
          case x: java.time.LocalDate => Some(x)
          case _ => None
        }
        val rawDay = try Some(java.time.LocalDate.parse(raw)) catch {
          case _: Exception => None
        }
        for (l <- litDay; r <- rawDay) yield r.compareTo(l)
      case _ => None
    }

  /** Three-valued evaluation of one filter against one file's
    * partition values. Outer None = NOT DECIDABLE (bail the whole
    * file set); inner None = SQL NULL. */
  private def eval(f: Filter, vals: Map[String, Option[String]],
                   types: Map[String, DataType]): Option[Option[Boolean]] = {
    def valOf(a: String): Option[Option[String]] = vals.get(a)
    def typed(a: String)(op: (String, DataType) => Option[Option[Boolean]])
        : Option[Option[Boolean]] =
      for {
        v <- valOf(a)
        dt <- types.get(a)
        r <- v match {
          case None => Some(None) // NULL partition value → NULL result
          case Some(raw) => op(raw, dt)
        }
      } yield r
    f match {
      case sources.EqualTo(a, lit) =>
        if (lit == null) Some(None)
        else typed(a)((raw, dt) => cmp(raw, lit, dt).map(c => Some(c == 0)))
      case sources.EqualNullSafe(a, lit) =>
        valOf(a).flatMap {
          case None => Some(Some(lit == null))
          case Some(raw) =>
            if (lit == null) Some(Some(false))
            else types.get(a).flatMap(dt =>
              cmp(raw, lit, dt).map(c => Some(c == 0)))
        }
      case sources.GreaterThan(a, lit) =>
        typed(a)((raw, dt) => cmp(raw, lit, dt).map(c => Some(c > 0)))
      case sources.GreaterThanOrEqual(a, lit) =>
        typed(a)((raw, dt) => cmp(raw, lit, dt).map(c => Some(c >= 0)))
      case sources.LessThan(a, lit) =>
        typed(a)((raw, dt) => cmp(raw, lit, dt).map(c => Some(c < 0)))
      case sources.LessThanOrEqual(a, lit) =>
        typed(a)((raw, dt) => cmp(raw, lit, dt).map(c => Some(c <= 0)))
      case sources.In(a, lits) =>
        typed(a) { (raw, dt) =>
          val cs = lits.toSeq.map {
            case null => Some(None) // NULL member → NULL unless a hit
            case l => cmp(raw, l, dt).map(c => Some(c == 0))
          }
          if (cs.exists(_.isEmpty)) None
          else {
            val vs = cs.map(_.get)
            if (vs.contains(Some(true))) Some(Some(true))
            else if (vs.contains(None)) Some(None)
            else Some(Some(false))
          }
        }
      case sources.IsNull(a) => valOf(a).map(v => Some(v.isEmpty))
      case sources.IsNotNull(a) => valOf(a).map(v => Some(v.nonEmpty))
      case sources.StringStartsWith(a, p) =>
        typed(a)((raw, dt) => dt match {
          case _: StringType => Some(Some(raw.startsWith(p)))
          case _ => None
        })
      case sources.StringEndsWith(a, p) =>
        typed(a)((raw, dt) => dt match {
          case _: StringType => Some(Some(raw.endsWith(p)))
          case _ => None
        })
      case sources.StringContains(a, p) =>
        typed(a)((raw, dt) => dt match {
          case _: StringType => Some(Some(raw.contains(p)))
          case _ => None
        })
      case sources.And(l, r) =>
        for (a <- eval(l, vals, types); b <- eval(r, vals, types))
          yield and3(a, b)
      case sources.Or(l, r) =>
        for (a <- eval(l, vals, types); b <- eval(r, vals, types))
          yield or3(a, b)
      case sources.Not(c) =>
        eval(c, vals, types).map(_.map(!_))
      case _: sources.AlwaysTrue => Some(Some(true))
      case _: sources.AlwaysFalse => Some(Some(false))
      case _ => None
    }
  }
}
