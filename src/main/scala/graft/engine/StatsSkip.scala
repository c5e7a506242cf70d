package graft.engine

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.types._

/** Canonical encoding + ordering for per-file column bounds
  * (`Icelite.DataFile.colStats`) — the icelite analog of Iceberg's
  * manifest `lower_bounds`/`upper_bounds` scan planning.
  *
  * Bounds are stored as strings in the manifest JSON and compared TYPED at
  * scan-planning time (numerics numerically, strings by unsigned UTF-8
  * bytes — the order parquet binary statistics are computed in, so a file
  * bound and a query bound always agree on direction). Rather than
  * truncate long string bounds (Iceberg truncates to 16 bytes and must
  * increment the upper bound's last byte to stay an upper bound), a string
  * bound longer than [[MaxStringBound]] chars drops the column's stats for
  * that file entirely — "unknown, never skip" is always sound and the
  * stats columns this exists for (language, category, short identifiers)
  * never hit the cap.
  */
object StatsSkip {

  /** Longest string bound kept in a manifest; longer => stats omitted. */
  val MaxStringBound = 64

  /** Is `dt` a type this skipper can harvest and compare? */
  def supported(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | TimestampType | FloatType | DoubleType |
        StringType => true
    case _ => false
  }

  /** Encode a parquet-footer (min, max) pair for storage. The values are
    * what `Statistics.genericGetMin/Max` returns for the physical type
    * (Integer/Long for int32/int64 — timestamps included, Float/Double,
    * parquet `Binary` for UTF-8 strings). None = unharvestable (store no
    * stats: never skip). */
  def encode(dt: DataType, min: Any, max: Any): Option[List[String]] = dt match {
    case IntegerType | LongType | TimestampType | FloatType | DoubleType =>
      Some(List(min.toString, max.toString))
    case StringType =>
      val mn = binToString(min)
      val mx = binToString(max)
      if (mn.length > MaxStringBound || mx.length > MaxStringBound) None
      else Some(List(mn, mx))
    case _ => None
  }

  private[engine] def binToString(v: Any): String = v match {
    case b: org.apache.parquet.io.api.Binary =>
      new String(b.getBytes, StandardCharsets.UTF_8)
    case s: String => s
    case other => other.toString
  }

  /** Canonicalize a caller-supplied query bound to the stored encoding. */
  def canon(dt: DataType, v: Any): String = dt match {
    case TimestampType => v match {
      case t: java.sql.Timestamp => // micros since epoch, footer encoding
        (t.getTime * 1000L + (t.getNanos / 1000L) % 1000L).toString
      case n: Number => n.longValue.toString
      case s: String => s
    }
    case IntegerType | LongType => v match {
      case n: Number => n.longValue.toString
      case s: String => s.trim
    }
    case FloatType | DoubleType => v match {
      case n: Number => n.doubleValue.toString
      case s: String => s.trim
    }
    case _ => v.toString
  }

  /** Typed three-way compare of two canonical bound strings. */
  def cmp(dt: DataType, a: String, b: String): Int = dt match {
    case IntegerType | LongType | TimestampType =>
      java.lang.Long.compare(a.toLong, b.toLong)
    case FloatType | DoubleType =>
      java.lang.Double.compare(a.toDouble, b.toDouble)
    case _ => // unsigned UTF-8 byte order (parquet binary stats order)
      val ab = a.getBytes(StandardCharsets.UTF_8)
      val bb = b.getBytes(StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(ab.length, bb.length)
      while (i < n) {
        val d = (ab(i) & 0xff) - (bb(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      ab.length - bb.length
  }

  /** Decode a stored canonical bound back to the EXTERNAL value a reader
    * of the flattened state would see for `dt` (inverse of [[encode]] +
    * [[canon]]): timestamps micros-exact `java.sql.Timestamp`, numerics
    * their boxed type, strings as-is. Metadata-only min/max answers are
    * built from these. */
  def decode(dt: DataType, s: String): Any = dt match {
    case IntegerType => java.lang.Integer.valueOf(s.trim)
    case LongType => java.lang.Long.valueOf(s.trim)
    case TimestampType =>
      val micros = s.trim.toLong
      val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
      ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
      ts
    case FloatType => java.lang.Float.valueOf(s.trim)
    case DoubleType => java.lang.Double.valueOf(s.trim)
    case _ => s
  }

  /** Could a file whose stored bounds are `bounds` contain a value in
    * [lo, hi] (either side optional)? Empty bounds = the column is
    * entirely null in the file: no VALUE exists, so any actual bound
    * rules the file out (SQL comparison semantics — null satisfies no
    * range), but a boundless scan (lo and hi both absent) is a full
    * read and must keep it. */
  def overlaps(dt: DataType, bounds: List[String],
      lo: Option[String], hi: Option[String]): Boolean = bounds match {
    case mn :: mx :: Nil =>
      lo.forall(l => cmp(dt, mx, l) >= 0) && hi.forall(h => cmp(dt, mn, h) <= 0)
    case _ => lo.isEmpty && hi.isEmpty // all-null file
  }
}
