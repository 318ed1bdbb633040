package graft.engine

import java.time.{Instant, LocalDate, ZoneOffset}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hidden partition TRANSFORMS (round 15) — Iceberg-style
  * `PARTITIONED BY (days(ts), bucket(16, k))` layouts for the physical-
  * directory engine.
  *
  * Encoding: a transform is a DERIVED directory column named
  * `ptx_<kind>_<source>` (`ptx_day_ts`, `ptx_bucket16_k`), computed by
  * the write funnels ([[materialize]]) just before `partitionBy` and
  * never part of the logical schema — the pinned CREATE TABLE schema
  * stays the user's columns, reads project the derived names away, and
  * every existing consumer of "partition columns as strings"
  * (`layoutPartitionCols`, staging, stage-in, rewrite verbs) keeps
  * working because the NAME alone round-trips the transform
  * ([[decode]]).
  *
  * Directory values are chosen SORTABLE so predicate mapping is a
  * string/int comparison: `year` → int year, `month` → `yyyy-MM`,
  * `day` → `yyyy-MM-dd`, `hour` → `yyyy-MM-dd-HH`, `bucket<N>` →
  * `pmod(murmur3(col), N)`. At 100 TB the transform's job is twofold:
  * writes CLUSTER rows by coarse time / key bucket (tight per-file
  * stats envelopes for the `.stats` skipping that already prunes data
  * columns), and reads prune the snapshot's FILE LIST by parsed
  * directory values ([[pruneFiles]]) — no directory listing, no footer
  * opens, superset-safe (a file is kept whenever a value fails to
  * parse or a predicate shape is not understood).
  */
object PartitionTransforms {

  private val Prefix = "ptx_"
  private val Pat = "^ptx_(year|month|day|hour|bucket([0-9]+))_(.+)$".r

  sealed trait PT {
    def source: String
    def dirName: String
  }
  final case class PTime(unit: String, source: String) extends PT {
    val dirName = s"${Prefix}${unit}_$source"
  }
  final case class PBucket(n: Int, source: String) extends PT {
    val dirName = s"${Prefix}bucket${n}_$source"
  }

  /** Is `name` an engine-maintained derived directory column? Full
    * pattern match, not a prefix test — a user column that merely
    * starts with `ptx_` is not mistaken for a transform (and CREATE
    * TABLE refuses genuinely ambiguous names up front).
    *
    * The prefix deliberately has NO leading underscore: Hadoop/Spark
    * file listings treat `_`-prefixed paths as hidden (the `_SUCCESS`
    * convention), so `_pt_...=v/` partition directories would be
    * invisible to stage-in and scans.
    */
  def isDerived(name: String): Boolean = decode(name).isDefined

  /** `ptx_day_ts` → PTime(day, ts); `ptx_bucket16_k` → PBucket(16, k);
    * anything else → None (a plain identity layout column).
    */
  def decode(dirName: String): Option[PT] = dirName match {
    case Pat(kind, num, source) =>
      if (kind.startsWith("bucket")) Some(PBucket(num.toInt, source))
      else Some(PTime(kind, source))
    case _ => None
  }

  /** The source data columns of every transform in `layoutCols` —
    * schema migrations refuse to touch these (a rename breaks the
    * decode, a widen changes the bucket hash).
    */
  def transformSources(layoutCols: Seq[String]): Seq[String] =
    layoutCols.flatMap(decode).map(_.source)

  /** The derivation expression for one transform over `srcType`. */
  private def deriveExpr(pt: PT, srcType: DataType): Column = pt match {
    case PTime("year", s) => year(col(s))
    case PTime("month", s) => date_format(col(s), "yyyy-MM")
    case PTime("day", s) => to_date(col(s))
    case PTime("hour", s) =>
      require(srcType == TimestampType || srcType == TimestampNTZType,
        s"hour($s) needs a timestamp column, got ${srcType.sql}")
      date_format(col(s), "yyyy-MM-dd-HH")
    case PTime(u, s) =>
      throw new IllegalArgumentException(s"unknown time transform $u($s)")
    case PBucket(n, s) => pmod(hash(col(s)), lit(n))
  }

  /** Validate a transform against the table schema at CREATE time. */
  def validate(pt: PT, schema: StructType): Unit = {
    val f = schema.fields.find(_.name.equalsIgnoreCase(pt.source))
      .getOrElse(throw new IllegalArgumentException(
        s"partition transform over unknown column ${pt.source} " +
          s"(${schema.fieldNames.mkString(", ")})"))
    pt match {
      case PTime(u, s) =>
        require(f.dataType == DateType || f.dataType == TimestampType ||
          f.dataType == TimestampNTZType,
          s"$u($s) needs a date/timestamp column, got ${f.dataType.sql}")
        require(u != "hour" || f.dataType != DateType,
          s"hour($s): a DATE column has no hours")
      case PBucket(n, s) =>
        require(n > 0, s"bucket($n, $s): bucket count must be positive")
        val integral = Set[DataType](ByteType, ShortType, IntegerType,
          LongType)
        require(integral(f.dataType) || f.dataType == StringType,
          s"bucket($n, $s) supports integral and string keys, got " +
            f.dataType.sql)
    }
  }

  /** Add every missing derived column of `layoutCols` to `df` — the ONE
    * hook all write funnels call just before `partitionBy`. Identity
    * columns pass through (they must already exist; the writer's own
    * resolution errors otherwise).
    */
  def materialize(df: DataFrame, layoutCols: Seq[String]): DataFrame = {
    var derived = List.empty[String]
    val out = layoutCols.foldLeft(df) { (d, c) =>
      if (d.columns.contains(c)) d
      else decode(c) match {
        case Some(pt) =>
          require(d.columns.contains(pt.source),
            s"cannot derive partition column $c: source column " +
              s"${pt.source} is not in the batch " +
              s"(${d.columns.mkString(", ")})")
          derived ::= c
          d.withColumn(c, deriveExpr(pt, d.schema(pt.source).dataType))
        case None => d // identity: let the write resolve (and fail) it
      }
    }
    // cluster by the derived leaves: without this, every shuffle
    // partition writes a sliver into every leaf directory — a
    // months×buckets layout times 32 shuffle partitions is thousands
    // of tiny files per batch. One hash shuffle sends each leaf to one
    // task → one file per leaf per write (a skewed leaf becomes one
    // large file; compaction/Z-order handle that the usual way).
    if (derived.isEmpty) out
    else out.repartition(layoutCols.map(col): _*)
  }

  // ---- read-side file pruning --------------------------------------

  /** Keep only the files of `relFiles` whose transform-directory values
    * can satisfy `preds` — catalyst conjuncts of `attr op literal`
    * shapes over the SOURCE columns. Superset-safe: unknown shapes,
    * unparseable values, `__HIVE_DEFAULT_PARTITION__` (NULL) dirs, and
    * columns without a transform keep the file.
    */
  def pruneFiles(relFiles: Seq[String],
      preds: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions._
    val transforms: Map[String, Seq[PT]] = relFiles.headOption
      .map(_.split("/").dropRight(1).toSeq.map(_.takeWhile(_ != '=')))
      .getOrElse(Seq.empty)
      .flatMap(decode).groupBy(_.source)
    if (transforms.isEmpty) return relFiles

    // per file: dirName -> raw dir value
    def dirValues(f: String): Map[String, String] =
      f.split("/").dropRight(1).iterator.map { seg =>
        val i = seg.indexOf('=')
        if (i < 0) seg -> "" else seg.take(i) -> seg.drop(i + 1)
      }.toMap

    // a test per (dirName, rawValue): true = may match, false = prune.
    // Each test is KEYED BY THE dirName OF THE TRANSFORM IT WAS BUILT
    // FOR and only ever applied to that directory (ADVICE r15): a
    // bucket test must never see a time-transform dir of the same
    // source column — safety is local, not dependent on CREATE-time
    // validation forbidding mixed transforms.
    type DirTest = (String, String) => Boolean
    def forSource(name: String)(mk: PT => Option[DirTest])
        : Seq[(String, DirTest)] =
      transforms.getOrElse(name, Seq.empty)
        .flatMap(t => mk(t).map(t.dirName -> _)).toSeq

    // comparisons run in the UNIT-INDEX domain (year number, month
    // index, epoch day, epoch hour), parsed back from the directory
    // value on one side and computed from the typed literal (UTC) on
    // the other. Writes render dir values in the SESSION zone
    // (to_date/date_format), so bounds widen by a slack of one unit
    // (15 for hour — zone offsets reach ±14h) — superset-safe under
    // any zone; the kept files are re-filtered by the actual predicate
    // post-scan, so extra kept files never change results.
    def unitIndexOfLiteral(unit: String, lit: Literal): Option[Long] = {
      val utc = lit.dataType match {
        case DateType =>
          Some(LocalDate.ofEpochDay(lit.value.asInstanceOf[Int].toLong)
            .atStartOfDay(ZoneOffset.UTC))
        case TimestampType | TimestampNTZType =>
          // exact micros→nanos: a far-future sentinel bound (e.g.
          // TIMESTAMP'9999-12-31') would WRAP under plain * 1000 and
          // prune everything — on overflow, contribute no test at all
          // (keep every file; review fix, round 15)
          try Some(Instant.EPOCH
            .plusNanos(Math.multiplyExact(
              lit.value.asInstanceOf[Long], 1000L))
            .atZone(ZoneOffset.UTC))
          catch { case _: ArithmeticException => None }
        case _ => None
      }
      utc.map { z =>
        unit match {
          case "year" => z.getYear.toLong
          case "month" => z.getYear * 12L + (z.getMonthValue - 1)
          case "day" => z.toLocalDate.toEpochDay
          case "hour" => z.toEpochSecond / 3600L
        }
      }
    }
    def unitIndexOfDir(unit: String, raw: String): Option[Long] =
      try {
        unit match {
          case "year" => Some(raw.toLong)
          case "month" =>
            val Array(y, m) = raw.split("-")
            Some(y.toLong * 12L + (m.toLong - 1))
          case "day" => Some(LocalDate.parse(raw).toEpochDay)
          case "hour" =>
            val i = raw.lastIndexOf('-')
            Some(LocalDate.parse(raw.take(i)).toEpochDay * 24L +
              raw.drop(i + 1).toLong)
        }
      } catch { case _: Exception => None } // unparseable ⇒ keep
    def timeTest(unit: String, op: String, lit: Literal): Option[DirTest] =
      unitIndexOfLiteral(unit, lit).map { v =>
        val slack = if (unit == "hour") 15L else 1L
        (dir: String, raw: String) =>
          unitIndexOfDir(unit, raw) match {
            case None => true // NULL dir / unparseable: keep
            case Some(u) => op match {
              case ">=" | ">" => u >= v - slack
              case "<=" | "<" => u <= v + slack
              case "=" => math.abs(u - v) <= slack
            }
          }
      }

    def bucketTest(n: Int, lit: Literal): Option[DirTest] = {
      // the same murmur3(seed 42) the write side's hash() uses, on the
      // literal AS TYPED — a type mismatch would hash differently, so
      // only prune when the literal is integral/string like the column
      lit.dataType match {
        case ByteType | ShortType | IntegerType | LongType | StringType =>
          val h = Murmur3Hash(Seq(lit), 42).eval(null)
            .asInstanceOf[Int]
          val b = ((h % n) + n) % n
          Some((_: String, raw: String) =>
            raw == "__HIVE_DEFAULT_PARTITION__" || raw.isEmpty ||
              raw == b.toString)
        case _ => None
      }
    }

    def testsOf(e: Expression): Seq[(String, DirTest)] = e match {
      case And(l, r) => testsOf(l) ++ testsOf(r)
      case EqualTo(a: Attribute, l: Literal) => point(a.name, l)
      case EqualTo(l: Literal, a: Attribute) => point(a.name, l)
      case GreaterThanOrEqual(a: Attribute, l: Literal) => lo(a.name, l)
      case GreaterThan(a: Attribute, l: Literal) => lo(a.name, l)
      case LessThanOrEqual(a: Attribute, l: Literal) => hi(a.name, l)
      case LessThan(a: Attribute, l: Literal) => hi(a.name, l)
      case GreaterThanOrEqual(l: Literal, a: Attribute) => hi(a.name, l)
      case GreaterThan(l: Literal, a: Attribute) => hi(a.name, l)
      case LessThanOrEqual(l: Literal, a: Attribute) => lo(a.name, l)
      case LessThan(l: Literal, a: Attribute) => lo(a.name, l)
      case _ => Seq.empty
    }
    def point(name: String,
        l: org.apache.spark.sql.catalyst.expressions.Literal) =
      forSource(name) {
        case PTime(u, _) => timeTest(u, "=", l)
        case PBucket(n, _) => bucketTest(n, l)
      }
    def lo(name: String,
        l: org.apache.spark.sql.catalyst.expressions.Literal) =
      forSource(name) {
        case PTime(u, _) => timeTest(u, ">=", l)
        case _: PBucket => None // a range says nothing about a bucket
      }
    def hi(name: String,
        l: org.apache.spark.sql.catalyst.expressions.Literal) =
      forSource(name) {
        case PTime(u, _) => timeTest(u, "<=", l)
        case _: PBucket => None
      }

    // tests keyed by the dirName they were built for (ADVICE r15)
    val tests: Seq[(String, DirTest)] = preds.flatMap(testsOf)
    if (tests.isEmpty) return relFiles
    relFiles.filter { f =>
      val dv = dirValues(f)
      tests.forall { case (dn, t) =>
        dv.get(dn).forall(raw => t(dn, raw))
      }
    }
  }
}
