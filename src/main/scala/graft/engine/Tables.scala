package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Test-table access for the driver harness (TESTDATA.md).
  *
  * Every `SparkEntry.queries` function receives `(spark, sfDir)` and reads
  * parquet from `sfDir`; the DuckDB oracle reads the same files under the
  * bare table name. Centralizing the read keeps scan options (vectorized
  * parquet reader, pushdown) uniform.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.ts` has shipped in two parquet encodings across testdata
    * generations: TIMESTAMP(NANOS) — which Spark's reader rejects (no
    * nanosecond TimestampType) — and plain TIMESTAMP(MICROS). The unit is
    * a property of the FILE, so [[t]] detects it from the footer-inferred
    * schema instead of assuming either: a timestamp-typed `ts` is read
    * natively (NTZ normalized to TimestampType — identical instants under
    * the UTC session zone every entrypoint pins), while a NANOS file
    * (inference throws) falls back to an explicit INT64 schema and exact
    * integer ns→µs truncation, which is also what DuckDB-on-ns
    * effectively compares at for date/bucket outputs.
    */
  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** True iff `e` (or any cause) is Spark's parquet unsupported-type
    * rejection — the only failure that legitimately means "this is the
    * TIMESTAMP(NANOS) generation". Matched by SparkThrowable condition
    * (`PARQUET_TYPE_*`) with a message fallback for wrapped rethrows
    * that lose the condition.
    */
  private def isIllegalParquetType(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8).exists {
      case st: org.apache.spark.SparkThrowable
          if st.getCondition != null =>
        st.getCondition.startsWith("PARQUET_TYPE")
      case t => t.getMessage != null &&
        t.getMessage.contains("Illegal Parquet type")
    }

  /** Footer-inferred `ts` type, or None when inference rejects the
    * file's parquet type (the TIMESTAMP(NANOS) generation). Resolution
    * is one footer read on the driver — the same work the non-events
    * branch already does — so no extra job is scheduled. Any OTHER
    * failure (missing path, corrupt footer, IO error) propagates:
    * routing it into the INT64 fallback would defer the real error to a
    * later, more confusing read.
    */
  private def eventsTsType(spark: SparkSession, path: String) =
    try spark.read.parquet(path).schema.find(_.name == "ts").map(_.dataType)
    catch {
      case e: Throwable if isIllegalParquetType(e) => None
    }

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      val path = s"$sfDir/events.parquet"
      val tsType = eventsTsType(spark, path)
      tsType match {
        case Some(TimestampType) => spark.read.parquet(path)
        case Some(TimestampNTZType) =>
          spark.read.parquet(path)
            .withColumn("ts", col("ts").cast(TimestampType))
        case _ =>
          rawEvents(spark, path, tsType)
            .withColumn("ts",
              timestamp_micros(call_function("div", col("ts"), lit(1000L))))
      }
    } else raw(spark, sfDir, name)

  /** The events read for an already-detected `ts` type — so [[t]] and
    * [[raw]] each resolve the footer exactly once.
    */
  private def rawEvents(spark: SparkSession, path: String,
      tsType: Option[DataType]): DataFrame =
    tsType match {
      case Some(TimestampType) | Some(TimestampNTZType) =>
        spark.read.parquet(path)
      case _ => spark.read.schema(eventsSchema).parquet(path)
    }

  /** Canonical post-[[t]] column contract for every test table — the
    * round-start drift check. Each column lists the ACCEPTED
    * `DataType.simpleString`s: date-ish columns accept both `timestamp`
    * and `timestamp_ntz` (identical instants under the UTC session zone
    * every entrypoint pins; the oracle compares at instant level), while
    * `events.ts` must come out of [[t]] as plain `timestamp` — that IS
    * the normalization contract. Anything else is a testdata
    * regeneration drift (round 7 burned hours when the events parquet
    * encoding flipped); [[auditSchemas]] turns the next one into a
    * 1-minute diagnosis.
    */
  private val ts2 = Set("timestamp", "timestamp_ntz")
  private def one(s: String) = Set(s)
  private[graft] val canonical: Seq[(String, Seq[(String, Set[String])])] =
    Seq(
      "region" -> Seq("r_regionkey" -> one("int"), "r_name" -> one("string")),
      "nation" -> Seq("n_nationkey" -> one("int"), "n_name" -> one("string"),
        "n_regionkey" -> one("int")),
      "customer" -> Seq("c_custkey" -> one("bigint"), "c_name" -> one("string"),
        "c_nationkey" -> one("int"), "c_acctbal" -> one("double"),
        "c_mktsegment" -> one("string")),
      "supplier" -> Seq("s_suppkey" -> one("bigint"), "s_name" -> one("string"),
        "s_nationkey" -> one("int"), "s_acctbal" -> one("double")),
      "part" -> Seq("p_partkey" -> one("bigint"), "p_name" -> one("string"),
        "p_brand" -> one("string"), "p_type" -> one("string"),
        "p_size" -> one("int"), "p_retailprice" -> one("double")),
      "orders" -> Seq("o_orderkey" -> one("bigint"),
        "o_custkey" -> one("bigint"), "o_orderstatus" -> one("string"),
        "o_totalprice" -> one("double"), "o_orderdate" -> ts2,
        "o_orderpriority" -> one("string")),
      "lineitem" -> Seq("l_orderkey" -> one("bigint"),
        "l_partkey" -> one("bigint"), "l_suppkey" -> one("bigint"),
        "l_linenumber" -> one("int"), "l_quantity" -> one("double"),
        "l_extendedprice" -> one("double"), "l_discount" -> one("double"),
        "l_tax" -> one("double"), "l_returnflag" -> one("string"),
        "l_linestatus" -> one("string"), "l_shipdate" -> ts2),
      "events" -> Seq("event_id" -> one("bigint"), "ts" -> one("timestamp"),
        "user_id" -> one("bigint"), "event_type" -> one("string"),
        "value" -> one("double"), "props" -> one("string")),
      "documents" -> Seq("doc_id" -> one("bigint"), "text" -> one("string"),
        "lang" -> one("string"), "source" -> one("string"),
        "n_chars" -> one("bigint")),
      "embeddings" -> Seq("vec_id" -> one("bigint"),
        "embedding" -> one("array<float>"), "label" -> one("int")))

  /** Audit every test table's post-[[t]] schema against [[canonical]].
    * Returns one human-readable drift line per violation (missing table,
    * missing/extra/reordered column, dtype outside the accepted set);
    * empty = the generation matches the contract. Footer-only work — no
    * job is scheduled.
    */
  def auditSchemas(spark: SparkSession, sfDir: String): Seq[String] =
    canonical.flatMap { case (tbl, cols) =>
      scala.util.Try(t(spark, sfDir, tbl)) match {
        case scala.util.Failure(e) =>
          Seq(s"$tbl: unreadable at $sfDir (${e.getMessage})")
        case scala.util.Success(df) =>
          val actual = df.schema.fields.map(f =>
            f.name -> f.dataType.simpleString).toSeq
          if (actual.map(_._1) != cols.map(_._1))
            Seq(s"$tbl: column set/order drifted — expected " +
              s"${cols.map(_._1).mkString(",")} got " +
              s"${actual.map(_._1).mkString(",")}")
          else cols.zip(actual).collect {
            case ((name, accepted), (_, got)) if !accepted(got) =>
              s"$tbl.$name: dtype drifted — expected one of " +
                s"${accepted.mkString("|")} got $got"
          }
      }
    }

  /** The table in its file-native `ts` representation — for tooling that
    * copies/rewrites table files ([[graft.tools.Soak]]). A micros file is
    * copied as a timestamp column (so [[t]]'s detection keeps reading the
    * rewrite natively); a NANOS file is copied as the raw int64 (a
    * rewritten BIGINT column falls into [[t]]'s ns fallback, preserving
    * the legacy unit).
    */
  private[graft] def raw(spark: SparkSession, sfDir: String,
      name: String): DataFrame =
    if (name == "events") {
      val path = s"$sfDir/events.parquet"
      rawEvents(spark, path, eventsTsType(spark, path))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
}
