package graft.engine

import java.sql.DriverManager
import org.apache.spark.sql.DataFrame

/** JDBC warehouse sink — the relational-landing half of the reference's
  * contract: every transformed table there ends in Postgres
  * (`dags/transformed_from_s3_to_pg.py:143-152`, psycopg2
  * `execute_values` INSERTs). The engine's system of record stays
  * date-partitioned parquet (the scale-correct choice), and this sink
  * publishes mart slices OUT to any JDBC warehouse with the same
  * idempotent-per-date semantics the parquet writes have: delete the
  * date's rows, then append — a replay never duplicates (which the
  * reference's raw INSERTs do on re-run; SURVEY §7.4.5).
  *
  * Scale: `df.write.jdbc` writes from the EXECUTORS, one connection per
  * partition (`numPartitions`/`batchsize` options control fan-in); the
  * driver only issues the date-delete. Marts are date-scoped aggregates
  * (tiny relative to facts), which is exactly why a row-store landing
  * is viable for them and not for the fact table.
  */
object JdbcSink {

  /** Publish one mart's date slice. Creates the table on first publish
    * (Spark's JDBC Append mode maps the schema); subsequent publishes
    * of the same date replace that date's rows and leave other dates
    * untouched.
    */
  def publishMart(df: DataFrame, url: String, table: String,
      dateCol: String, date: java.sql.Date,
      props: java.util.Properties = new java.util.Properties): Unit = {
    val conn = DriverManager.getConnection(url, props)
    try {
      val exists = {
        val rs = conn.getMetaData.getTables(
          null, null, table.toUpperCase(java.util.Locale.ROOT), null)
        try rs.next() finally rs.close()
      }
      if (exists) {
        val del = conn.prepareStatement(
          s"""DELETE FROM $table WHERE "$dateCol" = ?""")
        try { del.setDate(1, date); del.executeUpdate(); () }
        finally del.close()
      }
    } finally conn.close()
    df.write.mode("append").jdbc(url, table, props)
  }
}
