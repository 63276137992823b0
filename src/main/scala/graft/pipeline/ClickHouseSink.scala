package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** ClickHouse-dialect JDBC sink: the reference's actual sink shape —
  * explicit-column bulk INSERT per routed table
  * (`internal/clickhouseclient/clickhouse.go:79-83`) with first-write
  * auto-provisioning in the MergeTree layout (`ClickHouseDdl`). The
  * generic `df.write.jdbc` path can't provision ClickHouse (its
  * CREATE TABLE emits no ENGINE clause, which ClickHouse rejects) and
  * maps TimestampType to TIMESTAMP instead of DateTime64(6); this
  * sink owns both.
  *
  * Executor shape: one connection + prepared statement per partition,
  * `executeBatch` every `batchSize` rows — the reference's
  * PrepareBatch/Append/Send cycle, with bounded executor memory. No
  * driver-side data movement; table provisioning is the only
  * driver-side statement.
  */
object ClickHouseSink {

  /** Both official ClickHouse JDBC prefixes. */
  def isClickHouseUrl(url: String): Boolean =
    url.startsWith("jdbc:clickhouse:") || url.startsWith("jdbc:ch:")

  /** The reference's bulk INSERT statement (clickhouse.go:79-83):
    * explicit column list in schema order, one placeholder each.
    */
  def insertSql(table: String, schema: StructType): String =
    s"INSERT INTO $table (${schema.fieldNames.mkString(", ")}) VALUES " +
      schema.fields.map(_ => "?").mkString("(", ",", ")")

  /** First-write auto-provisioning: `CREATE TABLE IF NOT EXISTS` in
    * the reference MergeTree layout — DateTime64(6) event times,
    * LowCardinality(String) EventType, unsigned contract columns
    * (ClickHouseDdl's mapping). Idempotent, so every micro-batch may
    * call it.
    */
  def ensureTable(conn: java.sql.Connection, table: String,
      schema: StructType): Unit = {
    val st = conn.createStatement()
    try st.executeUpdate(ClickHouseDdl.createTable(table, schema))
    finally st.close()
  }

  /** JDBC parameter binding per Spark type. Timestamps bind as
    * java.sql.Timestamp truncated to microseconds — the DateTime64(6)
    * column holds exactly six fractional digits, so the sink owns the
    * truncation deterministically instead of leaving sub-µs residue to
    * server-side parse behavior. (Spark's TimestampType is µs-exact
    * already; the guard matters for rows bound from raw JDBC callers.)
    */
  private[graft] def bind(ps: java.sql.PreparedStatement,
      schema: StructType, row: Row): Unit = {
    var i = 0
    while (i < schema.length) {
      val idx = i + 1
      if (row.isNullAt(i)) ps.setObject(idx, null)
      else schema.fields(i).dataType match {
        case StringType => ps.setString(idx, row.getString(i))
        case IntegerType => ps.setInt(idx, row.getInt(i))
        case LongType => ps.setLong(idx, row.getLong(i))
        case DoubleType => ps.setDouble(idx, row.getDouble(i))
        case FloatType => ps.setFloat(idx, row.getFloat(i))
        case BooleanType => ps.setBoolean(idx, row.getBoolean(i))
        case DateType => ps.setDate(idx, row.getDate(i))
        case TimestampType => ps.setTimestamp(idx, toMicros(row.getTimestamp(i)))
        case BinaryType => ps.setBytes(idx, row.getAs[Array[Byte]](i))
        case _: DecimalType => ps.setBigDecimal(idx, row.getDecimal(i))
        case _ => ps.setObject(idx, row.get(i))
      }
      i += 1
    }
  }

  /** DateTime64(6) precision: truncate sub-microsecond nanos (no-op —
    * and no allocation — for the µs-aligned values Spark produces).
    */
  private[graft] def toMicros(t: java.sql.Timestamp): java.sql.Timestamp =
    if (t == null || t.getNanos % 1000 == 0) t
    else {
      val us = new java.sql.Timestamp(t.getTime)
      us.setNanos(t.getNanos / 1000 * 1000)
      us
    }

  /** Drain one partition's rows through a prepared statement in
    * bounded batches (factored out so a spec can drive it with a
    * recording PreparedStatement).
    */
  private[graft] def writePartition(ps: java.sql.PreparedStatement,
      schema: StructType, rows: Iterator[Row], batchSize: Int): Long = {
    var n = 0L
    rows.foreach { r =>
      bind(ps, schema, r)
      ps.addBatch()
      n += 1
      if (n % batchSize == 0) ps.executeBatch()
    }
    if (n % batchSize != 0) ps.executeBatch()
    n
  }

  /** Bulk append `df` into `table`, auto-provisioning it first. */
  def write(df: DataFrame, table: String, url: String,
      props: java.util.Properties = new java.util.Properties(),
      batchSize: Int = 10000, provision: Boolean = true): Unit = {
    val schema = df.schema
    val sql = insertSql(table, schema)
    if (provision) {
      val conn = java.sql.DriverManager.getConnection(url, props)
      try ensureTable(conn, table, schema) finally conn.close()
    }
    df.foreachPartition { (rows: Iterator[Row]) =>
      val conn = java.sql.DriverManager.getConnection(url, props)
      try {
        val ps = conn.prepareStatement(sql)
        try { writePartition(ps, schema, rows, batchSize); () }
        finally ps.close()
      } finally conn.close()
    }
  }
}
