package graft.pipeline

import org.apache.spark.sql.types._

/** ClickHouse DDL emission for the routed JDBC sink: generates the
  * `CREATE TABLE … ENGINE = MergeTree PARTITION BY EventDate ORDER BY
  * (EventDate, EventTime)` statement for any routed table from its
  * Spark schema, so a deployment can provision the sink tables from
  * the same schema object the pump writes. The type mapping and the
  * reference layout come from the reference's published DDL
  * (README.md "CREATE TABLE logs" block: Date / DateTime64(6) /
  * LowCardinality(String) / UInt32 / Nullable(...) columns, MergeTree
  * partitioned by EventDate, ordered by (EventDate, EventTime)).
  */
object ClickHouseDdl {

  /** Spark → ClickHouse type for the pump's column set. Unsigned
    * widths follow the reference DDL where the column name matches its
    * 16-column contract; generic columns get the natural signed map.
    */
  private def chType(field: StructField): String = {
    val base = field.dataType match {
      case DateType => "Date"
      case TimestampType => "DateTime64(6)"
      case StringType if field.name == "EventType" => "LowCardinality(String)"
      case StringType => "String"
      case LongType if Set("Duration", "SessionID", "ClientID",
        "ConnectionID")(field.name) => "UInt32"
      case LongType => "Int64"
      case IntegerType => "Int32"
      case DoubleType => "Float64"
      case FloatType => "Float32"
      case BooleanType => "UInt8"
      case BinaryType => "String"
      case d: DecimalType => s"Decimal(${d.precision}, ${d.scale})"
      case other =>
        throw new IllegalArgumentException(
          s"no ClickHouse mapping for ${field.name}: $other")
    }
    // the reference wraps its optional columns in Nullable(...) — any
    // nullable non-key column follows suit
    if (field.nullable && field.dataType != DateType &&
      field.dataType != TimestampType) s"Nullable($base)" else base
  }

  /** The 16-column sink contract with the reference DDL's exact
    * nullability (case-class encoders mark every boxed field nullable,
    * so the contract is spelled out once here).
    */
  val TechLogSchema: StructType = StructType(Seq(
    StructField("EventDate", DateType, nullable = false),
    StructField("EventTime", TimestampType, nullable = false),
    StructField("EventType", StringType, nullable = false),
    StructField("Duration", LongType, nullable = false),
    StructField("User", StringType, nullable = false),
    StructField("InfoBase", StringType, nullable = false),
    StructField("SessionID", LongType, nullable = false),
    StructField("ClientID", LongType, nullable = false),
    StructField("ConnectionID", LongType, nullable = false),
    StructField("ExceptionType", StringType, nullable = true),
    StructField("ErrorText", StringType, nullable = true),
    StructField("SQLText", StringType, nullable = true),
    StructField("Rows", IntegerType, nullable = true),
    StructField("RowsAffected", IntegerType, nullable = true),
    StructField("Context", StringType, nullable = true),
    StructField("ProcessName", StringType, nullable = false)))

  /** The pump's sink-table DDL — the reference README block, generated. */
  def techLogDdl(table: String): String = createTable(table, TechLogSchema)

  /** CREATE TABLE statement in the reference's MergeTree layout. */
  def createTable(table: String, schema: StructType,
      partitionBy: String = "EventDate",
      orderBy: Seq[String] = Seq("EventDate", "EventTime")): String = {
    val width = schema.fields.map(_.name.length).max + 2
    val cols = schema.fields.map { f =>
      s"    ${f.name.padTo(width, ' ')}${chType(f)}"
    }.mkString(",\n")
    s"""CREATE TABLE IF NOT EXISTS $table (
       |$cols
       |)
       |ENGINE = MergeTree
       |PARTITION BY $partitionBy
       |ORDER BY (${orderBy.mkString(", ")})""".stripMargin
  }
}
