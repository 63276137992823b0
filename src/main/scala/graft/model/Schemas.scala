package graft.model

import java.time.Instant

/** Typed schemas of the log-pump dataflow, mirroring the reference's two
  * row types (reference: `internal/models/models.go:8-34` and `:38-55`).
  *
  * Type widening (documented in SURVEY.md §1.4): Go unsigned ints have
  * no Spark/JVM counterpart — `uint8 Severity` → Int, `uint32` → Long,
  * `uint64 SessionID` → Long (full-range uint64 session ids are not
  * realistic; the reference itself truncates to uint32 at the sink,
  * `internal/transform/transform.go:62`).
  *
  * Field names keep the reference's capitalized spelling because they
  * ARE the output schema contract (README ClickHouse DDL).
  */
final case class LogEntry(
    Timestamp: String,       // source file base name, e.g. "25052607.log"
    LogTimestamp: String,    // raw event time, e.g. "00:03.310025-1327862"
    Component: String,
    Severity: Int,
    Level: String,
    Process: String,
    ProcessName: String,
    OSThread: Long,
    ClientID: Long,
    ApplicationName: String,
    ComputerName: String,
    ConnectID: Long,
    SessionID: Long,
    User: String,
    DBMS: String,
    Database: String,
    Trans: Long,
    DBPID: Long,
    SQL: String,
    Rows: Int,
    RowsAffected: Int,
    Context: String,
    EventType: String,
    File: String,
    InsertedAt: Instant)

/** Sink-side 16-column row (reference: `internal/models/models.go:38-55`
  * + README DDL). Nullable columns are Options, matching the Go pointer
  * fields. EventDate/EventTime are kept as native Spark DATE/TIMESTAMP
  * (µs) types rather than the reference's pre-formatted strings — the
  * string form was only a ClickHouse-driver coercion artifact
  * (`transform.go:56-57`).
  */
final case class TechLogRow(
    EventDate: java.time.LocalDate,
    EventTime: Instant,
    EventType: String,
    Duration: Long,
    User: String,
    InfoBase: String,
    SessionID: Long,
    ClientID: Long,
    ConnectionID: Long,
    ExceptionType: Option[String], // always None (transform.go:65)
    ErrorText: Option[String],     // always None (transform.go:66)
    SQLText: Option[String],
    Rows: Option[Int],
    RowsAffected: Option[Int],
    Context: Option[String],
    ProcessName: String)
