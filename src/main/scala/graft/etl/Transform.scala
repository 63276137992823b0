package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** LogEntry → TechLogRow transform (reference:
  * `internal/transform/transform.go:14-73`), expressed as Catalyst
  * Column expressions — NOT a typed map — so the whole stage is
  * codegen'd and column-prunable: a downstream query that only needs
  * (EventDate, EventType) never evaluates the SQL/Context columns.
  *
  * Semantics preserved from the reference:
  *  - T1 date-from-filename: "25052607.log" → 2025-05-26, hour 07, with
  *    the hard-coded "20" century prefix (transform.go:20);
  *  - T2 event time: BOM stripped, first `\d{2}:\d{2}\.\d{1,6}` match in
  *    LogTimestamp, combined with date+hour; unparseable → record
  *    DROPPED (transform.go:26-45 — Go time.Parse validates ranges the
  *    same way to_timestamp does, both yield null/error on 99 minutes);
  *  - T3 duration: text after the first '-' of LogTimestamp, parsed as
  *    uint32; syntax OR range error → 0 (transform.go:47-53 — note this
  *    differs from the parser's clamping coercions);
  *  - T4 renames Component→EventType, DataBase→InfoBase,
  *    ConnectID→ConnectionID; SessionID narrowed uint64→uint32 by
  *    truncation, i.e. mod 2^32 (transform.go:62); ExceptionType and
  *    ErrorText constant-null (transform.go:65-66);
  *  - T5 malformed records are dropped, not failed (clickhouse.go:90-95).
  */
object Transform {

  private val Uint32Max = 4294967295L

  /** All 16 output columns + a validity predicate over LogEntry input
    * (T5: invalid records dropped).
    */
  def apply(entries: DataFrame): DataFrame =
    withReason(entries)
      .filter(col("drop_reason") === "ok")
      .drop("drop_reason")

  /** The same transform WITHOUT the T5 drop: every record keeps a
    * `drop_reason` column ('ok' | 'short_filename' | 'bad_hour' |
    * 'no_time_match' | 'bad_time') — the dead-letter-queue view of the
    * pipeline. The reasons REFINE the reference's single validity
    * predicate (reason == 'ok' ⇔ the T5 `valid`, proven by `apply`
    * being the filtered composition): an out-of-range hour surfaces as
    * 'bad_hour' even though the reference only observes it as the
    * timestamp parse failing. Invalid rows carry NULL EventDate /
    * EventTime and whatever else still parsed.
    */
  def withReason(entries: DataFrame): DataFrame = {
    val fn = col("Timestamp")
    // BOM strip is TrimPrefix (leading only) — transform.go:29
    val lt = regexp_replace(col("LogTimestamp"), "^\uFEFF", "")

    val dateStr = concat(lit("20"),
      substring(fn, 1, 2), lit("-"),
      substring(fn, 3, 2), lit("-"),
      substring(fn, 5, 2))
    // Go Atoi(ts[6:8]) accepts signed ints; %02d then re-renders. Any
    // value a two-char signed Atoi yields that formats into a valid
    // hour is 00-09 ("07"→"07") or 10-23; invalid hours fail the
    // timestamp parse below on both engines.
    val hourRaw = substring(fn, 7, 2)
    val hourInt = when(hourRaw.rlike("^[+-]?[0-9]+$"), hourRaw.cast("int"))
    val hourStr = lpad(hourInt.cast("string"), 2, "0")

    val timeRx = "(\\d{2}):(\\d{2})\\.(\\d{1,6})"
    val mm = regexp_extract(lt, timeRx, 1)
    val ss = regexp_extract(lt, timeRx, 2)
    val frac = regexp_extract(lt, timeRx, 3)

    val eventTimeStr = concat(dateStr, lit(" "), hourStr, lit(":"),
      mm, lit(":"), ss, lit("."), rpad(frac, 6, "0"))
    val eventTime = try_to_timestamp(eventTimeStr,
      lit("yyyy-MM-dd HH:mm:ss.SSSSSS"))

    // duration: SplitN(lt, "-", 2)[1] via Go ParseUint(_, 10, 32):
    // digits-only (no sign), in-range, else 0.
    val afterDash = element_at(split(lt, "-", 2), 2)
    val durNum = when(afterDash.rlike("^[0-9]+$"),
      afterDash.cast("decimal(38,0)"))
    val duration = when(durNum.isNotNull && durNum <= Uint32Max,
      durNum.cast("long")).otherwise(lit(0L))

    // decomposition of the T5 `valid` predicate (length(fn) >= 8 &&
    // hourInt.isNotNull && mm =!= "" && eventTime.isNotNull) into
    // first-failure reasons; 'ok' ⇔ valid because each arm only
    // refines the conjunct order
    val reason: Column =
      when(length(fn) < 8, "short_filename")
        .when(hourInt.isNull || hourInt < 0 || hourInt > 23, "bad_hour")
        .when(mm === "", "no_time_match")
        .when(eventTime.isNull, "bad_time")
        .otherwise("ok")

    entries
      .withColumn("__event_time", eventTime)
      .withColumn("drop_reason", reason)
      .select(
        to_date(col("__event_time")).as("EventDate"),
        col("__event_time").as("EventTime"),
        col("Component").as("EventType"),
        duration.as("Duration"),
        col("User"),
        col("Database").as("InfoBase"),
        pmod(col("SessionID"), lit(Uint32Max + 1L)).as("SessionID"),
        col("ClientID"),
        col("ConnectID").as("ConnectionID"),
        lit(null).cast("string").as("ExceptionType"),
        lit(null).cast("string").as("ErrorText"),
        col("SQL").as("SQLText"),
        col("Rows"),
        col("RowsAffected"),
        col("Context"),
        col("ProcessName"),
        col("drop_reason"))
  }
}
