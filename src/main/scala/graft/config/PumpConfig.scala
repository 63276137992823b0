package graft.config

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.collection.mutable

/** Pump configuration (reference: `internal/config/config.go` +
  * `Parser.go`): same field set, same sanitize steps (strip UTF-8 BOM,
  * tabs → two spaces — Parser.go:20-26), same required-field
  * validation with the same error messages (Parser.go:38-58).
  *
  * The environment has no YAML dependency, so `MiniYaml` implements
  * the small subset the reference's config.yaml actually uses:
  * scalars, one level of nesting, flat maps, `#` comments, quoted
  * strings. This is a config reader, not a YAML library — anything
  * outside that subset fails loudly.
  */
final case class ClickHouseConfig(
    Address: String = "",
    Username: String = "",
    Password: String = "",
    Database: String = "",
    DefaultTable: String = "",
    Protocol: String = "",
    TableMap: Map[String, String] = Map.empty)

final case class PumpConfig(
    LogDirectoryMap: Map[String, String] = Map.empty,
    FilePattern: String = "",
    BatchSize: Int = 0,
    BatchInterval: Int = 0,
    RescanInterval: Int = 0,
    ClickHouse: ClickHouseConfig = ClickHouseConfig(),
    ProcessedStorage: String = "") {

  /** Required-field validation — reference Parser.go:38-58 (same
    * checks, same order, same messages).
    */
  def validate(): Either[String, PumpConfig] =
    if (LogDirectoryMap.isEmpty) Left("LogDirectoryMap must not be empty")
    else if (FilePattern.isEmpty) Left("FilePattern must not be empty")
    else if (BatchSize <= 0) Left("BatchSize must be positive")
    else if (BatchInterval <= 0) Left("BatchInterval must be positive")
    else if (ClickHouse.Address.isEmpty) Left("ClickHouse.Address must not be empty")
    else if (ClickHouse.Database.isEmpty) Left("ClickHouse.Database must not be empty")
    else Right(this)
}

object PumpConfig {

  /** Load + sanitize + parse + validate — reference config.go:67-88. */
  def load(path: String): Either[String, PumpConfig] = {
    val raw =
      try Files.readString(Paths.get(path), StandardCharsets.UTF_8)
      catch { case e: Exception => return Left(s"read config: ${e.getMessage}") }
    for {
      parsed <- MiniYaml.parse(sanitize(raw))
      cfg <- fromTree(parsed)
      valid <- cfg.validate()
    } yield valid
  }

  /** Strip UTF-8 BOM, tabs → 2 spaces (Parser.go:20-26). */
  private[graft] def sanitize(s: String): String =
    s.stripPrefix("\uFEFF").replace("\t", "  ")

  private def fromTree(t: Map[String, Any]): Either[String, PumpConfig] = {
    def str(m: Map[String, Any], k: String): String = m.get(k) match {
      case Some(s: String) => s
      case _ => ""
    }
    def int(m: Map[String, Any], k: String): Int = m.get(k) match {
      case Some(s: String) => s.toIntOption.getOrElse(0)
      case _ => 0
    }
    def map(m: Map[String, Any], k: String): Map[String, String] = m.get(k) match {
      case Some(mm: Map[_, _]) =>
        mm.collect { case (kk: String, v: String) => kk -> v }.toMap
      case _ => Map.empty
    }
    val ch = t.get("ClickHouse") match {
      case Some(m: Map[String, Any] @unchecked) => ClickHouseConfig(
        Address = str(m, "Address"), Username = str(m, "Username"),
        Password = str(m, "Password"), Database = str(m, "Database"),
        DefaultTable = str(m, "DefaultTable"), Protocol = str(m, "Protocol"),
        TableMap = map(m, "TableMap"))
      case _ => ClickHouseConfig()
    }
    Right(PumpConfig(
      LogDirectoryMap = map(t, "LogDirectoryMap"),
      FilePattern = str(t, "FilePattern"),
      BatchSize = int(t, "BatchSize"),
      BatchInterval = int(t, "BatchInterval"),
      RescanInterval = int(t, "RescanInterval"),
      ClickHouse = ch,
      ProcessedStorage = str(t, "ProcessedStorage")))
  }
}

/** Minimal YAML-subset reader: `key: value` scalars, two nesting
  * levels (two-space indents — the reference config nests
  * ClickHouse → TableMap → entries), `#` comments, quoted strings.
  */
object MiniYaml {
  def parse(text: String): Either[String, Map[String, Any]] = {
    val root = mutable.LinkedHashMap.empty[String, Any]
    var level1: Option[mutable.LinkedHashMap[String, Any]] = None
    var level2: Option[mutable.LinkedHashMap[String, Any]] = None
    val lines = text.split("\n", -1)
    var lineNo = 0
    for (rawLine <- lines) {
      lineNo += 1
      val noComment = stripComment(rawLine)
      if (noComment.trim.nonEmpty) {
        val indent =
          if (noComment.startsWith("    ")) 2
          else if (noComment.startsWith("  ")) 1
          else 0
        val line = noComment.trim
        val colon = line.indexOf(':')
        if (colon < 0) return Left(s"line $lineNo: expected 'key: value'")
        val key = line.substring(0, colon).trim
        val value = unquote(line.substring(colon + 1).trim)
        indent match {
          case 0 =>
            level2 = None
            if (value.isEmpty) {
              val m = mutable.LinkedHashMap.empty[String, Any]
              root += key -> m
              level1 = Some(m)
            } else { root += key -> value; level1 = None }
          case 1 => level1 match {
            case None => return Left(s"line $lineNo: unexpected indent")
            case Some(m) =>
              if (value.isEmpty) {
                val mm = mutable.LinkedHashMap.empty[String, Any]
                m += key -> mm
                level2 = Some(mm)
              } else { m += key -> value; level2 = None }
          }
          case 2 => level2 match {
            case None => return Left(s"line $lineNo: unexpected indent")
            case Some(m) => m += key -> value
          }
        }
      }
    }
    def freeze(m: mutable.LinkedHashMap[String, Any]): Map[String, Any] =
      m.map {
        case (k, mm: mutable.LinkedHashMap[String, Any] @unchecked) => k -> freeze(mm)
        case (k, v) => k -> v
      }.toMap
    Right(freeze(root))
  }

  private def stripComment(line: String): String = {
    // '#' starts a comment unless inside quotes
    var inS = false
    var inD = false
    var i = 0
    while (i < line.length) {
      line.charAt(i) match {
        case '\'' if !inD => inS = !inS
        case '"' if !inS => inD = !inD
        case '#' if !inS && !inD => return line.substring(0, i)
        case _ =>
      }
      i += 1
    }
    line
  }

  private def unquote(s: String): String =
    if (s.length >= 2 &&
      ((s.head == '"' && s.last == '"') || (s.head == '\'' && s.last == '\'')))
      s.substring(1, s.length - 1)
    else s
}
