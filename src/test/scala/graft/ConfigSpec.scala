package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.config.{MiniYaml, PumpConfig}

class ConfigSpec extends AnyFunSuite {

  val fixture: String =
    """# Path to log dirs
      |LogDirectoryMap:
      |  Map1: "/data/logs/a"
      |  Map2: '/data/logs/b'
      |
      |RescanInterval: 20
      |FilePattern: "*.log"   # file mask
      |BatchSize: 100
      |BatchInterval: 20
      |
      |ClickHouse:
      |  Address: "localhost:9000"
      |  Username: "admin"
      |  Database: "logs_db"
      |  DefaultTable: "logs"
      |  Protocol: "tcp"
      |  TableMap:
      |    DBMSSQL: "sql_logs"
      |    EXCP: "errors"
      |
      |ProcessedStorage: "file"
      |""".stripMargin

  private def loadFixture(text: String): Either[String, PumpConfig] = {
    val f = Files.createTempFile("graft-cfg", ".yaml")
    Files.writeString(f, text)
    PumpConfig.load(f.toString)
  }

  test("parses the reference config shape: scalars, nested maps, comments, quotes") {
    val cfg = loadFixture(fixture).toOption.get
    assert(cfg.LogDirectoryMap == Map("Map1" -> "/data/logs/a", "Map2" -> "/data/logs/b"))
    assert(cfg.FilePattern == "*.log")
    assert(cfg.BatchSize == 100 && cfg.BatchInterval == 20 && cfg.RescanInterval == 20)
    assert(cfg.ClickHouse.Address == "localhost:9000")
    assert(cfg.ClickHouse.Database == "logs_db")
    assert(cfg.ClickHouse.TableMap == Map("DBMSSQL" -> "sql_logs", "EXCP" -> "errors"))
    assert(cfg.ProcessedStorage == "file")
  }

  test("sanitize: BOM stripped, tabs become two spaces (Parser.go:20-26)") {
    assert(PumpConfig.sanitize("\uFEFFa:\tb") == "a:  b")
    val tabbed = fixture.replace("  Map1", "\tMap1")
    assert(loadFixture(tabbed).isRight)
  }

  test("validation errors match the reference's checks and order (Parser.go:38-58)") {
    def without(s: String, repl: String = ""): String = fixture.replace(s, repl)
    assert(loadFixture(without("LogDirectoryMap:").replace("  Map1: \"/data/logs/a\"", "")
      .replace("  Map2: '/data/logs/b'", "")) == Left("LogDirectoryMap must not be empty"))
    assert(loadFixture(without("FilePattern: \"*.log\"   # file mask")) ==
      Left("FilePattern must not be empty"))
    assert(loadFixture(without("BatchSize: 100", "BatchSize: 0")) ==
      Left("BatchSize must be positive"))
    assert(loadFixture(without("BatchInterval: 20", "BatchInterval: -1")) ==
      Left("BatchInterval must be positive"))
    assert(loadFixture(without("  Address: \"localhost:9000\"")) ==
      Left("ClickHouse.Address must not be empty"))
    assert(loadFixture(without("  Database: \"logs_db\"")) ==
      Left("ClickHouse.Database must not be empty"))
  }

  test("miniyaml rejects malformed lines with a line number") {
    assert(MiniYaml.parse("key value no colon").isLeft)
    assert(MiniYaml.parse("  orphan: indent").isLeft)
  }

  test("missing file is a read error, not an exception") {
    assert(PumpConfig.load("/nonexistent/x.yaml").left.exists(_.startsWith("read config:")))
  }
}
