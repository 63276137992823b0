package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.RecordAssembler.splitRecords

class RecordAssemblerSpec extends AnyFunSuite {

  private def split(lines: String*): List[Seq[String]] =
    splitRecords(lines.iterator).toList

  test("boundary line flushes previous record (tail.go:102-104)") {
    val recs = split(
      "00:01.123456-5,CONN,3,Usr=a",
      "continuation line",
      "00:02.200000-7,DBMSSQL,5,Usr=b")
    assert(recs == List(
      Seq("00:01.123456-5,CONN,3,Usr=a", "continuation line"),
      Seq("00:02.200000-7,DBMSSQL,5,Usr=b")))
  }

  test("leading non-boundary lines form their own (malformed) record") {
    val recs = split("garbage", "00:01.123456-5,CONN,3")
    assert(recs == List(Seq("garbage"), Seq("00:01.123456-5,CONN,3")))
  }

  test("NUL bytes stripped per line (tail.go:98-101)") {
    val recs = split("00:01.12\u000034-5,CONN,3")
    assert(recs == List(Seq("00:01.1234-5,CONN,3")))
  }

  test("empty input → no records") {
    assert(split() == Nil)
  }

  test("trailing buffer flushed at EOF (tail.go:90-97)") {
    val recs = split("00:01.123456-5,CONN,3", "tail line")
    assert(recs == List(Seq("00:01.123456-5,CONN,3", "tail line")))
  }
}
