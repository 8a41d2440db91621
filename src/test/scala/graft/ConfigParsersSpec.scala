package graft

import java.time.{LocalDate, LocalTime}

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ConfigParsers._

/** Table-driven parser tests mirroring the reference's coverage
  * (weather_dl/download_pipeline/parsers_test.py), plus seeded random
  * property sweeps for the invariants the reference asserts. */
class ConfigParsersSpec extends AnyFunSuite {

  test("date: absolute formats") {
    assert(parseDate("2021-10-31") == LocalDate.of(2021, 10, 31))
    assert(parseDate("19700101") == LocalDate.of(1970, 1, 1))
    assert(parseDate("1950-007") == LocalDate.of(1950, 1, 7))
  }

  test("date: relative days") {
    val today = LocalDate.of(2026, 8, 12)
    assert(parseDate("-5", today) == today.minusDays(5))
  }

  test("date: invalid raises") {
    intercept[IllegalArgumentException](parseDate("10-31-2021"))
    intercept[IllegalArgumentException](parseDate("nope"))
  }

  test("time: formats") {
    assert(parseTime("18") == LocalTime.of(18, 0))
    assert(parseTime("18:22") == LocalTime.of(18, 22))
    assert(parseTime("1822") == LocalTime.of(18, 22))
    intercept[IllegalArgumentException](parseTime("25:00"))
  }

  test("mars: plain list passes through") {
    assert(parseMarsSyntax("00/06/12/18") == Seq("00", "06", "12", "18"))
  }

  test("mars: int ranges with padding and direction") {
    assert(parseMarsSyntax("10/to/12") == Seq("10", "11", "12"))
    assert(parseMarsSyntax("12/to/10/by/-1") == Seq("12", "11", "10"))
    assert(parseMarsSyntax("00/to/03") == Seq("00", "01", "02", "03"))
  }

  test("mars: float range rounds to 4 places") {
    assert(parseMarsSyntax("0.0/to/0.5/by/0.1") ==
      Seq("0.0", "0.1", "0.2", "0.3", "0.4", "0.5"))
  }

  test("mars: date ranges, inclusive, auto direction") {
    assert(parseMarsSyntax("2020-01-07/to/2020-01-14/by/2") ==
      Seq("2020-01-07", "2020-01-09", "2020-01-11", "2020-01-13"))
    assert(parseMarsSyntax("2020-01-14/to/2020-01-07/by/-2") ==
      Seq("2020-01-14", "2020-01-12", "2020-01-10", "2020-01-08"))
  }

  test("mars: year-month ranges") {
    assert(parseMarsSyntax("2019-11/to/2020-02", "year-month") ==
      Seq("2019-11", "2019-12", "2020-01", "2020-02"))
  }

  test("hdate: plain subtraction and leap-day clamp") {
    assert(generateHdate("2021-03-15", 2) == "2019-03-15")
    // Feb 29 becomes Feb 28 FIRST, even when the target year is a leap year
    assert(generateHdate("2020-02-29", 4) == "2016-02-28")
  }

  test("day=all explodes year-month into concrete dates") {
    val out = optimizeSelectionPartition(Map(
      "year" -> Seq("2020"), "month" -> Seq("2"), "day" -> Seq("all")))
    assert(out("date").size == 29) // 2020 is a leap year
    assert(out("date").head == "2020-02-01")
    assert(out("date").last == "2020-02-29")
    assert(!out.contains("day") && !out.contains("year") && !out.contains("month"))
  }

  test("date_range collapses to first value") {
    val out = optimizeSelectionPartition(Map("date_range" -> Seq("2020-01-01", "2020-02-01")))
    assert(out("date") == Seq("2020-01-01"))
  }

  test("property: int range length matches Python range semantics") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val a = rnd.nextInt(51); val b = rnd.nextInt(51)
      val out = parseMarsSyntax(s"$a/to/$b")
      if (a <= b) {
        assert(out.size == b - a + 1)
        assert(out.head == a.toString && out.last == b.toString)
      } else assert(out.isEmpty) // positive default step, descending: empty
    }
  }

  test("property: hdate never lands on Feb 29") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 500) {
      val s = f"${1990 + rnd.nextInt(41)}%04d-${1 + rnd.nextInt(12)}%02d-${1 + rnd.nextInt(28)}%02d"
      assert(generateHdate(s, 1 + rnd.nextInt(20)).substring(5) != "02-29")
    }
  }
}
