package graft.functions

import java.time.format.DateTimeFormatter
import java.time.temporal.ChronoUnit
import java.time.{LocalDate, LocalTime}
import scala.util.Try

/** Driver-side parsers for the downloader's config value syntax.
  *
  * Re-expresses (not ports) the semantics of
  * weather_dl/download_pipeline/parsers.py and util.py — these run on the
  * Spark driver over tiny config structures; distribution happens after the
  * request space is expanded (see operators.Partitioner).
  *
  * Reference semantics, with file:line anchors:
  *  - date():   parsers.py:34-70 — YYYY-MM-DD | YYYYMMDD | YYYY-DDD | "-N" days
  *  - time():   parsers.py:73-104 — HH | HH:MM | HHMM
  *  - parse_mars_syntax(): parsers.py:238-319 — "a/to/b[/by/c]" inclusive
  *    ranges typed by content: int (zero-pad preserved), float (round 4),
  *    date (YYYY-MM-DD, int-day increments, direction auto-corrected),
  *    year-month (when key == "year-month")
  *  - date_range(): parsers.py:322-325 — inclusive generator
  *  - generate_hdate(): util.py:213-236 — date minus N years, Feb 29 -> Feb 28
  *  - parse_literal/validate/typecast: parsers.py:124-154
  */
object ConfigParsers {
  private val isoDate = DateTimeFormatter.ofPattern("yyyy-MM-dd")

  /** parsers.py:34-70. Relative "-N" is resolved against `today` so tests are
    * deterministic. */
  def parseDate(candidate: String, today: LocalDate = LocalDate.now()): LocalDate = {
    if (candidate.startsWith("-"))
      return today.plusDays(candidate.toLong)
    val attempts: Seq[() => LocalDate] = Seq(
      () => LocalDate.parse(candidate, isoDate),
      () => LocalDate.parse(candidate, DateTimeFormatter.ofPattern("yyyyMMdd")),
      () => LocalDate.ofYearDay(candidate.take(4).toInt, {
        require(candidate.charAt(4) == '-' && candidate.length == 8); candidate.drop(5).toInt
      })
    )
    attempts.view.flatMap(f => Try(f()).toOption).headOption.getOrElse(
      throw new IllegalArgumentException(s"Not a valid date: '$candidate'."))
  }

  /** parsers.py:73-104. */
  def parseTime(candidate: String): LocalTime = {
    val attempts: Seq[() => LocalTime] = Seq(
      () => { require(candidate.length <= 2); LocalTime.of(candidate.toInt, 0) },
      () => LocalTime.parse(candidate, DateTimeFormatter.ofPattern("H:mm")),
      () => { require(candidate.length == 4); LocalTime.of(candidate.take(2).toInt, candidate.drop(2).toInt) }
    )
    attempts.view.flatMap(f => Try(f()).toOption).headOption.getOrElse(
      throw new IllegalArgumentException(s"Not a valid time: '$candidate'."))
  }

  /** Render a double the way Python's str() does for the simple decimals the
    * MARS float ranges produce (shortest round-trip; whole values as "x.0"). */
  private def pyStr(x: Double): String = x.toString

  /** Inclusive date range with signed day increment (parsers.py:322-325). */
  def dateRange(start: LocalDate, end: LocalDate, increment: Int = 1): Seq[LocalDate] = {
    val offset = if (start.isAfter(end)) -1 else 1
    val span = ChronoUnit.DAYS.between(start, end).toInt + offset
    Range(0, span, increment).map(d => start.plusDays(d.toLong))
  }

  /** parsers.py:238-319. Returns rendered strings exactly as the reference
    * does (the downstream request payloads are strings). */
  def parseMarsSyntax(block: String, key: String = ""): Seq[String] = {
    val tokens = block.split('/').map(_.trim).filter(_.nonEmpty).toSeq
    if (!tokens.contains("to") && !tokens.contains("by")) return tokens

    val toIdx = tokens.indexOf("to")
    require(toIdx > 0, s"Improper range syntax in '$block'.")
    val startToken = tokens(toIdx - 1)
    val endToken = tokens(toIdx + 1)
    val incToken = if (tokens.contains("by")) tokens(tokens.indexOf("by") + 1) else "1"

    def asInt(s: String): Option[Long] = Try(s.toLong).toOption
    def asFloat(s: String): Option[Double] =
      if (s.contains(".")) Try(s.toDouble).toOption else None
    def asDate(s: String): Option[LocalDate] = Try(parseDate(s)).toOption
    def asYearMonth(s: String): Option[LocalDate] =
      Try(LocalDate.parse(s + "-01", isoDate)).toOption

    (key, asYearMonth(startToken), asYearMonth(endToken)) match {
      case ("year-month", Some(s), Some(e)) =>
        val inc0 = asInt(incToken).getOrElse(
          throw new IllegalArgumentException(s"year-month increment must be int: '$incToken'")).toInt
        val offset = if (s.isAfter(e)) -1 else 1
        val inc = if (inc0 >= 0) inc0 * offset else inc0
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var cur = s
        while (if (offset > 0) !cur.isAfter(e) else !cur.isBefore(e)) {
          out += f"${cur.getYear}%04d-${cur.getMonthValue}%02d"
          cur = cur.plusMonths(inc.toLong)
        }
        return out.toSeq
      case _ =>
    }

    (asDate(startToken), asDate(endToken)) match {
      case (Some(s), Some(e)) if startToken.exists(!_.isDigit) || startToken.length == 8 =>
        val inc0 = asInt(incToken).getOrElse(
          throw new IllegalArgumentException(
            s"Increments on a date range must be integer number of days, '$incToken' is invalid.")).toInt
        val inc = if (s.isAfter(e) && inc0 > 0) -inc0 else inc0
        return dateRange(s, e, inc).map(_.format(isoDate))
      case _ =>
    }

    (asFloat(startToken).orElse(asInt(startToken).map(_.toDouble)),
      asFloat(endToken).orElse(asInt(endToken).map(_.toDouble))) match {
      case (Some(s), Some(e)) if asFloat(startToken).isDefined || asFloat(endToken).isDefined =>
        val inc = Try(incToken.toDouble).getOrElse(
          throw new IllegalArgumentException(s"Improper range syntax in '$block'."))
        // np.arange(start, end + inc, inc) semantics: start + i*inc, strictly
        // below end + inc; rounded to 4 places (parsers.py:311-313).
        val n = math.ceil(((e + inc) - s) / inc - 1e-12).toInt
        return (0 until n).map { i =>
          val v = BigDecimal(s + i * inc).setScale(4, BigDecimal.RoundingMode.HALF_EVEN).toDouble
          padNum(pyStr(v), startToken.length)
        }
      case _ =>
    }

    (asInt(startToken), asInt(endToken), asInt(incToken)) match {
      case (Some(s), Some(e), Some(inc)) =>
        // Python range(start, end + offset, inc) semantics exactly: the int
        // branch does NOT auto-correct direction (parsers.py:314-316) — a
        // positive step with start > end yields an empty expansion.
        require(inc != 0, s"Improper range syntax in '$block'.")
        val offset = if (s <= e) 1L else -1L
        val stop = e + offset
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var x = s
        while (if (inc > 0) x < stop else x > stop) {
          out += padNum(x.toString, startToken.length)
          x += inc
        }
        out.toSeq
      case _ =>
        throw new IllegalArgumentException(
          s"Range tokens (start='$startToken', end='$endToken', increment='$incToken') are inconsistent types.")
    }
  }

  /** Python str.zfill: left-pad with zeros after any sign, to width `n`. */
  def padNum(s: String, n: Int): String =
    if (s.length >= n) s
    else if (s.startsWith("-")) "-" + ("0" * (n - s.length)) + s.drop(1)
    else ("0" * (n - s.length)) + s

  /** util.py:213-236 — subtract N years; a Feb 29 input becomes Feb 28 first
    * so the hindcast date is never a leap day. */
  def generateHdate(date: String, subtractYears: Int): String = {
    val d0 = LocalDate.parse(date, isoDate)
    val d = if (d0.getMonthValue == 2 && d0.getDayOfMonth == 29) d0.minusDays(1) else d0
    d.minusYears(subtractYears.toLong).format(isoDate)
  }

  /** parsers.py:124-131 — ints with leading zeros stay ints; everything else
    * is kept as-is (we only need the numeric case). */
  def parseLiteral(candidate: String): Any =
    if (candidate.nonEmpty && candidate.forall(_.isDigit)) candidate.toLong else candidate

  /** parsers.py:134-139. */
  def validate(key: String, value: Long): Unit = {
    if (key == "day") require(value >= 1 && value <= 31, "Day value must be between 1 to 31.")
    if (key == "month") require(value >= 1 && value <= 12, "Month value must be between 1 to 12.")
  }

  /** config.py:80-126 — `day='all'` explodes every (year, month) into that
    * month's concrete dates; `date_range` collapses to its first value. */
  def optimizeSelectionPartition(selection: Map[String, Seq[String]]): Map[String, Seq[String]] = {
    var sel = selection
    sel.get("date_range").foreach { dr => sel = sel - "date_range" + ("date" -> dr.take(1)) }
    if (sel.get("day").exists(_ == Seq("all"))) {
      val years = sel.getOrElse("year", Nil)
      val months = sel.getOrElse("month", Nil)
      require(years.forall(!_.contains("/")), "When using day='all' in selection, '/' is not allowed in year.")
      require(months.forall(!_.contains("/")), "When using day='all' in selection, '/' is not allowed in month.")
      val dates = for {
        y <- years; m <- months
        ym = LocalDate.of(y.toInt, m.toInt, 1)
        d <- 1 to ym.lengthOfMonth()
      } yield f"${y.toInt}%04d-${m.toInt}%02d-$d%02d"
      sel = sel - "day" - "month" - "year" + ("date" -> dates)
    }
    sel
  }
}
