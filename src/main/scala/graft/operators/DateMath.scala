package graft.operators

import java.time.{Instant, ZoneOffset, ZonedDateTime}
import java.time.temporal.ChronoUnit

/** Solr date-math expressions (reference:
  * solr/core/src/java/org/apache/solr/util/DateMathParser.java:46-68,127-166):
  * `NOW` (optional prefix) followed by left-to-right operations — `+Nunit` /
  * `-Nunit` add, `/unit` rounds DOWN to the start of that unit. Unit names
  * accept the reference's singular/plural aliases (`DATE`==`DAYS`,
  * `MILLI`==`MILLIS`, DateMathParser.java:131-166). Rounding is UTC, the
  * reference's default (`DEFAULT_MATH_TZ`, :114).
  *
  * A pure `(Instant, String) => Instant` function — applied per row inside
  * a typed map when a column of expressions needs evaluating, exactly like
  * the analyzer chain (no UDF registration, no driver loop). */
object DateMath {

  private val units: Map[String, ChronoUnit] = {
    import ChronoUnit._
    Map(
      "YEAR" -> YEARS, "YEARS" -> YEARS,
      "MONTH" -> MONTHS, "MONTHS" -> MONTHS,
      "DAY" -> DAYS, "DAYS" -> DAYS, "DATE" -> DAYS,
      "HOUR" -> HOURS, "HOURS" -> HOURS,
      "MINUTE" -> MINUTES, "MINUTES" -> MINUTES,
      "SECOND" -> SECONDS, "SECONDS" -> SECONDS,
      "MILLI" -> MILLIS, "MILLIS" -> MILLIS,
      "MILLISECOND" -> MILLIS, "MILLISECONDS" -> MILLIS)
  }

  def eval(anchor: Instant, expr0: String): Instant = {
    val expr = {
      val e = expr0.trim
      if (e.startsWith("NOW")) e.substring(3) else e
    }
    var t = ZonedDateTime.ofInstant(anchor, ZoneOffset.UTC)
    var i = 0
    while (i < expr.length) {
      expr.charAt(i) match {
        case '/' =>
          val (unit, ni) = readUnit(expr, i + 1)
          t = roundDown(t, unit)
          i = ni
        case c @ ('+' | '-') =>
          var j = i + 1
          while (j < expr.length && expr.charAt(j).isDigit) j += 1
          require(j > i + 1, s"date math missing number at $i in '$expr0'")
          val n = expr.substring(i + 1, j).toLong
          val (unit, ni) = readUnit(expr, j)
          t = if (c == '+') t.plus(n, unit) else t.minus(n, unit)
          i = ni
        case other =>
          throw new IllegalArgumentException(
            s"unexpected date math character '$other' in '$expr0'")
      }
    }
    t.toInstant
  }

  private def readUnit(expr: String, from: Int): (ChronoUnit, Int) = {
    var j = from
    while (j < expr.length && expr.charAt(j).isLetter) j += 1
    val name = expr.substring(from, j)
    (units.getOrElse(name,
      throw new IllegalArgumentException(s"unknown date math unit: $name")), j)
  }

  /** Round down to the start of `unit` — DateMathParser's `/` semantics
    * (truncation in the rounding timezone; MONTH/YEAR truncate to the first
    * day, then midnight). */
  private def roundDown(t: ZonedDateTime, unit: ChronoUnit): ZonedDateTime =
    unit match {
      case ChronoUnit.YEARS =>
        t.withDayOfYear(1).truncatedTo(ChronoUnit.DAYS)
      case ChronoUnit.MONTHS =>
        t.withDayOfMonth(1).truncatedTo(ChronoUnit.DAYS)
      case u => t.truncatedTo(u)
    }
}
