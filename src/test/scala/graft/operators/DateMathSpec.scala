package graft.operators

import java.time.Instant
import org.scalatest.funsuite.AnyFunSuite

/** DateMathParser semantics (solr/core/src/java/org/apache/solr/util/
  * DateMathParser.java:46-68): left-to-right ops, round-down `/`, unit
  * aliases, UTC rounding. */
class DateMathSpec extends AnyFunSuite {
  private val a = Instant.parse("2024-03-15T13:45:30Z")
  private def ev(e: String) = DateMath.eval(a, e).toString

  test("rounding truncates to unit start in UTC") {
    assert(ev("NOW/DAY") == "2024-03-15T00:00:00Z")
    assert(ev("NOW/HOUR") == "2024-03-15T13:00:00Z")
    assert(ev("NOW/MONTH") == "2024-03-01T00:00:00Z")
    assert(ev("NOW/YEAR") == "2024-01-01T00:00:00Z")
    assert(ev("/DAY") == "2024-03-15T00:00:00Z") // NOW prefix optional
  }

  test("add/subtract apply left to right, then round") {
    assert(ev("NOW+6MONTHS+3DAYS/DAY") == "2024-09-18T00:00:00Z")
    assert(ev("NOW/DAY+6MONTHS+3DAYS") == "2024-09-18T00:00:00Z")
    assert(ev("NOW-1YEAR/MONTH") == "2023-03-01T00:00:00Z")
    assert(ev("NOW+90DAYS") == "2024-06-13T13:45:30Z")
    assert(ev("NOW+30MINUTES") == "2024-03-15T14:15:30Z")
  }

  test("unit aliases and month-end clamping follow java.time like the reference") {
    assert(ev("NOW+1DATE") == ev("NOW+1DAY"))
    assert(ev("NOW+500MILLIS") == "2024-03-15T13:45:30.500Z")
    // Jan 31 + 1 month clamps to Feb 29 (leap year), like ChronoUnit
    assert(DateMath.eval(Instant.parse("2024-01-31T00:00:00Z"),
      "NOW+1MONTH").toString == "2024-02-29T00:00:00Z")
  }

  test("malformed expressions are rejected") {
    intercept[IllegalArgumentException](ev("NOW+DAY"))
    intercept[IllegalArgumentException](ev("NOW/5DAY"))
    intercept[IllegalArgumentException](ev("NOW+2FORTNIGHTS"))
    intercept[IllegalArgumentException](ev("NOW 2DAYS"))
  }
}
