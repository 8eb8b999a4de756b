package graft

import graft.functions.TimeFunctions
import graft.functions.TimeFunctions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral truth table for F1/F2 (reference `app/utils/time_converter.py`),
  * cases from FIXTURES.md §5. Property-style cases run over a seeded sample
  * (scalatest+scalacheck bridge is not in the offline dependency cache).
  */
class TimeFunctionsSpec extends AnyFunSuite {

  test("9-digit fraction rounds to 6 (half-even like Python round)") {
    assert(TimeFunctions.normalizeIso("2025-01-01T00:00:00.123456789Z")
      == "2025-01-01T00:00:00.123457Z")
    // exact half goes to even
    assert(TimeFunctions.normalizeIso("2025-01-01T00:00:00.123456500Z")
      == "2025-01-01T00:00:00.123456Z")
    assert(TimeFunctions.normalizeIso("2025-01-01T00:00:00.123457500Z")
      == "2025-01-01T00:00:00.123458Z")
  }

  test("round-up overflow clamps to 999999") {
    assert(TimeFunctions.normalizeIso("2025-01-01T00:00:00.999999700+00:00")
      == "2025-01-01T00:00:00.999999+00:00")
  }

  test("fraction longer than 9 digits is an error") {
    intercept[InvalidFormatException] {
      TimeFunctions.normalizeIso("2025-01-01T00:00:00.1234567891Z")
    }
  }

  test("non-digit fraction is a FORMAT error, not a NumberFormatException") {
    intercept[InvalidFormatException] {
      TimeFunctions.normalizeIso("2021-01-01T10:00:00.12a+00:00")
    }
  }

  test("short fraction is padded to 6 on parse path") {
    val p = TimeFunctions.isoToParts("2025-01-01T10:20:30.123+00:00")
    assert(p.datetime == "2025-01-01 10:20:30")
    assert(p.microseconds.contains(123000))
    assert(p.month == "2025-01-01")
  }

  test("empty input: allow_empty -> nulls, else error") {
    val p = TimeFunctions.isoToParts("", allowEmpty = true)
    assert(p.datetime == null && p.microseconds.isEmpty)
    intercept[EmptyValueException] { TimeFunctions.isoToParts("") }
  }

  test("timezone mismatch: error policy raises, ignore shifts into expected zone") {
    intercept[TimezoneMismatchException] {
      TimeFunctions.isoToParts("2025-01-01T10:00:00.000000+03:00", expectedTimezone = 0)
    }
    val shifted = TimeFunctions.isoToParts(
      "2025-01-01T10:00:00.000000+03:00", expectedTimezone = 0, handleTimezone = "ignore")
    assert(shifted.datetime == "2025-01-01 07:00:00")
  }

  test("negative fractional-hour offsets floor toward -inf (reference // semantics)") {
    // -03:30 offset -> floor(-3.5h) = -4 actual; matches expected -4 -> no
    // shift, wall-clock time is preserved in the output
    val p = TimeFunctions.isoToParts(
      "2025-01-01T10:00:00.000000-03:30", expectedTimezone = -4, handleTimezone = "error")
    assert(p.datetime == "2025-01-01 10:00:00")
  }

  test("outputs carry second-precision datetime + µs side channel + month floor") {
    val p = TimeFunctions.isoToParts("2025-03-15T23:59:59.999999500+00:00")
    assert(p.datetime == "2025-03-15 23:59:59")
    assert(p.microseconds.contains(999999)) // clamped
    assert(p.month == "2025-03-01")
  }

  test("property: normalized fraction always has exactly 6 digits") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val frac = rnd.between(0L, 1000000000L).toString
      val s = s"2025-06-07T01:02:03.$frac+00:00"
      val out = TimeFunctions.normalizeIso(s)
      val fracOut = out.substring(out.indexOf('.') + 1, out.indexOf('+'))
      assert(fracOut.length == 6 && fracOut.forall(_.isDigit), s"input $s -> $out")
    }
  }

  test("property: isoToParts microseconds in [0, 999999]") {
    val rnd = new scala.util.Random(43)
    (1 to 500).foreach { _ =>
      val n = rnd.between(0L, 1000000000L)
      val p = TimeFunctions.isoToParts(f"2025-06-07T01:02:03.$n%09d+00:00")
      assert(p.microseconds.exists(m => m >= 0 && m <= 999999), s"n=$n -> $p")
    }
  }
}
