package graft.functions

import java.time.OffsetDateTime
import java.time.format.DateTimeFormatter

/** Clean-room Scala implementation of the reference's timestamp utilities
  * (behavioral spec: `app/utils/time_converter.py:7-43` for normalization,
  * `:46-131` for the ISO -> (datetime, microseconds, month) split).
  *
  * These are pure driver/executor-side functions; the dataflow surface wraps
  * them as struct-returning UDFs (see [[Registry]]) while the flagship query
  * path uses native `Column` equivalents (date_format / date_trunc) that stay
  * inside whole-stage codegen.
  */
object TimeFunctions {

  final case class IsoParts(datetime: String, microseconds: Option[Int], month: String)

  class InvalidFormatException(msg: String) extends IllegalArgumentException(msg)
  class EmptyValueException(msg: String) extends IllegalArgumentException(msg)
  class TimezoneMismatchException(msg: String) extends IllegalArgumentException(msg)

  /** Normalize an ISO-8601 string so the fractional second has exactly 6
    * digits, rounding (half-even, matching Python's `round`) from up to
    * `maxFractionLength` digits and clamping a round-up overflow to `999999`
    * (reference `time_converter.py:34-37`). A fraction longer than
    * `maxFractionLength` digits is an error (`:28-31`).
    *
    * Quirk preserved for parity (`:39-42`): with no fractional part, the
    * string is returned unchanged only when the seconds field is zero;
    * otherwise "000000" is spliced in at index 26, which for short strings
    * produces an unparseable value that the caller surfaces as a format error.
    */
  def normalizeIso(isoTime: String, maxFractionLength: Int = 9): String = {
    val tIdx = isoTime.indexOf('T')
    if (tIdx < 0) throw new InvalidFormatException(s"Invalid time format: $isoTime")
    val datePart = isoTime.substring(0, tIdx)
    val timePart = isoTime.substring(tIdx + 1)
    val dotIdx = timePart.indexOf('.')
    if (dotIdx >= 0) {
      val mainTime = timePart.substring(0, dotIdx)
      val fractionAndTz = timePart.substring(dotIdx + 1)
      // fraction = digits before any 'Z' / '+' / '-' suffix
      val fraction = fractionAndTz.stripSuffix("Z").split('+')(0).split('-')(0)
      if (fraction.length > maxFractionLength)
        throw new InvalidFormatException(
          s"The fractional part is too long: ${fraction.length} digits (max $maxFractionLength).")
      if (!fraction.forall(_.isDigit))
        // keep the documented error contract: a malformed fraction must be a
        // format error, not a NumberFormatException escaping from toLong
        throw new InvalidFormatException(s"Invalid time format: $isoTime")
      val padded = fraction.padTo(maxFractionLength, '0').mkString
      val scale = math.pow(10, (maxFractionLength - 6).toDouble).toLong
      val n = padded.toLong
      val q = n / scale
      val r = n % scale
      val half = scale / 2
      val rounded =
        if (scale == 1) n
        else if (r > half) q + 1
        else if (r < half) q
        else if (q % 2 == 0) q else q + 1 // half-even
      val normalized0 = f"$rounded%06d"
      val normalized = if (normalized0 == "1000000") "999999" else normalized0
      s"${datePart}T$mainTime.$normalized${fractionAndTz.substring(fraction.length)}"
    } else {
      // Reference parses the last ':'-field as an int: a tz suffix glued to
      // the seconds ("30+00:00") is a ValueError there -> format error here.
      val secondsField = timePart.split(':').last
      val secs =
        try secondsField.trim.toInt
        catch {
          case _: NumberFormatException =>
            throw new InvalidFormatException(s"Invalid time format: $isoTime")
        }
      if (secs == 0) isoTime
      else {
        val cut = math.min(26, isoTime.length)
        isoTime.substring(0, cut) + "000000" + (if (isoTime.length > 26) isoTime.substring(26) else "")
      }
    }
  }

  private val outFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  /** ISO-8601 string -> (datetime at second precision, microseconds side
    * channel, month floor) with a timezone-mismatch policy
    * (reference `time_converter.py:46-131`): compare the string's UTC offset
    * (floor of hours) against `expectedTimezone`; `error` raises, `warning`
    * and `ignore` shift the wall-clock time into the expected zone (`:120`).
    * Empty input: nulls when `allowEmpty`, error otherwise (`:80-83`).
    */
  def isoToParts(
      isoTime: String,
      expectedTimezone: Int = 0,
      handleTimezone: String = "error",
      allowEmpty: Boolean = false,
      maxFractionLength: Int = 9): IsoParts = {
    if (isoTime == null || isoTime.isEmpty) {
      if (!allowEmpty) throw new EmptyValueException("Empty values are not allowed.")
      return IsoParts(null, None, null)
    }
    require(Set("error", "warning", "ignore").contains(handleTimezone),
      s"Invalid value for handle_timezone: '$handleTimezone'.")
    try {
      if (isoTime.length < 20) throw new InvalidFormatException("The ISO time string is too short to be valid.")
      val needsNorm = isoTime.length < 26 || isoTime.charAt(19) != '.' ||
        (isoTime.length > 26 && isoTime.charAt(26) != '+' && isoTime.charAt(26) != 'Z') ||
        isoTime.length == 26
      val normalized = if (needsNorm) normalizeIso(isoTime, maxFractionLength) else isoTime
      val parseable = if (normalized.endsWith("Z")) normalized.dropRight(1) + "+00:00" else normalized
      var dt = OffsetDateTime.parse(parseable)
      val actualTz = math.floorDiv(dt.getOffset.getTotalSeconds.toLong, 3600L).toInt
      if (actualTz != expectedTimezone) {
        if (handleTimezone == "error")
          throw new TimezoneMismatchException(
            s"Timezone mismatch: expected $expectedTimezone, got $actualTz.")
        dt = dt.plusHours((expectedTimezone - actualTz).toLong)
      }
      IsoParts(
        dt.format(outFmt),
        Some(dt.getNano / 1000),
        f"${dt.getYear}%04d-${dt.getMonthValue}%02d-01")
    } catch {
      case e: TimezoneMismatchException => throw e
      case e: EmptyValueException => throw e
      case e: InvalidFormatException => throw e
      case _: java.time.format.DateTimeParseException =>
        throw new InvalidFormatException(s"Invalid time format: $isoTime")
    }
  }
}
