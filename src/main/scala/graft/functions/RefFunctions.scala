package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Procedural parity functions reproducing the reference's genuinely
  * algorithmic per-record logic (the minority of DoFns that are not
  * expressible as simple column expressions). Each is a pure Scala
  * function (unit-testable against the reference's golden fixtures in
  * tests/test_dataflow_utils.py) wrapped as a Spark UDF.
  *
  * These run row-at-a-time but are O(len(string)) pure JVM code with no
  * allocation-heavy regex backtracking — at 100 TB they are embarrassingly
  * parallel map work, never a shuffle.
  */
object RefFunctions {

  // ------------------------------------------------------------------
  // Parcel number normalisation
  // (dataflow_utils.py:597-616 + standardize_parc_num :1335-1456)
  // ------------------------------------------------------------------

  /** County 16-char parcel format: 5 components of lengths 4,1,5,4,2;
    * components 1 and 3 (0-indexed 0 and 2) must be purely numeric;
    * hyphenated inputs are split and zero-padded; trailing all-zero
    * components may be omitted; result needs >2 distinct chars.
    */
  private val ParcLens  = Array(4, 1, 5, 4, 2)
  private val AlphaOk   = Array(false, true, false, true, true)
  private val Invalid   = "invalid input"

  def standardizeParcelNum(input: String): String = {
    if (input == null) return Invalid
    val parcStr = input.trim.toUpperCase
    if (parcStr.isEmpty) return Invalid
    if (!parcStr.forall(c => c.isLetterOrDigit || c == '-')) return Invalid

    val parts: Array[String] =
      if (parcStr.contains("-")) {
        val p = parcStr.split("-", -1)
        if (p.length > ParcLens.length) return Invalid
        p
      } else if (parcStr.length == 16) {
        var rest = parcStr
        ParcLens.map { l => val (h, t) = rest.splitAt(l); rest = t; h }
      } else return Invalid

    val convVals = Array("", "", "", "0000", "00")
    var i = 0
    while (i < parts.length) {
      val part = parts(i)
      if (!AlphaOk(i) && part.exists(_.isLetter)) return Invalid
      if (part.length > ParcLens(i)) return Invalid
      convVals(i) = ("0" * (ParcLens(i) - part.length)) + part
      i += 1
    }
    val out = convVals.mkString
    if (out.length == 16 && out.distinct.length > 2) out else Invalid
  }

  val standardizeParcelNumUdf = udf(standardizeParcelNum _)

  // ------------------------------------------------------------------
  // Phone normalisation (ReformatPhoneNumbers, dataflow_utils.py:548-567)
  // ------------------------------------------------------------------

  /** Normalise to `+C (AAA) XXX-XXXX`; >10 digits → leading digits are
    * the country code, else country code is +1. Golden cases:
    * tests/test_dataflow_utils.py:412-432.
    */
  def reformatPhone(input: String): String = {
    if (input == null) return null
    val digits = input.filter(_.isDigit)
    if (digits.length < 10) return null
    val (cc, rest) =
      if (digits.length > 10) ("+" + digits.dropRight(10), digits.takeRight(10))
      else ("+1", digits)
    s"$cc (${rest.substring(0, 3)}) ${rest.substring(3, 6)}-${rest.substring(6)}"
  }

  val reformatPhoneUdf = udf(reformatPhone _)

  // ------------------------------------------------------------------
  // PII redaction (ReplacePII / replace_pii / snake_case_place_names,
  // dataflow_utils.py:570-594 + :1232-1319) — regex + heuristics, no
  // external DLP service. Golden contract: tests/test_dataflow_utils.py:
  // 274-302.
  // ------------------------------------------------------------------

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}".r
  private val PhoneRe = "(\\+?1[-. ])?\\(?\\d{3}\\)?[-. ]\\d{3}[-. ]\\d{4}".r
  // honorific + capitalised surname, or two consecutive capitalised words
  // that are not sentence-leading common words
  private val HonorificRe = "\\b(?:Mr|Ms|Mrs|Dr|Miss)\\.? [A-Z][a-z]+".r
  private val NameRe      = "\\b[A-Z][a-z]+ [A-Z][a-z]+\\b".r

  /** Words that look like name-pair halves but are not person names
    * (title-case bigram heuristic false-positive guard).
    */
  private val NotNameWords = Set(
    "The", "A", "An", "This", "That", "My", "Our", "Your", "Their",
    "North", "South", "East", "West", "New", "Old", "City", "County",
    "Park", "Street", "Avenue", "Road", "Drive", "Boulevard", "Lane",
    "Way", "Court", "Place", "Alley", "Plaza", "Bridge", "Hill")

  /** Place-word identifiers (reference stores these in
    * user_defined_data/place_identifiers.txt; this is the tested subset).
    */
  val PlaceIdentifiers: Seq[String] = Seq(
    "St", "Street", "Ave", "Avenue", "Rd", "Road", "Dr", "Drive",
    "Blvd", "Boulevard", "Ln", "Lane", "Way", "Ct", "Court", "Pl",
    "Place", "Park", "Playground", "Field", "Cemetery", "Alley", "Aly")
  /** Ordinal-cross-street patterns ("1st and Murray" → "1st and_Murray"
    * per the golden test — the identifier keeps the following word
    * joined so DLP-style scrubbers don't read it as a name).
    */
  val StreetNumIdentifiers: Seq[String] = Seq(
    "1st and", "2nd and", "3rd and", "4th and", "5th and",
    "6th and", "7th and", "8th and", "9th and", "0th and")

  /** snake_case_place_names (dataflow_utils.py:1297-1319): join a word
    * with a following place identifier ("Moore Park" → "Moore_Park"),
    * and a street-number identifier with the following word
    * ("1st and Murray" → "1st and_Murray" — the identifier keeps its
    * trailing join, per the golden test).
    */
  def snakeCasePlaceNames(input: String): String = {
    if (input == null) return null
    val placeAlt  = PlaceIdentifiers.mkString("|")
    val numAlt    = StreetNumIdentifiers.mkString("|")
    val joined = input.replaceAll(s"(?i)(\\s)\\b($placeAlt)\\b", "_$2")
    joined.replaceAll(s"(?i)\\b($numAlt)\\b(\\s)", "$1_")
  }

  /** Redact person names / emails / phone numbers with `[TYPE]` tokens;
    * empty input → "No comment"; optional place-name protection first.
    */
  def redactPii(input: String, retainLocation: Boolean): String = {
    var s = if (input == null || input.isEmpty) "No comment" else input
    if (retainLocation) {
      s = snakeCasePlaceNames(s)
      // "Dr" is both a place identifier (Drive) and an honorific; the
      // place join after a lowercase-INITIAL word ("spoke with_Dr
      // Jones") can only be the honorific — a street name before "Dr"
      // is capitalized ("Oak_Dr") — and leaving it joined would break
      // the honorific/name regexes below and LEAK the surname. The
      // test must be the preceding word's FIRST letter: its last
      // letter is lowercase for street names too ("Oak"), which would
      // un-join "Oak_Dr North_Ave" and redact the street as a person
      s = s.replaceAll("\\b([a-z][A-Za-z]*)_(Dr\\.?\\s+[A-Z])", "$1 $2")
    }
    s = EmailRe.replaceAllIn(s, "[EMAIL_ADDRESS]")
    s = PhoneRe.replaceAllIn(s, "[PHONE_NUMBER]")
    s = HonorificRe.replaceAllIn(s, "[PERSON_NAME]")
    s = NameRe.replaceAllIn(s, m => {
      val words = m.matched.split(" ")
      if (words.exists(NotNameWords.contains) || m.matched.contains("_")) m.matched
      else "[PERSON_NAME]"
    })
    s
  }

  val redactPiiUdf = udf((s: String) => redactPii(s, retainLocation = true))
  val redactPiiNoPlacesUdf = udf((s: String) => redactPii(s, retainLocation = false))

  // ------------------------------------------------------------------
  // Address-block anonymisation (AnonymizeAddressBlock,
  // dataflow_utils.py:78-115). Golden: tests/test_dataflow_utils.py:446-467
  // ------------------------------------------------------------------

  /** Mask a leading block number to `accuracy`: floor to accuracy, then
    * X-out as many trailing chars as `accuracy` has zeros
    * (123 @ 100 → "1XX").
    */
  def anonymizeBlock(address: String, accuracy: Int): String = {
    require(accuracy > 0, s"accuracy must be positive, got $accuracy")
    if (address == null) return null
    val blockNum = address.takeWhile(_.isDigit)
    if (blockNum.isEmpty) return address
    // BigInt: a pasted id longer than 19 digits would overflow toLong
    // and fail the task — dirty input must degrade, not crash
    val floored  = (BigInt(blockNum) / accuracy) * accuracy
    val numZeros = accuracy.toString.count(_ == '0')
    val fs       = floored.toString
    val keep     = math.max(fs.length - numZeros, 0)
    val masked   = fs.substring(0, keep) + fs.substring(keep).replace('0', 'X')
    masked + address.substring(blockNum.length)
  }

  def anonymizeBlockUdf(accuracy: Int) = udf((s: String) => anonymizeBlock(s, accuracy))

  // ------------------------------------------------------------------
  // Lat/long anonymisation (AnonymizeLatLong, dataflow_utils.py:118-155)
  // ------------------------------------------------------------------

  /** Meter accuracy → decimal places (wiki.gis.com decimal-degrees
    * table): 5000-14999m→1, 500-4999→2, 50-499→3, 5-49→4, 0-4→5.
    */
  def accuracyToDecimals(accuracyMeters: Int): Int = accuracyMeters match {
    case a if a >= 5000 => 1
    case a if a >= 500  => 2
    case a if a >= 50   => 3
    case a if a >= 5    => 4
    case _              => 5
  }

  /** Column-expression form: round coordinate to the accuracy-derived
    * number of decimals (roll_up_coords gcs_utils.py:445-454 is the
    * 3-decimal special case).
    */
  def anonymizeCoord(c: Column, accuracyMeters: Int): Column =
    round(c, accuracyToDecimals(accuracyMeters))
}
