package graft

import graft.functions.RefFunctions._

/** Golden fixtures for the procedural parity functions, ported from
  * tests/test_dataflow_utils.py and the spec comments in
  * dataflow_utils.py:1337-1360.
  */
class RefFunctionsSpec extends SparkSpec {

  test("reformatPhone: US formats (:412-424)") {
    val inputs = Seq("+1(412)-6368126", "+1-4126368126", "14126368126",
      "412-636-8126", "412,636,8126", "412.636/8126", "412+636+8126",
      "$ 4 1 2 6 3 6 8 1 2 6 /")
    inputs.foreach(i => assert(reformatPhone(i) === "+1 (412) 636-8126", i))
  }

  test("reformatPhone: international formats (:426-432)") {
    val inputs = Seq("+44 7911 123456", "+44(791)-1123456", "+44-7911123456",
      "447911123456", "44-791-112-3456", "44,791,112,3456",
      "44.791.112/3456", "+44+791+112+3456", "$ 4 4 7 9 1 1 1 2 3 4 5 6 /")
    inputs.foreach(i => assert(reformatPhone(i) === "+44 (791) 112-3456", i))
  }

  test("standardizeParcelNum: hyphenated city formats normalise to county 16-char") {
    // spec examples, dataflow_utils.py:1357-1360
    assert(standardizeParcelNum("1-X-1-1-1") === "0001X00001000101")
    assert(standardizeParcelNum("0001-X-00001-0001-01") === "0001X00001000101")
    // 16-char passthrough (spec convention 6)
    assert(standardizeParcelNum("1234X12345123412") === "1234X12345123412")
    // omitted all-zero trailing components get zero-filled defaults
    assert(standardizeParcelNum("0123-A-00045") === "0123A00045000000")
  }

  test("standardizeParcelNum: invalid inputs") {
    assert(standardizeParcelNum(null) === "invalid input")
    assert(standardizeParcelNum("12@4X12345123412") === "invalid input")
    assert(standardizeParcelNum("123") === "invalid input") // not 16, no hyphen
    assert(standardizeParcelNum("1-2-3-4-5-6") === "invalid input") // too many parts
    assert(standardizeParcelNum("123AX12345123412") === "invalid input") // letter in numeric comp
    assert(standardizeParcelNum("0000A00000000000") === "invalid input") // <3 distinct chars
  }

  test("redactPii: golden cases (:274-302)") {
    assert(redactPii("remove pothole", retainLocation = true) === "remove pothole")
    assert(redactPii("John Doe is causing a lot of noise", retainLocation = true)
      === "[PERSON_NAME] is causing a lot of noise")
    assert(redactPii("", retainLocation = true) === "No comment")
    assert(redactPii("I saw Ms. Smith littering", retainLocation = true)
      === "I saw [PERSON_NAME] littering")
    val longCase = redactPii(
      "Timmy Smith woke up the whole neighborhood by listening to The Smiths too loud. " +
        "Call him at 412-111-2222 to make him stop", retainLocation = true)
    assert(longCase.contains("[PERSON_NAME] woke up"))
    assert(longCase.contains("[PHONE_NUMBER]"))
    assert(!longCase.contains("Timmy"))
  }

  test("redactPii: place-name protection keeps streets (:291-292)") {
    val out = redactPii(
      "plow snow on Smith St and on 1st and Murray, notify me at jdoe@email.com when done",
      retainLocation = true)
    assert(out.contains("Smith_St"), out)
    assert(out.contains("and_Murray"), out)
    assert(out.contains("[EMAIL_ADDRESS]"), out)
    assert(!out.contains("jdoe@email.com"))
  }

  test("anonymizeBlock: floor + X-mask (:446-467 semantics, current source)") {
    assert(anonymizeBlock("513 N. Neville St, Apt A1, Pittsburgh", 10)
      === "51X N. Neville St, Apt A1, Pittsburgh")
    assert(anonymizeBlock("513 N. Neville St, Apt A1, Pittsburgh", 100)
      === "5XX N. Neville St, Apt A1, Pittsburgh")
    assert(anonymizeBlock("5565 Fifth Avenue, Apt D206, Pittsburgh", 1000)
      === "5XXX Fifth Avenue, Apt D206, Pittsburgh")
    assert(anonymizeBlock("No leading number", 100) === "No leading number")
    assert(anonymizeBlock(null, 100) === null)
  }

  test("accuracyToDecimals: meter accuracy buckets (:118-155)") {
    assert(accuracyToDecimals(5000) === 1)
    assert(accuracyToDecimals(200) === 3)
    assert(accuracyToDecimals(7) === 4)
    assert(accuracyToDecimals(0) === 5)
  }

  test("snakeCasePlaceNames joins place identifiers") {
    assert(snakeCasePlaceNames("Moore Park is nice") === "Moore_Park is nice")
  }

  test("redactPii: honorific Dr after a lowercase word is a PERSON even " +
    "under place protection; street Dr after a capitalized name stays a place") {
    val person = redactPii("Spoke with Dr Jones today", retainLocation = true)
    assert(person.contains("[PERSON_NAME]") && !person.contains("Jones"), person)
    val street = redactPii("pothole on Oak Dr near the school", retainLocation = true)
    assert(street.contains("Oak_Dr"), street)
    // a street Dr followed by a CAPITALIZED word (cross street) must
    // also stay a place — the un-join test is the preceding word's
    // first letter, not its last
    val cross = redactPii("pothole on Oak Dr North Ave", retainLocation = true)
    assert(cross.contains("Oak_Dr") && cross.contains("North_Ave"), cross)
    assert(!cross.contains("[PERSON_NAME]"), cross)
  }

  test("anonymizeBlock: a >19-digit pasted id masks instead of " +
    "overflowing; accuracy must be positive") {
    val out = anonymizeBlock("99999999999999999999 Main St", 100)
    assert(out.endsWith(" Main St") && out.contains("X"), out)
    intercept[IllegalArgumentException](anonymizeBlock("5 Main St", 0))
  }
}
