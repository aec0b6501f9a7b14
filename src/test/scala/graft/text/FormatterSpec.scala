package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Goldens from /root/reference/test/formatter_test.cc:5-31 plus the
  * template paths q36_format_address exercises. */
class FormatterSpec extends AnyFunSuite {
  import Formatter._

  test("FR golden: full address (formatter_test.cc:6-21)") {
    val a = Address(
      houseNumber = "17",
      road = "Rue du Médecin-Colonel Calbairac",
      neighbourhood = "Lafourguette",
      suburb = "Toulouse Ouest",
      postcode = "31000",
      city = "Toulouse",
      county = "Toulouse",
      state = "Midi-Pyrénées",
      country = "France",
      countryCode = "FR")
    assert(format(a) ===
      "17 Rue du Médecin-Colonel Calbairac, 31000 Toulouse, France")
  }

  test("US golden: road only, empty components cleaned (formatter_test.cc:23-26)") {
    assert(format(Address(road = "Test", countryCode = "US")) === "Test")
  }

  test("HU golden: road only (formatter_test.cc:28-31)") {
    assert(format(Address(road = "Test", countryCode = "HU")) === "Test")
  }

  test("unknown country falls back to house_number road (formatter.cc:88-93)") {
    assert(format(Address(houseNumber = "5", road = "Main Street", countryCode = "XX"))
      === "5 Main Street")
    assert(format(Address(road = "Main Street", countryCode = "XX")) === "Main Street")
  }

  test("DE template: road before house number") {
    val a = Address(houseNumber = "7", road = "Lindenstraße", postcode = "10007",
      city = "Berlin", country = "Deutschland", countryCode = "DE")
    assert(format(a) === "Lindenstraße 7, 10007 Berlin, Deutschland")
  }

  test("US template: full address keeps city before postcode") {
    val a = Address(houseNumber = "5", road = "Main Street", postcode = "10005",
      city = "Springfield", country = "USA", countryCode = "US")
    assert(format(a) === "5 Main Street, Springfield, 10005, USA")
  }
}
