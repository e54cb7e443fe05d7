package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Table-driven user-agent decomposition — mirrors the uap-core expected
  * values for the major families (`actionuseragent.go:50-112` runs the
  * full uap-go parser; this covers the compact subset we implement).
  */
class UserAgentSpec extends AnyFunSuite {
  import UserAgentParse.{parse, Ua}

  private def ua(s: String): Ua = parse(s)

  test("Chrome on Windows 10") {
    val r = ua("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.6099.109 Safari/537.36")
    assert(r.name == "Chrome" && r.major == "120" && r.minor == "0" && r.patch == "6099")
    assert(r.osFamily == "Windows" && r.osMajor == "10" && r.osMinor == null)
    assert(r.device == "Other")
  }

  test("Mobile Safari on iPhone") {
    val r = ua("Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1 Mobile/15E148 Safari/604.1")
    assert(r.name == "Mobile Safari" && r.major == "17" && r.minor == "1" && r.patch == null)
    assert(r.osFamily == "iOS" && r.osMajor == "17" && r.osMinor == "1")
    assert(r.device == "iPhone")
  }

  test("Safari on Mac") {
    val r = ua("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.0 Safari/605.1.15")
    assert(r.name == "Safari" && r.major == "17" && r.minor == "0")
    assert(r.osFamily == "Mac OS X" && r.osMajor == "10" && r.osMinor == "15")
    assert(r.device == "Mac")
  }

  test("Firefox on Linux") {
    val r = ua("Mozilla/5.0 (X11; Linux x86_64; rv:121.0) Gecko/20100101 Firefox/121.0")
    assert(r.name == "Firefox" && r.major == "121" && r.minor == "0")
    assert(r.osFamily == "Linux" && r.device == "Other")
  }

  test("Chrome Mobile on Android") {
    val r = ua("Mozilla/5.0 (Linux; Android 13; Pixel 7) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/119.0.6045.66 Mobile Safari/537.36")
    assert(r.name == "Chrome Mobile" && r.major == "119")
    assert(r.osFamily == "Android" && r.osMajor == "13")
    assert(r.device == "Generic Smartphone")
  }

  test("Edge wins over the embedded Chrome token") {
    val r = ua("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91")
    assert(r.name == "Edge" && r.major == "120")
    assert(r.osFamily == "Windows" && r.osMajor == "10")
  }

  test("Opera (OPR token) wins over Chrome") {
    val r = ua("Mozilla/5.0 (Windows NT 6.1) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/106.0.0.0 Safari/537.36 OPR/92.0.4561.43")
    assert(r.name == "Opera" && r.major == "92")
    assert(r.osFamily == "Windows" && r.osMajor == "7") // NT 6.1 → 7
  }

  test("IE 11 via Trident rv token") {
    val r = ua("Mozilla/5.0 (Windows NT 6.3; Trident/7.0; rv:11.0) like Gecko")
    assert(r.name == "IE" && r.major == "11")
    assert(r.osFamily == "Windows" && r.osMajor == "8" && r.osMinor == "1") // NT 6.3 → 8.1
  }

  test("tools and bots") {
    assert(ua("curl/8.5.0") == Ua("curl", "8", "5", "0", "Other", null, null, "Other"))
    assert(ua("python-requests/2.31.0").name == "Python Requests")
    val bot = ua("Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)")
    assert(bot.name == "Googlebot" && bot.major == "2" && bot.minor == "1" && bot.device == "Spider")
    val generic = ua("SomeRandomCrawler/1.0 (spider)")
    assert(generic.device == "Spider")
  }

  test("unknown UA → Other, never a failure (uap semantics)") {
    val r = ua("definitely not a browser")
    assert(r.name == "Other" && r.osFamily == "Other" && r.device == "Other")
    assert(r.major == null)
  }
}
