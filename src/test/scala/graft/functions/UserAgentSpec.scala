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

  // ---- full uap-core database loading (regexes.yaml / JSON form) ----
  // A miniature database in the EXACT uap-core file format; the rules
  // exercise every template feature the full public file uses:
  // $N substitution, literal replacements, group defaults, regex_flag.
  private val uapYaml =
    """user_agent_parsers:
      |  - regex: '(Namoroka|Shiretoko|Minefield)/(\d+)\.(\d+)\.(\d+(?:pre|))'
      |    family_replacement: 'Firefox ($1)'
      |  - regex: '(Chrome)/(\d+)\.(\d+)\.(\d+)\.(\d+) Mobile'
      |    family_replacement: 'Chrome Mobile'
      |  - regex: '(Chromium|Chrome)/(\d+)\.(\d+)(?:\.(\d+))?'
      |  - regex: '(Firefox)/(\d+)\.(\d+)\.(\d+)'
      |  - regex: 'Version/(\d+)\.(\d+)(?:\.(\d+))?.*Safari/'
      |    family_replacement: 'Safari'
      |    v1_replacement: '$1'
      |    v2_replacement: '$2'
      |    v3_replacement: '$3'
      |os_parsers:
      |  - regex: 'Win(?:dows)? ?(95|98|3\.1|NT|ME|2000)'
      |    os_replacement: 'Windows'
      |    os_v1_replacement: '$1'
      |  - regex: 'Windows NT 10\.0'
      |    os_replacement: 'Windows'
      |    os_v1_replacement: '10'
      |  - regex: '(CPU[ +]OS|iPhone[ +]OS|CPU[ +]iPhone[ +]OS)[ +]+(\d+)[_\.](\d+)'
      |    os_replacement: 'iOS'
      |    os_v1_replacement: '$2'
      |    os_v2_replacement: '$3'
      |  - regex: '(Android) (\d+)(?:\.(\d+))?'
      |device_parsers:
      |  - regex: '\bSmartWatch *\( *([^;]+) *; *([^;]+) *;'
      |    regex_flag: 'i'
      |    device_replacement: '$1 $2'
      |  - regex: '(?:\bApple-)?(iPhone)(?:/(\d+\.\d+))?'
      |    device_replacement: 'iPhone'
      |  - regex: 'Android.*\b([A-Za-z]+-\d+)\b'
      |""".stripMargin

  private val full = UapRules.fromYaml(uapYaml)
  private def uaFull(s: String): Ua = full.parse(s)

  test("uap-core database: $N substitution in family_replacement") {
    // 'Firefox ($1)' → group 1 spliced into the literal template
    val r = uaFull("Mozilla/5.0 (X11; Linux) Gecko Namoroka/3.6.2")
    assert(r.name == "Firefox (Namoroka)")
    assert(r.major == "3" && r.minor == "6" && r.patch == "2")
  }

  test("uap-core database: ordered rules, first match wins") {
    // Chrome Mobile rule precedes plain Chrome; both would match
    val m = uaFull("Mozilla/5.0 (Linux; Android 10) Chrome/99.0.4844.58 Mobile Safari/537.36")
    assert(m.name == "Chrome Mobile" && m.major == "99")
    assert(m.osFamily == "Android" && m.osMajor == "10")
    val d = uaFull("Mozilla/5.0 (Windows NT 10.0) Chrome/99.0.4844.58 Safari/537.36")
    assert(d.name == "Chrome" && d.major == "99" && d.minor == "0" && d.patch == "4844")
  }

  test("uap-core database: default capture groups when no replacement given") {
    // the bare Android os rule has no replacements: family=g1, v1=g2, v2=g3
    val r = uaFull("Mozilla/5.0 (Linux; Android 13.1) Firefox/115.2.1")
    assert(r.name == "Firefox" && r.major == "115" && r.minor == "2" && r.patch == "1")
    assert(r.osFamily == "Android" && r.osMajor == "13" && r.osMinor == "1")
  }

  test("uap-core database: unmatched optional group substitutes empty → null") {
    // Safari rule: v3_replacement '$3' with group 3 absent → patch null
    val r = uaFull("Mozilla/5.0 (Macintosh) Version/16.1 Safari/605.1.15")
    assert(r.name == "Safari" && r.major == "16" && r.minor == "1" && r.patch == null)
  }

  test("uap-core database: regex_flag i and multi-group device template") {
    val r = uaFull("SMARTWATCH (Polar;Vantage;) embedded")
    assert(r.device == "Polar Vantage")
    val p = uaFull("Apple-iPhone7C2/1202.466; U; CPU iPhone OS 10_2 like Mac OS X")
    assert(p.device == "iPhone" && p.osFamily == "iOS" && p.osMajor == "10" && p.osMinor == "2")
  }

  test("uap-core database: JSON form loads identically") {
    val json =
      """{"user_agent_parsers": [
        |   {"regex": "(Chromium|Chrome)/(\\d+)\\.(\\d+)(?:\\.(\\d+))?"}],
        | "os_parsers": [
        |   {"regex": "(Android) (\\d+)\\.(\\d+)"}],
        | "device_parsers": []}""".stripMargin
    val rs = UapRules.fromJson(json)
    val r = rs.parse("Mozilla/5.0 (Linux; Android 12.0) Chrome/90.1.2 Safari")
    assert(r.name == "Chrome" && r.major == "90" && r.osFamily == "Android")
    // (the Spark expression path with a loaded ruleset is covered by
    // PipelineConfigSpec's user_agent-with-database case)
  }

  test("uap-core database: no match in any section → Other/Other/Other") {
    val r = uaFull("telnet-client 1.0")
    assert(r.name == "Other" && r.osFamily == "Other" && r.device == "Other")
    assert(r.major == null && r.osMajor == null)
  }
}
