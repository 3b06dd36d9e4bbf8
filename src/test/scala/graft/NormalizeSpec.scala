package graft

import org.apache.spark.sql.functions._
import graft.functions.Normalize

class NormalizeSpec extends SparkSuite {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c).head.get(0)

  test("redactPii scrubs emails and phones, leaves the rest") {
    import graft.functions.TextFns
    val got = one(TextFns.redactPii(
      lit("mail a.b+c@x-y.co or 555-123-4567 x 12-34 keep@ nope")))
    assert(got == "mail <EMAIL> or <PHONE> x 12-34 keep@ nope")
  }

  test("topElementCount finds the modal element count") {
    import graft.functions.TextFns
    assert(one(TextFns.topElementCount(
      array(lit("a"), lit("b"), lit("a"), lit("a")))) == 3)
    assert(one(TextFns.topElementCount(
      array().cast("array<string>"))) == 0)
  }

  test("nfc composes combining sequences; idempotent; SQL-registered") {
    // explicit escapes: editors/tools silently re-normalize raw accents
    val decomposed = "Cafe\u0301 au lait" // e + combining acute
    val composed = "Caf\u00e9 au lait" // precomposed e-acute
    assert(one(Normalize.nfc(lit(decomposed))) == composed)
    assert(one(Normalize.nfc(lit(composed))) == composed)
    assert(one(length(Normalize.nfc(lit(decomposed)))) ==
      decomposed.length - 1)
    // null passes through, and the SQL registration resolves
    assert(one(Normalize.nfc(lit(null).cast("string"))) == null)
    graft.plans.GraftExtensions.register(spark)
    assert(spark.sql("SELECT nfc_normalize('Cafe\u0301')")
      .head.getString(0) == "Caf\u00e9")
  }

  test("cleanText trims, collapses whitespace, uppercases") {
    assert(one(Normalize.cleanText(lit("  hello   world "))) == "HELLO WORLD")
    assert(one(Normalize.cleanText(lit(""))) == "")
  }

  test("usState maps long names, passes codes, falls back to prefix") {
    assert(one(Normalize.usState(lit("California"))) == "CA")
    assert(one(Normalize.usState(lit(" tx "))) == "TX")
    assert(one(Normalize.usState(lit("New York"))) == "NY")
    assert(one(Normalize.usState(lit("Atlantis"))) == "AT")
  }

  test("zip5 strips non-digits, pads, truncates") {
    assert(one(Normalize.zip5(lit("90210-1234"))) == "90210")
    assert(one(Normalize.zip5(lit("421"))) == "00421")
    assert(one(Normalize.zip5(lit("no digits"))) == "")
  }

  test("combineFields skips empty/null parts") {
    assert(one(Normalize.combineFields(lit("123 Main  St"), lit(" apt 4 ")))
      == "123 MAIN ST APT 4")
    assert(one(Normalize.combineFields(lit(""), lit("apt 4"))) == "APT 4")
    assert(one(Normalize.combineFields(lit(null), lit(null))) == "")
  }

  test("stableId64 is deterministic and collision-free on testdata") {
    val cust = Tables.load(spark, sfDir, "customer")
    val ids = cust.select(
      Normalize.stableId64(col("c_name"), col("c_mktsegment")).as("id"))
    val a = ids.collect().map(_.getLong(0))
    val b = ids.collect().map(_.getLong(0))
    assert(a.sameElements(b))
    assert(a.distinct.length == a.length)
  }

  test("parseYyyymmdd coerces invalid to null") {
    assert(one(date_format(Normalize.parseYyyymmdd(lit(20240131)),
      "yyyy-MM-dd")) == "2024-01-31")
    assert(one(Normalize.parseYyyymmdd(lit(99999999))) == null)
  }

  test("normalizeKey strips leading N and uppercases") {
    assert(one(Normalize.normalizeKey(lit(" n221la "))) == "221LA")
    assert(one(Normalize.normalizeKey(lit("221LA"))) == "221LA")
  }

  test("stripMarkup drops tags, decodes entities in order, collapses ws") {
    import graft.functions.TextFns
    assert(one(TextFns.stripMarkup(lit(
      "<html><body><p class=x>a  b</p><br/>c &amp; d</body></html>")))
      == "a b c & d")
    // &amp; decodes LAST: &amp;lt; must yield the literal "&lt;",
    // never double-decode to "<"
    assert(one(TextFns.stripMarkup(lit("x &amp;lt; y"))) == "x &lt; y")
    assert(one(TextFns.stripMarkup(lit(
      "&lt;tag&gt; &quot;q&quot; &apos;a&apos;&nbsp;end")))
      == "<tag> \"q\" 'a' end")
    // markup-free text passes through modulo whitespace normalization
    assert(one(TextFns.stripMarkup(lit("  plain   text "))) == "plain text")
    assert(one(TextFns.stripMarkup(lit(null).cast("string"))) == null)
  }

  test("canonicalUrl lowercases authority only, strips noise") {
    val c = (s: String) => one(Normalize.canonicalUrl(lit(s)))
    // scheme+host lowercase, :443 stripped, utm_*/ref dropped,
    // fragment dropped, real params and PATH CASE preserved
    assert(c("HTTPS://WWW.Ex.COM:443/P/9?utm_source=a&ref=r&q=Keep#frag")
      == "https://www.ex.com/P/9?q=Keep")
    // all params tracking -> dangling '?' tidied away
    assert(c("http://a.com:80/x?utm_id=1&utm_b=2") == "http://a.com/x")
    // non-default port survives; no query/fragment is a no-op
    assert(c("https://A.com:8443/p") == "https://a.com:8443/p")
    assert(c("https://a.com/p?q=1") == "https://a.com/p?q=1")
    // 'ref' only dies as a WHOLE ?/&-delimited param name: href=,
    // pref=, xref= params and path segments like /ref=sr_1 survive
    assert(c("https://a.com/p?href=/x&q=1") == "https://a.com/p?href=/x&q=1")
    assert(c("https://a.com/p?pref=dark&xref=9") ==
      "https://a.com/p?pref=dark&xref=9")
    assert(c("https://a.com/dp/B00X/ref=sr_1_1?q=1") ==
      "https://a.com/dp/B00X/ref=sr_1_1?q=1")
    assert(c("https://a.com/p?ref=spam&href=/x") == "https://a.com/p?href=/x")
    // interleaved tracking params all die, separators stay sane
    assert(c("https://a.com/p?utm_a=1&q=1&ref=r&r2=2&utm_b=3") ==
      "https://a.com/p?q=1&r2=2")
    // default-port strip is scheme-AWARE: http://h:443 and
    // https://h:80 are distinct origins (RFC 6454) and survive
    assert(c("http://a.com:443/x") == "http://a.com:443/x")
    assert(c("https://a.com:80/x") == "https://a.com:80/x")
    assert(c("HTTP://A.com:80/x") == "http://a.com/x")
  }
}
