package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL normalization + registered-domain extraction — the crawl
  * curation primitives upstream of per-domain caps (RefinedWeb §3.1
  * caps documents per registered domain; CCNet buckets by domain).
  * Pure Column expressions (codegen'd when-chains and regexes — the
  * F9 broadcast-map discipline), every rule engine-replayable so the
  * whole family sits under the DuckDB hash oracle (t17/pipe31).
  *
  * Normalization contract (the conservative, curation-safe subset of
  * RFC 3986 §6): lowercase scheme and host, drop userinfo, drop the
  * fragment, strip trailing dots from the host, strip the scheme's
  * DEFAULT port (http:80/https:443 — a non-default port is identity),
  * empty path → "/". Path/query are otherwise preserved byte-for-byte
  * (dot-segment and percent-encoding normalization change semantics
  * on hostile servers; a dedup key must not merge distinct resources).
  * Input that is not an absolute scheme://authority URL normalizes to
  * null — crawl URL columns carry garbage, and null routes it out of
  * every downstream group-by. */
object Urls {

  /** Curated public-suffix rules, longest-match-first (multi-label
    * rules before their parent TLDs — the ORDER is the algorithm; the
    * first matching rule wins). A PARAMETER TABLE, not an algorithm:
    * deployments swap in the full publicsuffix.org list; the engine
    * logic (match longest suffix, registered domain = suffix + one
    * label) is list-independent. Includes two private-registry rules
    * (github.io, blogspot.com) — the PSL's private section matters
    * for crawl caps: one noisy user must not cap all of github.io. */
  val PublicSuffixes: Seq[String] = Seq(
    // multi-label (country-code second-level + private registries)
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.cn", "net.cn", "org.cn",
    "com.br", "com.mx", "co.in", "co.kr", "com.tr",
    "github.io", "blogspot.com",
    // single-label
    "uk", "de", "fr", "es", "it", "nl", "cn", "jp", "au", "br", "in",
    "io", "ai", "dev", "app",
    "com", "org", "net", "edu", "gov", "mil", "int", "info", "biz")

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val AuthRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val RestRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"

  private def hostPort(url: Column): Column =
    regexp_replace(regexp_extract(url, AuthRe, 1), "^[^@]*@", "")

  // Bracketed IPv6 literals ([::1], [2001:db8::1]:8080) carry colons
  // INSIDE the host, so the bare trailing-port regex would amputate
  // the address's last group; the bracket branch reads the host as
  // the [...] span and the port only after the closing bracket. RE2
  // has no lookbehind, so this is a branch, not a cleverer regex —
  // and it must stay a branch in the SQL spellings below too.
  private def portOf(hp: Column): Column =
    when(hp.startsWith("["), regexp_extract(hp, "\\]:([0-9]+)$", 1))
      .otherwise(regexp_extract(hp, ":([0-9]+)$", 1))
  private def hostOf(hp: Column): Column =
    when(hp.startsWith("["),
      lower(regexp_extract(hp, "^(\\[[^\\]]*\\])", 1)))
      .otherwise(lower(regexp_replace(
        regexp_replace(hp, ":[0-9]+$", ""), "\\.+$", "")))

  /** Lowercased host: userinfo and port dropped, trailing dots
    * stripped; bracketed IPv6 literals keep their brackets (the URL
    * serialization form). Empty string when `url` is not absolute. */
  def urlHost(url: Column): Column = hostOf(hostPort(url))

  /** Normalized URL per the contract above; null for non-absolute
    * input. */
  def urlNormalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, SchemeRe, 1))
    val hp = hostPort(url)
    val port = portOf(hp)
    val host = urlHost(url)
    val rest = regexp_extract(url, RestRe, 1)
    val portPart = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), "")
      .otherwise(concat(lit(":"), port))
    when(scheme === "" || host === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, portPart,
        when(rest === "", "/").otherwise(rest)))
  }

  /** Registered (pay-level) domain of a lowercased host: the longest
    * matching rule in [[PublicSuffixes]] plus one label; a host that
    * IS a public suffix has no registered domain (null); a host
    * matching no rule falls back to its last two labels (the PSL "*"
    * default — unknown TLDs are their own suffix).
    *
    * Shape note: expressed as FOUR set-membership branches over the
    * host's label tails rather than a per-rule when-chain — a chain
    * over the rule table builds an expression tree proportional to
    * the table (the full publicsuffix.org list is ~9 K rules) and
    * already fell out of codegen at 40 rules (pipe31's heavy window
    * read 1.7 spread on the interpreted tree); `isin` compiles to one
    * hash-set probe regardless of table size. Relies on every
    * multi-label rule having exactly 2 labels — enforced, and true of
    * the curated table; a 3-label registry rule adds one more
    * tail+branch, same shape. */
  def registeredDomain(host: Column): Column = {
    val (multi, single) = PublicSuffixes.partition(_.contains("."))
    require(multi.forall(_.count(_ == '.') == 1),
      "multi-label public-suffix rules must be exactly 2 labels")
    val last2 = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    val last3 = regexp_extract(host, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    def nn(c: Column) =
      when(c === "", lit(null).cast("string")).otherwise(c)
    when(host.isin(multi: _*), lit(null).cast("string"))
      .when(last2.isin(multi: _*), nn(last3))
      .when(host.isin(single: _*), lit(null).cast("string"))
      .otherwise(nn(last2))
  }

  /** [[registeredDomain]] of a raw URL. */
  def urlRegisteredDomain(url: Column): Column = {
    val h = urlHost(url)
    when(h === "", lit(null).cast("string")).otherwise(registeredDomain(h))
  }

  // ---- DuckDB spellings (oracle builders) — generated from the SAME
  // constants so the two sides cannot drift. `u` is a SQL expression
  // yielding the url (or host) string. ----

  private def hpSql(u: String): String =
    s"regexp_replace(regexp_extract($u, '$AuthRe', 1), '^[^@]*@', '')"

  private def portSql(hp: String): String =
    s"""CASE WHEN starts_with($hp, '[')
       |  THEN regexp_extract($hp, '\\]:([0-9]+)${"$"}', 1)
       |  ELSE regexp_extract($hp, ':([0-9]+)${"$"}', 1) END""".stripMargin

  def hostSql(u: String): String = {
    val hp = hpSql(u)
    s"""CASE WHEN starts_with($hp, '[')
       |  THEN lower(regexp_extract($hp, '^(\\[[^\\]]*\\])', 1))
       |  ELSE lower(regexp_replace(regexp_replace($hp,
       |    ':[0-9]+${"$"}', ''), '\\.+${"$"}', '')) END""".stripMargin
  }

  def normalizeSql(u: String): String = {
    val hp = hpSql(u)
    val port = portSql(hp)
    s"""CASE WHEN lower(regexp_extract($u, '$SchemeRe', 1)) = ''
       |  OR ${hostSql(u)} = '' THEN NULL
       |ELSE lower(regexp_extract($u, '$SchemeRe', 1)) || '://' ||
       |  ${hostSql(u)} ||
       |  CASE WHEN ($port) = ''
       |    OR (lower(regexp_extract($u, '$SchemeRe', 1)) = 'http'
       |        AND ($port) = '80')
       |    OR (lower(regexp_extract($u, '$SchemeRe', 1)) = 'https'
       |        AND ($port) = '443')
       |    THEN '' ELSE ':' || ($port) END ||
       |  CASE WHEN regexp_extract($u, '$RestRe', 1) = '' THEN '/'
       |    ELSE regexp_extract($u, '$RestRe', 1) END
       |END""".stripMargin
  }

  /** CASE chain over [[PublicSuffixes]]; `h` must already be the
    * lowercased host expression. */
  def registeredDomainSql(h: String): String = {
    val rules = PublicSuffixes.map { r =>
      val esc = r.replace(".", "\\.")
      s"""WHEN $h = '$r' THEN NULL
         |WHEN ends_with($h, '.$r')
         |  THEN regexp_extract($h, '([^.]+\\.$esc)${"$"}', 1)""".stripMargin
    }.mkString("\n")
    s"""CASE
       |$rules
       |ELSE nullif(regexp_extract($h, '([^.]+\\.[^.]+)${"$"}', 1), '')
       |END""".stripMargin
  }
}
