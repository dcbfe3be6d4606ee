package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain-level curation — the C4/RefinedWeb stage that runs BEFORE any
  * text stage: group crawl documents by REGISTERED domain (eTLD+1, the
  * ownership unit — `cdn.example.com` and `www.example.com` are one
  * publisher) for per-domain quality statistics, and kill documents from
  * blocklisted domains by URL alone, before a byte of their text is
  * shingled, scored, or hashed. Pure builtin Column expressions (regex +
  * array ops, whole-stage codegen): the DuckDB oracle mirrors every step
  * ([[registeredDomainSql]]), the [[UrlOps]] discipline.
  *
  * Registered-domain extraction is the standard last-two-labels rule
  * with a built-in multi-part-suffix set for the common second-level
  * registries (`co.uk`, `com.au`, …) — the full Public Suffix List is a
  * data file a deployment would broadcast and join; the RULE (k labels
  * from the right, k decided by the suffix) is what this operator pins,
  * and swapping the literal set for a broadcast lookup changes no plan
  * shape. IPv4-literal hosts pass through whole (no label semantics).
  *
  * Scale shape: [[stats]] is one hash aggregation keyed by the derived
  * domain (domains are Zipf-heavy — millions of groups at most, trivial
  * vs doc count; partial aggregation absorbs the per-domain skew);
  * [[filterBlocked]] is a narrow scan-side `isin` filter for literal
  * lists and a broadcast anti-join past [[IsinMaxDomains]] — never a
  * shuffle of the corpus.
  */
object Domains {

  /** Second-level registries the 2-vs-3-label heuristic recognizes (a
    * documented SUBSET of the Public Suffix List — see object scaladoc).
    */
  private[sources] val MultiPartSuffixes: Seq[String] = Seq(
    "co.uk", "ac.uk", "gov.uk", "org.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "co.nz", "co.in", "com.br", "com.cn",
    "com.mx", "co.za")

  private val Ipv4 = "^[0-9]{1,3}(\\.[0-9]{1,3}){3}$"

  /** Registered domain (eTLD+1) of a LOWERCASED host (use
    * [[UrlOps.host]] upstream): last two dot-labels, or three when the
    * last two are a listed second-level registry; hosts with ≤ 2 labels
    * and IPv4 literals pass through whole.
    */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    // concat, not concat_ws: null host must yield null domain (concat_ws
    // swallows nulls into ""), matching the oracle's null-propagating ||
    val last2 = concat(
      element_at(labels, -2), lit("."), element_at(labels, -1))
    val last3 = concat(
      element_at(labels, -3), lit("."), last2)
    when(host.rlike(Ipv4), host)
      .when(size(labels) <= 2, host)
      .when(last2.isin(MultiPartSuffixes.map(lit(_)): _*), last3)
      .otherwise(last2)
  }

  /** The DuckDB mirror of [[registeredDomain]] over a host-valued SQL
    * expression — single source of truth for the oracle strings.
    */
  def registeredDomainSql(hostRef: String): String = {
    val ls = s"string_split($hostRef, '.')"
    val last2 = s"($ls[-2] || '.' || $ls[-1])"
    val last3 = s"($ls[-3] || '.' || $ls[-2] || '.' || $ls[-1])"
    val suffixes = MultiPartSuffixes.map(sfx => s"'$sfx'").mkString(", ")
    s"CASE WHEN regexp_matches($hostRef, '$Ipv4') THEN $hostRef " +
      s"WHEN len($ls) <= 2 THEN $hostRef " +
      s"WHEN $last2 IN ($suffixes) THEN $last3 " +
      s"ELSE $last2 END"
  }

  /** Per-registered-domain corpus statistics from a URI column:
    * `(domain, n_docs, n_hosts, sum_chars)` — the aggregate behind
    * domain quality decisions (a domain whose thousands of pages carry
    * near-zero chars each is chrome; one host fanning out under many
    * subdomains is one publisher). One hash aggregation, no joins.
    */
  def stats(df: DataFrame, uriCol: String, textCol: String): DataFrame = {
    val host = UrlOps.host(col(uriCol))
    df.select(registeredDomain(host).as("domain"), host.as("host"),
        length(col(textCol)).cast("long").as("chars"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("host")).as("n_hosts"),
        sum(col("chars")).as("sum_chars"))
  }

  /** Past this many blocked domains, [[filterBlocked]] switches the
    * literal `isin` for a broadcast anti-join (an `isin` of thousands of
    * literals bloats the generated code; the broadcast probe is O(1) per
    * row either way).
    */
  val IsinMaxDomains = 64

  /** Drop every document whose URI's registered domain is blocklisted —
    * the URL-level kill that runs before any text stage. Small lists are
    * a narrow scan-side filter; large ones a broadcast anti-join. Rows
    * whose URI yields no host (null/scheme-less) are KEPT — domain
    * curation only acts where it has evidence; malformed records are the
    * quality gate's job.
    */
  def filterBlocked(df: DataFrame, uriCol: String, blocked: Seq[String]): DataFrame = {
    require(blocked.nonEmpty,
      "empty domain blocklist — a zero-value isin would be ambiguous; " +
        "skip the stage instead")
    // the derived domain is lowercased (UrlOps.host lowers), so entries
    // must be too — a verbatim 'Tracker.NET' from config/CLI would
    // silently match nothing (r14 ADVICE)
    val entries = blocked.map(_.trim.toLowerCase(java.util.Locale.ROOT))
      .filter(_.nonEmpty).distinct
    require(entries.nonEmpty,
      "domain blocklist held only blank entries — skip the stage instead")
    val domain = registeredDomain(UrlOps.host(col(uriCol)))
    if (entries.size <= IsinMaxDomains)
      df.filter(!coalesce(domain.isin(entries.map(lit(_)): _*), lit(false)))
    else {
      val spark = df.sparkSession
      import spark.implicits._
      val b = broadcast(entries.toDF("__blocked_domain"))
      df.join(b, domain === col("__blocked_domain"), "left_anti")
    }
  }
}
