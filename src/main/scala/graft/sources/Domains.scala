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

  /** Labels deeper than this are never public suffixes in practice (the
    * real PSL tops out at 5); the cap bounds the per-row probe count
    * whatever a malformed suffix table claims.
    */
  private[sources] val MaxSuffixLabels = 8

  /** Normalize a raw Public-Suffix-List-style table (one `suffixCol`
    * string per row — plain entries like `co.uk`/`github.io`, wildcard
    * entries like `*.ck`, exception entries like `!www.ck`; comments
    * and blank lines already stripped) into one row per LOOKUP KEY with
    * kind flags. The key is the entry minus its `*.`/`!` marker, so
    * `ck`-the-exact and `*.ck`-the-wildcard share a row — the match
    * combiner applies each kind's own label arithmetic.
    */
  private[sources] def normalizeSuffixRules(
      suffixes: DataFrame, suffixCol: String): DataFrame = {
    val entry = lower(trim(col(suffixCol)))
    suffixes.select(entry.as("__e"))
      .where(col("__e").isNotNull && col("__e") =!= "")
      .select(
        when(col("__e").startsWith("!"), substring(col("__e"), 2, 1 << 20))
          .when(col("__e").startsWith("*."), substring(col("__e"), 3, 1 << 20))
          .otherwise(col("__e")).as("key"),
        col("__e").startsWith("!").as("exc"),
        col("__e").startsWith("*.").as("wild"))
      .groupBy(col("key"))
      .agg(
        max(col("exc")).as("has_exc"),
        max(col("wild")).as("has_wild"),
        max(!col("exc") && !col("wild")).as("has_exact"))
  }

  /** A normalized, checkpoint-bounded PSL rule table plus its deepest
    * rule depth — prepare ONCE per run with [[prepareSuffixes]] and
    * reuse across every batch/call site. The per-call form of
    * [[withRegisteredDomain]] normalizes (and eagerly `head()`s) the
    * rule table on EVERY invocation, which a loop calling it per drain
    * pays repeatedly while accumulating checkpoint RDDs (r15 ADVICE).
    */
  final case class PslRules private[sources] (rules: DataFrame, maxK: Int)

  /** Normalize a raw PSL-style table into its reusable prepared form:
    * one localCheckpoint + one eager depth probe, total. */
  def prepareSuffixes(suffixes: DataFrame,
      suffixCol: String = "suffix"): PslRules = {
    val rules = normalizeSuffixRules(suffixes, suffixCol).localCheckpoint()
    val deepestRow = rules.agg(max(size(split(col("key"), "\\.")))).head()
    require(!deepestRow.isNullAt(0),
      "empty public-suffix table — use the built-in registeredDomain " +
        "(implicit '*' only) instead of a data-driven lookup with no data")
    PslRules(rules, math.min(math.max(deepestRow.getInt(0), 1), MaxSuffixLabels))
  }

  /** Registered domain (eTLD+1) under a DATA-DRIVEN Public Suffix List
    * — the full-PSL form of [[registeredDomain]] (whose built-in
    * 16-entry set is a documented subset). Implements the PSL
    * algorithm: among the rules matching a suffix of the host, an
    * EXCEPTION rule prevails (its public suffix is the rule minus its
    * leftmost label); otherwise the rule with the MOST labels (a
    * wildcard `*.x` matching one label deeper than its base); no match
    * falls back to the implicit `*` (public suffix = the last label,
    * registered domain = last two). A host that IS a public suffix
    * passes through whole, as do IPv4 literals and ≤1-label hosts.
    *
    * Scale shape: K sequential BROADCAST hash probes (K = deepest rule,
    * ≤ [[MaxSuffixLabels]]; the real PSL has K=5) against the ~10k-row
    * rule table, then one row-local precedence expression — no explode,
    * no shuffle, no per-row regex. Swapping the literal set for this
    * changes no downstream plan shape, exactly as the
    * [[registeredDomain]] scaladoc promised.
    */
  def withRegisteredDomain(df: DataFrame, hostCol: String, outCol: String,
      suffixes: DataFrame, suffixCol: String = "suffix"): DataFrame =
    withRegisteredDomain(df, hostCol, outCol,
      prepareSuffixes(suffixes, suffixCol))

  /** [[withRegisteredDomain]] over a [[prepareSuffixes]]-prepared rule
    * table — the loop-friendly form: no per-call normalization, no
    * per-call checkpoint. */
  def withRegisteredDomain(df: DataFrame, hostCol: String, outCol: String,
      prepared: PslRules): DataFrame = {
    val rules = prepared.rules
    val maxK = prepared.maxK

    val host = lower(col(hostCol))
    val labels = split(host, "\\.")
    val n = size(labels)
    val joined = (1 to maxK).foldLeft(df) { (cur, k) =>
      val r = broadcast(rules.select(
        col("key").as(s"__psl_key_$k"),
        col("has_exc").as(s"__psl_xc_$k"),
        col("has_wild").as(s"__psl_w_$k"),
        col("has_exact").as(s"__psl_ex_$k")))
      // the host's k-label suffix; null (joins nothing) when too short
      val cand = when(n >= k, array_join(slice(labels, -k, k), "."))
      cur.join(r, cand === col(s"__psl_key_$k"), "left")
    }
    // precedence: any exception rule wins (public suffix = rule minus
    // its leftmost label); else most labels, a wildcard counting one
    // deeper than its base; else the implicit '*' (one label)
    val nulls = Seq(lit(null).cast("int"), lit(null).cast("int"))
    val excPs = greatest(
      (1 to maxK).map(k => when(col(s"__psl_xc_$k"), lit(k - 1))) ++ nulls: _*)
    val normPs = greatest(
      (1 to maxK).flatMap(k => Seq(
        when(col(s"__psl_w_$k") && n >= k + 1, lit(k + 1)),
        when(col(s"__psl_ex_$k"), lit(k)))) ++ nulls: _*)
    val ps = coalesce(excPs, normPs, lit(1))
    val rd = when(host.isNull, lit(null).cast("string"))
      .when(host.rlike(Ipv4), host)
      .when(n <= ps, host)
      .otherwise(array_join(slice(labels, -(ps + lit(1)), ps + lit(1)), "."))
    (1 to maxK).foldLeft(joined.withColumn(outCol, rd)) { (cur, k) =>
      cur.drop(s"__psl_key_$k", s"__psl_xc_$k", s"__psl_w_$k", s"__psl_ex_$k")
    }
  }

  /** [[stats]] under a data-driven Public Suffix List: the same single
    * hash aggregation, with the grouping domain derived by
    * [[withRegisteredDomain]]'s broadcast probes instead of the literal
    * rule — the shuffle still carries GROUPS, not rows.
    */
  def stats(df: DataFrame, uriCol: String, textCol: String,
      suffixes: DataFrame): DataFrame =
    withRegisteredDomain(
      df.select(UrlOps.host(col(uriCol)).as("__host"),
        length(col(textCol)).cast("long").as("__chars")),
      "__host", "domain", suffixes)
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("__host")).as("n_hosts"),
        sum(col("__chars")).as("sum_chars"))

  /** [[filterBlocked]] under a data-driven Public Suffix List — the
    * blocklist kill keyed by the PSL-derived registered domain (a
    * blocklisted `github.io` PUBLISHER dies without killing every other
    * `github.io` site, which the literal rule would lump together).
    */
  def filterBlocked(df: DataFrame, uriCol: String, blocked: Seq[String],
      suffixes: DataFrame): DataFrame =
    filterBlocked(df, uriCol, blocked, prepareSuffixes(suffixes))

  /** [[filterBlocked]] over a prepared PSL rule table (the crawl
    * loop's per-drain call path — prepare once per run). */
  def filterBlocked(df: DataFrame, uriCol: String, blocked: Seq[String],
      prepared: PslRules): DataFrame = {
    require(blocked.nonEmpty,
      "empty domain blocklist — a zero-value isin would be ambiguous; " +
        "skip the stage instead")
    val entries = blocked.map(_.trim.toLowerCase(java.util.Locale.ROOT))
      .filter(_.nonEmpty).distinct
    require(entries.nonEmpty,
      "domain blocklist held only blank entries — skip the stage instead")
    val withD = withRegisteredDomain(
      df.withColumn("__psl_host", UrlOps.host(col(uriCol))),
      "__psl_host", "__psl_domain", prepared)
    val kept =
      if (entries.size <= IsinMaxDomains)
        withD.filter(!coalesce(
          col("__psl_domain").isin(entries.map(lit(_)): _*), lit(false)))
      else {
        val spark = df.sparkSession
        import spark.implicits._
        val b = broadcast(entries.toDF("__blocked_domain"))
        withD.join(b, col("__psl_domain") === col("__blocked_domain"),
          "left_anti")
      }
    kept.drop("__psl_host", "__psl_domain")
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
