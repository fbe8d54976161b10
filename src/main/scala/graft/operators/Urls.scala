package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** URL hygiene for crawl corpora: host extraction and domain-blocklist
  * filtering with PARENT-DOMAIN semantics (an entry `example.net` blocks
  * `a.b.example.net` too) — the C4/CCNet "bad domains" gate, and the
  * standard robots/spam/NSFW list application step (the reference has no
  * crawl surface — beyond-reference training-pipeline operator).
  *
  * Matching a host against a million-entry blocklist must NOT be a
  * per-row scan of the list: the host is exploded into its ≤ ~10 domain
  * suffixes (`a.b.example.net` → itself, `b.example.net`, `example.net`,
  * `net`) and matched by an equi-JOIN against the blocklist — the plan
  * Catalyst can broadcast (small list) or shuffle-partition (huge list),
  * both corpus-scale-safe. The flag is computed on DISTINCT hosts (many
  * orders of magnitude smaller than the corpus — Zipf over domains) and
  * joined back on host.
  */
object Urls {

  /** Lowercased host of a URL: text between `://` and the first
    * `/ : ? #`, with any userinfo (`user@`) stripped. NULL when the value
    * doesn't parse as an absolute URL. Pure codegen'd projection,
    * RE2-replayable.
    */
  def host(url: Column): Column = {
    // capture the whole authority first (userinfo may contain ':', so a
    // bare [^/:?#]+ would stop inside user:pw), then strip userinfo after
    // the last '@' and the port after the remaining ':'. Bracketed IPv6
    // literals are out of scope (declared).
    val auth   = lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))
    val noUser = element_at(split(auth, "@"), -1)
    val noPort = element_at(split(noUser, ":"), 1)
    when(length(noPort) > 0, noPort)
  }

  /** All dot-suffixes of a host, longest first: the join keys for
    * parent-domain matching.
    */
  def domainSuffixes(hostCol: Column): Column = {
    val parts = split(hostCol, "\\.")
    transform(sequence(lit(1), size(parts)), i =>
      array_join(slice(parts, i, size(parts)), "."))
  }

  /** Annotate `df` with `host` and `blocked` (true iff the host or any
    * parent domain appears in `blocklist(domainCol)`). Unparseable URLs
    * get host NULL, blocked false — gating on them is the caller's
    * policy decision.
    */
  def withDomainBlocked(
      df: DataFrame,
      urlCol: String,
      blocklist: DataFrame,
      domainCol: String,
  ): DataFrame = {
    val names = df.columns.toSet
    Seq("host", "blocked", "__sfx").foreach(c =>
      require(!names.contains(c), s"input already has a '$c' column"))
    val withHost = df.withColumn("host", host(col(urlCol)))
    val blockedHosts = withHost
      .select("host").where(col("host").isNotNull).distinct()
      .withColumn("__sfx", explode(domainSuffixes(col("host"))))
      .join(blocklist.select(lower(col(domainCol)).as("__sfx")), "__sfx")
      .select("host").distinct()
      .withColumn("blocked", lit(true))
    withHost
      .join(blockedHosts, Seq("host"), "left")
      .withColumn("blocked", coalesce(col("blocked"), lit(false)))
  }

  /** Canonical URL for crawl dedup — the normalization every URL-level
    * dedup pass applies before keying (two crawls of one page must
    * collapse even when trackers/fragments/param order differ):
    *  - scheme and host lowercased, userinfo dropped;
    *  - default ports stripped (`:80` http, `:443` https), others kept;
    *  - fragment dropped;
    *  - tracking params dropped (`utm_*`, `gclid`, `fbclid`, `ref`);
    *  - surviving query params sorted by full `k=v` text (stable across
    *    engines — no locale, byte order);
    *  - trailing path slash dropped (`/a/` ≡ `/a`, `/` ≡ empty).
    * NULL for non-absolute URLs. Pure per-row projection (split /
    * filter / array_sort / array_join HOFs) — no shuffle; the dedup that
    * follows keys on the result.
    */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val port   = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*?:(\\d+)(?:[/?#]|$)", 1)
    val path   = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    val query  = regexp_extract(url, "^[^#]*?\\?([^#]*)", 1)
    val keepPort = when(
      port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val params = filter(split(query, "&"), p =>
      !(p.startsWith("utm_") || p === "" ||
        p.startsWith("gclid=") || p.startsWith("fbclid=") || p.startsWith("ref=") ||
        p === "gclid" || p === "fbclid" || p === "ref"))
    val q = array_join(array_sort(params), "&")
    val cleanPath = regexp_replace(path, "/+$", "")
    when(host(url).isNotNull,
      concat(scheme, lit("://"), host(url), keepPort, cleanPath,
        when(q === "", lit("")).otherwise(concat(lit("?"), q))))
  }

  /** The filter form: rows whose host survives the blocklist. */
  def filterBlockedDomains(
      df: DataFrame, urlCol: String, blocklist: DataFrame, domainCol: String,
  ): DataFrame =
    withDomainBlocked(df, urlCol, blocklist, domainCol)
      .where(!col("blocked")).drop("host", "blocked")

  /** One parsed robots.txt rule: `agent` is the lowercased User-agent token
    * the rule's group was declared for, `allow` the directive kind,
    * `prefix` the path prefix (non-empty — empty-value directives match
    * nothing per the REP and are dropped at parse time).
    */
  final case class RobotsRule(agent: String, allow: Boolean, prefix: String)

  /** Parse one robots.txt body into its rules — RFC 9309 grouping: a run
    * of consecutive `User-agent:` lines declares a group's agents; every
    * following `Allow:`/`Disallow:` line belongs to ALL of them; a
    * `User-agent:` after at least one rule starts a NEW group. Comments
    * (`#` to end of line) and unknown directives (Crawl-delay, Sitemap, …)
    * are ignored; blank lines do NOT end a group (RFC 9309 §2.2, the
    * Googlebot behavior). Plain prefix match only — the `*`/`$` wildcard
    * extension is out of scope (declared).
    *
    * Driver/executor-pure Scala: runs once per robots FILE (one per host —
    * orders of magnitude fewer rows than the URL corpus it gates).
    */
  def parseRobots(txt: String): Seq[RobotsRule] = {
    val out    = scala.collection.mutable.ArrayBuffer.empty[RobotsRule]
    var agents = List.empty[String]
    var inRun  = false // currently collecting consecutive User-agent lines
    for (raw <- txt.linesIterator) {
      val line = raw.takeWhile(_ != '#').trim
      val i    = line.indexOf(':')
      if (i > 0) {
        val key   = line.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(i + 1).trim
        key match {
          case "user-agent" if value.nonEmpty =>
            agents = if (inRun) value.toLowerCase(java.util.Locale.ROOT) :: agents else List(value.toLowerCase(java.util.Locale.ROOT))
            inRun = true
          case "allow" | "disallow" =>
            inRun = false
            if (value.nonEmpty) agents.foreach(a => out += RobotsRule(a, key == "allow", value))
          // RFC 9309 §2.2.2: records other than user-agent/allow/disallow
          // MUST NOT interfere with group structure — a Sitemap/Crawl-delay
          // BETWEEN two User-agent lines leaves them in one group, so the
          // run state is untouched (only rules end a run).
          case _ => ()
        }
      }
    }
    out.toSeq
  }

  /** Explode a (host, robots body) table into (host, agent, allow, prefix)
    * rule rows via [[parseRobots]].
    */
  def robotsRules(robots: DataFrame, hostCol: String, txtCol: String): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots.select(col(hostCol).cast("string"), col(txtCol).cast("string"))
      .as[(String, String)]
      .flatMap { case (h, t) =>
        parseRobots(Option(t).getOrElse("")).map(r => (h, r.agent, r.allow, r.prefix)) }
      .toDF("host", "agent", "allow", "prefix")
  }

  /** Annotate a URL corpus with `host` and `allowed` under robots.txt
    * semantics for `userAgent` (RFC 9309 / the Googlebot matcher):
    *  - group selection per host: if any rule group names `userAgent`
    *    (case-insensitive), ONLY those rules apply — the `*` group is not
    *    merged in; else the `*` group; else everything is allowed;
    *  - rule matching: plain path-prefix; empty URL path matches as "/";
    *  - precedence: longest matching prefix wins, Allow wins length ties;
    *  - no matching rule → allowed.
    *
    * Scale shape: group selection runs entirely on the RULES side (one
    * tiny self-aggregation — rules are per-host, Zipf-small next to the
    * corpus), then ONE equi-join on host fans each URL out to its host's
    * ≤ dozens of candidate rules, a `startswith` filter keeps matches, and
    * a map-side-combined `max(struct(len, allow))` per row id picks the
    * verdict — no window over the corpus, no driver loop; Catalyst
    * broadcasts the rules side when small.
    */
  def withRobotsAllowed(
      df: DataFrame,
      urlCol: String,
      rules: DataFrame, // host, agent, allow, prefix — [[robotsRules]] output
      userAgent: String,
      idCols: Seq[String],
  ): DataFrame = {
    val names = df.columns.toSet
    Seq("host", "allowed").foreach(c => require(!names.contains(c), s"input already has a '$c' column"))
    val ua = userAgent.toLowerCase(java.util.Locale.ROOT)
    // per-host: does a group for this agent exist? decided on the rules
    // side alone, then used to keep exactly one group's rules per host
    val hostHasUa = rules.groupBy("host")
      .agg(max(col("agent") === ua).as("__has_ua"))
    val effective = rules.join(hostHasUa, "host")
      .where(when(col("__has_ua"), col("agent") === ua).otherwise(col("agent") === "*"))
      .select(col("host"), col("allow").as("__r_allow"), col("prefix").as("__r_prefix"))
    val withHost = df.withColumn("host", host(col(urlCol)))
    val path0 = regexp_extract(col(urlCol), "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    val withPath = withHost.withColumn("__path", when(path0 === "", lit("/")).otherwise(path0))
    val verdict = withPath
      .select((idCols :+ "host" :+ "__path").map(col): _*)
      .join(effective, Seq("host"))
      .where(col("__path").startsWith(col("__r_prefix")))
      .groupBy(idCols.map(col): _*)
      // lexicographic (prefix length, allow): longest match wins, Allow
      // wins ties — one struct-max agg, no window
      .agg(max(struct(length(col("__r_prefix")).as("l"), col("__r_allow").as("a")))
        .getField("a").as("__verdict"))
    // Unparseable URLs (host NULL) get allowed = NULL, not true: the
    // robots gate can't vouch for a URL it can't attribute to a host, and
    // a silent fail-open would let malformed URLs bypass compliance.
    // Callers choose their own policy on NULL (cf. withDomainBlocked,
    // which DOCUMENTS its fail-open instead).
    withPath
      .join(verdict, idCols, "left")
      .withColumn("allowed",
        when(col("host").isNull, lit(null).cast("boolean"))
          .otherwise(coalesce(col("__verdict"), lit(true))))
      .drop("__path", "__verdict")
  }

  /** One sitemap entry: `kind` is "url" (from a `<urlset>`) or "sitemap"
    * (from a `<sitemapindex>` — the nested-index case crawlers must
    * recurse into); `lastmod` verbatim when present (W3C datetime — left
    * unparsed so date-only and timezone forms survive losslessly).
    */
  final case class SitemapEntry(kind: String, loc: String, lastmod: Option[String])

  private val SitemapBlockRe = "(?s)<(url|sitemap)\\b[^>]*>(.*?)</\\1>".r
  private val LocRe          = "(?s)<loc\\b[^>]*>\\s*(.*?)\\s*</loc>".r
  private val LastmodRe      = "(?s)<lastmod\\b[^>]*>\\s*(.*?)\\s*</lastmod>".r

  /** Parse one sitemap.xml body (sitemaps.org protocol): `<urlset>` url
    * entries and `<sitemapindex>` sitemap entries, in document order;
    * entries without a `<loc>` are dropped (the protocol makes loc
    * required); XML entities in loc/lastmod are decoded (`&amp;` URLs).
    * Regex pulls assume well-formed XML without CDATA — the same declared
    * simplification as the OOXML extractors. Driver/executor-pure Scala:
    * runs once per sitemap FILE (one per host-ish — tiny next to the URL
    * corpus it seeds).
    */
  def parseSitemap(xml: String): Seq[SitemapEntry] =
    SitemapBlockRe.findAllMatchIn(Option(xml).getOrElse("")).flatMap { m =>
      val kind = m.group(1)
      val body = m.group(2)
      LocRe.findFirstMatchIn(body).map { lm =>
        SitemapEntry(kind, xmlUnescape(lm.group(1)),
          LastmodRe.findFirstMatchIn(body).map(x => xmlUnescape(x.group(1))).filter(_.nonEmpty))
      }
    }.toSeq

  private def xmlUnescape(s: String): String =
    if (s.indexOf('&') < 0) s
    else s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&apos;", "'").replace("&amp;", "&")

  /** Explode a (host, sitemap body) table into (host, kind, loc, lastmod)
    * entry rows via [[parseSitemap]] — the frontier-seeding join input
    * ([[robotsRules]]'s companion: robots gates the crawl, sitemaps seed
    * it).
    */
  def sitemapEntries(sitemaps: DataFrame, hostCol: String, xmlCol: String): DataFrame = {
    val spark = sitemaps.sparkSession
    import spark.implicits._
    sitemaps.select(col(hostCol).cast("string"), col(xmlCol).cast("string"))
      .as[(String, String)]
      .flatMap { case (h, x) => parseSitemap(x).map(e => (h, e.kind, e.loc, e.lastmod.orNull)) }
      .toDF("host", "kind", "loc", "lastmod")
  }
}
