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
}
