package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The web front door of a training-data pipeline: deterministic HTML→text
  * extraction with a line-grain boilerplate law, and URL canonicalization +
  * registrable-domain derivation for domain-level curation.
  *
  * Everything here is an EXACT string/integer law over codegen'd column
  * expressions (regexp_replace / regexp_extract_all / HOFs — no UDF, no
  * shuffle), so a SQL oracle replays each step verbatim and the operators
  * are map-only at any corpus size: the extraction cost is per-row, the
  * plan is a projection, and the first shuffle belongs to whatever the
  * caller composes downstream (dedup, caps, sampling).
  *
  * The reference engine ingests pre-cleaned records (its text fields come
  * out of XDR, not markup — e.g. the memo/asset-name NUL strip at
  * `/root/reference/internal/transform/transaction.go`), so this file is
  * extension surface: the operators every web-scale corpus needs BEFORE
  * the reference-shaped analytics apply. */
object Web {

  // ---- HTML → text ---------------------------------------------------------

  /** Block-level boundaries that become line breaks: closing block tags and
    * `<br>`. One regex, case-insensitive, attribute-tolerant. */
  private[graft] val BlockBreakRe =
    "(?i)<(br|/(p|div|li|h[1-6]|tr|td|th|title|blockquote|ul|ol|table|article|section|header|footer|nav))(\\s[^>]*)?/?>"

  /** Entity unescape — one FIXED law: the five named entities plus the
    * numeric apostrophe, applied in this exact order with `&amp;` LAST (the
    * standard single-pass rule: "&amp;lt;" decodes to the literal "&lt;",
    * never double-decodes). Plain string replaces, no regex. */
  private[graft] val EntitySteps: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  def unescapeEntities(c: Column): Column =
    EntitySteps.foldLeft(c) { case (acc, (from, to)) =>
      replace(acc, lit(from), lit(to))
    }

  private def norm(c: Column): Column = trim(regexp_replace(c, "\\s+", " "))

  /** Deterministic HTML→text extraction with line-grain boilerplate
    * removal — the Kohlschütter-style density rule with every boundary
    * integer-exact so any engine replays the kept set bit-identically:
    *
    *  1. drop `<script>`/`<style>` BLOCKS and `<!-- -->` comments
    *     (non-greedy, case-insensitive, attribute-tolerant);
    *  2. ERROR CHANNEL: any surviving `<script`/`<style`/`<!--` opener is
    *     an unterminated block — truncated/malformed markup whose tail
    *     would otherwise leak script source into the "text" — and any
    *     surviving `</script`/`</style` CLOSER is the mirror case: the
    *     non-greedy strip terminated at a closer embedded in a JS string
    *     literal (`var s = "</script>"`), so the script tail between the
    *     false closer and the real one survived the strip. Both route the
    *     whole document to `extract_ok = false` instead of leaking;
    *  3. closing block tags and `<br>` become line breaks ([[BlockBreakRe]]);
    *  4. per line: strip remaining tags, unescape entities
    *     ([[EntitySteps]]), collapse whitespace; `n_text` = kept chars,
    *     `n_link` = chars inside `<a …>…</a>` anchors (same strip law);
    *  5. keep a line iff `n_text ≥ minTextLen` AND
    *     `n_link · linkDen < n_text · linkNum` (link density below
    *     num/den — navigation/footer lines are short and link-dense);
    *  6. `text` = kept lines joined with '\n'.
    *
    * Scale shape: map-only (one projection, codegen'd regex + HOF line
    * loop) — filters/limits compose before it so the regex work prunes
    * with the scan; nothing shuffles. Cold cost is regex-bound (~0.4 s
    * per 5 000 docs single-pass at sf0.01 scale; see BENCH_scale.md).
    *
    * Returns (id, extract_ok, error, text, n_lines, n_lines_kept,
    * n_chars); error rows carry null text/counts. */
  def htmlExtract(df: DataFrame, idCol: String, htmlCol: String,
      minTextLen: Int = 10, linkNum: Int = 2, linkDen: Int = 5): DataFrame = {
    require(minTextLen >= 1 && linkNum >= 1 && linkDen >= 1,
      "htmlExtract thresholds must be positive")
    val html = col(htmlCol)
    val noScript =
      regexp_replace(html, "(?is)<script(\\s[^>]*)?>.*?</script>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style(\\s[^>]*)?>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val malformed = lower(noComment)
      .rlike("<script[\\s>]|<style[\\s>]|<!--|</script|</style")
    val lines = split(regexp_replace(noComment, BlockBreakRe, "\n"), "\n")
    val lineInfo = transform(lines, l => {
      val txt = norm(unescapeEntities(regexp_replace(l, "<[^>]*>", " ")))
      // group 2 of the anchor regex is the anchor BODY (group 1 is the
      // attribute blob); bodies may nest inline tags, so the same strip +
      // unescape + collapse law applies before counting link chars
      val linkRaw = array_join(regexp_extract_all(l,
        lit("(?is)<a(\\s[^>]*)?>(.*?)</a>"), lit(2)), " ")
      val linkTxt = norm(unescapeEntities(regexp_replace(linkRaw, "<[^>]*>", " ")))
      struct(txt.as("t"), length(txt).as("nt"), length(linkTxt).as("nl"))
    })
    val kept = filter(lineInfo, s =>
      s("nt") >= minTextLen && s("nl") * linkDen < s("nt") * linkNum)
    val text = array_join(transform(kept, s => s("t")), "\n")
    val nLines = size(filter(lineInfo, s => s("nt") > 0))
    df.select(
      col(idCol),
      (!malformed).as("extract_ok"),
      when(malformed, lit("unterminated or desynchronized script/style/comment block"))
        .otherwise(lit(null).cast("string")).as("error"),
      when(malformed, lit(null).cast("string")).otherwise(text).as("text"),
      when(malformed, lit(null).cast("long"))
        .otherwise(nLines.cast("long")).as("n_lines"),
      when(malformed, lit(null).cast("long"))
        .otherwise(size(kept).cast("long")).as("n_lines_kept"),
      when(malformed, lit(null).cast("long"))
        .otherwise(length(text).cast("long")).as("n_chars"))
  }

  // ---- WARC record parsing --------------------------------------------------

  /** Split WARC/1.0 crawl files into records — the front door UPSTREAM of
    * [[htmlExtract]]: real corpora arrive as crawl containers, not HTML
    * strings. The record walk (`WARC/1.0\r\n` + headers + blank line +
    * Content-Length payload + `\r\n\r\n`, exact laws and error arms in
    * [[graft.codec.WarcCodec]]) runs as ONE fused native expression per
    * file; on top of it two map-only column laws:
    *
    *   - `http_status`: for payloads starting `HTTP/` with a header
    *     terminator, the 3-digit status of the first line;
    *   - `body`: the same payloads with the HTTP header block stripped
    *     (everything after the first `\r\n\r\n`); other payloads pass
    *     through verbatim.
    *
    * Scale shape: map-only (one generator projection per file — a crawl
    * shard explodes to its records with no shuffle; whatever the caller
    * composes downstream owns the first exchange). Returns one row per
    * record: (id, rec_idx, warc_type, target_uri, content_length,
    * payload, body, http_status, rec_ok, error); parse stops at the
    * first malformed record, which rides the error channel as its own
    * row. */
  def warcExtract(df: DataFrame, idCol: String, warcCol: String,
      maxRecords: Int = 64): DataFrame = {
    val recs = df
      .select(col(idCol), explode(graft.functions.GraftFunctions
        .warcRecords(col(warcCol), maxRecords)).as("rec"))
      .select(col(idCol), col("rec.*"))
    val p = col("payload")
    val sep = "\r\n\r\n"
    val isHttp = p.isNotNull && p.startsWith("HTTP/") && locate(sep, p) > 0
    recs
      .withColumn("http_status",
        when(isHttp, regexp_extract(p, "^HTTP/[0-9.]+ ([0-9]{3})", 1)
          .cast("long")).otherwise(lit(null).cast("long")))
      .withColumn("body",
        when(isHttp, p.substr(locate(sep, p) + 4, length(p))).otherwise(p))
  }

  // ---- URL canonicalization + registrable domain ---------------------------

  /** Tracking parameters stripped by [[urlCanonicalize]] — the fixed public
    * list (exact, lowercase key match). */
  val TrackingParams: Seq[String] = Seq(
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "msclkid", "ref")

  /** Bounded public-suffix-style table for [[registrableDomain]] — enough
    * of the PSL shape (multi-label country suffixes beat their single-label
    * prefixes) to exercise the longest-match law. At 100 TB with the full
    * ~9k-entry PSL this becomes a broadcast join on the host's last-2/-3
    * label tails instead of a generated match chain; the LAW (longest
    * matching suffix + one label) is identical. */
  val PublicSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "com.br", "co.in", "co.kr", "com.mx",
    "com", "org", "net", "io", "dev", "app", "edu", "gov", "mil", "info",
    "biz", "uk", "de", "fr", "jp", "au", "br", "in", "kr", "mx", "us",
    "ca", "it", "nl", "es", "se", "ch")

  /** Suffixes in match order: more labels first (so `co.uk` beats `uk`),
    * then longer first — the PSL longest-match rule. */
  private[graft] def suffixesOrdered: Seq[String] =
    PublicSuffixes.sortBy(s => (-s.count(_ == '.'), -s.length, s))

  /** Registrable domain (eTLD+1): the LONGEST suffix in the table that the
    * host equals or ends with (as a label boundary) plus one more label;
    * hosts matching no suffix — intranet names, IPs — return themselves
    * (already maximal curation grain). A host that IS a bare suffix
    * (`"com"`) also returns itself. */
  def registrableDomain(host: Column): Column =
    suffixesOrdered.foldRight(host) { (s, els) =>
      val esc = java.util.regex.Pattern.quote(s)
      when(host.endsWith("." + s),
        regexp_extract(host, "([^.]+\\." + esc + ")$", 1))
        .otherwise(els)
    }

  /** URL canonicalization — one exact string law, all regex/HOF (RE2-safe,
    * so any engine replays it):
    *
    *  1. drop the fragment (first '#' to end);
    *  2. a URL without `scheme://` is INVALID (url_valid = false, null
    *     canonical — route to the error channel, don't guess);
    *  3. lowercase the scheme and host; strip userinfo (`user@`);
    *  4. strip the DEFAULT port (`:80` for http, `:443` for https; other
    *     ports survive);
    *  5. empty path becomes "/" (the path is otherwise kept verbatim — no
    *     dot-segment resolution, documented);
    *  6. drop query parameters whose lowercase key is in
    *     [[TrackingParams]]; survivors keep their original order; an
    *     emptied query drops its '?'.
    *
    * Adds url_valid, canonical_url, host, registrable_domain. Map-only. */
  def urlCanonicalize(df: DataFrame, urlCol: String): DataFrame = {
    val noFrag = regexp_replace(col(urlCol), "#.*$", "")
    val valid = noFrag.rlike("^[A-Za-z][A-Za-z0-9+.-]*://")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val after = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val auth = regexp_extract(after, "^([^/?]*)", 1)
    val tail = substring(after, length(auth) + 1, lit(1 << 24))
    val hostPort = lower(regexp_replace(auth, "^[^@]*@", ""))
    val host = regexp_replace(hostPort, ":[0-9]*$", "")
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val portSfx = when(
      port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val rawPath = regexp_extract(tail, "^([^?]*)", 1)
    val path = when(rawPath === "", lit("/")).otherwise(rawPath)
    val query = when(tail.contains("?"),
      regexp_extract(tail, "\\?(.*)$", 1)).otherwise(lit(""))
    val keptParams = filter(split(query, "&"), p =>
      p =!= "" &&
        !lower(regexp_extract(p, "^([^=]*)", 1))
          .isin(TrackingParams.map(lit(_)): _*))
    val canon = concat(scheme, lit("://"), host, portSfx, path,
      when(size(keptParams) > 0,
        concat(lit("?"), array_join(keptParams, "&"))).otherwise(lit("")))
    df.withColumn("url_valid", valid)
      .withColumn("canonical_url",
        when(valid, canon).otherwise(lit(null).cast("string")))
      .withColumn("host", when(valid, host).otherwise(lit(null).cast("string")))
      .withColumn("registrable_domain",
        when(valid, registrableDomain(host)).otherwise(lit(null).cast("string")))
  }

  /** Domain-level curation — the standard web-corpus chain composed from
    * laws this file and [[Sampling]] already define:
    *
    *   canonicalize → drop invalid URLs (error channel) → EXACT-dedup on
    *   the canonical URL (lowest id wins — mirrors/trackers collapse) →
    *   anti-join the registrable domain against a blocklist (a bounded
    *   list: ONE broadcast, never a corpus-side shuffle) → cap documents
    *   per domain ([[Sampling.capPerKey]] — WindowGroupLimit, so a
    *   mega-domain moves ≈ cap·partitions rows, not its volume).
    *
    * Scale shape: one shuffle for the URL dedup, one for the domain cap;
    * the blocklist rides a broadcast. Returns the kept rows with
    * (canonical_url, registrable_domain) provenance. */
  def urlCuration(df: DataFrame, idCol: String, urlCol: String,
      blockedDomains: Seq[String], perDomainCap: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val canon = urlCanonicalize(df, urlCol).where(col("url_valid"))
    val dedup = canon
      .groupBy(col("canonical_url"))
      .agg(min_by(
        struct(canon.columns.map(col): _*), col(idCol)).as("__keep"))
      .select(col("__keep.*"))
    val block = blockedDomains.toDF("registrable_domain")
    val unblocked = dedup.join(broadcast(block),
      Seq("registrable_domain"), "left_anti")
    Sampling.capPerKey(unblocked, idCol, "registrable_domain", perDomainCap)
  }

  /** robots.txt gate (RFC 9309 / the public Google robots.txt spec) — the
    * crawl-politeness step between the WARC front door and URL curation.
    * One fused native pass per row ([[graft.codec.Robots]] holds the
    * parse/group/match laws: contiguous user-agent heads, same-agent
    * group merge, `*` fallback, `*`/trailing-`$` rule patterns,
    * longest-rule-wins with allow on ties) renders the verdict as
    * `A|<rule>` / `D|<rule>` / `A|`, unpacked here into `robots_allowed`
    * + `matched_rule` provenance. Map-only column algebra — the policy
    * text rides the row (a crawl archive carries it per capture), so no
    * join, no shuffle, no UDF fence. */
  def robotsFilter(df: DataFrame, robotsCol: String, pathCol: String,
      agent: String): DataFrame =
    df.withColumn("robots_verdict",
        graft.functions.GraftFunctions.robotsDecision(
          col(robotsCol), lit(agent), col(pathCol)))
      .withColumn("robots_allowed",
        substring(col("robots_verdict"), 1, 1) === "A")
      .withColumn("matched_rule",
        when(length(col("robots_verdict")) > 2,
          expr("substring(robots_verdict, 3)"))
          .otherwise(lit(null).cast("string")))

  /** FULL Public Suffix List semantics (publicsuffix.org/list/ — the
    * public algorithm), as the broadcast-join scale path the
    * [[registrableDomain]] Scaladoc promises for the ~9k-entry list a
    * generated match chain can't carry:
    *
    *   - a normal rule (`co.uk`) matches a host tail label-for-label;
    *   - a wildcard rule (`*.ck`) matches any tail whose LAST labels are
    *     the rule's non-* labels plus exactly one more label;
    *   - an exception rule (`!www.ck`) matches its literal labels and,
    *     when it matches, WINS outright; its public suffix is the rule
    *     minus its leftmost label;
    *   - among non-exception matches the rule with the MOST labels
    *     prevails; a host matching nothing takes the implicit default
    *     rule `*` (public suffix = its last label);
    *   - registrable domain (eTLD+1) = public suffix + one more host
    *     label; a host that IS a bare public suffix, or an IPv4 literal
    *     (all-digit last label — the PSL is about DNS names), maps to
    *     itself.
    *
    * Relational shape (scales to the full list): each host emits ≤
    * 2·maxRuleLabels bounded probe keys INTRA-ROW — its j-label tails
    * (exact/exception lookup) and `*.`+(j−1)-label tails (wildcard
    * lookup, plain string equality against the rule text) — then ONE
    * equi-join against the broadcast rule table and one map-combinable
    * max(struct(is_exception, rule_labels)) argmax back to host grain.
    * The rules never leave the broadcast; the corpus side moves narrow
    * (id, host, probe) rows once.
    *
    * Returns (idCol, host, psl_suffix, registrable_domain). */
  def registrableDomainPsl(df: DataFrame, idCol: String, hostCol: String,
      rules: Seq[String]): DataFrame = {
    require(rules.nonEmpty, "empty PSL rule table")
    val spark = df.sparkSession
    import spark.implicits._
    val maxJ = rules.map(_.stripPrefix("!").count(_ == '.') + 1).max
    // the implicit default rule `*` is materialized as a real row (every
    // host emits a matching "*" probe), so every host matches ≥ 1 rule
    // and host grain comes straight off the aggregate — no join-back
    val ruleTbl = (rules.map { r =>
      val exc = r.startsWith("!")
      // exception rules are looked up WITHOUT the '!'; wildcards keep
      // their '*.' spelling (the probe side fabricates the same string)
      val key = if (exc) r.substring(1) else r
      (key, key.count(_ == '.') + 1, exc)
    } :+ (("*", 1, false))).toDF("__key", "__rl", "__exc")
    // PSL matching is case-insensitive (DNS names are); the suffix and
    // registrable outputs are sliced from the LOWERED labels, the
    // conventional PSL rendering
    val labels = split(lower(col(hostCol)), "\\.")
    val n = size(labels)
    // probe structs: (key, jl = labels of host tail consumed by a match)
    val probes = (1 to maxJ).map { j =>
      when(n >= j, struct(
        array_join(slice(labels, -j, j), ".").as("__key"),
        lit(j).as("__jl")))
    } ++ (2 to maxJ).map { j =>
      when(n >= j, struct(
        concat(lit("*."), array_join(slice(labels, -(j - 1), j - 1), "."))
          .as("__key"),
        lit(j).as("__jl")))
    } :+ struct(lit("*").as("__key"), lit(1).as("__jl"))
    val probed = df.select(col(idCol), col(hostCol),
        explode(array(probes: _*)).as("__p"))
      .where(col("__p").isNotNull)
      .select(col(idCol), col(hostCol), col("__p.__key").as("__key"),
        col("__p.__jl").as("__jl"))
    val withSl = probed.join(broadcast(ruleTbl), "__key")
      // prevailing rule: exception first, then most rule labels; carry
      // the matched tail length to cut the suffix out of the host
      .groupBy(col(idCol), col(hostCol))
      .agg(max(struct(col("__exc"), col("__rl"), col("__jl"))).as("__m"))
      .select(col(idCol), col(hostCol),
        // exception: suffix = rule minus leftmost label => jl - 1 labels;
        // wildcard/exact: suffix = the full matched tail (jl labels)
        when(col("__m.__exc"), col("__m.__jl") - 1).otherwise(col("__m.__jl"))
          .as("__sl"))
    val lbl = split(lower(col(hostCol)), "\\.")
    val nn = size(lbl)
    val ipV4 = col(hostCol).rlike("^[0-9.]+$")
    // ONE case law for registrable_domain: LOWER on every arm (normal
    // hosts slice the lowered labels; the bare-suffix and IPv4 pass-
    // through arms lower explicitly) — a mixed-case bare-suffix host
    // ('Co.UK') must not leak original case out of one arm only
    withSl.select(col(idCol), col(hostCol),
      when(ipV4, lit(null).cast("string"))
        .otherwise(array_join(slice(lbl, -least(col("__sl"), nn),
          least(col("__sl"), nn)), ".")).as("psl_suffix"),
      when(ipV4 || nn <= col("__sl"), lower(col(hostCol)))
        .otherwise(array_join(
          slice(lbl, -(col("__sl") + 1), col("__sl") + 1), "."))
        .as("registrable_domain"))
  }
}
