package graft.codec

import org.apache.spark.unsafe.types.UTF8String

/** robots.txt group selection + rule matching (RFC 9309 / the public
  * Google robots.txt specification), as one compiled pass per document:
  *
  *   - lines are `\n`-split; a `#` starts a comment to end-of-line;
  *     fields are `name: value` with the name case-insensitive and both
  *     sides [ \t\r]-trimmed;
  *   - consecutive `user-agent` lines form one GROUP HEAD; the
  *     `allow`/`disallow` lines that follow (until the next head) belong
  *     to every agent named in that head; groups for the same agent
  *     merge (RFC 9309 §2.2.1);
  *   - the evaluated agent matches a head token case-insensitively and
  *     exactly; if no group matches, the `*` group applies; if neither
  *     exists, everything is allowed;
  *   - a rule value matches the URL path as a prefix, where `*` matches
  *     any character run and a TRAILING `$` anchors the end (`$`
  *     anywhere else is literal); an empty `disallow:` value matches
  *     nothing (allow-all);
  *   - the prevailing rule is the one with the MOST OCTETS in its value
  *     as written; at equal length `allow` wins (RFC 9309 §2.2.2).
  *
  * The verdict is rendered as a STRING so one deterministic expression
  * carries the whole decision for hashing and SQL replay:
  * `"A|<rule>"` / `"D|<rule>"` for an allow/disallow match,
  * `"A|"` for the no-match / no-group default. */
object Robots {

  private def trimF(s: String): String = {
    var a = 0; var b = s.length
    while (a < b && (s.charAt(a) == ' ' || s.charAt(a) == '\t' ||
      s.charAt(a) == '\r')) a += 1
    while (b > a && (s.charAt(b - 1) == ' ' || s.charAt(b - 1) == '\t' ||
      s.charAt(b - 1) == '\r')) b -= 1
    s.substring(a, b)
  }

  /** robots `*`/trailing-`$` pattern match against a path. Iterative
    * greedy-with-backtrack two-pointer — the same language `^…$`-rewritten
    * RE2 accepts, so a SQL regex replay agrees. */
  private[codec] def ruleMatches(rule: String, path: String): Boolean = {
    if (rule.isEmpty) return false // empty disallow value: matches nothing
    val anchored = rule.charAt(rule.length - 1) == '$'
    val pat = if (anchored) rule.substring(0, rule.length - 1) else rule
    // prefix match with '*' wildcards; anchored => must consume ALL of
    // path — the language a `^…(.*)?$`-rewritten RE2 accepts, so a SQL
    // regex replay agrees
    var p = 0; var s = 0
    var starP = -1; var starS = -1
    while (s < path.length) {
      if (!anchored && p >= pat.length) return true // prefix consumed
      if (p < pat.length && pat.charAt(p) == '*') {
        starP = p; starS = s; p += 1
      } else if (p < pat.length && pat.charAt(p) == path.charAt(s)) {
        p += 1; s += 1
      } else if (starP >= 0) {
        p = starP + 1; starS += 1; s = starS
      } else {
        return false
      }
    }
    // path exhausted: remaining pattern must be all '*'
    var q = p
    while (q < pat.length && pat.charAt(q) == '*') q += 1
    q >= pat.length
  }

  /** Full decision (object doc): returns `A|<rule>`, `D|<rule>` or `A|`. */
  def decision(robots: UTF8String, agent: UTF8String,
      path: UTF8String): UTF8String = {
    val agentLc = agent.toString.toLowerCase
    val pathS = path.toString
    // parse into (groupId, agents, rules); group heads = contiguous ua runs
    final case class Rule(allow: Boolean, value: String)
    val groupAgents = scala.collection.mutable.ArrayBuffer.empty[
      scala.collection.mutable.ArrayBuffer[String]]
    val groupRules = scala.collection.mutable.ArrayBuffer.empty[
      scala.collection.mutable.ArrayBuffer[Rule]]
    var inHead = false
    robots.toString.split("\n", -1).foreach { raw =>
      val noComment = {
        val h = raw.indexOf('#')
        if (h >= 0) raw.substring(0, h) else raw
      }
      val line = trimF(noComment)
      val colon = line.indexOf(':')
      if (colon > 0) {
        val field = trimF(line.substring(0, colon)).toLowerCase
        val value = trimF(line.substring(colon + 1))
        field match {
          case "user-agent" =>
            if (!inHead) {
              groupAgents += scala.collection.mutable.ArrayBuffer.empty
              groupRules += scala.collection.mutable.ArrayBuffer.empty
              inHead = true
            }
            groupAgents.last += value.toLowerCase
          case "allow" | "disallow" if groupAgents.nonEmpty =>
            inHead = false
            groupRules.last += Rule(field == "allow", value)
          // RFC 9309 §2.2.4 / google/robotstxt: records outside the
          // grammar (sitemap, crawl-delay, anything unknown) MUST NOT
          // interfere with group parsing — a `Sitemap:` between two
          // consecutive `user-agent` lines leaves them in ONE head; only
          // allow/disallow rule lines close a head
          case _ => ()
        }
      }
      // blank / comment-only lines neither end a head nor start one
    }
    // RFC 9309 §2.2.1: groups for the same agent merge — collect rules
    // from every group naming the agent; fall back to '*' groups
    def rulesFor(name: String): Seq[Rule] =
      groupAgents.indices.collect {
        case i if groupAgents(i).contains(name) => groupRules(i)
      }.flatten.toSeq
    val rules = {
      val exact = rulesFor(agentLc)
      if (exact.nonEmpty || groupAgents.exists(_.contains(agentLc))) exact
      else rulesFor("*")
    }
    var best: Rule = null
    var bestLen = -1
    rules.foreach { r =>
      if (ruleMatches(r.value, pathS)) {
        // RFC 9309 §2.2.2: the prevailing rule has the most OCTETS, not
        // the most UTF-16 units — a multi-byte rule value ('/café/')
        // outweighs a same-char-count ASCII one (oracle: octet_length())
        val len = r.value.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          .length
        if (len > bestLen || (len == bestLen && r.allow && !best.allow)) {
          best = r; bestLen = len
        }
      }
    }
    val out = if (best == null) "A|"
      else (if (best.allow) "A|" else "D|") + best.value
    UTF8String.fromString(out)
  }
}
