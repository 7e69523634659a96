"""robots.txt compliance filtering (RFC 9309).

Responsible crawl pipelines re-check robots rules when they re-use a
crawl (RefinedWeb §3.1 filters by URL policy; Common Crawl publishes
robots captures alongside pages). This module implements the RFC 9309
match algorithm over a (domain → robots.txt) table:

- **group selection** (§2.2.1): the group whose ``User-agent`` line
  most specifically matches the product token — exact token match
  beats ``*``; multiple groups for the same agent concatenate;
- **rule matching** (§2.2.2): a rule pattern matches a URL PATH as a
  prefix, with ``*`` matching any octet sequence and ``$`` anchoring
  the end;
- **precedence** (§2.2.2): the MOST SPECIFIC match wins — longest
  pattern in octets; on a length tie, allow wins. No match → allowed
  (and a domain with no robots row → allowed: absence of a policy is
  permission, per §2.3.1.2 / crawl practice).

Split of labor (the lmscore/bm25 shared-function doctrine): PARSING
robots.txt (line splitting, group assembly, pattern → anchored regex
translation) happens in ONE place — :func:`parse_robots_rules`,
Python — and both engines consume the identical compiled rule rows;
MATCHING + precedence are then replayed independently by each engine
(Spark columns here, SQL in the oracle). Patterns translate to the
regex subset that Java regex and RE2 agree on (the pii.py
compatibility contract): escaped literals, ``.*``, ``$``.

Scale shape: rules tables are domain-sized (summary) — broadcast; the
URL-side work is one explode-free equi-join on domain (rules arrive
as an ARRAY per domain, matched with exists/filter higher-order
functions — no per-rule row blowup of the URL table) and pure
expressions. No Python in the matching path.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import DataFrame, functions as F

#: Compiled rule: (allow, pattern_len_octets, anchored_regex)
_RULES_TYPE = "array<struct<allow:boolean,plen:int,rx:string>>"
RULES_SCHEMA = f"domain string, rules {_RULES_TYPE}"


def _pattern_to_regex(pattern: str) -> str:
    """RFC 9309 pattern → anchored regex in the Java∩RE2 subset:
    specials escaped, ``*`` → ``.*``, trailing ``$`` → end anchor;
    prefix semantics (no trailing anchor otherwise)."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    out = []
    for ch in body:
        if ch == "*":
            out.append(".*")
        elif ch in r"\.^$|?+()[]{}":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "^" + "".join(out) + ("$" if anchored else "")


def parse_robots_rules(robots_txt: str, agent: str = "*"
                       ) -> List[Tuple[bool, int, str]]:
    """Parse one robots.txt into the effective compiled rule list for
    ``agent``: the most-specific user-agent group's (allow, octet-len,
    regex) rows. Comments stripped; unknown directives ignored;
    groups for the same agent merge (RFC 9309 §2.2.1)."""
    agent = agent.lower()
    groups: dict = {}
    current: List[str] = []
    saw_rule = True
    for raw in robots_txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, sep, value = line.partition(":")
        if not sep:
            continue
        key, value = key.strip().lower(), value.strip()
        if key == "user-agent":
            if saw_rule:
                current = []
                saw_rule = False
            current.append(value.lower())
            for a in current:
                groups.setdefault(a, [])
        elif key in ("allow", "disallow"):
            saw_rule = True
            if not value and key == "disallow":
                continue   # "Disallow:" empty = allow all, no rule
            if value:
                rule = (key == "allow", len(value.encode()),
                        _pattern_to_regex(value))
                for a in current:
                    groups.setdefault(a, []).append(rule)
        else:
            saw_rule = True   # other directives end the agent run
    if agent in groups:
        return groups[agent]
    return groups.get("*", [])


def robots_rules_df(robots: DataFrame, *, agent: str = "*",
                    domain_col: str = "domain",
                    txt_col: str = "robots_txt") -> DataFrame:
    """(domain, robots_txt) → (domain, rules array) via one Arrow
    batch boundary over the SUMMARY-sized robots table."""
    def gen(batches):
        import pandas as pd
        for pdf in batches:
            rows = []
            for dom, txt in zip(pdf[domain_col], pdf[txt_col]):
                rules = (parse_robots_rules(txt, agent)
                         if txt is not None else [])
                rows.append((dom, rules))
            yield pd.DataFrame(rows, columns=["domain", "rules"])

    return (robots.select(domain_col, txt_col)
            .mapInPandas(gen, RULES_SCHEMA))


def robots_filter(urls: DataFrame, rules: DataFrame, *,
                  url_path_col: str = "url_path",
                  domain_col: str = "domain",
                  broadcast_rules: bool = True) -> DataFrame:
    """Apply RFC 9309 precedence to every URL row.

    ``rules`` is :func:`robots_rules_df` output. Adds ``allowed``
    (boolean) and ``rule_plen`` (octet length of the deciding rule,
    -1 when no rule matched). Longest-match/allow-tie precedence is
    ONE higher-order ``aggregate`` over the matched rules — the URL
    table never explodes per rule.

    ``broadcast_rules``: the default hints a broadcast (a crawl's
    policy table is usually far smaller than its URL table), but a
    FULL-web domain population (~10^8 registrable domains) outgrows a
    driver broadcast — pass False there and the equi-join shuffles on
    domain like any other join (AQE still broadcasts it when it turns
    out small).
    """
    path = F.col(url_path_col)
    matched = F.filter(
        F.coalesce(F.col("rules"), F.array().cast(_RULES_TYPE)),
        lambda r: F.regexp_like(path, r["rx"]))
    # fold to the winning (plen, allow): longer wins; tie -> allow
    best = F.aggregate(
        matched,
        F.struct(F.lit(-1).cast("int").alias("plen"),
                 F.lit(True).alias("allow")),
        lambda acc, r: F.when(
            (r["plen"] > acc["plen"])
            | ((r["plen"] == acc["plen"]) & r["allow"]),
            F.struct(r["plen"].alias("plen"),
                     r["allow"].alias("allow"))).otherwise(acc))
    right = F.broadcast(rules) if broadcast_rules else rules
    return (urls.join(right,
                      urls[domain_col] == rules["domain"], "left")
            .drop(rules["domain"])
            .withColumn("_best", best)
            .withColumn("allowed", F.col("_best.allow"))
            .withColumn("rule_plen", F.col("_best.plen"))
            .drop("rules", "_best"))


def robots_rules_values_sql(rules_rows) -> str:
    """Embed compiled rule rows as a VALUES literal for the oracle:
    (domain, allow, plen, rx) — the ONE shared-parse artifact; DuckDB
    replays matching + precedence itself."""
    if not rules_rows:
        return ("SELECT NULL AS domain, NULL AS allow, NULL AS plen, "
                "NULL AS rx WHERE false")
    vals = ", ".join(
        "('%s', %s, %d, '%s')"
        % (d.replace("'", "''"), "true" if a else "false", p,
           rx.replace("'", "''"))
        for d, a, p, rx in rules_rows)
    return (f"SELECT * FROM (VALUES {vals}) "
            f"AS t(domain, allow, plen, rx)")
