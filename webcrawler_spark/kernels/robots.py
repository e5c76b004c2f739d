"""robots.txt parsing (RFC 9309 Robots Exclusion Protocol) — turns raw
robots.txt text into the engine's robots-table shape
``(disallow_prefixes: list[str], crawl_delay_ms: int)``.

The reference delegates politeness to its fetch layer (WebGet.scala fetches
without an explicit REP parser); a Common-Crawl-scale crawler must parse
the real files, so this kernel implements the public spec directly:

- groups of ``User-agent`` lines followed by rules; the most specific
  matching group wins (exact agent match beats ``*``), per RFC 9309 §2.2.1;
- ``Disallow`` / ``Allow`` path rules (the engine's admission filter is
  prefix-based, so Allow rules are kept separately for callers that want
  longest-match semantics via :func:`is_allowed`);
- ``Crawl-delay`` (de-facto extension, seconds, fractional ok) mapped to
  the table's ``crawl_delay_ms``;
- comments (``#``), blank-line group breaks, case-insensitive field names,
  missing colons and unknown fields tolerated per §2.2.

Distributed face: :func:`robots_df_from_text` — one Arrow-batched
``mapInPandas`` pass from ``(host, robots_txt)`` to the politeness table
the crawler joins against (plans/crawler.py:384-397)."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class RobotsRules:
    disallow_prefixes: list[str] = field(default_factory=list)
    allow_prefixes: list[str] = field(default_factory=list)
    crawl_delay_ms: int = 0


def _clean(line: str) -> str:
    hash_pos = line.find("#")
    if hash_pos >= 0:
        line = line[:hash_pos]
    return line.strip()


def parse_robots(text: str | bytes, agent: str = "*") -> RobotsRules:
    """Parse one robots.txt for ``agent``. Group selection per RFC 9309:
    the group whose user-agent token is the longest prefix of ``agent``
    (case-insensitive) wins; the ``*`` group is the fallback; if several
    user-agent lines head one group they share its rules."""
    if isinstance(text, bytes):
        text = text.decode("utf-8", "replace")
    agent = agent.lower()

    groups: list[tuple[list[str], RobotsRules]] = []
    cur_agents: list[str] = []
    cur_rules: RobotsRules | None = None

    for raw in text.splitlines():
        line = _clean(raw)
        if not line:
            continue
        key, sep, value = line.partition(":")
        if not sep:
            continue
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if cur_rules is not None and (
                cur_rules.disallow_prefixes
                or cur_rules.allow_prefixes
                or cur_rules.crawl_delay_ms
            ):
                # rules already seen: this user-agent starts a NEW group
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], None
            cur_agents.append(value.lower())
            if cur_rules is None:
                cur_rules = RobotsRules()
        elif cur_rules is not None:
            if key == "disallow":
                if value:
                    cur_rules.disallow_prefixes.append(value)
            elif key == "allow":
                if value:
                    cur_rules.allow_prefixes.append(value)
            elif key == "crawl-delay":
                try:
                    # round, don't truncate: 0.003 * 1000 is 2.999… in IEEE
                    cur_rules.crawl_delay_ms = int(round(float(value) * 1000))
                except ValueError:
                    pass
        # rules before any user-agent line are ignored per spec
    if cur_agents and cur_rules is not None:
        groups.append((cur_agents, cur_rules))

    best: RobotsRules | None = None
    best_len = -1
    fallback: RobotsRules | None = None
    for agents, rules in groups:
        for a in agents:
            if a == "*":
                if fallback is None:
                    fallback = rules
            elif agent.startswith(a) and len(a) > best_len:
                best, best_len = rules, len(a)
    chosen = best if best is not None else fallback
    return chosen if chosen is not None else RobotsRules()


def is_allowed(rules: RobotsRules, path: str) -> bool:
    """Longest-match rule evaluation (RFC 9309 §2.2.2): the longest
    matching prefix among Allow and Disallow decides; ties go to Allow;
    no match means allowed."""
    best_allow = max(
        (len(p) for p in rules.allow_prefixes if path.startswith(p)), default=-1
    )
    best_dis = max(
        (len(p) for p in rules.disallow_prefixes if path.startswith(p)),
        default=-1,
    )
    return best_allow >= best_dis


def robots_df_from_text(texts, agent: str = "*", text_col: str = "robots_txt"):
    """(host, robots_txt) -> (host, disallow_prefixes, crawl_delay_ms) —
    the crawler's politeness-table shape. One mapInPandas pass; the parse
    pipelines with the scan (at 100 TB the robots corpus is ~10^8 tiny
    documents — pure map work)."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            out = {"host": [], "disallow_prefixes": [], "crawl_delay_ms": []}
            for host, txt in zip(pdf["host"], pdf[text_col]):
                r = parse_robots(txt if txt is not None else "", agent)
                out["host"].append(host)
                out["disallow_prefixes"].append(r.disallow_prefixes)
                out["crawl_delay_ms"].append(r.crawl_delay_ms)
            yield pd.DataFrame(out)

    return texts.mapInPandas(
        run, "host string, disallow_prefixes array<string>, crawl_delay_ms int"
    )
