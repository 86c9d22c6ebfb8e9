"""Pure-Python reference crawler — the executable crawl-semantics contract.

The Spark scheduler (crawler_spark.scheduler) must reproduce, for the same
corpus + seed list + politeness budget:

* the exact schedule: (round, priority, seq, url) in scheduling order,
* the final URL-seen set,
* byte-identical extracted text per fetched url.

Semantics (BSP rounds — the distributed analog of the reference's FIFO
frontier, /root/reference/collector-url.go:19-46):

1. **Admission** — a candidate batch (seeds at round 0; outlinks discovered
   in round r admitted for round r+1) is processed in deterministic order
   (seeds: seq asc; outlinks: (parent_seq, pos) asc). First occurrence wins
   (global first-occurrence dedup, the north_rule generalization of the
   reference's per-page-only distinct). Every admitted-or-blocked URL is
   recorded in ``seen``; robots-disallowed URLs are seen but never
   scheduled; allowed URLs get the next global ``seq`` and join the
   frontier with ``round_added`` = the upcoming round.
2. **Politeness** — each round, per host, the first ``budget(host)`` frontier
   entries in (priority, round_added, seq) order are scheduled; the rest
   stay in the frontier (carry over) untouched.
3. **Fetch-as-join** — a scheduled URL present in the corpus yields html
   (outlinks + extraction); a miss is a silent drop (collector.go:88-90).

The ordering is a *data* property (priority, round, seq) — never an
execution property — so any parallel execution can reproduce it.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from crawler_spark.frontier.canon import canonicalize_url, extract_outlinks


def url_host(url_canon: str) -> str:
    rest = url_canon.split("://", 1)[-1]
    hostport = rest.split("/", 1)[0]
    return hostport.split("@")[-1].split(":")[0].lower()


def url_path(url_canon: str) -> str:
    rest = url_canon.split("://", 1)[-1]
    slash = rest.find("/")
    path = rest[slash:] if slash != -1 else "/"
    return path.split("?", 1)[0]


@dataclass
class ScheduleEntry:
    round: int
    url: str
    host: str
    priority: int
    seq: int
    fetched: bool


@dataclass
class OracleResult:
    schedule: list[ScheduleEntry] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)
    metrics: list[dict] = field(default_factory=list)


def crawl_oracle(
    pages: dict[str, str],
    seeds: list[tuple[str, int, int]],
    robots: dict[str, list[str]] | None = None,
    budgets: dict[str, int] | None = None,
    default_budget: int = 16,
    max_rounds: int = 50,
) -> OracleResult:
    """pages: {url: html} (urls in any form; canonicalized internally);
    seeds: [(url, priority, seq)] — seq defines seed admission order."""
    robots = robots or {}
    budgets = budgets or {}
    corpus = {canonicalize_url(u): h for u, h in pages.items()}

    res = OracleResult()
    seen = res.seen
    frontier: list[dict] = []  # {url, host, priority, round_added, seq}
    next_seq = 0

    def disallowed(url_canon: str, host: str) -> bool:
        prefixes = robots.get(host) or []
        path = url_path(url_canon)
        return any(path.startswith(p) for p in prefixes)

    def admit(batch: list[tuple[str, int]], round_added: int) -> int:
        """batch: [(url_canon, priority)] in deterministic order."""
        nonlocal next_seq
        admitted = 0
        for url, priority in batch:
            if not url or url in seen:
                continue
            seen.add(url)
            host = url_host(url)
            if disallowed(url, host):
                continue
            frontier.append(
                {
                    "url": url,
                    "host": host,
                    "priority": priority,
                    "round_added": round_added,
                    "seq": next_seq,
                }
            )
            next_seq += 1
            admitted += 1
        return admitted

    admit([(canonicalize_url(u), p) for u, p, _ in sorted(seeds, key=lambda t: t[2])], 0)

    rnd = 0
    while frontier and rnd < max_rounds:
        by_host: dict[str, list[dict]] = {}
        for e in frontier:
            by_host.setdefault(e["host"], []).append(e)
        scheduled: list[dict] = []
        deferred: list[dict] = []
        for host, entries in by_host.items():
            entries.sort(key=lambda e: (e["priority"], e["round_added"], e["seq"]))
            b = budgets.get(host, default_budget)
            scheduled.extend(entries[:b])
            deferred.extend(entries[b:])
        scheduled.sort(key=lambda e: (e["priority"], e["seq"]))

        discovered: list[tuple[str, int]] = []
        fetched = 0
        for e in scheduled:
            html = corpus.get(e["url"])
            ok = html is not None
            fetched += int(ok)
            res.schedule.append(
                ScheduleEntry(rnd, e["url"], e["host"], e["priority"], e["seq"], ok)
            )
            if ok:
                for link in extract_outlinks(e["url"], html):
                    discovered.append((link, 0))

        frontier = deferred
        admitted = admit(discovered, rnd + 1)
        res.metrics.append(
            {
                "round": rnd,
                "scheduled": len(scheduled),
                "fetched": fetched,
                "failed": len(scheduled) - fetched,
                "admitted": admitted,
                "deferred": len(deferred),
            }
        )
        rnd += 1

    return res
