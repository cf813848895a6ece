"""Pure-Python crawl simulator — the golden oracle (SURVEY.md §5.1).

Re-states the reference's sequential loop semantics (ordered work-list
consumption in chunks of `token_rate` per host per round, reference
crawlers/details_crawler.py:36-103; ban counter per agent, reference
availability_crawler.py:97-124) over the same seeded frontier the engine
consumes. No Spark, no engine code — an independent implementation whose
(crawl order, seen set) the distributed engine must reproduce byte-for-byte
(BASELINE.json north_rule).

Inputs are plain Python rows (typically read from the seeded frontier
parquet written by CrawlEngine.seed, which carries the canonical URL and
url_hash so this oracle shares no hashing code with the engine's JVM side).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import urlparse


def _is_blocked(url_hash: int, round_no: int, permille: int) -> bool:
    """Deterministic failure injection — same modular arithmetic as
    round_runner._error_expr (pmod keeps negatives positive, like Python %)."""
    base = url_hash % 1_000_000_007
    return (base + round_no * 2_654_435_761) % 1000 < permille


def _path(canonical_url: str) -> str:
    p = urlparse(canonical_url).path
    return p if p else "/"


@dataclass
class HostState:
    token_rate: int
    ban_threshold: int
    robots_disallow: tuple[str, ...] = ()
    consecutive_errors: int = 0
    quarantined: bool = False


@dataclass
class SimResult:
    crawl_order: list[tuple[int, str, int, int]] = field(default_factory=list)
    # (round, host, host_rank, url_hash) of successful fetches
    seen: set[int] = field(default_factory=set)
    rounds: int = 0


def simulate(
    frontier_rows: list[dict],
    host_rows: list[dict],
    error_permille: int = 0,
    max_rounds: int = 1000,
) -> SimResult:
    """Replay the crawl. `frontier_rows` need keys url_hash, canonical_url,
    host, priority, seed_rank; `host_rows` need host, token_rate,
    ban_threshold, robots_disallow."""
    hosts = {
        h["host"]: HostState(
            token_rate=h["token_rate"],
            ban_threshold=h["ban_threshold"],
            robots_disallow=tuple(h.get("robots_disallow") or ()),
        )
        for h in host_rows
    }

    # robots filter (never fetched at all)
    def allowed(row) -> bool:
        hs = hosts.get(row["host"])
        if hs is None:
            return True
        path = _path(row["canonical_url"])
        return not any(path.startswith(d) for d in hs.robots_disallow)

    # first-wins dedup by canonical hash (reference dict-insert semantics,
    # earliest position in the shuffled list wins) — mirrors CrawlEngine.seed
    best: dict[int, dict] = {}
    for r in frontier_rows:
        cur = best.get(r["url_hash"])
        if cur is None or r["seed_rank"] < cur["seed_rank"]:
            best[r["url_hash"]] = r

    # reference crawl order within a host: priority band, then the persisted
    # shuffled order, url_hash as total-order tiebreak
    work: dict[str, list[dict]] = {}
    for row in sorted(
        (r for r in best.values() if allowed(r)),
        key=lambda r: (r["priority"], r["seed_rank"], r["url_hash"]),
    ):
        work.setdefault(row["host"], []).append(row)

    res = SimResult()
    for round_no in range(1, max_rounds + 1):
        scheduled = 0
        for host in work:
            hs = hosts.get(host) or HostState(token_rate=50, ban_threshold=20)
            hosts.setdefault(host, hs)
            if hs.quarantined:
                continue
            pending = [r for r in work[host] if r["url_hash"] not in res.seen]
            chunk = pending[: hs.token_rate]
            if not chunk:
                continue
            scheduled += len(chunk)
            last_ok_rank = 0
            for rank, row in enumerate(chunk, start=1):
                if _is_blocked(row["url_hash"], round_no, error_permille):
                    continue
                res.seen.add(row["url_hash"])
                res.crawl_order.append((round_no, host, rank, row["url_hash"]))
                last_ok_rank = rank
            trailing = len(chunk) - last_ok_rank
            if trailing == len(chunk):
                hs.consecutive_errors += trailing
            else:
                hs.consecutive_errors = trailing
            if hs.consecutive_errors >= hs.ban_threshold:
                hs.quarantined = True
        res.rounds = round_no
        if scheduled == 0:
            break
    return res
