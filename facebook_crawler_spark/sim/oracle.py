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
    # (round, host, consecutive_errors) at the moment the quarantined bit
    # flips — the ban-alert channel the engine's alerts table mirrors
    quarantine_events: list[tuple[int, str, int]] = field(default_factory=list)


def _fnv64_signed(s: str) -> int:
    """FNV-1a 64-bit as signed int64 — deliberately re-implemented here
    (NOT imported from the engine) so the oracle stays a genuinely
    independent implementation; parity of the two 6-line definitions is
    asserted in tests/test_urls.py."""
    h = 0xCBF29CE484222325
    for ch in s.encode("utf-8"):
        h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h - (1 << 64) if h >= (1 << 63) else h


# --- pure-Python XXH64 (public xxHash spec), seed 42 = Spark's default ------
# Replays the engine's production url_hash (F.xxhash64 over UTF-8 bytes)
# with no JVM; an independent implementation from the spec, asserted equal
# to Spark's own output in tests/test_urls.py.
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xxh64(data: bytes, seed: int = 42) -> int:
    n, i = len(data), 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i <= n - 32:
            v1 = (_rotl((v1 + int.from_bytes(data[i : i + 8], "little") * _P2) & _M64, 31) * _P1) & _M64
            v2 = (_rotl((v2 + int.from_bytes(data[i + 8 : i + 16], "little") * _P2) & _M64, 31) * _P1) & _M64
            v3 = (_rotl((v3 + int.from_bytes(data[i + 16 : i + 24], "little") * _P2) & _M64, 31) * _P1) & _M64
            v4 = (_rotl((v4 + int.from_bytes(data[i + 24 : i + 32], "little") * _P2) & _M64, 31) * _P1) & _M64
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ ((_rotl((v * _P2) & _M64, 31) * _P1) & _M64)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = (_rotl((int.from_bytes(data[i : i + 8], "little") * _P2) & _M64, 31) * _P1) & _M64
        h = ((_rotl(h ^ k, 27) * _P1) + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h = ((_rotl(h ^ ((int.from_bytes(data[i : i + 4], "little") * _P1) & _M64), 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M64), 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def _xxh64_signed(s: str) -> int:
    h = _xxh64(s.encode("utf-8"), 42)
    return h - (1 << 64) if h >= (1 << 63) else h


_HASH_FNS = {"xxhash64": _xxh64_signed, "fnv": _fnv64_signed}


def _children_of(
    parent_hash: int, parent_rank: int, priority: int, round_no: int, d: dict, hash_fn=_xxh64_signed
) -> list[dict]:
    """Deterministic outlinks of one successful fetch — the pure-Python twin
    of round_runner._expand_discoveries (same modular arithmetic; the child
    URL is constructed already-canonical, so url_hash = hash_fn(url)
    directly — xxh64 replay by default, fnv in sim-parity mode)."""
    base = parent_hash % 1_000_000_007
    out = []
    for j in range(1, base % d["max_out"] + 1):
        t = (base * (j + 1) + round_no * 1007) % d["n_images"]
        # (t mod P) before the Knuth multiply, mirroring the engine's
        # int64-overflow-safe expression (Python ints wouldn't overflow,
        # but both sides must compute the identical value)
        if ((t % 1_000_000_007) * 2_654_435_761) % 100 < d["hot_pct"]:
            host = d["hot_host"]
        else:
            host = f"host-{(t * 97) % (d['n_hosts'] - 1):03d}.example.test"
        url = f"https://{host}/item/img_{t:012d}?disc={j}"
        out.append(
            {
                "url_hash": hash_fn(url),
                "canonical_url": url,
                "host": host,
                "priority": priority,
                "seed_rank": ((parent_rank % (1 << 40)) * 31 + j * 7 + round_no) % (1 << 40),
                "discovered_round": round_no,
            }
        )
    return out


def simulate(
    frontier_rows: list[dict],
    host_rows: list[dict],
    error_permille: int = 0,
    max_rounds: int = 1000,
    discovery: dict | None = None,
    hash_mode: str = "xxhash64",
) -> SimResult:
    """Replay the crawl. `frontier_rows` need keys url_hash, canonical_url,
    host, priority, seed_rank; `host_rows` need host, token_rate,
    ban_threshold, robots_disallow. `discovery` (optional) mirrors
    round_runner.DiscoveryConfig as a dict with keys n_images, n_hosts,
    hot_pct, hot_host, max_out. `hash_mode` must match the engine's
    (CrawlEngine hash_mode): the hash only matters for discovery-child
    url_hashes — seed hashes arrive in `frontier_rows`."""
    hash_fn = _HASH_FNS[hash_mode]
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
    frontier: dict[int, dict] = {}
    for r in frontier_rows:
        r = dict(r)
        r.setdefault("discovered_round", 0)
        cur = frontier.get(r["url_hash"])
        if cur is None or r["seed_rank"] < cur["seed_rank"]:
            frontier[r["url_hash"]] = r

    res = SimResult()
    for round_no in range(1, max_rounds + 1):
        # per-round work lists: reference crawl order within a host is
        # priority band, then the persisted shuffled order, url_hash as
        # total-order tiebreak; children discovered in round r are eligible
        # from round r+1 (mirrors run_round's discovered_round < round)
        work: dict[str, list[dict]] = {}
        for row in sorted(
            (
                r
                for r in frontier.values()
                if allowed(r) and r["url_hash"] not in res.seen and r["discovered_round"] < round_no
            ),
            key=lambda r: (r["priority"], r["seed_rank"], r["url_hash"]),
        ):
            work.setdefault(row["host"], []).append(row)

        scheduled = 0
        round_children: list[dict] = []
        for host, pending in work.items():
            hs = hosts.get(host) or HostState(token_rate=50, ban_threshold=20)
            hosts.setdefault(host, hs)
            if hs.quarantined:
                continue
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
                if discovery is not None:
                    round_children.extend(
                        _children_of(
                            row["url_hash"], row["seed_rank"], row["priority"],
                            round_no, discovery, hash_fn,
                        )
                    )
            trailing = len(chunk) - last_ok_rank
            if trailing == len(chunk):
                hs.consecutive_errors += trailing
            else:
                hs.consecutive_errors = trailing
            if hs.consecutive_errors >= hs.ban_threshold and not hs.quarantined:
                hs.quarantined = True
                res.quarantine_events.append((round_no, host, hs.consecutive_errors))

        # append this round's discoveries: first-wins within the round
        # (min seed_rank, canonical tiebreak), never replacing known URLs
        for child in sorted(round_children, key=lambda c: (c["seed_rank"], c["canonical_url"])):
            if child["url_hash"] not in frontier:
                frontier[child["url_hash"]] = child
        res.rounds = round_no
        if scheduled == 0:
            break
    return res
