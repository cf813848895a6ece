"""Probe-gated matched-pair watcher for the N→4N scaling evidence.

Rounds 4-5 gathered their scaling pairs by hand-firing `bench.py`
pair subprocesses whenever the box looked quiet; this round's weather
(host-starvation bursts INSIDE a leg that bracketing point probes cannot
see — see BENCH/BASELINE.md "Second final-tree pair") made that protocol
both lossy and ad hoc. This tool makes it reproducible:

  1. every `--interval` seconds, run the single-thread CPU probe;
  2. when the probe reads clean (≤ --probe-max), fire ONE matched pair
     (`BENCH_MODE=pair`, scaling fixture, order alternated across
     attempts);
  3. accept or reject the pair on bench.py's IN-BAND seed-uniformity
     gate (`seed_uniform` in the pair JSON — the matched seed job
     embedded in both legs, which catches mid-leg bursts the bracketing
     probes miss), recording the bracketing probes alongside;
  4. append one JSON line per attempt to --log (default
     BENCH/pairs.jsonl), then stop after --max-accept accepted pairs or
     --deadline-sec, whichever first.

Consumers fold accepted pairs into BENCH/BASELINE.md's cumulative set by
hand — this tool only gathers evidence; it never rewrites the analysis.

Run:  python tools/pair_watcher.py --max-accept 2 --deadline-sec 7200
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: SCALING_ENV + probe)


def run_pair(order: tuple[int, int]) -> dict:
    env = dict(
        os.environ,
        BENCH_MODE="pair",
        BENCH_PAIR=f"{order[0]},{order[1]}",
        **bench.SCALING_ENV,
    )
    out = subprocess.run(
        [sys.executable, bench.__file__],
        env=env,
        capture_output=True,
        text=True,
    )
    if out.returncode != 0:
        return {"error": (out.stderr or "")[-2000:]}
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-accept", type=int, default=2)
    ap.add_argument("--deadline-sec", type=float, default=7200)
    ap.add_argument("--interval", type=float, default=60)
    ap.add_argument(
        "--probe-max", type=float, default=0.75,
        help="fire a pair only when the single-thread probe reads ≤ this "
        "(clean baseline 0.58-0.65 s this round; starved windows 0.9-1.8+)",
    )
    ap.add_argument(
        "--probe-mt-max", type=float, default=0.85,
        help="ALSO require the 8-process parallel probe (bench.cpu_probe_mt) "
        "≤ this before firing: the warmup-era log exposed windows where "
        "1-thread probes and steal read clean but parallel capacity is "
        "capped 1.3-2x (8-legs ~150 s vs ~105 s), which only a parallel "
        "probe sees (clean reference ~0.6-0.8 s). A firing condition — "
        "window selection — not an acceptance gate.",
    )
    ap.add_argument("--log", default="BENCH/pairs.jsonl")
    args = ap.parse_args()

    os.makedirs(os.path.dirname(args.log) or ".", exist_ok=True)
    t_end = time.monotonic() + args.deadline_sec
    accepted = 0
    attempt = 0
    orders = [(2, 8), (8, 2)]
    while time.monotonic() < t_end and accepted < args.max_accept:
        probe0 = bench.cpu_probe()
        if probe0 > args.probe_max:
            print(f"watch: probe {probe0}s > {args.probe_max} — waiting", file=sys.stderr)
            time.sleep(args.interval)
            continue
        probe_mt0 = bench.cpu_probe_mt()
        if probe_mt0 > args.probe_mt_max:
            print(
                f"watch: probe_mt {probe_mt0}s > {args.probe_mt_max} "
                "(parallel capacity capped) — waiting",
                file=sys.stderr,
            )
            time.sleep(args.interval)
            continue
        order = orders[attempt % 2]
        attempt += 1
        print(f"watch: probe {probe0}s clean — firing pair {order}", file=sys.stderr)
        t0 = time.monotonic()
        res = run_pair(order)
        probe1 = bench.cpu_probe()
        rec = {
            "attempt": attempt,
            "order": list(order),
            "probe_before": probe0,
            "probe_after": probe1,
            "probe_mt_before": probe_mt0,
            "probe_mt_after": bench.cpu_probe_mt(),
            "wall_sec": round(time.monotonic() - t0, 1),
        }
        if "error" in res:
            rec["accepted"] = False
            rec["error"] = res["error"]
        else:
            legs = res["pair"]
            rec["seed_ratio"] = res.get("seed_ratio")
            rec["seed_uniform"] = res.get("seed_uniform", True)
            # round-dispersion gate (bench.py round-5: matched per-round
            # ratios over the deterministic crawl — covers the whole crawl
            # phase, closing the seed gate's short-sample blind spot)
            rec["round_disp"] = res.get("round_disp")
            rec["rounds_uniform"] = res.get("rounds_uniform", True)
            # steal-share gate (bench.py round-5: /proc/stat steal per leg
            # — whole-leg weather coverage, informative even on the
            # one-round bulk fixture where the dispersion gate is null)
            rec["steal_pct"] = res.get("steal_pct")
            rec["steal_ok"] = res.get("steal_ok", True)
            # warmup leg (bench.py round-5: throwaway crawl before the
            # first measured leg, erasing the ~25 s additive first-leg
            # JVM-warmup tax the pair log exposed) — recorded so warmup-era
            # pairs are distinguishable from earlier protocol eras
            rec["warmup"] = res.get("warmup")
            # per-leg parallel-capacity probes (bench.py cpu_probe_mt):
            # the slow-8-leg mode shows clean 1-thread probes and <0.1%
            # steal, so only a parallel probe can classify those windows
            rec["probe_mt"] = res.get("probe_mt")
            rec["legs"] = {
                k: {
                    "crawl_sec": v["crawl_sec"],
                    "urls_per_sec": v["urls_per_sec"],
                    "seed_sec": v["seed_sec"],
                    # kept verbatim so a pair's dispersion verdict can be
                    # re-derived (and outlier rounds located) post-hoc
                    "round_sec": v.get("round_sec"),
                }
                for k, v in legs.items()
            }
            rec["pair_efficiency"] = res.get("pair_efficiency", round(
                (legs["8"]["urls_per_sec"] / legs["2"]["urls_per_sec"]) / 4.0, 3
            ))
            # pair_valid (bench.py): seed-uniform AND physically possible
            # (efficiency ≤ 1.0) AND round-dispersion-uniform AND
            # steal-clean — the full in-band gate set; this tool just
            # relays the subprocess's verdict.
            rec["accepted"] = bool(
                res.get("pair_valid", rec["seed_uniform"])
                and rec["pair_efficiency"] <= 1.0
            )
        with open(args.log, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(f"watch: attempt {attempt}: {json.dumps(rec)}", file=sys.stderr)
        if rec["accepted"]:
            accepted += 1
    print(
        f"watch: done — {accepted} accepted / {attempt} attempted", file=sys.stderr
    )


if __name__ == "__main__":
    main()
