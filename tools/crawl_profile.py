"""Round-6 crawl-loop profiler (guide §1): run the EXACT bench.py frontier
fixture (imported from the frozen bench module — nothing re-implemented)
under a session with the Spark event log enabled, then print a per-job
timeline (job id, submit/complete, duration, #tasks, description) so the
per-round flat costs can be attributed to specific jobs.

Usage:
  python tools/crawl_profile.py          # run fixture + print job timeline
  BENCH_FRONTIER_URLS=... etc. are honored exactly as in bench.py.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = os.environ.get("PROFILE_EVDIR", "/dev/shm/fcs-events")


def main() -> None:
    if "--parse-only" in sys.argv:
        parse()
        return
    import shutil

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)

    import bench
    from facebook_crawler_spark.session import get_spark

    cpus = bench.CPUS
    spark = get_spark(
        app_name="fcs-crawl-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
        },
    )
    t0 = time.perf_counter()
    stats = bench.run_frontier(spark)
    wall = time.perf_counter() - t0
    print(json.dumps({"frontier": stats, "wall": round(wall, 3)}))
    spark.stop()
    parse()


def parse() -> None:
    # parse the event log: job-level timeline
    logs = sorted(
        p
        for p in glob.glob(os.path.join(EVDIR, "**", "*"), recursive=True)
        if os.path.isfile(p)
        and "appstatus" not in os.path.basename(p)
        and not os.path.basename(p).startswith(".")
    )

    def _open(path):
        if path.endswith(".zstd"):
            import io  # noqa: PLC0415
            import subprocess  # noqa: PLC0415

            out = subprocess.run(
                ["zstd", "-dc", path], capture_output=True, check=True
            ).stdout
            return io.TextIOWrapper(io.BytesIO(out))
        return open(path)
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    for path in logs:
        with _open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    jid = ev["Job ID"]
                    props = ev.get("Properties") or {}
                    jobs[jid] = {
                        "start": ev["Submission Time"],
                        "desc": props.get("spark.job.description")
                        or props.get("callSite.short", ""),
                        "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                        "ntasks": sum(
                            s.get("Number of Tasks", 0) for s in ev.get("Stage Infos", [])
                        ),
                    }
                elif e == "SparkListenerJobEnd":
                    jid = ev["Job ID"]
                    if jid in jobs:
                        jobs[jid]["end"] = ev["Completion Time"]
                elif e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    stages[si["Stage ID"]] = {
                        "name": si.get("Stage Name", ""),
                        "ntasks": si.get("Number of Tasks", 0),
                        "dur": (si.get("Completion Time", 0) - si.get("Submission Time", 0))
                        / 1000.0
                        if si.get("Submission Time")
                        else None,
                    }
    first = min(j["start"] for j in jobs.values()) if jobs else 0
    print("\n# job timeline (t_rel_s  dur_s  ntasks  desc)", file=sys.stderr)
    for jid in sorted(jobs):
        j = jobs[jid]
        dur = (j.get("end", j["start"]) - j["start"]) / 1000.0
        rel = (j["start"] - first) / 1000.0
        names = " | ".join(
            f"{stages[s]['name'][:40]}({stages[s]['ntasks']})"
            for s in j["stages"]
            if s in stages
        )
        print(
            f"job {jid:4d}  t={rel:8.2f}  dur={dur:7.3f}  tasks={j['ntasks']:5d}  {j['desc'][:60]} :: {names[:160]}",
            file=sys.stderr,
        )
    # gap analysis: driver-side time not covered by any job
    iv = sorted((j["start"], j.get("end", j["start"])) for j in jobs.values())
    covered = 0
    cur_s, cur_e = iv[0]
    gaps = []
    for s, e in iv[1:]:
        if s > cur_e:
            gaps.append((cur_e, s))
            covered += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    covered += cur_e - cur_s
    total = iv[-1][1] - iv[0][0]
    print(
        f"\n# jobs cover {covered/1000.0:.2f}s of {total/1000.0:.2f}s span; "
        f"{(total-covered)/1000.0:.2f}s in {len(gaps)} driver-side gaps",
        file=sys.stderr,
    )
    biggest = sorted(gaps, key=lambda g: g[1] - g[0], reverse=True)[:15]
    for s, e in biggest:
        print(f"  gap t={(s-first)/1000.0:8.2f} -> {(e-first)/1000.0:8.2f}  ({(e-s)/1000.0:.3f}s)", file=sys.stderr)


if __name__ == "__main__":
    main()
