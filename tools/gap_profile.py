"""Event-log gap profiler: where does the parallelism-independent wall live?

Parses a Spark event log (spark.eventLog.enabled=true) and reports, over the
whole application:

  1. DRIVER GAPS — wall intervals with zero jobs running (Catalyst analysis,
     file listing, py4j round-trips, manifest IO). Top gaps are attributed to
     the job that STARTED at the gap's end (its name says what was planned).
  2. STAGE QUANTIZATION — per stage: wall (submission->completion), sum of
     task run times, max task, and the overhead ratio
     wall * slots / task_time (1.0 = perfectly packed waves).

Usage:
  SPARK_GRAFT_EXTRA_CONF='{"spark.eventLog.enabled":"true",
      "spark.eventLog.dir":"file:///tmp/spark-events"}' \
      SPARK_GRAFT_CPUS=8 ... python bench.py
  python tools/gap_profile.py /tmp/spark-events/<app-id> [slots]
"""

from __future__ import annotations

import json
import sys


def main(path: str, slots: int) -> None:
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    t_min, t_max = None, None
    with open(path, encoding="utf-8") as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {
                    "start": ev["Submission Time"],
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    )[:90],
                }
            elif e == "SparkListenerJobEnd":
                j = jobs.get(ev["Job ID"])
                if j is not None:
                    j["end"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                st = stages.setdefault(si["Stage ID"], {"task_ms": 0, "max_task": 0,
                                                        "n_tasks": 0})
                st["name"] = si["Stage Name"][:70]
                st["wall"] = si.get("Completion Time", 0) - si.get(
                    "Submission Time", si.get("Completion Time", 0)
                )
            elif e == "SparkListenerTaskEnd":
                st = stages.setdefault(ev["Stage ID"], {"task_ms": 0, "max_task": 0,
                                                        "n_tasks": 0})
                ti = ev.get("Task Info", {})
                dur = ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
                st["task_ms"] += dur
                st["n_tasks"] += 1
                st["max_task"] = max(st["max_task"], dur)
    done = [j for j in jobs.values() if "end" in j]
    done.sort(key=lambda j: j["start"])
    if not done:
        print("no completed jobs")
        return
    t_min = done[0]["start"]
    t_max = max(j["end"] for j in done)
    total = (t_max - t_min) / 1000.0
    # merge job intervals; gaps = complement
    merged = []
    for j in done:
        if merged and j["start"] <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], j["end"])
        else:
            merged.append([j["start"], j["end"]])
    gaps = []
    prev_end = merged[0][1]
    for seg in merged[1:]:
        if seg[0] > prev_end:
            # attribute to the first job starting at/after the gap end
            nxt = next((j for j in done if j["start"] >= seg[0]), None)
            gaps.append((prev_end, seg[0], (nxt or {}).get("desc", "")))
        prev_end = max(prev_end, seg[1])
    gap_total = sum(b - a for a, b, _ in gaps) / 1000.0
    print(f"app wall (first job start -> last job end): {total:.1f}s   "
          f"driver-gap total: {gap_total:.1f}s  ({100*gap_total/total:.1f}%)")
    print(f"\ntop driver gaps (>0.2s) of {len(gaps)}:")
    for a, b, desc in sorted(gaps, key=lambda g: g[0] - g[1])[:25]:
        if b - a < 200:
            break
        print(f"  {(b-a)/1000.0:6.2f}s  at +{(a-t_min)/1000.0:7.1f}s  next-job: {desc}")
    print("\nstage packing (wall*slots vs task-time; worst overhead first):")
    rows = []
    for sid, st in stages.items():
        if "wall" not in st or st["task_ms"] <= 0 or st["wall"] <= 0:
            continue
        overhead = st["wall"] * slots / st["task_ms"]
        waste = (st["wall"] * slots - st["task_ms"]) / 1000.0
        rows.append((waste, overhead, sid, st))
    rows.sort(reverse=True)
    for waste, overhead, sid, st in rows[:15]:
        print(f"  stage {sid:4d} wall {st['wall']/1000:7.1f}s tasks {st['n_tasks']:4d} "
              f"task-sum {st['task_ms']/1000:8.1f}s max-task {st['max_task']/1000:6.1f}s "
              f"idle-slot-waste {waste:7.1f}core-s  {st['name']}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 8)
