"""Aggregate a Spark event log by job description (the crawl phase labels).

Companion to gap_profile.py: with the round-6 setJobDescription labels
(r<k>:eligibility / fetch_parse_dedup_probe / stats / discover /
commit:<table>, init_frontier, compact), prints per-phase merged wall time
and driver gaps attributed to the next job's phase.

Usage: python tools/phase_profile.py <decompressed-event-log-file>
(decompress rolling .zstd event logs with: zstd -d -c events_*.zstd > log)
"""
import json, sys, collections

path = sys.argv[1]
jobs = {}
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
                "desc": (ev.get("Properties") or {}).get("spark.job.description", "?"),
            }
        elif e == "SparkListenerJobEnd":
            j = jobs.get(ev["Job ID"])
            if j is not None:
                j["end"] = ev["Completion Time"]

done = sorted((j for j in jobs.values() if "end" in j), key=lambda j: j["start"])
if not done:
    sys.exit("no jobs")
t0 = done[0]["start"]

# per-description: merged wall (union of intervals), job count
by = collections.defaultdict(list)
for j in done:
    by[j["desc"]].append((j["start"], j["end"]))

rows = []
for desc, iv in by.items():
    iv.sort()
    merged = []
    for a, b in iv:
        if merged and a <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], b)
        else:
            merged.append([a, b])
    wall = sum(b - a for a, b in merged) / 1000.0
    rows.append((wall, len(iv), desc))
rows.sort(reverse=True)
print(f"{'wall_s':>8} {'jobs':>5}  description")
for wall, n, desc in rows[:40]:
    print(f"{wall:8.2f} {n:5d}  {desc[:100]}")

# driver gaps attributed to the NEXT job's description
merged = []
for j in done:
    if merged and j["start"] <= merged[-1][1]:
        merged[-1][1] = max(merged[-1][1], j["end"])
    else:
        merged.append([j["start"], j["end"]])
gaps = collections.defaultdict(float)
gap_list = []
prev_end = merged[0][1]
for seg in merged[1:]:
    if seg[0] > prev_end:
        nxt = next((j for j in done if j["start"] >= seg[0]), None)
        d = (nxt or {}).get("desc", "?")
        gaps[d] += (seg[0] - prev_end) / 1000.0
        gap_list.append((seg[0] - prev_end, prev_end - t0, d))
    prev_end = max(prev_end, seg[1])
print(f"\ndriver-gap total: {sum(gaps.values()):.1f}s; by next-job description:")
for d, s in sorted(gaps.items(), key=lambda kv: -kv[1])[:25]:
    print(f"{s:8.2f}  {d[:100]}")
print("\ntop individual gaps:")
for dur, at, d in sorted(gap_list, reverse=True)[:20]:
    print(f"{dur/1000:8.2f}s at +{at/1000:7.1f}s  before: {d[:90]}")
