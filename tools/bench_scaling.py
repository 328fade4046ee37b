"""Two-cluster-size scaling evidence (BASELINE.json north rule).

A real N vs 4N executor comparison needs a cluster; in this sandbox the same
crawl job runs at local[N] and local[4N] on the identical input (driver
instruction), and efficiency = (T_N / T_4N) / 4 — equivalently
(urls_per_sec_4N / urls_per_sec_N) / 4. Results are appended to BENCH.md.

The parallelism pair matters on one box: 8→32 saturates the single machine's
memory bandwidth (the pure extraction kernel alone only scales 0.81 there),
which a multi-node cluster does NOT do — every added node brings its own
memory channels. 2→8 stays below the wall and is the closer analog of
adding executors. Measure both; report both.

Usage: python tools/bench_scaling.py [n_pages] [cpus_lo] [cpus_hi]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, n_pages: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_MODE="crawl",
        SPARK_GRAFT_CRAWL_PAGES=str(n_pages),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 4 * lo
    factor = hi / lo
    print(f"scaling bench over {n_pages} pages: local[{lo}] ...", flush=True)
    r_lo = run_at(lo, n_pages)
    print(f"  local[{lo}]: {r_lo['crawl']}", flush=True)
    print(f"local[{hi}] ...", flush=True)
    r_hi = run_at(hi, n_pages)
    print(f"  local[{hi}]: {r_hi['crawl']}", flush=True)

    t_lo, t_hi = r_lo["crawl"]["urls_per_sec"], r_hi["crawl"]["urls_per_sec"]
    eff = (t_hi / t_lo) / factor
    result = {
        "n_pages": n_pages,
        "cpus": [lo, hi],
        f"local{lo}_urls_per_sec": t_lo,
        f"local{hi}_urls_per_sec": t_hi,
        "speedup": round(t_hi / t_lo, 3),
        "scaling_efficiency_Nto4N": round(eff, 3),
        "crawl_lo": r_lo["crawl"],
        "crawl_hi": r_hi["crawl"],
    }
    print(json.dumps(result))
    with open(os.path.join(REPO, "BENCH.md"), "a", encoding="utf-8") as f:
        f.write(
            f"\n## Scaling run (pages={n_pages}, {lo}->{hi} cores)\n\n"
            f"| parallelism | urls fetched+deduped/sec | wall (s) | rounds |\n"
            f"|---|---|---|---|\n"
            f"| local[{lo}] (N) | {t_lo} | {r_lo['crawl']['wall_s']} | {r_lo['crawl']['rounds']} |\n"
            f"| local[{hi}] ({factor:g}N) | {t_hi} | {r_hi['crawl']['wall_s']} | {r_hi['crawl']['rounds']} |\n\n"
            f"speedup N→{factor:g}N: **{round(t_hi / t_lo, 3)}×**, "
            f"scaling efficiency: **{round(eff, 3)}** "
            f"(target ≥ 0.8 per BASELINE.json)\n"
        )


if __name__ == "__main__":
    main()
