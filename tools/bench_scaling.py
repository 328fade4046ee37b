"""Two-cluster-size scaling evidence (BASELINE.json north rule).

A real N vs 4N executor comparison needs a cluster; in this sandbox the same
crawl job runs at local[8] and local[32] on the identical input (driver
instruction), and efficiency = (T8 / T32) / 4 — equivalently
(urls_per_sec_32 / urls_per_sec_8) / 4. Results are appended to BENCH.md.

Usage: python tools/bench_scaling.py [n_pages]
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
    print(f"scaling bench over {n_pages} pages: local[8] ...", flush=True)
    r8 = run_at(8, n_pages)
    print(f"  local[8]: {r8['crawl']}", flush=True)
    print("local[32] ...", flush=True)
    r32 = run_at(32, n_pages)
    print(f"  local[32]: {r32['crawl']}", flush=True)

    t8, t32 = r8["crawl"]["urls_per_sec"], r32["crawl"]["urls_per_sec"]
    eff = (t32 / t8) / 4.0
    result = {
        "n_pages": n_pages,
        "local8_urls_per_sec": t8,
        "local32_urls_per_sec": t32,
        "speedup_8_to_32": round(t32 / t8, 3),
        "scaling_efficiency_Nto4N": round(eff, 3),
        "crawl8": r8["crawl"],
        "crawl32": r32["crawl"],
    }
    print(json.dumps(result))
    with open(os.path.join(REPO, "BENCH.md"), "a", encoding="utf-8") as f:
        f.write(
            f"\n## Scaling run (pages={n_pages})\n\n"
            f"| parallelism | urls fetched+deduped/sec | wall (s) | rounds |\n"
            f"|---|---|---|---|\n"
            f"| local[8] (N) | {t8} | {r8['crawl']['wall_s']} | {r8['crawl']['rounds']} |\n"
            f"| local[32] (4N) | {t32} | {r32['crawl']['wall_s']} | {r32['crawl']['rounds']} |\n\n"
            f"speedup N→4N: **{round(t32 / t8, 3)}×**, "
            f"scaling efficiency: **{round(eff, 3)}** "
            f"(target ≥ 0.8 per BASELINE.json)\n"
        )


if __name__ == "__main__":
    main()
