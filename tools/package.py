"""Build dist/engine.zip for spark-submit --py-files.

The zip carries the pure-Python engine package; the driver script (crawl.py)
stays outside the zip as the spark-submit primary resource. Usage:

    python tools/package.py
    spark-submit --master yarn --py-files dist/engine.zip crawl.py --seeds ...
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str | None = None) -> str:
    out = out or os.path.join(REPO, "dist", "engine.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(REPO, "gh_crawler_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    print(build())
