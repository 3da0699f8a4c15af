"""Build dist/etl_spark.zip for ``spark-submit --py-files``.

Usage: python tools/make_pyfiles.py [out_zip]
The zip contains the ``etl_spark`` package only (no tests/bench) — ship
it with ``spark-submit --py-files dist/etl_spark.zip tools/replay_job.py
<wal> <table> <state>`` so every executor can import the package.
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(out: str = "dist/etl_spark.zip") -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "etl_spark")
    os.makedirs(os.path.dirname(os.path.join(root, out)) or ".", exist_ok=True)
    out_path = os.path.join(root, out)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, names in os.walk(pkg):
            for n in sorted(names):
                if not n.endswith(".py"):
                    continue
                full = os.path.join(dirpath, n)
                z.write(full, os.path.relpath(full, root))
    return out_path


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else "dist/etl_spark.zip"))
