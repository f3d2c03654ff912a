#!/usr/bin/env python3
"""Build the --py-files zip for spark-submit.

    python scripts/make_pyfiles.py [dist_dir]   # default ./dist

Produces <dist>/spanmarkerner_spark_pkg.zip containing the package at
top level, importable on every executor via
`spark-submit --py-files <zip>`.
"""

from __future__ import annotations

import os
import shutil
import sys


def build(dist_dir: str = "dist") -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_dir = os.path.join(repo, "spanmarkerner_spark")
    os.makedirs(dist_dir, exist_ok=True)
    zip_path = shutil.make_archive(
        os.path.join(dist_dir, "spanmarkerner_spark_pkg"),
        "zip",
        root_dir=repo,
        base_dir=os.path.basename(pkg_dir),
    )
    return zip_path


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else "dist"))
