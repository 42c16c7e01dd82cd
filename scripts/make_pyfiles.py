"""Package the engine for spark-submit --py-files: dist/cc3d_spark.zip.

Usage: python scripts/make_pyfiles.py  →  prints the zip path.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "connected_components_3d_spark"


def build(dist_dir: str | None = None) -> str:
    dist = dist_dir or os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "cc3d_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg_root = os.path.join(REPO, PKG)
        for root, _dirs, files in os.walk(pkg_root):
            for name in sorted(files):
                if not name.endswith(".py"):
                    continue
                path = os.path.join(root, name)
                zf.write(path, os.path.relpath(path, REPO))
    return out


if __name__ == "__main__":
    print(build())
