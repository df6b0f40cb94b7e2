"""Build the --py-files artifact: zip the osmcha_spark package.

Usage: python tools/make_pyfiles_zip.py [out.zip]   (default: dist/osmcha_spark.zip)

The same zip `osmcha_spark.session.ship_package` builds programmatically,
exposed as a file for the spark-submit deployment path mandated by the
engine spec (spark-submit --py-files dist/osmcha_spark.zip job.py ...).
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> str:
    pkg_dir = os.path.join(REPO, "osmcha_spark")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in sorted(files):
                if fn.endswith(".py") or fn.endswith(".yaml"):
                    full = os.path.join(root, fn)
                    rel = os.path.join(
                        "osmcha_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "dist", "osmcha_spark.zip"
    )
    print(build(out))
