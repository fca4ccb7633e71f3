"""Build the ``--py-files`` archive for spark-submit deployment.

Zips the ``set_sketch_paper_spark`` package (sources only, no caches) with
deterministic member order and zeroed timestamps, so the same tree always
produces a byte-identical archive — the archive hash can serve as a deploy
fingerprint next to the pipeline's config hash.

    python scripts/package_pyfiles.py [dist/set_sketch_paper_spark.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "set_sketch_paper_spark"


def build(out_path: str, repo_root: str | None = None) -> str:
    root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_dir = os.path.join(root, PKG)
    members = []
    for dirpath, dirnames, filenames in os.walk(pkg_dir):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                members.append((full, os.path.relpath(full, root)))
    if not members:
        raise FileNotFoundError(f"no python sources under {pkg_dir}")
    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, arc in members:
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "dist/set_sketch_paper_spark.zip"
    print(build(out))
