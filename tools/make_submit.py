"""Package the engine for `spark-submit --py-files` (the north rule's
cluster deployment shape): zip the pure-Python `kgspark` package into
dist/kgspark.zip. Executors unpack it onto their PYTHONPATH, so the one
artifact serves every job script in tools/.

Usage:
    python tools/make_submit.py [out_zip]
    spark-submit --master <cluster> --py-files dist/kgspark.zip \
        tools/submit_build_graph.py --input <pages table> --output <store root>
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_zip: str | None = None) -> str:
    out_zip = out_zip or os.path.join(REPO, "dist", "kgspark.zip")
    os.makedirs(os.path.dirname(out_zip), exist_ok=True)
    pkg = os.path.join(REPO, "kgspark")
    n = 0
    # deterministic archive: sorted walk, zeroed timestamps — re-running
    # on an unchanged tree produces a byte-identical artifact
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in sorted(os.walk(pkg)):
            dirs[:] = sorted(d for d in dirs if d != "__pycache__")
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                arc = os.path.relpath(full, REPO)
                info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
                info.compress_type = zipfile.ZIP_DEFLATED
                info.external_attr = 0o644 << 16
                with open(full, "rb") as fh:
                    zf.writestr(info, fh.read())
                n += 1
    print(f"{out_zip}: {n} modules")
    return out_zip


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else None)
