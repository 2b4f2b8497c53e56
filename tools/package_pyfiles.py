"""Build the --py-files archive for spark-submit.

    python tools/package_pyfiles.py [dist/engine_pyfiles.zip]

Zips the `use_case_real_time_anomaly_detection_spark` package (source
only, no caches) so executors can import it:

    spark-submit --py-files dist/engine_pyfiles.zip \\
        use_case_real_time_anomaly_detection_spark/runner.py ...
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "use_case_real_time_anomaly_detection_spark"
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> str:
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(os.path.join(ROOT, PKG)):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                z.write(full, os.path.relpath(full, ROOT))
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "dist", "engine_pyfiles.zip")
    print(build(out))
