#!/usr/bin/env python
"""Build dist/geomesa_spark.zip for spark-submit --py-files."""

import os
import zipfile

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
pkg = os.path.join(root, "geomesa_spark")
dist = os.path.join(root, "dist")
os.makedirs(dist, exist_ok=True)
out = os.path.join(dist, "geomesa_spark.zip")
with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
    for r, _dirs, files in os.walk(pkg):
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(r, f)
                zf.write(full, os.path.join("geomesa_spark", os.path.relpath(full, pkg)))
print(out)
