#!/usr/bin/env python
"""Canonical output hashes for every declared query — the round-9 A/B
equivalence harness. For each query: collect rows, sort canonically, hash.
Any optimization must leave every hash unchanged at every SF.

Usage: python scripts/qhash.py <sf_dir> <out.json> [query ...]
"""
from __future__ import annotations

import hashlib
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    sf_dir, out_path = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    import bench

    spark = bench.make_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    import __spark_entry__ as entry

    qs = entry.queries()
    out = {}
    for name, q in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = q(spark, sf_dir)
            rows = df.collect()
            canon = sorted(
                tuple(repr(v) for v in row) for row in rows
            )
            h = hashlib.sha256(repr(canon).encode()).hexdigest()[:16]
            out[name] = {"rows": len(rows), "hash": h, "s": round(time.time() - t0, 2)}
        except Exception as exc:  # pragma: no cover
            out[name] = {"err": f"{type(exc).__name__}: {exc}"[:200]}
        print(f"{name}: {out[name]}", file=sys.stderr)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
