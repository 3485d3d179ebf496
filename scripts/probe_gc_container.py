"""Probe: container-direction GC predicates, batch refine vs scalar loop.

Shape: ONE heterogeneous GEOMETRYCOLLECTION (polygon + line) against 5,000
distinct small rects — the worst case for partner-keyed evidence grouping
(every row its own group) and the best case for the GC-keyed reverse
coverage evidence added in r8.

r8 measurement on this host (local, pure numpy path, no Spark):
    within  : batch 1.2 s   scalar 10.1 s  (covby_rev2 alone decides —
              coverage by a closure implies interior-interior)
    crosses : batch 0.4 s   scalar 10.7 s  (ii + rev covby decide)
    overlaps: batch 4.6 s   scalar  8.9 s  (areal forward evidence is
              GC-keyed after the r8 role swap; the residual cost is the
              line/point families' partner-keyed groups — a one-multiline-
              vs-many-areal-partners kernel does not exist)
    covers  : batch 2.3 s   scalar  9.3 s  (AND-shaped rows whose areal
              coverage already failed lazily skip the per-partner
              line/point kernels)

Run: python scripts/probe_gc_container.py
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import pandas as pd

from geomesa_spark.geom import algorithms as alg
from geomesa_spark.geom.wkb import to_wkb
from geomesa_spark.geom.wkt import from_wkt
from geomesa_spark.operators.spatial_join import _pairwise_predicate_fn


def main():
    gc = from_wkt(
        "GEOMETRYCOLLECTION (POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0)), "
        "LINESTRING (10 10, 15 15))"
    )
    rng = np.random.default_rng(3)
    bs = []
    for _ in range(5000):
        x0, y0 = rng.uniform(0, 8, 2).round(2)
        bs.append(
            from_wkt(
                f"POLYGON (({x0} {y0}, {x0 + 1} {y0}, {x0 + 1} {y0 + 1}, "
                f"{x0} {y0 + 1}, {x0} {y0}))"
            )
        )
    lw = pd.Series([bytes(to_wkb(b)) for b in bs], dtype=object)
    rw = pd.Series([bytes(to_wkb(gc))] * len(bs), dtype=object)
    for pred in ("within", "overlaps", "crosses", "covers"):
        fn = _pairwise_predicate_fn(pred)
        t0 = time.time()
        got = fn(lw, rw)
        t_b = time.time() - t0
        t0 = time.time()
        want = [getattr(alg, pred)(b, gc) for b in bs]
        t_s = time.time() - t0
        ok = all(bool(g) == w for g, w in zip(got, want))
        assert ok, pred
        print(f"{pred}: batch {t_b:.2f}s scalar {t_s:.2f}s parity={ok}")


if __name__ == "__main__":
    main()
