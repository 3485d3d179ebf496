"""Stats DSL: the reference's server-side stat strings as Spark aggregations.

Mirrors the Stat DSL surface (geomesa-utils Stat.scala:30-127, DSL parser
189-315; distributed fold semantics AggregatingScan/StatsScan §2.4):
  Count()                      -> count
  MinMax(attr)                 -> min/max/count
  Enumeration(attr)            -> value -> count map
  TopK(attr[, k])              -> k most frequent (StreamSummary analog)
  Frequency(attr)              -> count-min sketch (Spark built-in CMS)
  Histogram(attr, bins, lo, hi)-> fixed-width bins (reference Histogram.scala)
  DescriptiveStats(a[,b...])   -> mean/var/stddev/skew/kurt per attr
  GroupBy(attr, <stat>)        -> stat per group
  <s1>;<s2>                    -> SeqStat
Every stat is one Catalyst partial+final aggregation — structurally identical
to the reference's per-server fold + client merge."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stat(df: DataFrame, spec: str):
    """Evaluate a stat-DSL string; returns a dict (or list for SeqStat)."""
    parts = _split_seq(spec)
    results = [_eval_one(df, p) for p in parts]
    return results[0] if len(results) == 1 else results


def _split_seq(spec: str) -> list[str]:
    out, depth, cur = [], 0, []
    for ch in spec:
        if ch == ";" and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            depth += ch == "("
            depth -= ch == ")"
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return [p for p in out if p]


_CALL_RE = re.compile(r"^(\w+)\((.*)\)$", re.DOTALL)


def _args(argstr: str) -> list[str]:
    out, depth, cur = [], 0, []
    for ch in argstr:
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            depth += ch == "("
            depth -= ch == ")"
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return [a.strip().strip("'\"") for a in out if a.strip()]


def _eval_one(df: DataFrame, spec: str):
    m = _CALL_RE.match(spec.strip())
    if not m:
        raise ValueError(f"bad stat spec {spec!r}")
    name = m.group(1).lower()
    args = _args(m.group(2))

    if name == "count":
        return {"stat": "Count", "count": df.count()}
    if name == "minmax":
        (a,) = args
        r = df.agg(
            F.min(a).alias("mn"), F.max(a).alias("mx"), F.count(a).alias("c")
        ).collect()[0]
        return {"stat": "MinMax", "attribute": a, "min": r.mn, "max": r.mx, "count": r.c}
    if name == "enumeration":
        (a,) = args
        rows = df.groupBy(a).count().collect()
        return {"stat": "Enumeration", "attribute": a, "values": {r[a]: r["count"] for r in rows}}
    if name == "topk":
        a = args[0]
        k = int(args[1]) if len(args) > 1 else 10
        rows = (
            df.groupBy(a).count().orderBy(F.desc("count"), F.asc(a)).limit(k).collect()
        )
        return {"stat": "TopK", "attribute": a, "topk": [(r[a], r["count"]) for r in rows]}
    if name == "frequency":
        a = args[0]
        eps = float(args[1]) if len(args) > 1 else 0.005
        conf = float(args[2]) if len(args) > 2 else 0.99
        r = df.agg(
            F.count_min_sketch(F.col(a), F.lit(eps), F.lit(conf), F.lit(42)).alias("cms")
        ).collect()[0]
        return {"stat": "Frequency", "attribute": a, "cms_bytes": bytes(r.cms)}
    if name == "histogram":
        a, bins, lo, hi = args[0], int(args[1]), float(args[2]), float(args[3])
        width = (hi - lo) / bins
        b = F.when(
            (F.col(a) >= lo) & (F.col(a) <= hi),
            F.least(F.floor((F.col(a) - lo) / width), F.lit(bins - 1)),
        ).otherwise(F.lit(-1))
        rows = df.groupBy(b.alias("bin")).count().collect()
        counts = [0] * bins
        below_above = 0
        for r in rows:
            if r.bin is not None and r.bin >= 0:
                counts[int(r.bin)] = r["count"]
            else:
                below_above += r["count"]
        return {
            "stat": "Histogram", "attribute": a, "bins": bins,
            "lower": lo, "upper": hi, "counts": counts, "outside": below_above,
        }
    if name == "descriptivestats":
        aggs = []
        for a in args:
            aggs += [
                F.count(a).alias(f"{a}_count"),
                F.avg(a).alias(f"{a}_mean"),
                F.var_pop(a).alias(f"{a}_variance"),
                F.stddev_pop(a).alias(f"{a}_stddev"),
                F.skewness(a).alias(f"{a}_skewness"),
                F.kurtosis(a).alias(f"{a}_kurtosis"),
                F.min(a).alias(f"{a}_min"),
                F.max(a).alias(f"{a}_max"),
            ]
        r = df.agg(*aggs).collect()[0].asDict()
        out = {"stat": "DescriptiveStats", "attributes": list(args)}
        out.update(r)
        # covariance matrix for attribute pairs (DescriptiveStats.scala)
        for i, a in enumerate(args):
            for b in args[i + 1 :]:
                out[f"cov_{a}_{b}"] = df.agg(F.covar_pop(a, b)).collect()[0][0]
        return out
    if name == "groupby":
        a = args[0]
        inner = spec.strip()[len("GroupBy(") + 0 :]
        # re-extract the inner stat spec (everything after the first comma)
        inner_spec = m.group(2).split(",", 1)[1].strip()
        groups = [r[a] for r in df.select(a).distinct().collect()]
        return {
            "stat": "GroupBy",
            "attribute": a,
            "groups": {
                g: _eval_one(df.filter(F.col(a) == g), inner_spec) for g in groups
            },
        }
    if name == "z3histogram":
        # per-time-bin counts (reference Z3Histogram: histogram keyed by the
        # z3 time bin) — expects the indexed table's week_bin column
        col = args[0] if args else "week_bin"
        rows = df.groupBy(col).count().collect()
        return {"stat": "Z3Histogram", "bins": {r[col]: r["count"] for r in rows}}
    if name == "z3frequency":
        # count-min sketch over the z3 key (reference Z3Frequency)
        col = args[0] if args else "z3"
        r = df.agg(
            F.count_min_sketch(F.col(col), F.lit(0.005), F.lit(0.99), F.lit(42)).alias("cms")
        ).collect()[0]
        return {"stat": "Z3Frequency", "attribute": col, "cms_bytes": bytes(r.cms)}
    if name == "iteratorstackcount":
        return {"stat": "IteratorStackCount", "count": df.rdd.getNumPartitions()}
    raise ValueError(f"unknown stat {name!r}")


def approx_count_distinct(df: DataFrame, col: str, rsd: float = 0.05) -> int:
    """HyperLogLog cardinality (reference HyperLogLog.scala analog —
    Spark's HLL++ built-in)."""
    return df.agg(F.approx_count_distinct(col, rsd)).collect()[0][0]
