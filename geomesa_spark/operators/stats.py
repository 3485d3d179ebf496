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
to the reference's per-server fold + client merge.

Unbounded domains NEVER fully collect to the driver: Enumeration / GroupBy /
Z3Histogram return their full result as a lazy DataFrame under the "df" key
and a driver-side dict CAPPED at `max_enum` values (most frequent first,
"truncated": True when the cap hit) — the reference's Stat results are
bounded sketches, not whole attribute domains."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# driver-side cap for enumerated domains (Enumeration/GroupBy/Z3Histogram
# dicts); the full domain stays distributed in the "df" result
MAX_ENUM = 10_000


def stat(df: DataFrame, spec: str, max_enum: int = MAX_ENUM):
    """Evaluate a stat-DSL string; returns a dict (or list for SeqStat)."""
    parts = _split_seq(spec)
    results = [_eval_one(df, p, max_enum) for p in parts]
    return results[0] if len(results) == 1 else results


def _capped(rows_df: DataFrame, order_cols, max_enum: int):
    """Collect at most max_enum+1 rows (deterministic order); flag overflow."""
    rows = rows_df.orderBy(*order_cols).limit(max_enum + 1).collect()
    return rows[:max_enum], len(rows) > max_enum


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


def _eval_one(df: DataFrame, spec: str, max_enum: int = MAX_ENUM):
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
        counts = df.groupBy(a).count()
        rows, truncated = _capped(counts, [F.desc("count"), F.asc(a)], max_enum)
        return {
            "stat": "Enumeration",
            "attribute": a,
            "values": {r[a]: r["count"] for r in rows},
            "truncated": truncated,
            "df": counts,
        }
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
        # ONE distributed aggregation over all groups — never a driver loop
        # of per-group filters, never a distinct().collect() of the domain
        a = args[0]
        inner_spec = m.group(2).split(",", 1)[1].strip()
        gdf, row_to_stat = _groupby_agg(df, a, inner_spec)
        rows, truncated = _capped(gdf, [F.asc(a)], max_enum)
        return {
            "stat": "GroupBy",
            "attribute": a,
            "groups": {r[a]: row_to_stat(r) for r in rows},
            "truncated": truncated,
            "df": gdf,
        }
    if name == "z3histogram":
        # per-time-bin counts (reference Z3Histogram: histogram keyed by the
        # z3 time bin) — expects the indexed table's week_bin column
        col = args[0] if args else "week_bin"
        counts = df.groupBy(col).count()
        rows, truncated = _capped(counts, [F.asc(col)], max_enum)
        return {
            "stat": "Z3Histogram",
            "bins": {r[col]: r["count"] for r in rows},
            "truncated": truncated,
            "df": counts,
        }
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


def _groupby_agg(df: DataFrame, group_col: str, inner_spec: str):
    """Compile GroupBy(group, <inner>) to ONE groupBy().agg() pass. Returns
    (grouped DataFrame, row -> inner-stat-dict converter)."""
    m = _CALL_RE.match(inner_spec.strip())
    if not m:
        raise ValueError(f"bad inner stat spec {inner_spec!r}")
    name = m.group(1).lower()
    args = _args(m.group(2))

    if name == "count":
        gdf = df.groupBy(group_col).agg(F.count("*").alias("count"))
        return gdf, lambda r: {"stat": "Count", "count": r["count"]}
    if name == "minmax":
        (a,) = args
        gdf = df.groupBy(group_col).agg(
            F.min(a).alias("mn"), F.max(a).alias("mx"), F.count(a).alias("c")
        )
        return gdf, lambda r: {
            "stat": "MinMax", "attribute": a, "min": r["mn"], "max": r["mx"], "count": r["c"]
        }
    if name == "descriptivestats":
        aggs = []
        for a in args:
            aggs += [
                F.count(a).alias(f"{a}_count"),
                F.avg(a).alias(f"{a}_mean"),
                F.var_pop(a).alias(f"{a}_variance"),
                F.stddev_pop(a).alias(f"{a}_stddev"),
                F.min(a).alias(f"{a}_min"),
                F.max(a).alias(f"{a}_max"),
            ]
        gdf = df.groupBy(group_col).agg(*aggs)

        def conv(r):
            out = {"stat": "DescriptiveStats", "attributes": list(args)}
            out.update({k: v for k, v in r.asDict().items() if k != group_col})
            return out

        return gdf, conv
    if name == "enumeration":
        (a,) = args
        gdf = (
            df.groupBy(group_col, a)
            .count()
            .groupBy(group_col)
            .agg(F.map_from_entries(F.collect_list(F.struct(a, "count"))).alias("values"))
        )
        return gdf, lambda r: {
            "stat": "Enumeration", "attribute": a, "values": dict(r["values"])
        }
    if name == "topk":
        a = args[0]
        k = int(args[1]) if len(args) > 1 else 10
        from pyspark.sql.window import Window

        counts = df.groupBy(group_col, a).count()
        w = Window.partitionBy(group_col).orderBy(F.desc("count"), F.asc(a))
        ranked = counts.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") <= k)
        gdf = ranked.groupBy(group_col).agg(
            F.collect_list(F.struct(a, F.col("count"))).alias("topk")
        )
        return gdf, lambda r: {
            "stat": "TopK", "attribute": a,
            "topk": sorted(((e[a], e["count"]) for e in r["topk"]), key=lambda t: (-t[1], t[0])),
        }
    raise ValueError(f"GroupBy does not support inner stat {name!r}")


def approx_count_distinct(df: DataFrame, col: str, rsd: float = 0.05) -> int:
    """HyperLogLog cardinality (reference HyperLogLog.scala analog —
    Spark's HLL++ built-in)."""
    return df.agg(F.approx_count_distinct(col, rsd)).collect()[0][0]
