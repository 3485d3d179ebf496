#!/usr/bin/env python
"""spark-submit entry point (north rule: "runs via spark-submit --py-files on
multi-executor clusters").

Usage:
  python scripts/build_pyfiles.py              # -> dist/geomesa_spark.zip
  spark-submit --py-files dist/geomesa_spark.zip scripts/submit_job.py \
      --job index --input /data/docs --output /data/docs_indexed
  spark-submit --py-files dist/geomesa_spark.zip scripts/submit_job.py \
      --job join --input /data/docs_indexed --polys /data/regions \
      --output /data/joined --predicate intersects

Jobs: index | filter | join | knn | density | tiles.
In cluster mode the SparkSession master/conf come from spark-submit; locally
this falls back to local[*]."""

from __future__ import annotations

import argparse
import json
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--job", required=True, choices=["index", "filter", "join", "knn", "density", "tiles"])
    ap.add_argument("--input", required=True)
    ap.add_argument("--output")
    ap.add_argument("--polys")
    ap.add_argument("--geometry", help="query WKT for --job filter")
    ap.add_argument("--predicate", default="intersects")
    ap.add_argument("--zoom", type=int, default=8)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--queries", help="JSON [[qid,lon,lat],...] for knn")
    ap.add_argument("--bbox", help="minx,miny,maxx,maxy for density")
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=256)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(f"geomesa-spark-{args.job}").getOrCreate()
    import geomesa_spark

    geomesa_spark.init_sql(spark)

    from geomesa_spark.operators.density import density, tile_counts
    from geomesa_spark.operators.knn import knn
    from geomesa_spark.operators.spatial_join import spatial_join
    from geomesa_spark.plans.planner import spatial_filter
    from geomesa_spark.sources.docs import index_docs, write_indexed

    df = spark.read.parquet(args.input)

    if args.job == "index":
        out = index_docs(df)
        write_indexed(out, args.output)
    else:
        if args.job == "filter":
            out = spatial_filter(df, args.geometry, args.predicate)
        elif args.job == "join":
            polys = spark.read.parquet(args.polys)
            out = spatial_join(df, polys, predicate=args.predicate)
        elif args.job == "knn":
            qs = [(q[0], float(q[1]), float(q[2])) for q in json.loads(args.queries)]
            out = knn(df, qs, k=args.k)
        elif args.job == "density":
            bbox = tuple(float(v) for v in args.bbox.split(","))
            out = density(df, bbox, args.width, args.height)
        elif args.job == "tiles":
            out = tile_counts(df, args.zoom)
        if args.output:
            out.write.mode("overwrite").parquet(args.output)
        else:
            out.show(20, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
