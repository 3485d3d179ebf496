"""Document packing: assign docs to fixed-token-budget packs (training-batch
sharding for LLM data pipelines — the step between dedup/quality filtering
and tokenized shard writing).

Sequential-fill semantics, deterministic and engine-independent: within each
group (default: language), documents are taken in `order_cols` order and the
pack id is floor(prefix_tokens / budget) where prefix_tokens is the
cumulative token count EXCLUDING the current document — i.e. packs are
consecutive ~budget-token runs of the ordered stream. Oracle-checkable with
one SQL window cumsum.

Scale posture (the reason this is not a Window): `Window.partitionBy(group)
.orderBy(order)` serializes each group into ONE task — at 100 TB a language
group is ~the whole corpus and the job never finishes. This implementation
is the classic two-pass distributed prefix sum:

  1. range-repartition by (group, order) — Spark's RangePartitioner assigns
     ascending key ranges to ascending partition ids, so partition id IS the
     global order of chunks;
  2. pass 1: per-(partition, group) token totals — O(partitions x groups)
     rows collected to the driver (bounded: partitions and groups are both
     small relative to rows) and turned into per-(partition, group) OFFSETS
     by a prefix sum over partition ids;
  3. pass 2: one Arrow pass per partition — sort-within, per-group local
     cumsum + broadcast offset.

Both passes are single-shuffle + narrow; nothing grows with total row count
on any single node. The pass-1 totals job reuses pass-2's range exchange as
a skipped stage (same lineage), so the full rows shuffle ONCE.

Conscious trade-off: the document payload rides one Arrow round trip
through the assign pass (column pruning cannot cross mapInPandas). The
JVM-only alternative — a window over (group, partition_id) with broadcast
offsets — would instead HASH-exchange the full rows a second time, which
costs more than the Arrow hop; and the realistic pipeline writes packed
rows with their content anyway, so the payload must flow through here
regardless.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _token_count(text_col):
    """Whitespace token count — matches the text_quality oracle definition
    (len(string_split(lower(text), ' ')))."""
    return F.size(F.split(F.lower(text_col), " ")).cast("long")


def pack_documents(
    df: DataFrame,
    budget_tokens: int = 2048,
    group_col: str = "lang",
    order_cols: tuple = ("doc_id",),
    text_col: str = "text",
) -> DataFrame:
    """Adds `n_tok` and `pack_id` (bigint, per-group sequential-fill pack).

    Documents larger than the budget get a pack to themselves (floor of a
    prefix that already crossed the boundary), packs never split a document.
    """
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    order = list(order_cols)
    d = df.withColumn("_tok", _token_count(F.col(text_col)))
    d = d.repartitionByRange(group_col, *order).sortWithinPartitions(
        group_col, *order
    )
    d = d.withColumn("_pid", F.spark_partition_id())
    # pass 1: per-(partition, group) totals — O(partitions x groups) rows
    totals = (
        d.groupBy("_pid", group_col)
        .agg(F.sum("_tok").alias("_t"))
        .collect()
    )
    by_group: dict = {}
    for row in sorted(totals, key=lambda r: r["_pid"]):
        g = row[group_col]
        acc = by_group.setdefault(g, [0, {}])  # [running, {pid: offset}]
        acc[1][row["_pid"]] = acc[0]
        acc[0] += row["_t"]
    offsets = {g: pids for g, (_, pids) in by_group.items()}
    spark = df.sparkSession
    b_offsets = spark.sparkContext.broadcast(offsets)
    budget = int(budget_tokens)

    cols = [f.name for f in d.schema.fields] + ["pack_id"]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in d.schema.fields
    ) + ", pack_id bigint"

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one invocation per PARTITION; Arrow slices the partition into
        # multiple batches, so per-group running totals must carry across
        # them (a per-batch cumsum would silently reset pack boundaries
        # every ~20k rows)
        running: dict = {}
        for pdf in batches:
            if pdf.empty:
                continue
            # partition data is sorted by sortWithinPartitions and batches
            # are consecutive slices; this re-sort is a stable no-op kept as
            # a guard against upstream ordering changes
            pdf = pdf.sort_values([group_col] + order, kind="mergesort")
            local = pdf.groupby(group_col, sort=False)["_tok"].cumsum() - pdf["_tok"]
            start = pd.Series(
                [running.get(g, 0) for g in pdf[group_col]], index=pdf.index
            )
            off = pd.Series(
                [
                    b_offsets.value.get(g, {}).get(p, 0)
                    for g, p in zip(pdf[group_col], pdf["_pid"])
                ],
                index=pdf.index,
            )
            pdf["pack_id"] = ((local + start + off) // budget).astype("int64")
            for g, s in pdf.groupby(group_col, sort=False)["_tok"].sum().items():
                running[g] = running.get(g, 0) + int(s)
            yield pdf[cols]

    return (
        d.mapInPandas(assign, schema=out_schema)
        .withColumnRenamed("_tok", "n_tok")
        .drop("_pid")
    )
