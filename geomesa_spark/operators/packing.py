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
     global order of chunks; the partitioned frame is then
     localCheckpoint(eager=False)'d so BOTH passes read the SAME physical
     partitions (repartitionByRange samples with fresh seeds per query
     execution, so without the checkpoint pass 1 and pass 2 could place
     boundary rows in different partitions and the offsets would silently
     mis-assign pack ids — exactly the failure mode at 100 TB where range
     sampling is partial);
  2. pass 1: per-(partition, group) token totals — O(partitions x groups)
     rows collected to the driver (bounded: partitions and groups are both
     small relative to rows) and turned into per-(partition, group) OFFSETS
     by a prefix sum over partition ids. The collect is capped at
     `max_offset_entries` via limit(cap+1) — the driver never receives more
     rows than the cap regardless of data;
  3. pass 2: one Arrow pass per partition — sort-within, per-group local
     cumsum + broadcast offset.

Extreme group cardinality (partitions x distinct(group) > max_offset_entries,
e.g. packing keyed by a near-unique column) would blow the driver collect
and the broadcast dict, so the operator switches to an all-JVM fallback:
the per-(partition, group) offsets stay distributed, prefix-summed with a
Window over _pid WITHIN each group of the tiny totals frame (<= partitions
rows per window task), joined back on (_pid, group), and the local cumsum
becomes a Window over (_pid, group) — bounded per task by one physical
partition's rows, never by group size. The fallback costs one extra rows
shuffle (the join); the broadcast path stays the default because it
shuffles rows exactly once.

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
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _token_count(text_col):
    """Whitespace token count — matches the text_quality oracle definition
    (len(string_split(lower(text), ' ')))."""
    return F.size(F.split(F.lower(text_col), " ")).cast("long")


def _pack_via_join(
    d: DataFrame, budget: int, group_col: str, order: list
) -> DataFrame:
    """All-JVM fallback for extreme group cardinality: offsets stay
    distributed (no driver collect, no broadcast dict).

    Every Window here is bounded: the offset window runs over the TOTALS
    frame (<= n_partitions rows per group), and the cumsum window over
    (_pid, group) holds at most one physical partition's rows for that
    group — nothing serializes a whole group into one task.
    """
    totals = d.groupBy("_pid", group_col).agg(F.sum("_tok").alias("_t"))
    w_off = (
        Window.partitionBy(group_col)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_pid",
        group_col,
        F.coalesce(F.sum("_t").over(w_off), F.lit(0)).alias("_off"),
    )
    w_cum = (
        Window.partitionBy("_pid", group_col)
        .orderBy(*[F.col(c) for c in order])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    joined = d.join(offsets, ["_pid", group_col], "left")
    prefix = F.coalesce(F.sum("_tok").over(w_cum), F.lit(0)) + F.coalesce(
        F.col("_off"), F.lit(0)
    )
    # SQL `div` (integer division; tokens >= 0 so div == floor) — a double
    # `/` would lose precision on prefixes past 2^53
    out = joined.withColumn("_prefix", prefix.cast("long")).withColumn(
        "pack_id", F.expr(f"_prefix div {budget}")
    )
    keep = [c for c in d.columns] + ["pack_id"]
    return out.select(*keep)


def pack_documents(
    df: DataFrame,
    budget_tokens: int = 2048,
    group_col: str = "lang",
    order_cols: tuple = ("doc_id",),
    text_col: str = "text",
    max_offset_entries: int = 5_000_000,
) -> DataFrame:
    """Adds `n_tok` and `pack_id` (bigint, per-group sequential-fill pack).

    Documents larger than the budget get a pack to themselves (floor of a
    prefix that already crossed the boundary), packs never split a document.

    `max_offset_entries` caps how many (partition, group) offset rows the
    driver will hold/broadcast; past the cap the operator switches to the
    distributed-join fallback (see module docstring).
    """
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    order = list(order_cols)
    d = df.withColumn("_tok", _token_count(F.col(text_col)))
    d = d.repartitionByRange(group_col, *order).sortWithinPartitions(
        group_col, *order
    )
    d = d.withColumn("_pid", F.spark_partition_id())
    # Pin the physical partitions: pass 1 (totals) and pass 2 (assign) are
    # separate query executions, and repartitionByRange re-samples range
    # bounds per execution — without this, boundary rows can land in
    # different partitions between the passes and offsets mis-assign.
    # eager=False: materialized by the pass-1 action, reused by pass 2.
    d = d.localCheckpoint(eager=False)
    budget = int(budget_tokens)

    # pass 1: per-(partition, group) totals — capped collect: the driver
    # receives at most max_offset_entries+1 rows no matter the cardinality
    totals_df = d.groupBy("_pid", group_col).agg(F.sum("_tok").alias("_t"))
    totals = totals_df.limit(max_offset_entries + 1).collect()
    if len(totals) > max_offset_entries:
        out = _pack_via_join(d, budget, group_col, order)
        return out.withColumnRenamed("_tok", "n_tok").drop("_pid")

    by_group: dict = {}
    for row in sorted(totals, key=lambda r: r["_pid"]):
        g = row[group_col]
        acc = by_group.setdefault(g, [0, {}])  # [running, {pid: offset}]
        acc[1][row["_pid"]] = acc[0]
        acc[0] += row["_t"]
    offsets = {g: pids for g, (_, pids) in by_group.items()}
    spark = df.sparkSession
    b_offsets = spark.sparkContext.broadcast(offsets)

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
