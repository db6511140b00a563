"""Sequence packing and corpus mixing — the last mile between a cleaned
corpus (ml/dedup, ml/text, ml/decontam, ml/splits) and a training run.

`pack_sequences`: assign documents to fixed-token-budget training
sequences — greedy first-fit-in-order over a deterministic document
order, the form every training pipeline uses. The greedy fold is
genuinely stateful (the current sequence's remaining budget carries
forward), so this is the documented `applyInPandas` case: an
Arrow-batched linear pass per shard group, parallel across shards,
reproducible across runs. Sequences never exceed the budget; documents
longer than the budget sit alone, flagged `oversize` (pre-split them
upstream).

`mix_corpus`: deterministic per-source sampling rates (e.g. wiki 2×
upsampled epochs are expressed as rate > 1 handled by the caller; here
rates in [0,1] select a stable subset). Reuses the content-addressed
bucket from ml/splits so a document's inclusion is stable across runs and
engines — re-running the pipeline yields the same mixture, which keeps
training reproducible and dedup/decontam decisions consistent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mempool_dumpster_spark.ml.splits import split_bucket


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    partition_cols: list[str] | None = None,
    n_shards: int = 64,
    shard_col: str = "shard",
) -> DataFrame:
    """First-fit-in-order packing: documents ordered by `id_col` (within
    `partition_cols`, e.g. a split or shard key) accumulate into
    sequences of at most `max_tokens`. Adds:

    - `seq_id`: 0-based sequence number within the partition;
    - `oversize`: 1 when the document alone exceeds the budget (it gets
      its own sequence; split such docs upstream).

    When `partition_cols` is not given, the input is AUTO-SHARDED by a
    content-addressed bucket of `id_col` (ml.splits.split_bucket, md5 mod
    `n_shards`) and a `shard_col` LONG column is added to the output —
    the sequence key is then `(shard, seq_id)`. Without this, the whole
    corpus would flow through ONE applyInPandas group (one task, one
    Arrow transfer of every row — dead at any real scale). Packing is
    per-shard in any real pipeline anyway; the shard assignment is stable
    across runs, partition layouts, and engines. Pass `n_shards=1` to
    explicitly opt into single-group global packing for small inputs.

    Exact greedy is a stateful fold (the unused tail of the current
    sequence carries forward), which no composition of window functions
    expresses — a pure `floor(cumsum/budget)` bucketing can OVERSHOOT the
    budget when a straddling document resets the origin (e.g. 500, 999,
    499 at budget 1000 would co-locate 999+499). This is therefore the
    `applyInPandas` case: one Arrow-batched linear pass per partition
    group, deterministic order by `id_col` inside the group. Sequences
    never exceed the budget (oversize docs sit alone, flagged).
    Parallelism = number of partition groups."""
    from pyspark.sql.types import LongType, StructField, StructType

    parts = list(partition_cols or [])
    if not parts:
        if n_shards < 1:
            raise ValueError(f"n_shards must be >= 1, got {n_shards}")
        if shard_col in df.columns:
            raise ValueError(
                f"auto-shard column {shard_col!r} already exists; pass it in "
                f"partition_cols to pack by it, or rename via shard_col="
            )
        df = df.withColumn(
            shard_col, split_bucket(id_col, n_buckets=n_shards).cast("long")
        )
        parts = [shard_col]
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("seq_id", LongType(), False),
            StructField("oversize", LongType(), False),
        ]
    )

    def fold(pdf):
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        seq, fill = 0, 0
        seqs = []
        for t in pdf[token_col].astype("int64"):
            if fill > 0 and fill + t > max_tokens:
                seq += 1
                fill = 0
            seqs.append(seq)
            fill += t
        pdf["seq_id"] = seqs
        pdf["oversize"] = (pdf[token_col].astype("int64") > max_tokens).astype(
            "int64"
        )
        return pdf

    return df.groupBy(*parts).applyInPandas(fold, schema=out_schema)


def mix_corpus(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
) -> DataFrame:
    """Keep a deterministic `rate` fraction of each source's documents
    (rate in [0, 1]; sources absent from `rates` use `default_rate`).
    Selection is content-addressed (md5 bucket of the id, same primitive
    as ml.splits), so the kept subset is stable across runs, partition
    layouts, and engines — and independent of the split assignment because
    the bucket is salted with the source name."""
    for src, r in rates.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for {src!r} must be in [0,1], got {r}")
    # coalesce both salt parts: concat is null-propagating, and a NULL
    # bucket would silently DROP the row in the filter below (NULL < x is
    # never true) — NULL-source docs must still respect default_rate
    salted = F.concat(
        F.coalesce(F.col(source_col), F.lit("")),
        F.lit(":"),
        F.coalesce(F.col(id_col).cast("string"), F.lit("")),
    )
    bucket = split_bucket(salted, n_buckets=10_000)
    rate_expr = None
    for src, r in rates.items():
        cond = F.col(source_col) == src
        rate_expr = (
            F.when(cond, F.lit(r)) if rate_expr is None else rate_expr.when(cond, F.lit(r))
        )
    rate_expr = (
        rate_expr.otherwise(F.lit(default_rate))
        if rate_expr is not None
        else F.lit(default_rate)
    )
    return df.filter(bucket < rate_expr * 10_000)


def budget_fill(
    df: DataFrame,
    token_budgets: dict[str, int],
    token_col: str = "n_tokens",
    source_col: str = "source",
    id_col: str = "doc_id",
    order_col: str | None = None,
    default_budget: int = 0,
) -> DataFrame:
    """Keep each source's highest-priority documents until its TOKEN budget
    fills — the mixture primitive real training runs use (budgets are set
    in tokens, not document rates; `mix_corpus` covers the rate form).

    Documents are taken in `order_col` DESCENDING order (quality score,
    dedup priority, …), tiebroken by `id_col` so the cut is total; with no
    `order_col`, a content-addressed md5 bucket of the id orders them —
    uniform-random-but-stable, same determinism contract as ml.splits. A
    document is kept only if it fits ENTIRELY within the remaining budget
    of its running total (inclusive cumulative sum ≤ budget): no partial
    documents, deterministic across engines and partitionings.

    One shuffle (window over source); the cumulative sum is a running
    aggregate, not a self-join — at 100 TB the cost is a sort within each
    source's partitions, and skewed sources are exactly the ones whose
    budget cut discards most rows early at the read."""
    from pyspark.sql import Window

    if order_col is None:
        order = split_bucket(F.col(id_col).cast("string"), n_buckets=1_000_000)
        ordering = [order.asc(), F.col(id_col).asc()]
    else:
        ordering = [F.col(order_col).desc(), F.col(id_col).asc()]
    w = Window.partitionBy(source_col).orderBy(*ordering)
    budget = None
    for src, b in token_budgets.items():
        if b < 0:
            raise ValueError(f"budget for {src!r} must be >= 0, got {b}")
        cond = F.col(source_col) == src
        budget = F.when(cond, F.lit(b)) if budget is None else budget.when(cond, F.lit(b))
    budget = (
        budget.otherwise(F.lit(default_budget))
        if budget is not None
        else F.lit(default_budget)
    )
    cum = F.sum(F.col(token_col)).over(w)
    return (
        df.withColumn("__cum", cum)
        .filter(F.col("__cum") <= budget)
        .drop("__cum")
    )


def sample_per_group(
    df: DataFrame,
    n: int,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic `n`-per-group sample: rank rows within each group by
    the content-addressed md5 bucket of their id (uniform-but-stable
    pseudo-order, tiebroken by id) and keep rank ≤ n. Unlike
    `df.sampleBy`, the selection is independent of partition layout, seed
    plumbing, and engine — re-running the pipeline re-picks the same rows,
    so downstream dedup/decontam decisions stay consistent. One window
    shuffle on the group key."""
    from pyspark.sql import Window

    if n < 0:
        raise ValueError(f"n must be >= 0, got {n}")
    order = split_bucket(F.col(id_col).cast("string"), n_buckets=1_000_000)
    w = Window.partitionBy(group_col).orderBy(order.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .drop("__rk")
    )


def training_order(
    df: DataFrame,
    seed: str = "",
    id_col: str = "doc_id",
    out_col: str = "order_key",
) -> DataFrame:
    """Content-addressed global shuffle order for a training epoch:
    `out_col` = md5(seed ‖ '|' ‖ id). Sorting by it is a uniform
    pseudo-random permutation that is DETERMINISTIC across engines,
    partitionings, and re-runs (the same determinism contract as
    ml.splits) — no rand() whose retry/speculation behavior could
    reorder an epoch — and each `seed` (epoch number) gives an
    independent permutation. At scale, write with
    `shuffle_for_training`: repartitionByRange + sortWithinPartitions
    give a total order ACROSS output files without any single-partition
    global sort."""
    return df.withColumn(
        out_col,
        F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string"))),
    )


def shuffle_for_training(
    df: DataFrame,
    seed: str = "",
    id_col: str = "doc_id",
    n_partitions: int | None = None,
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """`training_order` materialization plan: range-partition on the order
    key and sort within partitions, so reading files in partition order
    streams the epoch's permutation with NO global sort bottleneck (the
    range exchange samples boundaries; each partition sorts locally —
    the same layout contract as sources/clustered.py).

    `tiebreakers` orders rows that share an order key — the packed-corpus
    case, where `id_col` is the SEQUENCE identity (all rows of a packed
    sequence must stay adjacent, in pack order) and the tiebreaker is the
    document id within the sequence."""
    ordered = training_order(df, seed=seed, id_col=id_col)
    parts = (
        ordered.repartitionByRange(n_partitions, "order_key")
        if n_partitions
        else ordered.repartitionByRange("order_key")
    )
    return parts.sortWithinPartitions("order_key", *(tiebreakers or []))


def shuffle_packed_for_training(
    packed: DataFrame,
    seed: str = "",
    id_col: str = "doc_id",
    n_partitions: int | None = None,
) -> DataFrame:
    """Epoch-shuffle a PACKED corpus (output of `pack_prepped` /
    `pack_sequences`, identity (split, shard, seq_id)) for training
    consumption: the permutation unit is the SEQUENCE — its member
    documents stay adjacent and in pack order (`id_col`) — and the order
    key is content-addressed from the sequence identity, so the epoch
    order is deterministic across engines and re-runs. Written
    range-partitioned (see `shuffle_for_training`), reading the output
    files in name order streams the epoch: zero-padded part numbers rank
    by task, tasks rank by disjoint order-key ranges, rows within a task
    are sorted — the `prep --pack-tokens --training-order SEED` path.

    The within-partition sort leads with `split`: the packed companion
    is written `partitionBy("split")`, and Spark's V1 file writer
    injects its own NON-STABLE sort on the partition columns whenever
    the child ordering doesn't already lead with them — which would
    scramble the epoch order inside each task. Leading with `split`
    satisfies the writer's required ordering, so no extra sort is
    planned and the (order_key, id) order survives to disk. Cross-file
    order within a split still holds: the range exchange is on
    order_key alone, so a task's rows for any split occupy a disjoint
    key range."""
    for c in ("split", "shard", "seq_id"):
        if c not in packed.columns:
            raise ValueError(
                f"packed frame is missing sequence-identity column {c!r}; "
                "expected pack_prepped/pack_sequences output"
            )
    keyed = packed.withColumn(
        "__seq_identity",
        F.concat_ws(
            "|",
            F.col("split"),
            F.col("shard").cast("string"),
            F.col("seq_id").cast("string"),
        ),
    )
    ordered = training_order(keyed, seed=seed, id_col="__seq_identity")
    parts = (
        ordered.repartitionByRange(n_partitions, "order_key")
        if n_partitions
        else ordered.repartitionByRange("order_key")
    )
    return parts.sortWithinPartitions(
        "split", "order_key", id_col
    ).drop("__seq_identity")
