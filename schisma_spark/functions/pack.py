"""Sequence PACKING for training pipelines: assign documents to
fixed-token-budget context windows.

No reference analog (kettek/schisma is a single-value validator); this is
a training-data-pipeline extension in the same family as dedup/curation.
Two strategies, both deterministic:

- ``chunk`` (default, oracle-able): the GPT-style concatenate-then-chunk
  assignment. Documents are sharded, ordered by id within a shard, laid
  end-to-end, and the token stream is cut every ``budget`` tokens; each
  document is assigned the chunk containing its FIRST token (``seq_id``)
  plus the chunk containing its last (``end_seq`` — a long document can
  span several). Pure window arithmetic: exclusive prefix-sum of token
  counts, then integer division. One shuffle (by shard); every window is
  shard-local, so at 100 TB the sort is bounded by shard size — there is
  NO global window (n_shards scales with the cluster, and the shard hash
  is uniform by construction).
- ``greedy`` (next-fit): T5-style packing WITHOUT splitting — a document
  that does not fit the open window closes it and starts the next; a
  document longer than the budget gets a window of its own. Sequential
  per shard (the recurrence is inherently ordered), parallel across
  shards via ``applyInPandas`` — the per-shard group is the unit a real
  packer materializes anyway. Verified against a pure-Python reference
  in tests; not SQL-expressible, so no DuckDB twin (driver records the
  rows-only check for it — the ``chunk`` twin is the hash-green oracle).

Every input row yields exactly one output row (NULL/blank text packs as
0 tokens at its offset — the curation gates upstream decide whether it
should have been dropped; packing never drops).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from schisma_spark.functions.portable import hash32
from schisma_spark.functions.text import token_count_ws

PACK_SCHEMA = ("{id} {id_type}, tokens long, shard long, seq_id long, "
               "offset long, end_seq long")


def _tokens(df: DataFrame, text_col: str, token_col: str | None) -> Column:
    if token_col is not None:
        return F.coalesce(F.col(token_col).cast("long"), F.lit(0))
    return F.coalesce(token_count_ws(F.col(text_col)).cast("long"),
                      F.lit(0))


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 2048,
    token_col: str | None = None,
    n_shards: int | None = None,
    strategy: str = "chunk",
) -> DataFrame:
    """Per-document window assignment: ``id, tokens, shard, seq_id,
    offset, end_seq``.

    ``seq_id`` is shard-local (a global window id, when needed, is
    ``shard * max_seqs + seq_id`` — kept factored so the output is
    stable under re-sharding of everything else). ``offset`` is the
    token offset of the document's first token inside ``seq_id``;
    ``end_seq`` is the window holding its last token (== seq_id for
    ``greedy``, which never splits).

    ``token_col`` supplies a precomputed token count (e.g. from a real
    tokenizer run); default derives whitespace counts from ``text_col``.
    The unit is arbitrary: pass decoded-byte or pixel counts as
    ``token_col`` to pack IMAGE rows into fixed-memory GPU batches with
    the same machinery. The shard hash is the portable md5 prefix so the
    chunk strategy has an exact DuckDB twin.

    ``n_shards`` bounds the per-task work on BOTH strategies: each
    shard is one sorted window partition (chunk) / one pandas group
    (greedy), so a shard must fit a task — the default derives
    ``4 x defaultParallelism`` from the session (a plan-time constant,
    no job), but a 10^12-row corpus on a big cluster should pass an
    explicit count sized so rows/n_shards stays in task range.
    Determinism caveat: the assignment is deterministic GIVEN n_shards —
    pin it explicitly when two runs (or an oracle) must agree across
    differently-sized sessions.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_shards is None:
        n_shards = 4 * df.sparkSession.sparkContext.defaultParallelism
    base = df.select(
        F.col(id_col),
        _tokens(df, text_col, token_col).alias("tokens"),
        (hash32(F.col(id_col).cast("string")) % n_shards).alias("shard"),
    )
    if strategy == "chunk":
        w = (Window.partitionBy("shard").orderBy(id_col)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        start = (F.sum("tokens").over(w) - F.col("tokens")).alias("_start")
        out = base.select(id_col, "tokens", "shard", start)
        seq = F.floor(F.col("_start") / budget)
        end = F.floor(
            (F.col("_start") + F.greatest(F.col("tokens"), F.lit(1)) - 1)
            / budget)
        return out.select(
            id_col, "tokens", "shard",
            seq.alias("seq_id"),
            (F.col("_start") - seq * budget).alias("offset"),
            end.alias("end_seq"),
        )
    if strategy == "greedy":
        import pandas as pd

        _id = id_col

        def _pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
            pdf = pdf.sort_values(_id)
            seqs, offs = [], []
            seq, fill = 0, 0
            for tok in pdf["tokens"]:
                if fill > 0 and fill + tok > budget:
                    seq, fill = seq + 1, 0
                offs.append(fill)
                seqs.append(seq)
                fill += tok
            pdf = pdf.assign(seq_id=seqs, offset=offs)
            pdf["end_seq"] = pdf["seq_id"]
            return pdf[[_id, "tokens", "shard", "seq_id", "offset",
                        "end_seq"]]

        id_type = base.schema[id_col].dataType.simpleString()
        return base.groupBy("shard").applyInPandas(
            _pack, PACK_SCHEMA.format(id=id_col, id_type=id_type))
    raise ValueError(f"unknown strategy {strategy!r}")


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """One-row fill report over a :func:`pack_sequences` result:
    ``n_docs, n_seqs, total_tokens, fill_rate``. ``n_seqs`` counts every
    window any document STARTS in per shard (``max(end_seq)+1`` — chunk
    windows a long document merely passes through still exist).
    ``fill_rate = total_tokens / (n_seqs * budget)`` — the fraction of
    the training batch that is real data rather than padding (chunk
    packing trails only the final partial window per shard; greedy also
    pays per-window tail gaps). Aggregates are map-side partial; the
    by-shard stage is at most ``n_shards`` rows."""
    per_shard = packed.groupBy("shard").agg(
        F.count(F.lit(1)).alias("docs"),
        (F.max("end_seq") + 1).alias("seqs"),
        F.sum("tokens").alias("toks"),
    )
    # empty input: global sums over zero rows are NULL — report a real
    # all-zero row (callers int()/float() the metrics into manifests)
    return per_shard.agg(
        F.coalesce(F.sum("docs"), F.lit(0)).cast("long").alias("n_docs"),
        F.coalesce(F.sum("seqs"), F.lit(0)).cast("long").alias("n_seqs"),
        F.coalesce(F.sum("toks"), F.lit(0)).cast("long")
         .alias("total_tokens"),
        F.coalesce(F.round(F.sum("toks") / (F.sum("seqs") * budget), 6),
                   F.lit(0.0)).alias("fill_rate"),
    )
