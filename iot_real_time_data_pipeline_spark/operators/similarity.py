"""Vector similarity search over an embedding column (array<float>).

Two paths, as a real 100 TB pipeline would ship them:

- ``cosine_topk``   : exact brute-force top-k — the correctness baseline.
                      The query set broadcasts; each partition scores its
                      own vectors independently (embarrassingly parallel),
                      and per-query top-k is a window over a pre-pruned
                      candidate set.
- ``ivf_topk``      : IVF-style approximate search. A cheap coarse
                      quantizer (sign bits of the leading dimensions)
                      assigns every vector to one of 2^b buckets; queries
                      probe only their own bucket. Scan cost drops by the
                      bucket count; recall is tunable via b.
- ``label_centroids``: per-label mean vector via positional explode —
                      the bulk "embedding aggregation" primitive
                      (cluster centroids, class prototypes).

Dot products use ``zip_with`` + a left-to-right ``aggregate`` fold so the
accumulation order is deterministic and matches the DuckDB oracle
(list_reduce) bit-for-bit before the final 6 dp rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IVF_BITS = 4  # 16 coarse buckets


def _fold_sum(arr: F.Column) -> F.Column:
    """Deterministic left fold sum of a double array."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: F.Column, b: F.Column) -> F.Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: x * y))


def norm(a: F.Column) -> F.Column:
    return F.sqrt(_fold_sum(F.transform(a, lambda x: x * x)))


def as_double(a: F.Column) -> F.Column:
    return F.transform(a, lambda x: x.cast("double"))


def coarse_bucket(emb: F.Column, bits: int = IVF_BITS) -> F.Column:
    """Sign-bit quantizer over the first ``bits`` dimensions -> int."""
    bucket = F.lit(0)
    for i in range(bits):
        bucket = bucket + F.when(
            F.element_at(emb, i + 1) > 0, F.lit(2**i)
        ).otherwise(F.lit(0))
    return bucket


def _scored_pairs(queries: DataFrame, corpus: DataFrame, join_on=None) -> DataFrame:
    """Broadcast the query set against the corpus and score cosine."""
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        as_double(F.col("embedding")).alias("qe"),
        *([F.col("bucket").alias("q_bucket")] if join_on == "bucket" else []),
    )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        as_double(F.col("embedding")).alias("ce"),
        *([F.col("bucket")] if join_on == "bucket" else []),
    )
    if join_on == "bucket":
        joined = c.join(F.broadcast(q), F.col("q_bucket") == F.col("bucket"), "inner")
    else:
        joined = c.crossJoin(F.broadcast(q))
    return (
        joined.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            dot(F.col("qe"), F.col("ce")) / (norm(F.col("qe")) * norm(F.col("ce"))),
        )
        .select("query_id", "neighbor_id", "cosine")
    )


def _topk(scored: DataFrame, k: int) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
        )
    )


def cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Exact brute-force cosine top-k for each query vector.

    At 100 TB: the query set is the broadcast side (typically thousands
    of probes), the corpus streams through in place — no shuffle of the
    corpus; the only shuffle is the per-query top-k reduction, whose
    input the window pre-prunes.
    """
    return _topk(_scored_pairs(queries, embeddings), k)


def ivf_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 3, bits: int = IVF_BITS
) -> DataFrame:
    """IVF-bucketed approximate top-k: probe only the query's bucket.

    The bucket id is a pure map-side expression, so the corpus join is a
    hash join on a tiny int key; within-bucket scoring is identical to
    the exact path. Recall < 1 by design — this is the scale path.
    """
    eb = embeddings.withColumn("bucket", coarse_bucket(as_double(F.col("embedding")), bits))
    qb = queries.withColumn("bucket", coarse_bucket(as_double(F.col("embedding")), bits))
    return _topk(_scored_pairs(qb, eb, join_on="bucket"), k)


def cosine_dup_pairs(embeddings: DataFrame, threshold: float = 0.45) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact, upper triangle).

    The correctness baseline: scores every i<j pair. O(n²/2) by
    definition — run it on candidate sets, not corpora. The scale path
    is the same scoring after LSH/IVF candidate generation
    (``ivf_topk``'s bucket join), trading recall for the quadratic;
    exact cosine thresholding admits no lossless prefilter.
    """
    e = embeddings.select(
        F.col("vec_id"), as_double(F.col("embedding")).alias("v")
    )
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("qe"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("ce"))
    return (
        b.crossJoin(F.broadcast(a))
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn(
            "cosine",
            dot(F.col("qe"), F.col("ce")) / (norm(F.col("qe")) * norm(F.col("ce"))),
        )
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", F.round("cosine", 6).alias("cosine"))
    )


def label_centroids(embeddings: DataFrame) -> DataFrame:
    """Per-label mean embedding, long form (label, pos, centroid).

    posexplode + groupBy(label, pos): partial aggregation compresses the
    shuffle to one partial sum per (label, pos, partition) — the
    standard distributed centroid plan.
    """
    exploded = embeddings.select(
        "label", F.posexplode(as_double(F.col("embedding"))).alias("pos", "v")
    )
    return (
        exploded.groupBy("label", (F.col("pos") + 1).cast("long").alias("dim"))
        .agg(F.round(F.avg("v"), 6).alias("centroid"))
    )
