"""Hybrid retrieval fusion — the query-time op a curation stack runs
on top of its two index families (the BM25/postings side built by
``text_analysis`` and the ANN side built by ``similarity``).

Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
``score(d) = Σ_systems 1 / (K + rank_system(d))`` with K = 60. RRF is
the standard way to combine a lexical and a dense ranking without
score calibration — only RANKS cross the system boundary, so the
BM25-ish weights and the cosine values never need to share a scale.

Cross-engine determinism: the fused score is computed on the integer
ppb grid (``1e9 div (K + rank)``), ranks come from integer-weighted
overlap (sparse) and the already-gate-proven cosine ordering (dense),
and every tie breaks on ``doc_id`` — no float comparison anywhere in
the fusion itself.

Scale shape at 100 TB: the sparse side is a postings join whose
high-df tokens are dropped BEFORE the join (df-cap, the stop-token
bound every inverted index uses), with the tiny query-doc side as the
build side; the dense side is :func:`similarity.cosine_topk`'s
broadcast-queries corpus scan. Fusion itself touches only
|queries| × (k_dense + k_sparse) rows — driver-free, shuffle ∝ the
candidate lists, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import texthash as TH
from . import similarity as SIM

RRF_K = 60               # the SIGIR-2009 constant; rank damping
RRF_SCALE = 1_000_000_000  # integer ppb grid for 1/(K+rank)
RRF_DF_CAP = 200         # tokens in more docs than this are stopwords
RRF_LIST_K = 10          # per-system candidate-list depth
RRF_TOPK = 5             # fused results kept per query


def sparse_topk(
    docs: DataFrame,
    k: int = RRF_LIST_K,
    df_cap: int = RRF_DF_CAP,
    query_mod: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Lexical more-like-this ranking: for each query doc (``doc_id %
    query_mod == 0``) rank the corpus by inverse-df-weighted DISTINCT
    token overlap — the integer-exact stand-in for per-query BM25
    (same idf-weighted intersection, no length norm; the fusion only
    consumes the RANKS).

    Plan: one distinct-token postings table feeds both df and the
    query↔candidate join; df > df_cap postings are dropped before the
    join, bounding it at df_cap rows per token. Returns
    ``(query_id, sparse_rank, doc_id, overlap_w)``.
    """
    posts = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.array_distinct(TH.tokens(F.col(text_col)))).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    dfreq = posts.groupBy("tok").agg(F.count("*").alias("df"))
    w = dfreq.filter(F.col("df") <= df_cap).select(
        "tok", F.expr("CAST(1000000 AS BIGINT) div df").alias("w")
    )
    wp = posts.join(w, "tok")
    # weight comes from the candidate side; the query side carries only
    # (query_id, tok) — same token, same w, and it keeps the self-join
    # free of an ambiguous duplicate column.
    qp = wp.filter(F.col("doc_id") % query_mod == 0).select(
        F.col("doc_id").alias("query_id"), "tok"
    )
    overlap = (
        wp.join(F.broadcast(qp), "tok")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("w").cast("long").alias("overlap_w"))
    )
    rank_w = Window.partitionBy("query_id").orderBy(
        F.col("overlap_w").desc(), F.col("doc_id")
    )
    return (
        overlap.withColumn("sparse_rank", F.row_number().over(rank_w))
        .filter(F.col("sparse_rank") <= k)
        .select(
            "query_id",
            F.col("sparse_rank").cast("long").alias("sparse_rank"),
            "doc_id",
            "overlap_w",
        )
    )


def rrf_fusion(
    docs: DataFrame,
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = RRF_TOPK,
    list_k: int = RRF_LIST_K,
    rrf_k: int = RRF_K,
    df_cap: int = RRF_DF_CAP,
    query_mod: int = 50,
) -> DataFrame:
    """Fuse the lexical and dense candidate lists per query with RRF.

    A candidate absent from one list contributes 0 from that system
    (the standard RRF convention); its reported rank is 0. Returns
    ``(query_id, rank, doc_id, rrf_ppb, dense_rank, sparse_rank)``.
    """
    dense = SIM.cosine_topk(embeddings, queries, k=list_k).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").cast("long").alias("dense_rank"),
    )
    sparse = sparse_topk(
        docs, k=list_k, df_cap=df_cap, query_mod=query_mod
    ).select("query_id", "doc_id", "sparse_rank")
    fused = (
        dense.join(sparse, ["query_id", "doc_id"], "full_outer")
        .withColumn(
            "rrf_ppb",
            F.coalesce(
                F.expr(f"CAST({RRF_SCALE} AS BIGINT) div ({rrf_k} + dense_rank)"),
                F.lit(0).cast("long"),
            )
            + F.coalesce(
                F.expr(f"CAST({RRF_SCALE} AS BIGINT) div ({rrf_k} + sparse_rank)"),
                F.lit(0).cast("long"),
            ),
        )
    )
    rank_w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_ppb").desc(), F.col("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "doc_id",
            "rrf_ppb",
            F.coalesce(F.col("dense_rank"), F.lit(0).cast("long")).alias(
                "dense_rank"
            ),
            F.coalesce(F.col("sparse_rank"), F.lit(0).cast("long")).alias(
                "sparse_rank"
            ),
        )
    )
