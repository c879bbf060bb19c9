"""Plan-size control for iterative DataFrame operators.

Iterative graph operators (pagerank, label propagation) build each
round's frame on top of the previous round's. With lazy ``persist()``
per round the *execution* is fine (the CacheManager substitutes each
round's InMemoryRelation at runtime), but the **analyzed logical plan
keeps the full nested tree**: round N's plan inlines the complete
upstream pipeline N times, so analyzer/optimizer/cache-lookup time on
the driver grows superlinearly with rounds. Measured on the round-12
tree (sf0.1, quiet host): ``label_propagation`` spent ~15 s of its
19.8 s wall in driver-side planning (its formatted plan was 4,506
lines / 646 Exchange nodes), and in-session repeats got *slower*
(33 s) as every call re-registered four more cached plans for the
matcher to scan.

:func:`lazy_local_checkpoint` truncates the lineage per round WITHOUT
running a job at construction (operators must stay action-free for
registry enumeration / plan audits — see
``test_pagerank_construction_is_lazy``):

- ``localCheckpoint(eager=False)`` converts the plan to an RDD now and
  wraps it in a ``LogicalRDD`` leaf, so downstream rounds analyze a
  one-node subtree; the RDD itself computes on the first action and is
  stored at MEMORY_AND_DISK for reuse (released by the ContextCleaner
  when the frame is garbage-collected — unlike ``persist()``, nothing
  accumulates in the CacheManager across calls).
- AQE is disabled *during the RDD conversion only*: under AQE,
  ``Dataset → RDD`` materializes every adaptive query stage (runs the
  actual shuffles), which would execute the operator at construction.
- Auto-broadcast is disabled during the conversion as well: a
  ``BroadcastHashJoinExec`` inside the converted subtree submits its
  broadcast-collect job from ``doExecute`` even without AQE. Baking
  shuffle joins into the checkpointed subtree is the scale-honest
  choice anyway — per-round label/rank frames are corpus-sized (one
  row per node) and never broadcastable at 100 TB.

Cluster note: localCheckpoint blocks are NOT fault-tolerant (lineage
is gone; a lost executor fails the query with "Checkpoint block ...
not found"). On a real cluster either accept the retry (the driver
re-runs the query) or switch to reliable ``checkpoint()`` against the
cluster checkpoint dir for multi-hour jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

AQE_KEY = "spark.sql.adaptive.enabled"
BROADCAST_KEY = "spark.sql.autoBroadcastJoinThreshold"


def lazy_local_checkpoint(df: DataFrame) -> DataFrame:
    """Truncate ``df``'s lineage to a ``LogicalRDD`` leaf without
    launching any job (see module docstring for the two conf flips)."""
    conf = df.sparkSession.conf
    prev_aqe = conf.get(AQE_KEY)
    prev_bc = conf.get(BROADCAST_KEY)
    conf.set(AQE_KEY, "false")
    conf.set(BROADCAST_KEY, "-1")
    try:
        return df.localCheckpoint(eager=False)
    finally:
        conf.set(AQE_KEY, prev_aqe)
        conf.set(BROADCAST_KEY, prev_bc)
