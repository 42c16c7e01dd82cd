"""Streaming connected components — maintain the canonical
(vertex, component = min member id) labeling of a link graph as edge
batches arrive, without ever re-running CC over the full history.

Composition of two existing pieces:
  * Structured Streaming supplies ordered, replayable micro-batches
    (`foreachBatch` + the sink checkpoint's WAL);
  * operators/incremental.py folds ONE batch into the standing
    assignment with label-sized work (the delta graph joins old labels,
    not old edges — the full edge history is never touched again).

Exactly-once without a transactional sink: state is written to
VERSIONED directories ``state_dir/v{batch_id}`` with an atomic
tmp+rename commit, and the fold is idempotent — on failure/restart
Structured Streaming replays the same batch_id with the same data, the
committed version is detected and the fold SKIPPED, so reprocessing
cannot double-apply (same recovery contract as sources/checkpoint.py,
restated for streaming). The latest committed version IS the current
assignment; `read_components` resolves it by max batch id.

Scale shape per batch: incremental_components joins the batch against
the label table twice (vertex-sized), runs hash-min CC on the
LABEL-SIZED delta graph, and rewrites the assignment — O(V) per batch,
O(Δ) for the delta CC, never O(E_history).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_VPREFIX = "v"


def _committed_versions(state_dir: str) -> list[int]:
    if not os.path.isdir(state_dir):
        return []
    out = []
    for name in os.listdir(state_dir):
        if name.startswith(_VPREFIX):
            try:
                vid = int(name[len(_VPREFIX):])
            except ValueError:
                continue
            if os.path.exists(os.path.join(state_dir, name, "_SUCCESS")):
                out.append(vid)
    return sorted(out)


def read_components(spark: SparkSession, state_dir: str) -> DataFrame:
    """Current assignment: the max committed version (empty frame if no
    batch has committed yet)."""
    versions = _committed_versions(state_dir)
    if not versions:
        return spark.createDataFrame([], "vertex long, component long")
    return spark.read.parquet(
        os.path.join(state_dir, f"{_VPREFIX}{versions[-1]}")
    )


def stream_components(
    edge_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    **cc_kwargs,
):
    """Attach the incremental-CC fold to a streaming (src, dst) frame.
    Returns the unstarted `DataStreamWriter` — callers pick the trigger
    (`.trigger(availableNow=True).start()` for drain-and-stop, default
    micro-batch otherwise)."""
    from ..operators.incremental import incremental_components

    spark = edge_stream.sparkSession

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        final_dir = os.path.join(state_dir, f"{_VPREFIX}{batch_id}")
        if os.path.exists(os.path.join(final_dir, "_SUCCESS")):
            return  # replay of a committed batch — idempotent skip
        assign = read_components(spark, state_dir)
        res = incremental_components(spark, assign, batch_df, **cc_kwargs)
        tmp_dir = os.path.join(state_dir, f"_tmp_{_VPREFIX}{batch_id}")
        res.components.write.mode("overwrite").parquet(tmp_dir)
        os.replace(tmp_dir, final_dir)  # atomic commit

    return (
        edge_stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
