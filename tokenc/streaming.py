"""Structured-Streaming encode: micro-batched appends.

The reference's writer is incremental — buffered `Write` + size-triggered
`Flush` (writer/writer.go:228-259) — with no event-time semantics. The Spark
analog is a streaming sink whose every micro-batch runs the same shuffle-free
encode and appends committed row groups; `foreachBatch` gives each batch a
deterministic epoch id, so the manifest records (epoch, rg_id) lineage and a
restarted stream resumes from the checkpoint without re-encoding committed
epochs (Spark's checkpoint + our idempotent epoch dirs).
"""

from __future__ import annotations

import os

from .engine import encode_df
from .manifest import manifest_df
from .schema import ColumnSpec


def streaming_encode(stream_df, specs: list[ColumnSpec], out_root: str, *,
                     checkpoint: str, target_raw_bytes: int = 32 << 20,
                     trigger_once: bool = True):
    """readStream DF (tokens schema) → encoded row-group appends.

    Returns the started StreamingQuery."""
    cols = [s.name for s in specs]

    def sink(batch_df, epoch_id: int):
        if batch_df.isEmpty():
            return
        data_dir = os.path.join(out_root, "data", f"epoch={epoch_id}")
        man_dir = os.path.join(out_root, "manifest", f"epoch={epoch_id}")
        enc = encode_df(batch_df, specs, target_raw_bytes=target_raw_bytes)
        enc.write.mode("overwrite").parquet(data_dir)
        spark = batch_df.sparkSession
        manifest_df(spark.read.parquet(data_dir), cols).write.mode("overwrite").parquet(man_dir)

    writer = (stream_df.writeStream
              .foreachBatch(sink)
              .option("checkpointLocation", checkpoint))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
