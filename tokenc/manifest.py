"""Manifest + resumable slice-commit protocol.

The reference finalizes a file with ColumnIndex/OffsetIndex + footer
(writer/writer.go:142-225); a killed write loses everything. Our distributed
analog commits per SLICE (a deterministic subset of input docs): each slice
writes data + a manifest + a commit marker with input lineage; a restarted
job skips slices whose marker matches the lineage fingerprint. This is the
north rule's "resumable restart from the last committed partition manifest".

Layout under an output root:
    data/slice=K/*.parquet      encoded row groups (blobs + per-column meta)
    manifest/slice=K/*.parquet  one row per (rg_id, column): codec + stats
    _commit/slice_K.json        lineage: fingerprint, rows, bytes, timings
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F


def slice_paths(out_root: str, k: int) -> tuple[str, str, str]:
    return (
        os.path.join(out_root, "data", f"slice={k}"),
        os.path.join(out_root, "manifest", f"slice={k}"),
        os.path.join(out_root, "_commit", f"slice_{k}.json"),
    )


def is_committed(out_root: str, k: int, fingerprint: str) -> bool:
    _, _, marker = slice_paths(out_root, k)
    if not os.path.exists(marker):
        return False
    try:
        with open(marker) as f:
            meta = json.load(f)
        return meta.get("fingerprint") == fingerprint
    except Exception:
        return False


def commit_slice(out_root: str, k: int, fingerprint: str, **extra) -> None:
    _, _, marker = slice_paths(out_root, k)
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"fingerprint": fingerprint, "committed_at": time.time(), **extra}, f)
    os.replace(tmp, marker)  # atomic commit


def manifest_df(enc_df, columns: list[str]):
    """Encoded row-group DF → long manifest: (rg_id, n_rows, column, codec,
    n_values, null_count, raw_bytes, enc_bytes, min_json, max_json).
    ONE scan: per-column meta structs explode into the long shape (the
    old per-column projection + unionAll read the encoded table once per
    column — N_columns× the I/O on every slice commit)."""
    def _entry(c: str):
        return F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}_meta.codec").alias("codec"),
            F.col(f"{c}_meta.n_values").alias("n_values"),
            F.col(f"{c}_meta.null_count").alias("null_count"),
            F.col(f"{c}_meta.raw_bytes").alias("raw_bytes"),
            F.col(f"{c}_meta.enc_bytes").alias("enc_bytes"),
            F.col(f"{c}_meta.min_json").alias("min_json"),
            F.col(f"{c}_meta.max_json").alias("max_json"))

    return (enc_df
            .select("rg_id", "n_rows",
                    F.explode(F.array(*[_entry(c) for c in columns]))
                    .alias("m"))
            .select("rg_id", "n_rows", "m.column", "m.codec", "m.n_values",
                    "m.null_count", "m.raw_bytes", "m.enc_bytes",
                    "m.min_json", "m.max_json"))


def fingerprint_input(desc: dict) -> str:
    """Deterministic lineage fingerprint from an input description."""
    import hashlib

    return hashlib.sha1(json.dumps(desc, sort_keys=True).encode()).hexdigest()
