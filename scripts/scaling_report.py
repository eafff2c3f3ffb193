#!/usr/bin/env python
"""Compute N→4N scaling efficiency from two bench.py JSON outputs and write
BENCH/BASELINE.md."""

from __future__ import annotations

import json
import os
import sys


def main():
    with open(sys.argv[1]) as f:
        n8 = json.load(f)
    with open(sys.argv[2]) as f:
        n32 = json.load(f)
    rows = []
    effs = {}
    for q in ("encode", "decode"):
        t8, t32 = n8["queries"][q], n32["queries"][q]
        thr8 = n8["throughput"]["raw_bytes"] / t8 / 1e6
        thr32 = n32["throughput"]["raw_bytes"] / t32 / 1e6
        eff = thr32 / (4 * thr8)
        effs[q] = eff
        rows.append((q, t8, t32, thr8, thr32, eff))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write("# BENCH — measured throughput & scaling efficiency\n\n")
        f.write(f"Input: deterministic synthetic tokens table, "
                f"{n8['config']['n_docs']} docs × ~{n8['config']['mean_tokens']} tokens "
                f"({n8['throughput']['raw_bytes']/1e6:.0f} MB raw), seed 42.\n\n")
        f.write("Same job, same input, two parallelism levels (sandbox proxy for "
                "N vs 4N executors): `spark-submit --py-files tokenc.zip` at "
                "local[8] and local[32].\n\n")
        f.write("| stage | local[8] s | local[32] s | MB/s @8 | MB/s @32 | efficiency (thr32 / 4·thr8) |\n")
        f.write("|---|---|---|---|---|---|\n")
        for q, t8, t32, thr8, thr32, eff in rows:
            f.write(f"| {q} | {t8:.2f} | {t32:.2f} | {thr8:.1f} | {thr32:.1f} | **{eff:.3f}** |\n")
        f.write("\n## Size vs reference Parquet\n\n")
        s = n32["sizes"]
        f.write(f"- raw logical bytes: {s['raw_bytes']:,}\n")
        f.write(f"- tokenc encoded (disk, zstd container): {s['encoded_disk_bytes']:,}\n")
        f.write(f"- reference `df.write.parquet` (snappy): {s['reference_parquet_snappy_bytes']:,}\n")
        f.write(f"- **tokenc / reference = {s['vs_reference']:.3f}** (target ≤ 1.0)\n")
        f.write(f"- compression ratio vs raw: {s['ratio_vs_raw']:.2f}×\n")
        f.write("\nRaw bench JSON:\n\n```\n")
        f.write(json.dumps(n8) + "\n" + json.dumps(n32) + "\n```\n")
    print(f"encode efficiency: {effs['encode']:.3f}  decode efficiency: {effs['decode']:.3f}")
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
