"""North-rule scaling evidence: run the identical tile-assignment job at
local[8] (N) and local[32] (4N) on the same input and report throughput at
both plus efficiency = throughput(32) / (4 * throughput(8)).

No real cluster exists in this sandbox; two parallelism levels on the same
box are the sanctioned stand-in (see BASELINE.md). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geo_epic_spark import synth
from geo_epic_spark.operators.spatial import pip_join
from geo_epic_spark.session import get_spark

N_IMG = int(os.environ.get("SCALING_N_IMG", "400000"))
N_POLY = 2000
REPEATS = 2


def run_at(cpus: int) -> float:
    spark = get_spark(cpus, f"scaling-{cpus}", extra_conf={
        "spark.sql.shuffle.partitions": str(max(cpus, 8)),
    })
    imgs = synth.images_meta_df(spark, N_IMG).select("i", "cx", "cy")
    flds = synth.fields_df(spark, N_POLY).select("poly_id", "xs", "ys")
    # warm-up (JVM + python worker pool)
    pip_join(imgs.limit(2000), flds, res=0.05, lon="cx", lat="cy").count()
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.time()
        pip_join(imgs, flds, res=0.05, lon="cx", lat="cy").count()
        best = min(best, time.time() - t0)
    spark.stop()
    return best


def main() -> None:
    t8 = run_at(8)
    t32 = run_at(32)
    thr8, thr32 = N_IMG / t8, N_IMG / t32
    eff = thr32 / (4 * thr8)
    print(json.dumps({
        "job": "tile_assign (PIP join)",
        "n_images": N_IMG,
        "n_polys": N_POLY,
        "sec_local8": round(t8, 2),
        "sec_local32": round(t32, 2),
        "rows_per_sec_local8": round(thr8),
        "rows_per_sec_local32": round(thr32),
        "scaling_efficiency_8_to_32": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
