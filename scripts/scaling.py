"""North-rule scaling evidence: run the identical tile-assignment job at
local[8] (N) and local[32] (4N) on the same input and report throughput at
both plus efficiency = throughput(32) / (4 * throughput(8)).

No real cluster exists in this sandbox; two parallelism levels on the same
box are the sanctioned stand-in (see BASELINE.md). Each level runs in a
FRESH subprocess/JVM (a stopped SparkContext leaves thread pools and codegen
caches behind that contaminate the second measurement), and the input is
sized so the job is compute-bound for tens of seconds — fixed overhead
(session start, broadcast build, Python<->JVM handshakes) must be amortized
or the measurement reads scheduler noise, not scaling.

Usage:
  python scripts/scaling.py            # orchestrate both levels, print JSON
  python scripts/scaling.py --run 8    # (internal) one measurement
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_IMG = int(os.environ.get("SCALING_N_IMG", "24000000"))
N_POLY = int(os.environ.get("SCALING_N_POLY", "2000"))
REPEATS = int(os.environ.get("SCALING_REPEATS", "2"))


def measure(cpus: int) -> dict:
    from geo_epic_spark import synth
    from geo_epic_spark.operators.spatial import pip_join
    from geo_epic_spark.session import get_spark

    spark = get_spark(cpus, f"scaling-{cpus}", extra_conf={
        # 4 tasks per core: the candidate count per partition varies with
        # polygon density, so finer tasks smooth stragglers at both levels.
        "spark.sql.shuffle.partitions": str(4 * cpus),
        "spark.default.parallelism": str(4 * cpus),
        "spark.locality.wait": "0",
        # identical heap at both levels so GC headroom is not the variable
        "spark.driver.memory": "64g",
    })
    imgs = synth.images_meta_df(spark, N_IMG).select("i", "cx", "cy")
    flds = synth.fields_df(spark, N_POLY).select("poly_id", "xs", "ys")

    def job():
        return pip_join(imgs, flds, res=0.05, lon="cx", lat="cy").count()

    # warm-up: full-size run primes JVM JIT, codegen cache, broadcast
    rows = job()
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.time()
        job()
        best = min(best, time.time() - t0)
    spark.stop()
    return {"cpus": cpus, "sec": best, "result_rows": rows}


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--run":
        print("RESULT " + json.dumps(measure(int(sys.argv[2]))))
        return
    res = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run", str(cpus)],
            capture_output=True, text=True, check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")][-1]
        res[cpus] = json.loads(line[len("RESULT "):])
    thr8 = N_IMG / res[8]["sec"]
    thr32 = N_IMG / res[32]["sec"]
    eff = thr32 / (4 * thr8)
    print(json.dumps({
        "job": "tile_assign (PIP join)",
        "n_images": N_IMG,
        "n_polys": N_POLY,
        "result_rows": res[32]["result_rows"],
        "sec_local8": round(res[8]["sec"], 2),
        "sec_local32": round(res[32]["sec"], 2),
        "rows_per_sec_local8": round(thr8),
        "rows_per_sec_local32": round(thr32),
        "scaling_efficiency_8_to_32": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
