"""Aspect-ratio bucketing for image training batches.

Variable-aspect image corpora can't batch together without destructive
square-cropping; the standard fix (public methodology: NovelAI aspect-ratio
bucketing, also used by SDXL — Podell et al. 2023 §2.3) is a fixed set of
(w, h) buckets under a pixel budget, each image assigned to the bucket whose
aspect ratio is nearest its own, then resized per-bucket. The bucket id then
becomes the batch/partition key downstream.

Spark shape: the bucket set is tiny (tens of rows) and KNOWN AT PLAN TIME,
so assignment is a pure Column fold over an array literal — map-only, no
join, no shuffle; whole-stage codegen keeps it JVM-side. Downstream batching
groups on ``bucket_id`` — the only exchange, and exactly the one the
training layout needs anyway.

Numeric contract: nearness is |w/h - bw/bh| compared via the DOUBLE key
``abs(w*bh - h*bw) / (h*bh)``. Every operand is an exact small integer, and
IEEE division is correctly rounded, so Spark and any mirroring SQL engine
compute bit-identical keys — no transcendental (log-ratio) calls whose last
ulp differs across runtimes. Ties break to the earlier bucket in the list.
"""

from __future__ import annotations

from math import gcd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["generate_buckets", "assign_aspect_buckets"]


def generate_buckets(
    max_pixels: int = 1024 * 1024,
    stride: int = 64,
    min_side: int = 512,
    max_side: int = 2048,
) -> list[tuple[int, int]]:
    """Candidate (w, h) buckets: stride-aligned sides within [min_side,
    max_side], pixel area <= ``max_pixels``, keeping for each distinct
    aspect ratio the LARGEST area that fits the budget. Deterministic
    order: ascending ratio w/h, then ascending w."""
    best: dict[tuple[int, int], tuple[int, int]] = {}
    for w in range(min_side, max_side + 1, stride):
        for h in range(min_side, max_side + 1, stride):
            if w * h > max_pixels:
                continue
            g = gcd(w, h)
            ratio = (w // g, h // g)
            cur = best.get(ratio)
            if cur is None or w * h > cur[0] * cur[1]:
                best[ratio] = (w, h)
    return sorted(best.values(), key=lambda wh: (wh[0] / wh[1], wh[0]))


def assign_aspect_buckets(
    df: DataFrame,
    buckets: list[tuple[int, int]] | None = None,
    w: str = "w",
    h: str = "h",
) -> DataFrame:
    """Add ``bucket_id`` / ``bucket_w`` / ``bucket_h``: the bucket whose
    aspect ratio is nearest the image's (see module docstring for the
    exact-integer distance key). Map-only Column fold — no shuffle."""
    if buckets is None:
        buckets = generate_buckets()
    if not buckets:
        raise ValueError("bucket list must be non-empty")
    arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("idx"),
                F.lit(int(bw)).alias("bw"),
                F.lit(int(bh)).alias("bh"),
            )
            for i, (bw, bh) in enumerate(buckets)
        ]
    )
    wc, hc = F.col(w).cast("long"), F.col(h).cast("long")

    def dist(b: Column) -> Column:
        # |w/h - bw/bh| * h  ==  |w*bh - h*bw| / bh  (h > 0 common factor;
        # constant within a row, so the argmin is unchanged)
        return F.abs(wc * b["bh"] - hc * b["bw"]).cast("double") / b[
            "bh"
        ].cast("double")

    zero = F.struct(
        F.lit(-1).alias("idx"), F.lit(1).alias("bw"), F.lit(1).alias("bh")
    )
    best = F.aggregate(
        arr,
        zero,
        lambda acc, x: F.when(
            (acc["idx"] < 0) | (dist(x) < dist(acc)), x
        ).otherwise(acc),
    )
    return df.withColumns(
        {
            "bucket_id": best["idx"],
            "bucket_w": best["bw"],
            "bucket_h": best["bh"],
        }
    )
