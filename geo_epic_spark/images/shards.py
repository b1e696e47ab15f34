"""WebDataset-style tar shard export/import for image+caption training data.

The standard interchange for large-scale image-caption training corpora is
a directory of tar "shards", each holding `<key>.<fmt>` (image bytes) +
`<key>.txt` (caption) member pairs, streamed sequentially by data loaders.
This module writes and reads that layout from Spark:

* `write_webdataset` — one `applyInPandas` group per shard writes one tar
  and emits a manifest row.  DETERMINISTIC output: members sorted by key,
  USTAR format, zeroed mtime/uid/gid — the same input always produces
  byte-identical tars (stable sha256), so re-exports are diffable and a
  resumed job can skip shards whose manifest row already exists.
* `read_webdataset` — tar paths parallelized, `mapInPandas` unpacks
  members back into (key, fmt, bytes, caption) rows.

Shard ASSIGNMENT is the caller's column (e.g. `sampling.hash_unit`-banded,
or a prefix-scan packer) — kept separate so the assignment stays a pure,
oracle-checkable function while the tar I/O is verified by roundtrip.

Scale shape: one shuffle keyed on the shard column (the repartition), then
map-only tar writes; shard count is chosen by the caller (e.g. corpus
bytes / 1 GiB). Local paths here; on a cluster the same code targets a
mounted object store via fsspec-style paths.
"""

from __future__ import annotations

import hashlib
import io
import os
import tarfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["write_webdataset", "read_webdataset"]


def _open_wb(path: str):
    """Executor-side binary writer: fsspec when available (object-store
    paths), else plain local open (shared-filesystem requirement stated in
    `write_webdataset`)."""
    try:
        import fsspec  # noqa: F401 — optional, absent in this sandbox

        return fsspec.open(path, "wb").open()
    except ImportError:
        return open(path, "wb")


def _makedirs(out_dir: str) -> None:
    try:
        import fsspec

        fs, root = fsspec.core.url_to_fs(out_dir)
        fs.makedirs(root, exist_ok=True)
    except ImportError:
        os.makedirs(out_dir, exist_ok=True)

_MANIFEST_SCHEMA = StructType([
    StructField("shard", LongType()),
    StructField("path", StringType()),
    StructField("n_members", LongType()),
    StructField("caption_bytes", LongType()),
    StructField("data_bytes", LongType()),
    StructField("tar_bytes", LongType()),
    StructField("sha16", StringType()),
])


def write_webdataset(
    df: DataFrame,
    out_dir: str,
    shard_col: str = "shard",
    key: str = "image_id",
    bytes_col: str = "bytes",
    caption_col: str = "caption",
    fmt_col: str = "fmt",
) -> DataFrame:
    """Write one `shard-%06d.tar` per distinct ``shard_col`` value; return
    the manifest DataFrame (shard, path, n_members, caption_bytes,
    data_bytes, tar_bytes, sha16).

    Filesystem contract: each tar is opened ON THE EXECUTOR via
    ``fsspec.open(path, "wb")`` when fsspec is importable — so an
    object-store ``out_dir`` (s3://, gs://, abfs://) works on a real
    cluster. Without fsspec (this sandbox) the writer falls back to plain
    ``open()``, which requires ``out_dir`` to be a SHARED filesystem
    visible at the same path from every executor (NFS, or local mode);
    executor-local disks would scatter the shards."""
    _makedirs(out_dir)

    def _write(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf[shard_col].iloc[0])
        pdf = pdf.sort_values(key, kind="mergesort")
        path = os.path.join(out_dir, f"shard-{shard:06d}.tar")
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
            for k, blob, cap, fmt in zip(
                pdf[key], pdf[bytes_col], pdf[caption_col], pdf[fmt_col]
            ):
                for name, payload in ((f"{k}.{fmt}", bytes(blob)),
                                      (f"{k}.txt", cap.encode("utf-8"))):
                    info = tarfile.TarInfo(name=name)
                    info.size = len(payload)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tf.addfile(info, io.BytesIO(payload))
        raw = buf.getvalue()
        with _open_wb(path) as f:
            f.write(raw)
        return pd.DataFrame([{
            "shard": shard,
            "path": path,
            "n_members": 2 * len(pdf),
            "caption_bytes": int(sum(len(c.encode("utf-8")) for c in pdf[caption_col])),
            "data_bytes": int(sum(len(bytes(b)) for b in pdf[bytes_col])),
            "tar_bytes": len(raw),
            "sha16": hashlib.sha256(raw).hexdigest()[:16],
        }])

    return (
        df.select(shard_col, key, bytes_col, caption_col, fmt_col)
        .repartition(shard_col)
        .groupBy(shard_col)
        .applyInPandas(_write, schema=_MANIFEST_SCHEMA)
    )


_READ_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("fmt", StringType()),
    StructField("bytes", BinaryType()),
    StructField("caption", StringType()),
])


def read_webdataset(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read a webdataset directory back into (image_id, fmt, bytes,
    caption) rows — one task per tar shard."""
    paths = sorted(
        os.path.join(out_dir, p) for p in os.listdir(out_dir) if p.endswith(".tar")
    )
    pdf = spark.createDataFrame([(p,) for p in paths], "path string")

    def _read(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for path in b["path"]:
                rows: dict[str, dict] = {}
                with tarfile.open(path, mode="r") as tf:
                    for m in tf:
                        stem, ext = m.name.rsplit(".", 1)
                        payload = tf.extractfile(m).read()
                        d = rows.setdefault(stem, {"image_id": stem})
                        if ext == "txt":
                            d["caption"] = payload.decode("utf-8")
                        else:
                            d["fmt"] = ext
                            d["bytes"] = payload
                if rows:
                    yield pd.DataFrame(list(rows.values()))[
                        ["image_id", "fmt", "bytes", "caption"]
                    ]

    return pdf.mapInPandas(_read, schema=_READ_SCHEMA)
