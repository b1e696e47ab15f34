"""WebDataset tar shard export: roundtrip, determinism, tar layout."""

import hashlib
import os
import tarfile

import pytest
from pyspark.sql import functions as F

from geo_epic_spark.images import full_images_df
from geo_epic_spark.images.shards import read_webdataset, write_webdataset
from geo_epic_spark.operators.sampling import hash_unit

N = 120
SHARDS = 4


@pytest.fixture(scope="module")
def exported(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("wds"))
    imgs = full_images_df(spark, N).withColumn(
        "shard", F.floor(hash_unit(F.col("i")) * SHARDS).cast("long"))
    man = write_webdataset(imgs, out).collect()
    return imgs, out, man


class TestWrite:
    def test_manifest_accounts_for_every_row(self, exported):
        imgs, out, man = exported
        assert sum(m.n_members for m in man) == 2 * N
        assert sorted(os.listdir(out)) == [
            f"shard-{m.shard:06d}.tar" for m in sorted(man, key=lambda m: m.shard)]

    def test_tar_layout_ustar_zeroed(self, exported):
        _, out, man = exported
        path = man[0].path
        with tarfile.open(path) as tf:
            members = tf.getmembers()
            names = [m.name for m in members]
            assert names == sorted(names)  # sorted by key, .fjpg/.png before .txt
            for m in members:
                assert m.mtime == 0 and m.uid == 0 and m.gid == 0
        # tar_bytes matches the USTAR accounting: 512-byte header +
        # 512-padded payload per member, 1024 end marker, 10240 record pad
        with tarfile.open(path) as tf:
            body = sum(512 + ((m.size + 511) // 512) * 512 for m in tf.getmembers())
        want = ((body + 1024 + 10239) // 10240) * 10240
        assert os.path.getsize(path) == want == man[0].tar_bytes

    def test_deterministic_sha(self, exported, spark, tmp_path):
        imgs, _, man = exported
        out2 = str(tmp_path / "wds2")
        man2 = write_webdataset(imgs, out2).collect()
        assert {m.shard: m.sha16 for m in man} == {m.shard: m.sha16 for m in man2}
        # sha in the manifest matches the file on disk
        p = man2[0]
        assert hashlib.sha256(open(p.path, "rb").read()).hexdigest()[:16] == p.sha16


class TestRoundtrip:
    def test_read_back_equals_input(self, exported, spark):
        imgs, out, _ = exported
        back = read_webdataset(spark, out)
        a = {r.image_id: (r.fmt, bytes(r.bytes), r.caption)
             for r in imgs.select("image_id", "fmt", "bytes", "caption").collect()}
        b = {r.image_id: (r.fmt, bytes(r.bytes), r.caption) for r in back.collect()}
        assert a == b
