"""BloomMapFile tests: Hadoop-bit-compatible murmur hash, filter
serialization round-trip, both JVM interop directions, and bloom-driven
file skipping in the hadoop_map datasource."""

import io
import os

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from hadoop_formats_spark.seqfile import bloom as B, mapfile as M

TEXT = "org.apache.hadoop.io.Text"


def test_murmur_matches_jvm_fuzz(spark):
    """Our murmur must equal Hadoop's signed-byte Murmur2 port bit for
    bit — it decides every bloom position."""
    import random

    mm = spark._jvm.org.apache.hadoop.util.hash.MurmurHash.getInstance()
    rng = random.Random(7)
    cases = [(b"", 0), (b"abc", 1), (b"\xff\xfe\xfd\xfc", 0), (b"\x80", -1)]
    cases += [
        (
            bytes(rng.randrange(256) for _ in range(rng.randrange(0, 40))),
            rng.randrange(-(2**31), 2**31),
        )
        for _ in range(100)
    ]
    for b, seed in cases:
        assert B.murmur_hash(b, seed) == mm.hash(b, len(b), seed)


def test_serialization_roundtrip():
    bl = B.DynamicBloom(vector_size=1000, nr=50)
    keys = [B.serialize_key(f"k{i}", TEXT) for i in range(120)]  # >2 filters
    for k in keys:
        bl.add(k)
    assert len(bl.matrix) == 3
    buf = io.BytesIO()
    bl.write(buf)
    buf.seek(0)
    back = B.DynamicBloom.read(buf)
    assert back.vector_size == 1000 and back.nr == 50
    assert len(back.matrix) == 3
    assert all(back.might_contain(k) for k in keys)


def test_no_false_negatives_and_bounded_false_positives():
    n = 2000
    bl = B.DynamicBloom(B.optimal_vector_size(n, 0.005), nr=n)
    for i in range(n):
        bl.add(B.serialize_key(f"doc{i}", TEXT))
    assert all(bl.might_contain(B.serialize_key(f"doc{i}", TEXT)) for i in range(n))
    fp = sum(
        bl.might_contain(B.serialize_key(f"absent{i}", TEXT)) for i in range(4000)
    )
    assert fp / 4000 < 0.02  # designed 0.5%; generous bound


@pytest.fixture(scope="module")
def bloom_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bmf") / "m")
    t = pa.table(
        {"key": [f"q{i:05d}" for i in range(3000)], "value": [i * 11 for i in range(3000)]}
    )
    B.write_bloom_map_dir(d, t, block_records=256)
    return d


def test_bloom_map_get(bloom_dir):
    assert B.bloom_map_get(bloom_dir, "q02222") == 2222 * 11
    assert B.bloom_map_get(bloom_dir, "definitely-not") is None
    # plain map reads are unaffected by the extra member
    assert M.read_map_dir(bloom_dir).num_rows == 3000


def test_jvm_bloom_reader_reads_ours(spark, bloom_dir):
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    fs = jvm.org.apache.hadoop.fs.FileSystem.getLocal(conf)
    r = jvm.org.apache.hadoop.io.BloomMapFile.Reader(fs, bloom_dir, conf)
    Text = jvm.org.apache.hadoop.io.Text
    LW = jvm.org.apache.hadoop.io.LongWritable
    val = LW()
    assert r.probablyHasKey(Text("q01111"))
    assert r.get(Text("q02999"), val) is not None and val.get() == 2999 * 11
    assert r.get(Text("absent"), val) is None
    fp = sum(bool(r.probablyHasKey(Text("x%05d" % i))) for i in range(1000))
    assert fp / 1000 < 0.02
    r.close()


def test_ours_reads_jvm_bloom(spark, tmp_path):
    d = str(tmp_path / "m")
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    conf = spark._jsc.hadoopConfiguration()
    MapFile = jvm.org.apache.hadoop.io.MapFile
    SFW = jvm.org.apache.hadoop.io.SequenceFile.Writer
    opts = gw.new_array(jvm.org.apache.hadoop.io.SequenceFile.Writer.Option, 2)
    opts[0] = MapFile.Writer.keyClass(
        jvm.java.lang.Class.forName("org.apache.hadoop.io.Text")
    )
    opts[1] = SFW.valueClass(
        jvm.java.lang.Class.forName("org.apache.hadoop.io.LongWritable")
    )
    w = jvm.org.apache.hadoop.io.BloomMapFile.Writer(
        conf, jvm.org.apache.hadoop.fs.Path(d), opts
    )
    Text = jvm.org.apache.hadoop.io.Text
    LW = jvm.org.apache.hadoop.io.LongWritable
    for i in range(500):
        w.append(Text("b%03d" % i), LW(i))
    w.close()
    bl = B.read_bloom(d)
    assert all(bl.might_contain(B.serialize_key("b%03d" % i, TEXT)) for i in range(500))
    assert B.bloom_map_get(d, "b042") == 42
    assert B.bloom_map_get(d, "nope") is None


def test_datasource_bloom_write_and_eq_skip(spark, tmp_path):
    out = str(tmp_path / "maps")
    df = spark.range(0, 4000).select(
        F.concat(F.lit("k"), F.lpad(F.col("id").cast("string"), 6, "0")).alias("key"),
        F.col("id").alias("value"),
    )
    df.repartitionByRange(4, "key").write.format("hadoop_map").option(
        "bloom", "true"
    ).option("block_records", "128").mode("overwrite").save(out)
    parts = [p for p in os.listdir(out) if p.startswith("part-")]
    assert len(parts) == 4
    assert all(os.path.isfile(os.path.join(out, p, "bloom")) for p in parts)

    back = spark.read.format("hadoop_map").load(out)
    assert back.count() == 4000
    hit = back.filter(F.col("key") == "k001234")
    assert [r["value"] for r in hit.collect()] == [1234]
    assert back.filter(F.col("key") == "zzz").count() == 0

    # plan-level: an absent equality key prunes EVERY file to 0 bytes
    from hadoop_formats_spark.seqfile.map_datasource import (
        MapFileDataSource,
        MapFileReader,
    )
    from pyspark.sql.datasource import EqualTo

    src = MapFileDataSource(options={"path": out})
    reader = MapFileReader(src, src.schema())
    list(reader.pushFilters([EqualTo(("key",), "zzz")]))
    assert (
        sum(e - s for sp in reader.partitions() for _, s, e in sp.ranges) == 0
    )
    # a present key plans at most ~one block from one file
    reader2 = MapFileReader(
        MapFileDataSource(options={"path": out}), src.schema()
    )
    list(reader2.pushFilters([EqualTo(("key",), "k001234")]))
    full = sum(
        os.path.getsize(os.path.join(out, p, "data")) for p in parts
    )
    planned = sum(e - s for sp in reader2.partitions() for _, s, e in sp.ranges)
    assert 0 < planned < full / 10
