"""SetFile / ArrayFile tests: set semantics, random access, bloom
acceleration, and JVM interop both directions."""

import pyarrow as pa
import pytest

from hadoop_formats_spark.seqfile import setfile as S


@pytest.fixture(scope="module")
def set_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sf") / "s")
    # duplicates in the input must collapse (set semantics)
    S.write_set_dir(
        d,
        [f"m{i:04d}" for i in range(500)] + ["m0001", "m0499"],
        block_records=64,
        with_bloom=True,
    )
    return d


def test_set_contains(set_dir):
    assert S.set_contains(set_dir, "m0000")
    assert S.set_contains(set_dir, "m0042")
    assert S.set_contains(set_dir, "m0499")
    assert not S.set_contains(set_dir, "m0500")
    assert not S.set_contains(set_dir, "")


def test_set_dedupes_input(set_dir):
    from hadoop_formats_spark.seqfile import core
    import os

    t = core.read_file(os.path.join(set_dir, "data"), want_values=False)
    keys = t.column(0).to_pylist()
    assert len(keys) == 500 and keys == sorted(set(keys))


def test_jvm_setfile_reader_reads_ours(spark, set_dir):
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    fs = jvm.org.apache.hadoop.fs.FileSystem.getLocal(conf)
    r = jvm.org.apache.hadoop.io.SetFile.Reader(fs, set_dir, conf)
    Text = jvm.org.apache.hadoop.io.Text
    assert r.seek(Text("m0042"))
    assert not r.seek(Text("nope"))
    r.close()


def test_ours_reads_jvm_setfile(spark, tmp_path):
    d = str(tmp_path / "s")
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    fs = jvm.org.apache.hadoop.fs.FileSystem.getLocal(conf)
    CT = jvm.org.apache.hadoop.io.SequenceFile.CompressionType
    kcls = jvm.java.lang.Class.forName("org.apache.hadoop.io.Text")
    w = jvm.org.apache.hadoop.io.SetFile.Writer(conf, fs, d, kcls, CT.NONE)
    Text = jvm.org.apache.hadoop.io.Text
    for i in range(200):
        w.append(Text("j%03d" % i))
    w.close()
    assert S.set_contains(d, "j042")
    assert not S.set_contains(d, "j500")


@pytest.fixture(scope="module")
def array_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("af") / "a")
    S.write_array_dir(d, [i * 1.5 for i in range(300)], block_records=64)
    return d


def test_array_get_and_length(array_dir):
    assert S.array_get(array_dir, 0) == 0.0
    assert S.array_get(array_dir, 299) == 299 * 1.5
    assert S.array_get(array_dir, 300) is None
    assert S.array_length(array_dir) == 300


def test_jvm_arrayfile_reader_reads_ours(spark, array_dir):
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    fs = jvm.org.apache.hadoop.fs.FileSystem.getLocal(conf)
    r = jvm.org.apache.hadoop.io.ArrayFile.Reader(fs, array_dir, conf)
    v = jvm.org.apache.hadoop.io.DoubleWritable()
    r.get(123, v)
    assert v.get() == 123 * 1.5
    r.close()


def test_ours_reads_jvm_arrayfile(spark, tmp_path):
    d = str(tmp_path / "a")
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    fs = jvm.org.apache.hadoop.fs.FileSystem.getLocal(conf)
    vcls = jvm.java.lang.Class.forName("org.apache.hadoop.io.LongWritable")
    w = jvm.org.apache.hadoop.io.ArrayFile.Writer(conf, fs, d, vcls)
    LW = jvm.org.apache.hadoop.io.LongWritable
    for i in range(150):
        w.append(LW(i * 7))
    w.close()
    assert S.array_get(d, 99) == 99 * 7
    assert S.array_length(d) == 150
