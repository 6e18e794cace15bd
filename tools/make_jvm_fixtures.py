"""Regenerate tests/data/jvm/*.seq with Hadoop's own SequenceFile.Writer
(the same oracle strategy as the reference's tests/MakeSequenceFiles.java:
Hadoop itself writes the fixtures, our reader must decode them).

2000 records of Text -> IntWritable: keys ``k%05d``, values ``i * 7``.

Usage: python tools/make_jvm_fixtures.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURES = [
    ("rec_default.seq", "RECORD", "org.apache.hadoop.io.compress.DefaultCodec"),
    ("rec_snappy.seq", "RECORD", "org.apache.hadoop.io.compress.SnappyCodec"),
    ("rec_bzip2.seq", "RECORD", "org.apache.hadoop.io.compress.BZip2Codec"),
    ("blk_gzip.seq", "BLOCK", "org.apache.hadoop.io.compress.GzipCodec"),
    ("none_writer.seq", "NONE", "org.apache.hadoop.io.compress.DefaultCodec"),
]

N_RECORDS = 2000


def main() -> None:
    from hadoop_formats_spark.session import get_spark

    spark = get_spark("make-fixtures", cores=2)
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    jvm = sc._jvm
    gw = sc._gateway
    conf = sc._jsc.hadoopConfiguration()
    SF = jvm.org.apache.hadoop.io.SequenceFile
    Path = jvm.org.apache.hadoop.fs.Path
    Text = jvm.org.apache.hadoop.io.Text
    IntW = jvm.org.apache.hadoop.io.IntWritable
    RU = jvm.org.apache.hadoop.util.ReflectionUtils

    def cls(name: str):
        return jvm.java.lang.Class.forName(name)

    out_dir = os.path.join(REPO, "tests", "data", "jvm")
    os.makedirs(out_dir, exist_ok=True)
    for fname, ctype, codec_name in FIXTURES:
        path = os.path.join(out_dir, fname)
        opts = gw.new_array(SF.Writer.Option, 4)
        opts[0] = SF.Writer.file(Path(path))
        opts[1] = SF.Writer.keyClass(cls("org.apache.hadoop.io.Text"))
        opts[2] = SF.Writer.valueClass(cls("org.apache.hadoop.io.IntWritable"))
        codec = RU.newInstance(cls(codec_name), conf)
        opts[3] = SF.Writer.compression(SF.CompressionType.valueOf(ctype), codec)
        w = SF.createWriter(conf, opts)
        k, v = Text(), IntW()
        for i in range(N_RECORDS):
            k.set(f"k{i:05d}")
            v.set(i * 7)
            w.append(k, v)
        w.close()
        print(fname, os.path.getsize(path))


if __name__ == "__main__":
    main()
