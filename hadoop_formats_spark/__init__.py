"""hadoop_formats_spark — a PySpark-native analytics engine with the
capabilities of jacobstanley/hadoop-formats (SequenceFile BLOCK+Snappy
format layer) plus a Spark-first relational / dedup / similarity /
text-analysis / streaming query surface.  See SURVEY.md."""

__version__ = "0.1.0"
