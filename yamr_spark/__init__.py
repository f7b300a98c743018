"""yamr_spark — a PySpark-native analytics engine with the capabilities of
osteotek/yamr, re-expressed Spark-first.

The reference (/root/reference) is an educational Hadoop-MapReduce-v1 clone:
user Mapper/Reducer Python classes over chunked DFS files with a
hash-partitioned, per-partition-sorted shuffle (see SURVEY.md). This package
provides:

- ``operators/``  — named DataFrame operators covering the reference's
  inventory (word count, max-per-key, grouping) plus the relational and
  LLM-data-pipeline surface (joins, windows, dedup, similarity, text
  analysis, multimodal) designed for 100 TB scale.
- ``compat/``     — a generic MapReduce job API accepting the reference's
  exact Mapper/Reducer script classes (duck-typed ``run_map``/``run_reduce``).
- ``sources/``    — IO helpers (text/json/parquet/binary read+write).
- ``streaming/``  — Structured Streaming operators for the events table.
- ``plans/``      — plan inspection helpers (explain, shuffle counting).

Everything is DataFrame/Catalyst-first: operators declare logical plans and
let Catalyst/Tungsten/AQE pick physical strategies. Python UDFs appear only
where built-ins genuinely cannot express the semantics, always Arrow-batched.
"""

from yamr_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
