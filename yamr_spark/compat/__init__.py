"""MapReduce compatibility layer — run reference-style Mapper/Reducer
scripts on Spark unmodified (SURVEY.md §7.3)."""

from yamr_spark.compat.mapreduce import run_job

__all__ = ["run_job"]
