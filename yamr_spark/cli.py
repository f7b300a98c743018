"""CLI parity with the reference's user surface.

The reference's entire user lifecycle is ``yamr.py`` (click CLI,
/root/reference/yamr.py:51-57,81-106): ``start_task <path> <script>``
submits a job script against a DFS path, polls, then prints the merged
result as ``key: value`` lines; ``task_result <task_id>`` re-reads a
finished task's result files and prints the same rendering.

The Spark-first analogues (no job tracker — a Spark job IS the task;
"result files" are a JSON-lines result dir written by the S6 sink):

- ``python -m yamr_spark run <input> <script> [--output DIR] ...`` —
  load a reference-style job script (any module defining duck-typed
  ``Mapper``/``Reducer`` classes, e.g.
  /root/reference/map_libs/word_count.py), run it through the compat
  shim's Arrow-vectorized plan (compat/mapreduce.py), print the
  ``key: value`` lines, optionally persist the result dir.
- ``python -m yamr_spark task-result <result_dir>`` — re-read a result
  dir (S7 scan) and print ``key: value`` lines, the task_result path.

The script is shipped to executors with ``addPyFile`` — the same
mechanism (and the same reason) as the reference's script fetch onto
mappers (S2, /root/reference/mapper.py:86-92): workers unpickle the
Mapper/Reducer by reference to the script module, so the module file
must be importable on every worker.
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys

from pyspark.sql import DataFrame, SparkSession


def load_job_script(script_path: str):
    """Import a reference-style job script and return (mapper, reducer)
    instances. The script must define classes named ``Mapper`` and
    ``Reducer`` with ``run_map``/``run_reduce`` — exactly the contract
    of the reference's map_libs scripts (word_count.py:3-66)."""
    script_path = os.path.abspath(script_path)
    mod_name = os.path.splitext(os.path.basename(script_path))[0]
    spec = importlib.util.spec_from_file_location(mod_name, script_path)
    if spec is None or spec.loader is None:
        raise ValueError(f"cannot import job script {script_path}")
    mod = importlib.util.module_from_spec(spec)
    # register BEFORE exec so cloudpickle pickles the classes by
    # reference to a resolvable module name on the workers
    sys.modules[mod_name] = mod
    spec.loader.exec_module(mod)
    for cls in ("Mapper", "Reducer"):
        if not hasattr(mod, cls):
            raise ValueError(
                f"job script {script_path} defines no class {cls} "
                "(reference contract: map_libs/word_count.py)"
            )
    return mod.Mapper(), mod.Reducer()


def run_script_job(
    spark: SparkSession,
    input_path: str,
    script_path: str,
    *,
    map_schema: str = "key string, value long",
    reduce_schema: str | None = None,
    mode: str = "grouped",
    chunks: bool = False,
) -> DataFrame:
    """start_task analogue: input text + job script → (key, value)
    result DataFrame. ``chunks=True`` feeds run_map whole files (the
    reference's exact chunk semantics, not splittable); the default
    feeds lines (splittable — one huge file still parallelizes)."""
    from yamr_spark.compat.mapreduce import run_job
    from yamr_spark.sources import read_text, read_text_chunks

    mapper, reducer = load_job_script(script_path)
    # ship the script like the reference ships it to mappers (S2)
    spark.sparkContext.addPyFile(os.path.abspath(script_path))
    if chunks:
        inp = read_text_chunks(spark, input_path).select("data")
    else:
        inp = read_text(spark, input_path)
    return run_job(
        spark,
        inp,
        mapper,
        reducer,
        map_schema=map_schema,
        reduce_schema=reduce_schema,
        mode=mode,
    )


def render_result(df: DataFrame, limit: int | None = None) -> list[str]:
    """The reference CLI's rendering: ``key: value`` per pair, sorted by
    key for a deterministic terminal order (yamr.py:76-77 prints in file
    order; files are per-region — sorting is the stable analogue).
    Driver-side collect is the POINT here (a terminal print), bounded by
    ``limit``."""
    rows = df.orderBy("key").limit(limit).collect() if limit else (
        df.orderBy("key").collect()
    )
    return [f"{r['key']}: {r['value']}" for r in rows]


def render_capped(df: DataFrame, cap: int | None) -> list[str]:
    """render_result behind the CLI's default safety cap (VERDICT r12
    #7): over-fetch ONE row past the cap to detect truncation without a
    second count job, warn on stderr, and never collect an unbounded
    result unless the caller explicitly passed cap=None (--limit 0, the
    reference-faithful mode)."""
    lines = render_result(df, limit=cap + 1 if cap else None)
    if cap and len(lines) > cap:
        lines = lines[:cap]
        print(
            f"... output truncated at {cap} rows "
            "(pass --limit 0 for the full result)",
            file=sys.stderr,
        )
    return lines


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m yamr_spark",
        description="Reference-parity CLI: run MapReduce job scripts on Spark",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    runp = sub.add_parser("run", help="run a job script over an input path")
    runp.add_argument("input", help="text input path (file/dir/glob)")
    runp.add_argument("script", help="job script defining Mapper/Reducer")
    runp.add_argument("--output", help="write result JSON-lines dir (S6 sink)")
    runp.add_argument("--map-schema", default="key string, value long")
    runp.add_argument("--reduce-schema", default=None)
    runp.add_argument("--mode", choices=["grouped", "region"], default="grouped")
    runp.add_argument(
        "--chunks", action="store_true",
        help="feed run_map whole files (reference chunk semantics)",
    )
    limit_help = (
        "max printed rows (default 10000 — a terminal-print safety cap, "
        "VERDICT r12 #7; pass 0 for the reference-faithful unbounded "
        "print, which collects the ENTIRE result to the driver)"
    )

    def _nonneg_limit(v: str) -> int:
        # the unbounded-collect mode must only be reachable by the
        # documented --limit 0, not by any negative value (ADVICE r13)
        n = int(v)
        if n < 0:
            raise argparse.ArgumentTypeError(
                "--limit must be >= 0 (0 = unbounded reference mode)"
            )
        return n

    runp.add_argument("--limit", type=_nonneg_limit, default=10000, help=limit_help)

    resp = sub.add_parser("task-result", help="print a finished result dir")
    resp.add_argument("result_dir")
    resp.add_argument("--value-type", default="double")
    resp.add_argument("--limit", type=_nonneg_limit, default=10000, help=limit_help)

    args = p.parse_args(argv)

    from yamr_spark.session import get_spark

    spark = get_spark("yamr_spark_cli")
    try:
        cap = args.limit if args.limit > 0 else None
        if args.cmd == "run":
            df = run_script_job(
                spark,
                args.input,
                args.script,
                map_schema=args.map_schema,
                reduce_schema=args.reduce_schema,
                mode=args.mode,
                chunks=args.chunks,
            )
            if args.output:
                from yamr_spark.sources import write_result_json

                df = df.cache()  # one execution serves both sink and print
                write_result_json(df, args.output)
        else:
            from yamr_spark.sources import read_result_json

            df = read_result_json(
                spark, args.result_dir, value_type=args.value_type
            )
        for line in render_capped(df, cap):
            print(line)
    finally:
        spark.stop()
    return 0
