"""Partition-layout invariance sweep: every registered query must
return BIT-IDENTICAL rows under different shuffle layouts
(spark.sql.shuffle.partitions 8 vs 37) — the proactive gate for the
float-accumulation-order flake class (a float AVG summed in shuffle
order changes last-ulp bits with the layout; the r07 stratified-sample
flake was exactly this). Strict canon: float bits via hex, type-family
tags, no rounding.

Run: python scripts/layout_sweep.py [start] [end]   (name-index slice)
     python scripts/layout_sweep.py <substr> ...    (name filter)
Expect final line RESULT: ALL-INVARIANT. Last full run: r10, 230/230.
"""

import decimal
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .appName("layout-sweep")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e

qs = e.queries()
SF = "/root/testdata/sf0.01"


def canon(v):
    if v is None:
        return None
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return ("f", "nan") if math.isnan(f) else ("f", f.hex())
    if isinstance(v, decimal.Decimal):
        return ("d", str(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("a", tuple(canon(x) for x in v))
    if isinstance(v, dict):
        return ("m", tuple(sorted((k, canon(x)) for k, x in v.items())))
    if isinstance(v, (bytes, bytearray)):
        return ("x", bytes(v))
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    return (type(v).__name__, v)


def rows_at(name, parts):
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    pdf = qs[name](spark, SF).toPandas()
    cols = sorted(pdf.columns)
    return sorted(
        (tuple(canon(v) for v in r) for r in pdf[cols].itertuples(index=False)),
        key=repr,
    )


def main():
    fails = []
    names = sorted(qs)
    args = sys.argv[1:]
    if args and not all(a.lstrip("-").isdigit() for a in args):
        # name-substring filter (drive.py convention)
        names = [n for n in names if any(a in n for a in args)]
    elif len(args) > 1:
        names = names[int(args[0]) : int(args[1])]
    for name in names:
        try:
            a, b = rows_at(name, 8), rows_at(name, 37)
            if a != b:
                fails.append(name)
                print(f"  {name}: LAYOUT-SENSITIVE", flush=True)
            else:
                print(f"  {name}: invariant rows={len(a)}", flush=True)
        except Exception as ex:  # noqa: BLE001 — the sweep must finish
            fails.append(name)
            print(f"  {name}: ERROR {type(ex).__name__} {str(ex)[:120]}", flush=True)
    print("RESULT:", "ALL-INVARIANT" if not fails else f"FAILS={fails}", flush=True)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
