"""Regenerate COVERAGE.md from the registry (one row per query)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from collections import defaultdict
from yamr_spark.registry import all_queries, all_oracles

qs = all_queries(); os_ = all_oracles()
fams = defaultdict(list)
for name, fn in qs.items():
    fams[fn.__module__.replace("yamr_spark.", "")].append(name)
lines = ["# Coverage inventory (generated from yamr_spark.registry)", "",
         f"{len(qs)} registered queries; {len(os_)} carry exact DuckDB oracles"
         + ("" if len(os_) == len(qs) else " (the rest are rows-only by design)")
         + ".",
         "Regenerate: `python scripts/gen_coverage.py`.", ""]
order = ["queries_core","queries_relational","queries_tpch","queries_analytics",
         "queries_functions","queries_temporal","queries_dedup","queries_similarity",
         "queries_text","queries_curation","queries_multimodal","queries_streaming",
         "queries_compat"]
for mod in order + [m for m in sorted(fams) if m not in order]:
    if mod not in fams:
        continue
    lines += [f"## {mod} ({len(fams[mod])})", "", "| query | oracle |", "|---|---|"]
    lines += [f"| `{n}` | {'exact' if n in os_ else 'rows-only'} |" for n in sorted(fams[mod])]
    lines.append("")
open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md"), "w").write("\n".join(lines))
print(f"wrote COVERAGE.md: {len(qs)} queries, {len(os_)} oracles")
