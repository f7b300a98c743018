"""The reference's two shipped job scripts, re-stated as duck-typed
classes the compat shim runs unmodified.

These mirror /root/reference/map_libs/word_count.py (run_map:16-23,
run_reduce:61-66) and map_libs/max_year_temp.py (run_map:19-25,
run_reduce:63-65) — same tokenization, same grouping contract (key-sorted
pairs in, (key, agg) out). They live in the package (not a test module)
so the registry can run them under any driver session (the classes ship
to python workers with the package zip)."""

from __future__ import annotations

import re
from itertools import groupby

_WORD = re.compile(r"\w+", re.UNICODE)


class WordCountMapper:
    """word_count.py:16-23: lowercase \\w+ tokens → (word, 1)."""

    def run_map(self, data: str):
        return [(w.lower(), 1) for w in _WORD.findall(data) if w]


class WordCountReducer:
    """word_count.py:37-66: group key-sorted pairs, emit (word, sum)."""

    def run_reduce(self, pairs):
        return [
            (k, sum(v for _, v in grp))
            for k, grp in groupby(pairs, key=lambda t: t[0])
        ]


class YearMaxMapper:
    """max_year_temp.py:19-25 with a CSV chunk row: 'yyyymm,temp' →
    (year, temp)."""

    def run_map(self, data: str):
        ym, temp = data.split(",", 1)
        return [(int(ym[:4]), float(temp))]


class YearMaxReducer:
    """max_year_temp.py:39-65: emit (year, max(temps))."""

    def run_reduce(self, pairs):
        return [
            (k, max(v for _, v in grp))
            for k, grp in groupby(pairs, key=lambda t: t[0])
        ]
