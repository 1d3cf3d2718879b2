"""Enforce the input_hint contract: no per-row Python, no RDD API in the
engine (SURVEY §7.4.6).  Everything must flow through DataFrame ops and
vectorized Arrow UDFs."""

import re
from pathlib import Path

PKG = Path(__file__).resolve().parents[1] / "voyagr_spark"

FORBIDDEN = [
    r"\.rdd\b",
    r"sparkContext\.parallelize",
    r"\.toLocalIterator\b",
    r"@udf\b",
    r"F\.udf\(",  # row-at-a-time Python UDFs
]


def test_no_rdd_or_row_udfs_in_engine():
    offenders = []
    for p in PKG.rglob("*.py"):
        src = p.read_text()
        for pat in FORBIDDEN:
            for m in re.finditer(pat, src):
                line = src[: m.start()].count("\n") + 1
                offenders.append(f"{p.name}:{line} matches {pat!r}")
    assert not offenders, offenders
