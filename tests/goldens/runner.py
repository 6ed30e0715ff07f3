"""Golden-file test runner — the reference's `.test` format
(testdata/workloads/functional-query/queries/QueryTest/*.test, sections
``---- QUERY`` / ``---- TYPES`` / ``---- RESULTS``; driven there by
tests/query_test/*.py). Same format here, executed through spark.sql over
the sf0.001 fixture views.

RESULTS rows are comma-separated canonical values: floats formatted with
repr, NULL spelled ``NULL``, timestamps as ``YYYY-MM-DD HH:MM:SS[.ffffff]``.
Row order must match when the query has ORDER BY (all goldens do).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from datetime import datetime
from decimal import Decimal

GOLDEN_DIR = os.path.dirname(os.path.abspath(__file__))


def _split_types(line: str) -> list[str]:
    """Split a TYPES line on commas outside parens (decimal(2,1) stays whole)."""
    out, depth, cur = [], 0, []
    for ch in line:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            if "".join(cur).strip():
                out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if "".join(cur).strip():
        out.append("".join(cur).strip())
    return out


@dataclass
class GoldenCase:
    name: str
    query: str
    types: list[str]
    results: list[str]


def parse_golden_file(path: str) -> list[GoldenCase]:
    cases: list[GoldenCase] = []
    section = None
    buf: dict[str, list[str]] = {}
    idx = 0

    def flush():
        nonlocal idx
        if "QUERY" in buf:
            idx += 1
            cases.append(
                GoldenCase(
                    name=f"{os.path.basename(path)}#{idx}",
                    query="\n".join(buf["QUERY"]).strip(),
                    types=_split_types(",".join(buf.get("TYPES", []))),
                    results=[r for r in buf.get("RESULTS", []) if r.strip()],
                )
            )

    with open(path) as f:
        for raw in f:
            line = raw.rstrip("\n")
            if line.startswith("===="):
                flush()
                buf, section = {}, None
            elif line.startswith("---- "):
                section = line[5:].strip()
                buf[section] = []
            elif section is not None:
                buf[section].append(line)
    flush()
    return cases


def _fmt(v: object) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, datetime):
        s = v.strftime("%Y-%m-%d %H:%M:%S")
        if v.microsecond:
            s += f".{v.microsecond:06d}".rstrip("0")
        return s
    return str(v)


def run_case(spark, case: GoldenCase) -> None:
    df = spark.sql(case.query)
    if case.types:
        got_types = [f.dataType.simpleString() for f in df.schema.fields]
        assert got_types == case.types, f"{case.name} types: {got_types} != {case.types}"
    got = [",".join(_fmt(v) for v in row) for row in df.collect()]
    assert got == case.results, (
        f"{case.name} results differ\n  got:  {got[:5]}\n  want: {case.results[:5]}"
    )


def all_golden_files() -> list[str]:
    return sorted(
        os.path.join(GOLDEN_DIR, f) for f in os.listdir(GOLDEN_DIR) if f.endswith(".test")
    )
