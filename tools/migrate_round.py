#!/usr/bin/env python
"""One-shot migration: round(x, n) -> binary floor(x*10^n+0.5)/10^n on
both the Spark side (F.round -> fround) and the DuckDB oracle side,
via paren matching. Spark round is Double.toString-based; DuckDB and
numpy round the binary value — floor unifies all engines. Run with
--apply to write; default is a dry-run report.
"""

from __future__ import annotations

import re
import sys

FILES = [
    "fluvio_demo_apps_rust_spark/plans/llm.py",
    "fluvio_demo_apps_rust_spark/plans/advanced.py",
    "fluvio_demo_apps_rust_spark/plans/events.py",
    "fluvio_demo_apps_rust_spark/plans/cdc.py",
    "fluvio_demo_apps_rust_spark/plans/mining.py",
    "fluvio_demo_apps_rust_spark/plans/relational.py",
    "fluvio_demo_apps_rust_spark/functions/text.py",
    "fluvio_demo_apps_rust_spark/functions/curation.py",
    "fluvio_demo_apps_rust_spark/functions/dedup.py",
]


def match_paren(s: str, i: int) -> int:
    """i points at '('; return index of matching ')'."""
    depth = 0
    while i < len(s):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise ValueError("unbalanced")


def split_top_comma(s: str) -> tuple[str, str] | None:
    """Split 'X, N' at the LAST top-level comma (args of round)."""
    depth = 0
    last = -1
    for i, c in enumerate(s):
        if c == "(" or c == "[":
            depth += 1
        elif c == ")" or c == "]":
            depth -= 1
        elif c == "," and depth == 0:
            last = i
    if last < 0:
        return None
    return s[:last], s[last + 1 :].strip()


def transform(src: str, pattern: str, rewrite) -> tuple[str, int]:
    out = []
    i = 0
    n = 0
    rx = re.compile(pattern)
    while True:
        m = rx.search(src, i)
        if not m:
            out.append(src[i:])
            break
        close = match_paren(src, m.end() - 1)
        inner = src[m.end() : close].rstrip().rstrip(",").rstrip()
        parts = split_top_comma(inner)
        repl = rewrite(inner, parts)
        if repl is None:
            out.append(src[i : close + 1])
        else:
            out.append(src[i : m.start()])
            out.append(repl)
            n += 1
        i = close + 1
    return "".join(out), n


def sql_rewrite(inner, parts):
    if parts is None:
        return None  # scale-0 quantize: leave
    expr, scale = parts
    if not scale.isdigit():
        return None
    mult = 10 ** int(scale)
    return f"floor(({expr.strip()}) * {mult} + 0.5) / {mult}.0"


def spark_rewrite(inner, parts):
    if parts is None:
        return None
    expr, scale = parts
    if not scale.isdigit():
        return None
    return f"fround({inner})"


def main(apply: bool) -> None:
    for path in FILES:
        src = open(path).read()
        src2, n_sql = transform(src, r"(?<![\w.])round\(", sql_rewrite)
        src3, n_spark = transform(src2, r"F\.round\(", spark_rewrite)
        print(f"{path}: {n_sql} sql, {n_spark} spark")
        if apply and (n_sql or n_spark):
            open(path, "w").write(src3)


if __name__ == "__main__":
    main(apply="--apply" in sys.argv)
