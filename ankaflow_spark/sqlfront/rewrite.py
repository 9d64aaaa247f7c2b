"""Pre-Catalyst SQL text rewriting.

The reference manipulates SQL text/AST before handing it to its embedded
engine (SURVEY.md §4) — the Spark engine does the same, then lets
Catalyst do all relational optimization. Rewrites:

1. ``Fn.name(...)`` macro spelling -> ``fn_name(...)`` (registered SQL
   UDFs; Spark function names cannot contain dots).
2. Double-quoted stage-name references -> mangled temp-view identifiers
   (Spark treats double quotes as string literals, not identifiers).
3. Light DuckDB-dialect normalization for the constructs the reference's
   corpus uses (``USING SAMPLE n ROWS`` -> ``TABLESAMPLE``, ``// `` int
   division, ``::TYPE`` casts are Spark-native already in 4.x).

No external SQL parser is available in this environment, so this layer
is a conservative tokenizer-based rewriter: it never touches string
literals and leaves unknown constructs for Spark's parser to report.
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, List, Tuple


def _split_literals(sql: str) -> List[Tuple[bool, str]]:
    """Split SQL into (is_literal, chunk) segments so rewrites never touch
    quoted strings. Handles single-quoted literals with '' escapes."""
    parts: List[Tuple[bool, str]] = []
    buf: List[str] = []
    i, n = 0, len(sql)
    in_lit = False
    while i < n:
        ch = sql[i]
        if not in_lit and ch == "'":
            parts.append((False, "".join(buf)))
            buf = [ch]
            in_lit = True
        elif in_lit and ch == "'":
            if i + 1 < n and sql[i + 1] == "'":
                buf.append("''")
                i += 1
            else:
                buf.append(ch)
                parts.append((True, "".join(buf)))
                buf = []
                in_lit = False
        else:
            buf.append(ch)
        i += 1
    if buf:
        parts.append((in_lit, "".join(buf)))
    return parts


def _map_nonliteral(sql: str, fn) -> str:
    return "".join(chunk if is_lit else fn(chunk) for is_lit, chunk in _split_literals(sql))


_FN_CALL = re.compile(r"\bFn\.([A-Za-z_][A-Za-z0-9_]*)", re.IGNORECASE)
_SAMPLE_ROWS = re.compile(r"\bUSING\s+SAMPLE\s+(\d+)\s+ROWS\b", re.IGNORECASE)
_SAMPLE_PCT = re.compile(r"\bUSING\s+SAMPLE\s+([0-9.]+)\s*%", re.IGNORECASE)


def expand_fn_macros(sql: str) -> str:
    """``Fn.div(a,b)`` -> ``fn_div(a,b)``; ``Fn.not(...)`` etc. keep the
    reference spelling available in transforms."""

    def repl(m: re.Match) -> str:
        name = m.group(1).lower().rstrip("_")
        return f"fn_{name}"

    return _FN_CALL.sub(repl, sql)


def rewrite_views(sql: str, views: Dict[str, str]) -> str:
    """Replace references to registered stage names with their mangled
    temp-view identifiers. Handles both double-quoted (``"Extract Data"``)
    and bare spellings."""

    def fix(chunk: str) -> str:
        out = chunk
        for user, view in views.items():
            if user == view:
                continue
            out = out.replace(f'"{user}"', view)
            if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", user):
                out = re.sub(rf"\b{re.escape(user)}\b", view, out)
        return out

    return _map_nonliteral(sql, fix)


def normalize_dialect(sql: str) -> str:
    def fix(chunk: str) -> str:
        out = _SAMPLE_ROWS.sub(r"TABLESAMPLE (\1 ROWS)", chunk)
        out = _SAMPLE_PCT.sub(r"TABLESAMPLE (\1 PERCENT)", out)
        return out

    return _map_nonliteral(sql, fix)


def quoted_stage_refs_to_views(sql: str, views: Dict[str, str]) -> str:
    """Double-quoted identifiers that are NOT registered stage names are
    converted to backticks (Spark identifier quoting)."""

    def fix(chunk: str) -> str:
        return re.sub(r'"([^"]+)"', lambda m: f"`{m.group(1)}`", chunk)

    return _map_nonliteral(sql, fix)


def rewrite_sql(sql: str, views: Dict[str, str]) -> str:
    out = _map_nonliteral(sql, expand_fn_macros)
    out = rewrite_views(out, views)
    out = normalize_dialect(out)
    out = quoted_stage_refs_to_views(out, views)
    return out
