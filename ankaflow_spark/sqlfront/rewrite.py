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


def _depth0_keyword_pos(sql: str, words: Tuple[str, ...], start: int = 0) -> int:
    """Index of the first keyword (from ``words``) occurring at paren
    depth 0 outside string literals; -1 if absent. Case-insensitive,
    word-bounded."""
    depth = 0
    in_lit = False
    upper = sql.upper()
    i = start
    n = len(sql)
    while i < n:
        ch = sql[i]
        if in_lit:
            if ch == "'":
                if i + 1 < n and sql[i + 1] == "'":
                    i += 1
                else:
                    in_lit = False
        elif ch == "'":
            in_lit = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0:
            for w in words:
                if upper.startswith(w, i):
                    before_ok = i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_")
                    after = i + len(w)
                    after_ok = after >= n or not (sql[after].isalnum() or sql[after] == "_")
                    if before_ok and after_ok:
                        return i
        i += 1
    return -1


def rewrite_qualify(sql: str) -> str:
    """DuckDB's QUALIFY (filter on window expressions) has no Spark
    equivalent; rewrite to the standard subquery form: compute the
    predicate (windows and all) as a projected boolean, filter on it,
    drop the helper column with ``* EXCEPT``. Paren-depth-aware so
    ORDER BY inside OVER(...) clauses is not mistaken for the tail."""
    s = sql.strip().rstrip(";")
    qpos = _depth0_keyword_pos(s, ("QUALIFY",))
    if qpos < 0:
        return sql
    base = s[:qpos].strip()
    rest = s[qpos + len("QUALIFY"):]
    tpos = _depth0_keyword_pos(rest, ("ORDER", "LIMIT"))
    pred = (rest if tpos < 0 else rest[:tpos]).strip()
    tail = "" if tpos < 0 else rest[tpos:].strip()
    return (
        f"SELECT * EXCEPT(__qualify__) FROM ("
        f"SELECT *, ({pred}) AS __qualify__ FROM ({base}) __qbase__"
        f") __qfiltered__ WHERE __qualify__ {tail}"
    )


def rewrite_sql(sql: str, views: Dict[str, str]) -> str:
    out = _map_nonliteral(sql, expand_fn_macros)
    out = rewrite_views(out, views)
    out = normalize_dialect(out)
    out = rewrite_qualify(out)
    out = quoted_stage_refs_to_views(out, views)
    return out
