"""Impala-SQL → Spark-SQL dialect translation.

The reference's grammar (fe/src/main/cup/sql-parser.cup) is ~95% ANSI and
runs unchanged on Spark SQL. This module rewrites the residue:

- plan hints ``JOIN [broadcast] t`` / ``JOIN [shuffle] t``
  (sql-parser.cup:1996-2000) → Spark ``/*+ BROADCAST(t) / SHUFFLE_HASH(t) */``
  hint comments injected after the nearest SELECT;
- ``SELECT STRAIGHT_JOIN`` (keep join order as written) → stripped, and the
  caller should disable ``spark.sql.cbo.joinReorder.enabled`` for the
  statement (Engine.sql does);
- catalog verbs: ``COMPUTE [INCREMENTAL] STATS t`` →
  ``ANALYZE TABLE t COMPUTE STATISTICS FOR ALL COLUMNS``;
  ``INVALIDATE METADATA t`` /
  ``REFRESH t`` → ``REFRESH TABLE t`` (statestored propagation is a no-op
  in Spark — SURVEY §1.4);
- SCALAR dialect function names are NOT rewritten here — they are registered
  as session SQL functions (functions/parity.py:register_sql_functions),
  which keeps translation purely syntactic. AGGREGATE spellings are the one
  exception (CREATE FUNCTION bodies are scalar-only, so they can't be
  registered): ndv/distinctpc/distinctpcsa → approx_count_distinct,
  appx_median → median (exact — a documented upgrade over the reference's
  sampled estimate), variance_pop/variance_samp → var_pop/var_samp.

Translation is regex-based over a comment/string-masked copy of the text, so
hints inside string literals are never rewritten.
"""

from __future__ import annotations

import re

_STRING_OR_COMMENT = re.compile(
    r"""('(?:[^'\\]|\\.)*')|("(?:[^"\\]|\\.)*")|(`[^`]*`)|(--[^\n]*)|(/\*.*?\*/)""",
    re.DOTALL,
)


def _mask(sql: str) -> str:
    """Replace string literals/comments with same-length placeholders so
    positional regex matches on the mask apply safely to the original.
    Literals mask to \\x00, comments to \\x01 — DISTINCT placeholders,
    because an abutting comment+literal ("IREGEXP/*c*/'a.c'") would
    otherwise form one contiguous run that a raw-first-char test
    classifies wholesale (ADVICE r10: the literal was skipped with the
    comment and valid SQL raised ValueError)."""

    def repl(m: re.Match) -> str:
        ch = "\x01" if (m.group(4) or m.group(5)) else "\x00"
        return ch * len(m.group(0))

    return _STRING_OR_COMMENT.sub(repl, sql)


_HINT = re.compile(r"\bJOIN\s*\[\s*(broadcast|shuffle)\s*\]\s*", re.IGNORECASE)
_TABLE_REF = re.compile(r"[A-Za-z_][\w.]*(?:\s+(?:AS\s+)?([A-Za-z_]\w*))?", re.IGNORECASE)
_SELECT = re.compile(r"\bSELECT\b", re.IGNORECASE)
_STRAIGHT = re.compile(r"\bSELECT\s+STRAIGHT_JOIN\b", re.IGNORECASE)
_COMPUTE_STATS = re.compile(
    r"^\s*COMPUTE\s+(?:INCREMENTAL\s+)?STATS\s+([\w.`]+)\s*$", re.IGNORECASE
)
_CREATE_DATA_SRC = re.compile(
    r"^\s*CREATE\s+DATA\s+SOURCE\s+(IF\s+NOT\s+EXISTS\s+)?(\w+)\s+"
    r"LOCATION\s+'([^']*)'\s+CLASS\s+'([^']+)'\s+API_VERSION\s+'([^']+)'\s*$",
    re.IGNORECASE,
)
_DROP_DATA_SRC = re.compile(
    r"^\s*DROP\s+DATA\s+SOURCE\s+(IF\s+EXISTS\s+)?(\w+)\s*$", re.IGNORECASE
)
_SHOW_DATA_SRCS = re.compile(
    r"^\s*SHOW\s+DATA\s+SOURCES(?:\s+LIKE\s+'([^']*)')?\s*$", re.IGNORECASE
)
_SHOW_STATS = re.compile(
    r"^\s*SHOW\s+(TABLE|COLUMN)\s+STATS\s+([\w.`]+)\s*$", re.IGNORECASE
)
_SHOW_FILES = re.compile(r"^\s*SHOW\s+FILES\s+IN\s+([\w.`]+)\s*$", re.IGNORECASE)
_INVALIDATE = re.compile(r"^\s*INVALIDATE\s+METADATA\s+([\w.`]+)\s*$", re.IGNORECASE)
_REFRESH = re.compile(r"^\s*REFRESH\s+([\w.`]+)\s*$", re.IGNORECASE)
_CREATE_LIKE_FILE = re.compile(
    r"^\s*CREATE\s+(?:EXTERNAL\s+)?TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([\w.`]+)\s+"
    r"LIKE\s+PARQUET\s+'([^']+)'\s*(?:STORED\s+AS\s+(\w+))?\s*$",
    re.IGNORECASE,
)
_LOAD_DATA = re.compile(
    r"^\s*LOAD\s+DATA\s+INPATH\s+'([^']+)'\s+(OVERWRITE\s+)?INTO\s+TABLE\s+"
    r"([\w.`]+)\s*(?:PARTITION\s*\(([^)]*)\))?\s*$",
    re.IGNORECASE,
)

_SPARK_HINT = {"broadcast": "BROADCAST", "shuffle": "SHUFFLE_HASH"}

# Words that can follow a table ref and must not be mistaken for an alias.
_KEYWORDS = {
    "ON", "USING", "JOIN", "INNER", "LEFT", "RIGHT", "FULL", "CROSS",
    "WHERE", "GROUP", "ORDER", "HAVING", "LIMIT", "UNION", "SELECT",
}

# Spark reserves a handful of keywords Impala treats as identifiers — none
# relevant to hint rewriting; quoting is passed through untouched.


def has_straight_join(sql: str) -> bool:
    return bool(_STRAIGHT.search(_mask(sql)))


def _governing_select(masked: str, pos: int) -> int | None:
    """Start offset of the SELECT governing the query block containing
    ``pos`` — a backward scan that skips over closed ``(...)`` groups, so a
    subquery's SELECT sitting textually between the outer SELECT and a
    hinted join (``SELECT ... FROM (SELECT ...) x JOIN [broadcast] s``)
    is not mistaken for the hint's home block. A Spark hint comment
    attached to the wrong block is silently dropped as unresolved."""
    depth = 0
    i = pos - 1
    while i >= 0:
        ch = masked[i]
        if ch == ")":
            depth += 1
        elif ch == "(" and depth > 0:
            depth -= 1
        elif depth == 0 and masked[i : i + 6].upper() == "SELECT":
            before = masked[i - 1] if i > 0 else " "
            after = masked[i + 6] if i + 6 < len(masked) else " "
            if not (before.isalnum() or before == "_") and not (
                after.isalnum() or after == "_"
            ):
                return i
        i -= 1
    return None


def parse_create_like_file(sql: str) -> dict | None:
    """Parse ``CREATE TABLE t LIKE PARQUET '<file>' [STORED AS fmt]`` —
    the reference's schema-inference DDL
    (fe/.../analysis/CreateTableLikeFileStmt.java; SURVEY §1.4). Returns
    None if the statement is not CREATE ... LIKE PARQUET."""
    m = _CREATE_LIKE_FILE.match(sql)
    if not m:
        return None
    return {
        "if_not_exists": bool(m.group(1)),
        "table": m.group(2).strip("`"),
        "path": m.group(3),
        "fmt": (m.group(4) or "parquet").lower(),
    }


def parse_data_source_ddl(sql: str) -> dict | None:
    """Parse the ext-data-source catalog verbs
    (fe/.../analysis/CreateDataSrcStmt.java, sql-parser.cup:1183):
    CREATE DATA SOURCE name LOCATION '...' CLASS '...' API_VERSION '...',
    DROP DATA SOURCE name, SHOW DATA SOURCES [LIKE 'pat']."""
    m = _CREATE_DATA_SRC.match(sql)
    if m:
        return {
            "op": "create",
            "if_not_exists": bool(m.group(1)),
            "name": m.group(2),
            "location": m.group(3),
            "class_name": m.group(4),
            "api_version": m.group(5),
        }
    m = _DROP_DATA_SRC.match(sql)
    if m:
        return {"op": "drop", "if_exists": bool(m.group(1)), "name": m.group(2)}
    m = _SHOW_DATA_SRCS.match(sql)
    if m:
        return {"op": "show", "pattern": m.group(1)}
    return None


def parse_show_stats(sql: str) -> dict | None:
    """Parse ``SHOW TABLE STATS t`` / ``SHOW COLUMN STATS t``
    (fe/.../analysis/ShowStatsStmt.java). Returns None for other
    statements; Engine.sql builds the stats result from the catalog."""
    m = _SHOW_STATS.match(sql)
    if not m:
        return None
    return {"kind": m.group(1).lower(), "table": m.group(2).strip("`")}


def parse_show_files(sql: str) -> dict | None:
    """Parse ``SHOW FILES IN t`` (fe/.../analysis/ShowFilesStmt.java)."""
    m = _SHOW_FILES.match(sql)
    if not m:
        return None
    return {"table": m.group(1).strip("`")}


def parse_load_data(sql: str) -> dict | None:
    """Parse ``LOAD DATA INPATH '<path>' [OVERWRITE] INTO TABLE t
    [PARTITION (k='v', ...)]`` (fe/.../analysis/LoadDataStmt.java).
    Returns None if the statement is not LOAD DATA. The reference moves
    files into the table directory; the Spark engine re-expresses it as a
    read + insertInto (Engine.sql), which additionally validates schema —
    a documented behavioral upgrade, same observable table state."""
    m = _LOAD_DATA.match(sql)
    if not m:
        return None
    partition: dict[str, str] = {}
    if m.group(4):
        for kv in m.group(4).split(","):
            k, _, v = kv.partition("=")
            partition[k.strip().strip("`")] = v.strip().strip("'\"")
    return {
        "path": m.group(1),
        "overwrite": bool(m.group(2)),
        "table": m.group(3).strip("`"),
        "partition": partition,
    }


_QUALIFY = re.compile(r"\bQUALIFY\b", re.IGNORECASE)
_WINDOW_CLAUSE = re.compile(r"\bWINDOW\s+[A-Za-z_]\w*\s+AS\b", re.IGNORECASE)
_FROM = re.compile(r"\bFROM\b", re.IGNORECASE)
_ORDER_OR_LIMIT = re.compile(r"\b(?:ORDER\s+BY|LIMIT)\b", re.IGNORECASE)
_AS_ALIAS = re.compile(r"\bAS\s+([A-Za-z_]\w*)\s*$", re.IGNORECASE)
_BARE_COLUMN = re.compile(r"^[A-Za-z_][\w.]*$")


def _find_depth0(masked: str, regex: re.Pattern, start: int = 0) -> re.Match | None:
    """First match of ``regex`` in ``masked`` at paren-depth 0 relative to
    ``start`` (string literals are already masked out, so parens inside
    literals don't count)."""
    for m in regex.finditer(masked, start):
        if masked.count("(", start, m.start()) == masked.count(")", start, m.start()):
            return m
    return None


def _split_top_commas(text: str) -> list[tuple[int, int]]:
    """(start, end) spans of top-level comma-separated items of ``text``."""
    spans, depth, item_start = [], 0, 0
    for i, ch in enumerate(text):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            spans.append((item_start, i))
            item_start = i + 1
    spans.append((item_start, len(text)))
    return spans


def _rewrite_qualify(sql: str) -> str:
    """Rewrite a single-block ``SELECT ... QUALIFY <pred>`` (Teradata /
    DuckDB / Snowflake surface; post-window filtering) into ANSI Spark SQL:

        SELECT <aliases> FROM (
            SELECT <select list>, (<pred with aliases inlined>) AS __qualify__
            FROM ...) __mis_qualify
        WHERE __qualify__ [ORDER BY/LIMIT tail]

    Select-list aliases referenced by the predicate are inlined as their
    defining expressions (Catalyst de-duplicates identical window specs, so
    the doubled window expr costs nothing), sidestepping Spark's
    lateral-column-alias restrictions on window expressions. Requires every
    select item to be a bare column or carry an ``AS`` alias — the
    registered dialect surface, not an arbitrary-SQL parser."""
    masked = _mask(sql)
    qual = _find_depth0(masked, _QUALIFY)
    if not qual:
        return sql
    sel = _find_depth0(masked, _SELECT)
    if not sel:
        return sql
    frm = _find_depth0(masked, _FROM, sel.end())
    if not frm or frm.start() > qual.start():
        return sql
    # All span math below runs on the masked text (same _mask discipline
    # as the rest of translate) and slices replacement text out of the raw
    # string by position — so parens/commas/AS inside string literals never
    # derail item splitting, and alias tokens inside literals are never
    # rewritten. Identifiers are unmasked, so masked spans == raw spans.
    sel_text = sql[sel.end(): frm.start()]
    masked_sel = masked[sel.end(): frm.start()]
    aliases: list[str] = []
    exprs: dict[str, str] = {}
    for a, b in _split_top_commas(masked_sel):
        item = sel_text[a:b].strip()
        m = _AS_ALIAS.search(masked_sel[a:b].rstrip())
        if m:
            aliases.append(m.group(1))
            exprs[m.group(1)] = sel_text[a:b][: m.start()].strip()
        elif _BARE_COLUMN.match(item):
            aliases.append(item.split(".")[-1])
        else:
            raise ValueError(
                "QUALIFY rewrite requires aliased select items: " + item
            )
    tail_m = _find_depth0(masked, _ORDER_OR_LIMIT, qual.end())
    tail_pos = tail_m.start() if tail_m else len(sql)
    # A named-WINDOW clause belongs BEFORE QUALIFY (the DuckDB/SQL:2003
    # clause order; it then lands inside the subquery with the OVER w
    # refs that need it). After QUALIFY it would silently be absorbed
    # into the predicate — reject instead of emitting broken SQL.
    if _find_depth0(masked[qual.end(): tail_pos], _WINDOW_CLAUSE):
        raise ValueError(
            "QUALIFY rewrite: WINDOW clause must precede QUALIFY"
        )
    pred = sql[qual.end(): tail_pos].strip()
    tail = sql[tail_pos:].strip()
    if exprs:
        masked_pred = masked[qual.end(): tail_pos]
        raw_pred = sql[qual.end(): tail_pos]
        parts: list[str] = []
        last = 0
        for m in re.finditer(r"\b[A-Za-z_]\w*\b", masked_pred):
            name = m.group(0)
            if name not in exprs:
                continue
            # Skip the column part of qualified refs (t.rn), alias-as-
            # qualifier (rn.x), and function-name collisions (rn(...)).
            before = masked_pred[m.start() - 1] if m.start() > 0 else ""
            j = m.end()
            while j < len(masked_pred) and masked_pred[j].isspace():
                j += 1
            after = masked_pred[j] if j < len(masked_pred) else ""
            if before == "." or after in ".(":
                continue
            parts.append(raw_pred[last: m.start()])
            parts.append(f"({exprs[name]})")
            last = m.end()
        parts.append(raw_pred[last:])
        pred = "".join(parts).strip()
    inner = (
        f"SELECT {sel_text.strip()}, ({pred}) AS __qualify__ "
        f"{sql[frm.start(): qual.start()].strip()}"
    )
    outer = (
        f"SELECT {', '.join(aliases)} FROM ({inner}) __mis_qualify "
        f"WHERE __qualify__"
    )
    return f"{outer} {tail}".strip()


_AGG_NAMES = {
    "ndv": "approx_count_distinct",
    "distinctpc": "approx_count_distinct",
    "distinctpcsa": "approx_count_distinct",
    "appx_median": "median",
    "variance_pop": "var_pop",
    "variance_samp": "var_samp",
}
_AGG_RENAME = re.compile(
    r"\b(" + "|".join(_AGG_NAMES) + r")\s*(?=\()", re.IGNORECASE
)

_BOOL_OP = re.compile(r"&&|\|\|")

_IREGEXP = re.compile(r"\bIREGEXP\b", re.IGNORECASE)


# Tokens of LOWER precedence than IREGEXP in the reference grammar
# (fe/src/main/cup/sql-parser.cup ranks like_predicate below the boolean/
# comparison tiers but ABOVE arithmetic): hitting one of these at depth 0
# ends the operand. Arithmetic ('p1 + p2') stays inside the operand.
_IREGEXP_STOP = {
    "AND", "OR", "NOT", "IS", "IN", "BETWEEN", "LIKE", "ILIKE", "RLIKE",
    "REGEXP", "IREGEXP", "DIV", "FROM", "WHERE", "GROUP", "ORDER",
    "HAVING", "LIMIT", "OFFSET", "UNION", "INTERSECT", "EXCEPT", "JOIN",
    "ON", "USING", "WHEN", "THEN", "ELSE", "END", "AS", "ASC", "DESC",
    "INNER", "LEFT", "RIGHT", "FULL", "CROSS",
}


def _skip_ws_comments(masked: str, raw: str, i: int) -> int:
    """Advance past whitespace and masked COMMENT runs (comments mask to
    \\x01, literals to \\x00 — distinct placeholders, so an abutting
    comment+literal stays separable and only the comment is skipped)."""
    n = len(masked)
    while i < n:
        if masked[i].isspace():
            i += 1
        elif masked[i] == "\x01":
            while i < n and masked[i] == "\x01":
                i += 1
        else:
            break
    return i


def _operand_end(masked: str, raw: str, start: int) -> int:
    """End offset of the IREGEXP right operand beginning at ``start``.
    The reference grammar binds IREGEXP LOWER than arithmetic, so the
    operand spans depth-0 whitespace-separated arithmetic terms
    ('p1 + p2') and ends only at a boundary of lower precedence: comma,
    closing paren, a comparison/boolean operator, a stop keyword, or end
    of text. Interior comment runs are skipped without extending the
    operand; trailing whitespace/comments are excluded."""
    n = len(masked)
    i = start
    last_end = start
    depth = 0
    while i < n:
        ch = masked[i]
        if ch == "\x00":  # string literal run: part of the operand
            while i < n and masked[i] == "\x00":
                i += 1
            last_end = i
            continue
        if ch == "\x01":  # comment run: skipped, never extends operand
            while i < n and masked[i] == "\x01":
                i += 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            if depth == 0:
                break
            depth -= 1
        elif depth == 0:
            if ch.isspace():
                i += 1
                continue
            if ch in ",;" or ch in "=<>!" or ch in "|&":
                break
            if ch.isalpha() or ch == "_":
                j = i
                while j < n and (masked[j].isalnum() or masked[j] == "_"):
                    j += 1
                if masked[i:j].upper() in _IREGEXP_STOP:
                    break
                i = j
                last_end = i
                continue
        i += 1
        last_end = i
    return last_end


def translate(sql: str) -> str:
    """Rewrite an Impala-dialect statement into Spark SQL text."""
    m = _COMPUTE_STATS.match(sql)
    if m:
        # The reference's COMPUTE STATS fills table-level row counts AND
        # per-column stats in one verb (ComputeStatsStmt.java runs a
        # count(*) query plus a per-column NDV query); Spark's FOR ALL
        # COLUMNS form does the same (AnalyzeColumnCommand also updates
        # table sizeInBytes/rowCount).
        return f"ANALYZE TABLE {m.group(1)} COMPUTE STATISTICS FOR ALL COLUMNS"
    m = _INVALIDATE.match(sql)
    if m:
        return f"REFRESH TABLE {m.group(1)}"
    m = _REFRESH.match(sql)
    if m and m.group(1).upper() not in ("TABLE", "FUNCTION"):
        return f"REFRESH TABLE {m.group(1)}"

    sql = _rewrite_qualify(sql)
    masked = _mask(sql)

    # All in-place rewrites below are length-preserving (padded with
    # spaces) so mask offsets remain valid for every subsequent edit;
    # the final hint-comment injections run right-to-left.
    out = sql

    def _splice(s: str, start: int, end: int, text: str) -> str:
        return s[:start] + text.ljust(end - start) + s[end:]

    # Strip STRAIGHT_JOIN (the Engine pins join order via config instead).
    for m in reversed(list(_STRAIGHT.finditer(masked))):
        out = _splice(out, m.start(), m.end(), "SELECT")
        masked = _splice(masked, m.start(), m.end(), "SELECT")

    # Rewrite [broadcast]/[shuffle] join hints.
    hints: list[tuple[int, str, str]] = []  # (select_end_pos, kind, table_alias)
    for m in reversed(list(_HINT.finditer(masked))):
        kind = m.group(1).lower()
        ref = _TABLE_REF.match(masked, m.end())
        if not ref:
            continue
        alias = ref.group(1)
        if alias and alias.upper() in _KEYWORDS:
            alias = None
        name = (alias or ref.group(0).split()[0]).split(".")[-1]
        sel_pos = _governing_select(masked, m.start())
        if sel_pos is None:
            continue
        hints.append((sel_pos + 6, kind, name))
        out = _splice(out, m.start(), m.end(), "JOIN ")
        masked = _splice(masked, m.start(), m.end(), "JOIN ")

    # Inject hint comments right after their governing SELECT (rightmost
    # insertion first so earlier offsets stay valid).
    for pos, kind, name in sorted(hints, reverse=True):
        comment = f" /*+ {_SPARK_HINT[kind]}({name}) */"
        out = out[:pos] + comment + out[pos:]

    # AGGREGATE-name renames, last (they change lengths, so they must run
    # after every offset-based edit; right-to-left keeps earlier match
    # offsets valid). These cannot be session SQL UDFs like the scalar
    # residue: CREATE FUNCTION bodies are scalar-only, so sketch/variance
    # aggregate spellings are a pure syntactic rename —
    # ndv/distinctpc/distinctpcsa (aggregate-functions.h:126 HLL) →
    # approx_count_distinct (Spark's HLL++), appx_median → median,
    # variance_pop/variance_samp (BuiltinsDb.java alias spellings) →
    # var_pop/var_samp.
    masked = _mask(out)
    for m in reversed(list(_AGG_RENAME.finditer(masked))):
        out = out[: m.start(1)] + _AGG_NAMES[m.group(1).lower()] + out[m.end(1):]

    # IREGEXP (LikePredicate.java:36): regex match with case sensitivity
    # OFF (be/src/exprs/like-predicate.cc:136 RegexPrepareInternal(...,
    # false)). Spark spelling: RLIKE with the inline (?i) flag — injected
    # into literal patterns, concat('(?i)', x) around non-literal ones.
    masked = _mask(out)
    for m in reversed(list(_IREGEXP.finditer(masked))):
        j = _skip_ws_comments(masked, out, m.end())
        end = _operand_end(masked, out, j)
        operand = out[j:end]
        if end <= j:
            raise ValueError(
                f"IREGEXP with no parseable right operand at offset {j}: "
                f"{sql!r}"
            )
        if operand.startswith("'") and set(masked[j:end]) == {"\x00"}:
            # Whole operand is ONE string literal — inject the flag inline.
            repl = "RLIKE " + operand[0] + "(?i)" + operand[1:]
        else:
            repl = f"RLIKE concat('(?i)', {operand})"
        out = out[: m.start()] + repl + out[end:]

    # Impala boolean operators: the reference's lexer maps '&&' → KW_AND
    # and '||' → KW_OR unconditionally (fe/src/main/jflex/
    # sql-scanner.flex:52,155) — in this dialect '||' is ALWAYS logical OR,
    # never string concat (that's the concat() function). Spark rejects
    # '&&' at parse time and reads '||' as concat (a silent wrong answer),
    # so both rewrite textually; prefix '!' needs no rewrite (Spark accepts
    # it as NOT). Right-to-left over the mask, after every offset-based
    # edit (the replacements change lengths).
    masked = _mask(out)
    for m in reversed(list(_BOOL_OP.finditer(masked))):
        word = "AND" if m.group() == "&&" else "OR"
        left = out[m.start() - 1] if m.start() > 0 else " "
        right = out[m.end()] if m.end() < len(out) else " "
        word = ("" if left.isspace() else " ") + word
        word = word + ("" if right.isspace() else " ")
        out = out[: m.start()] + word + out[m.end():]

    return out
