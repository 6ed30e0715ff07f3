"""Property-based tests (hypothesis) for the dialect translator's string
machinery — the masked-text invariants the r6 QUALIFY rewrite relies on:
_mask is length-preserving and identifier-transparent, _split_top_commas
over the mask never splits inside literals/parens, and _rewrite_qualify
never corrupts string literals or qualified refs regardless of the
generated predicate shape."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from minimised_impala_spark import dialect

_ident = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,8}", fullmatch=True)

# Aliases used in the QUALIFY templates below must not collide with the
# template's own column names (a, b, t) or with unquoted SQL keywords:
# QUALIFY resolves a colliding alias first (alias shadows the base
# column), so `a <> '...'` with alias=a legitimately inlines BOTH
# predicate refs — correct behavior that the count-based assertions
# here can't distinguish from corruption. Keyword "aliases" are simply
# invalid unquoted SQL. hypothesis found the alias='a' case on a fresh
# DB run (2026-08-15).
_TEMPLATE_WORDS = frozenset(
    w.lower()
    for w in (
        "select row_number rank over order by as from t qualify and "
        "a b where not"
    ).split()
)
_alias = _ident.filter(lambda s: s.lower() not in _TEMPLATE_WORDS)
_lit = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters=" ,()"
    ),
    max_size=12,
)


@given(_lit)
@settings(max_examples=200)
def test_mask_is_length_preserving(text):
    sql = f"SELECT '{text}' AS s, a FROM t"
    masked = dialect._mask(sql)
    assert len(masked) == len(sql)
    # everything outside the literal is untouched
    assert masked.startswith("SELECT ")
    assert masked.endswith(" AS s, a FROM t")


@given(st.lists(_ident, min_size=1, max_size=5, unique=True), _lit)
@settings(max_examples=200)
def test_split_top_commas_ignores_literal_commas_and_parens(names, lit):
    items = [f"{n} AS a_{n}" for n in names] + [f"'{lit}' AS p"]
    sel = ", ".join(items)
    masked = dialect._mask(sel)
    spans = dialect._split_top_commas(masked)
    assert len(spans) == len(items)
    assert [sel[a:b].strip() for a, b in spans] == items


@given(_alias, _lit, st.integers(min_value=1, max_value=9))
@settings(max_examples=200)
def test_rewrite_qualify_never_corrupts_literals(alias, lit, k):
    lit = lit.replace("'", "")
    sql = (
        f"SELECT a, row_number() OVER (ORDER BY b) AS {alias} "
        f"FROM t QUALIFY {alias} <= {k} AND a <> '{lit}'"
    )
    out = dialect._rewrite_qualify(sql)
    # the literal survives byte-for-byte even when it contains the alias
    assert f"'{lit}'" in out
    assert not re.search(r"\bQUALIFY\b", out, re.IGNORECASE)
    # the alias WAS inlined in the predicate position
    assert out.count("row_number() OVER (ORDER BY b)") == 2


@given(_alias, st.integers(min_value=1, max_value=9))
@settings(max_examples=200)
def test_rewrite_qualify_keeps_qualified_refs(alias, k):
    sql = (
        f"SELECT t.a, rank() OVER (ORDER BY t.b) AS {alias} "
        f"FROM t QUALIFY {alias} <= {k} AND t.{alias} > 0"
    )
    out = dialect._rewrite_qualify(sql)
    assert f"t.{alias} > 0" in out  # base-column ref untouched
    assert "t.(rank()" not in out
