"""Randomized differential testing — the engine's analogue of the
reference's random-query comparison framework
(tests/comparison/query_generator.py + discrepancy_searcher.py, which
diffed Impala against Postgres/MySQL; SURVEY §5.6). A seeded generator
emits ANSI SELECTs that are valid in both dialects; each runs on Spark and
DuckDB over the same parquet and must produce identical canonical rows.

Determinism: aggregates over 2-decimal fixed-point DOUBLE columns use the
scaled-sum rounding shim (see queries/tpch.py module doc); floats are
canonicalized to 9 significant digits by tests.oracle.
"""

from __future__ import annotations

import random

import pytest

from tests.oracle import canon_rows, duckdb_connect

TABLES = {
    "orders": {
        "numeric": ["o_orderkey", "o_custkey", "o_totalprice"],
        "unique": ["o_orderkey"],
        "money": ["o_totalprice"],
        "group": ["o_orderstatus", "o_orderpriority"],
        "string": {"o_orderstatus": ["F", "O", "P"]},
    },
    "lineitem": {
        "numeric": ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity"],
        # NOTE: (l_orderkey, l_linenumber) is NOT unique in the synthetic
        # fixture (the generator reuses line numbers); this 5-tuple is
        # verified unique at every SF, keeping ORDER BY+LIMIT deterministic.
        "unique": ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice"],
        "money": ["l_extendedprice"],
        "group": ["l_returnflag", "l_linestatus"],
        "string": {"l_returnflag": ["A", "N", "R"]},
    },
    "customer": {
        "numeric": ["c_custkey", "c_nationkey", "c_acctbal"],
        "unique": ["c_custkey"],
        "money": ["c_acctbal"],
        "group": ["c_mktsegment"],
        "string": {"c_mktsegment": ["BUILDING", "MACHINERY", "HOUSEHOLD", "AUTOMOBILE", "FURNITURE"]},
    },
}

N_QUERIES = 48


def _preds(rng: random.Random, meta: dict) -> list[str]:
    preds = []
    for _ in range(rng.randint(0, 3)):
        kind = rng.random()
        if kind < 0.5:
            col = rng.choice(meta["numeric"])
            op = rng.choice(["<", "<=", ">", ">=", "<>"])
            preds.append(f"{col} {op} {rng.randint(0, 5000)}")
        elif kind < 0.8 and meta["string"]:
            col = rng.choice(list(meta["string"]))
            vals = rng.sample(meta["string"][col], rng.randint(1, 2))
            quoted = ", ".join(f"'{v}'" for v in vals)
            neg = "NOT " if rng.random() < 0.3 else ""
            preds.append(f"{col} {neg}IN ({quoted})")
        else:
            col = rng.choice(meta["numeric"])
            lo = rng.randint(0, 2000)
            preds.append(f"{col} BETWEEN {lo} AND {lo + rng.randint(1, 3000)}")
    return preds


def _gen_query(rng: random.Random) -> str:
    table = rng.choice(list(TABLES))
    meta = TABLES[table]

    preds = _preds(rng, meta)
    where = (" WHERE " + " AND ".join(preds)) if preds else ""
    key = meta["unique"]
    keys = ", ".join(key)

    branch = rng.random()

    if branch < 0.12:
        # window branch: analytics over a unique order are deterministic
        g = rng.choice(meta["group"])
        m = rng.choice(meta["money"])
        over = f"OVER (PARTITION BY {g} ORDER BY {keys})"
        return (
            f"SELECT {keys}, {g}, "
            f"row_number() {over} AS rn, rank() {over} AS rk, "
            f"lag({m}) {over} AS lg "
            f"FROM {table}{where} ORDER BY {keys} LIMIT {rng.randint(20, 200)}"
        )
    if branch < 0.22:
        # scalar-expression branch (both-dialect function subset)
        g = rng.choice(meta["group"])
        m = rng.choice(meta["money"])
        n = rng.choice(meta["numeric"])
        return (
            f"SELECT {keys}, upper({g}) AS u, length({g}) AS ln, "
            f"CAST(floor({m}) AS BIGINT) AS fl, round({m}, 1) AS r1, "
            f"CASE WHEN {n} % 2 = 0 THEN 'even' ELSE 'odd' END AS par, "
            f"coalesce(nullif({g}, 'F'), 'X') AS cn "
            f"FROM {table}{where} ORDER BY {keys} LIMIT {rng.randint(20, 200)}"
        )
    if branch < 0.32:
        # set-operation branch (UNION ALL keeps dup ties — identical
        # tuples, so LIMIT stays deterministic; INTERSECT/EXCEPT dedup)
        op = rng.choice(["UNION ALL", "INTERSECT", "EXCEPT"])
        p2 = _preds(rng, meta)
        w2 = (" WHERE " + " AND ".join(p2)) if p2 else ""
        return (
            f"SELECT {keys} FROM {table}{where} {op} "
            f"SELECT {keys} FROM {table}{w2} "
            f"ORDER BY {keys} LIMIT {rng.randint(20, 200)}"
        )
    if branch < 0.40:
        # IN-subquery branch (semi-join rewrite on both engines)
        if table == "orders":
            sub = f"SELECT c_custkey FROM customer WHERE c_acctbal > {rng.randint(0, 8000)}"
            incol = "o_custkey"
        elif table == "lineitem":
            sub = f"SELECT o_orderkey FROM orders WHERE o_totalprice > {rng.randint(0, 50000)}"
            incol = "l_orderkey"
        else:
            sub = f"SELECT o_custkey FROM orders WHERE o_totalprice > {rng.randint(0, 50000)}"
            incol = "c_custkey"
        neg = "NOT " if rng.random() < 0.3 else ""
        return (
            f"SELECT {keys} FROM {table}{where}"
            f"{' AND' if preds else ' WHERE'} {incol} {neg}IN ({sub}) "
            f"ORDER BY {keys} LIMIT {rng.randint(20, 200)}"
        )

    if branch < 0.70:
        gcol = rng.choice(meta["group"])
        mcol = rng.choice(meta["money"])
        ncol = rng.choice(meta["numeric"])
        aggs = [
            "count(*) AS n",
            f"min({ncol}) AS mn",
            f"max({ncol}) AS mx",
            f"round(sum({mcol}) * 100) / 100 AS s",
        ]
        if rng.random() < 0.5:
            aggs.append(f"count(DISTINCT {gcol}) AS nd")
        having = (
            f" HAVING count(*) > {rng.randint(0, 1000)}" if rng.random() < 0.4 else ""
        )
        return (
            f"SELECT {gcol}, {', '.join(aggs)} FROM {table}{where} "
            f"GROUP BY {gcol}{having} ORDER BY {gcol}"
        )
    if rng.random() < 0.5:
        # join branch: orders⋈customer or lineitem⋈orders, grouped agg
        if table == "customer" or (table == "orders" and rng.random() < 0.5):
            join = "orders JOIN customer ON o_custkey = c_custkey"
            gcol, mcol = rng.choice(["o_orderstatus", "c_mktsegment"]), "o_totalprice"
        else:
            join = "lineitem JOIN orders ON o_orderkey = l_orderkey"
            gcol, mcol = rng.choice(["l_returnflag", "o_orderpriority"]), "l_extendedprice"
        jwhere = where.replace(" WHERE ", " WHERE ", 1) if preds else ""
        return (
            f"SELECT {gcol}, count(*) AS n, "
            f"round(sum({mcol}) * 100) / 100 AS s FROM {join}{jwhere} "
            f"GROUP BY {gcol} ORDER BY {gcol}"
        )
    # projection branch: order by the table's unique key so LIMIT is
    # deterministic across engines
    cols = rng.sample(meta["numeric"], 2)
    key = meta["unique"]
    sel = ", ".join(dict.fromkeys([*key, *cols]))
    return (
        f"SELECT {sel} FROM {table}{where} "
        f"ORDER BY {', '.join(key)} LIMIT {rng.randint(1, 200)}"
    )


# ---------------------------------------------------------------------------
# events-table branch (round-2 gap: fuzzing covered only the TPC-H schema, so
# the events loader regression was invisible to it; VERDICT r2 §next.10).
# Timestamp shapes both dialects agree on: literal comparison under a UTC
# session, date_trunc buckets, lag/lead over a per-user ordering.  event_id
# is unique at every SF (checked in fixture stats), so ORDER BY event_id
# keeps LIMIT deterministic.  props (JSON) is excluded: JSON-path dialects
# diverge and are pinned separately by events_json_extract's oracle.

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _gen_events_query(rng: random.Random) -> str:
    preds = []
    for _ in range(rng.randint(0, 2)):
        kind = rng.random()
        if kind < 0.35:
            day = rng.randint(1, 28)
            op = rng.choice(["<", ">=", ">"])
            preds.append(f"ts {op} TIMESTAMP '2024-01-{day:02d} 12:00:00'")
        elif kind < 0.6:
            vals = rng.sample(_EVENT_TYPES, rng.randint(1, 3))
            quoted = ", ".join(f"'{v}'" for v in vals)
            neg = "NOT " if rng.random() < 0.3 else ""
            preds.append(f"event_type {neg}IN ({quoted})")
        elif kind < 0.8:
            preds.append(f"value {rng.choice(['<', '>='])} {rng.randint(1, 300)}")
        else:
            preds.append(f"user_id {rng.choice(['<', '>='])} {rng.randint(1, 14)}")
    where = (" WHERE " + " AND ".join(preds)) if preds else ""
    branch = rng.random()
    if branch < 0.35:
        # CAST pins the bucket type: DuckDB date_trunc('day') yields DATE,
        # Spark yields TIMESTAMP
        unit = rng.choice(["hour", "day"])
        return (
            f"SELECT CAST(date_trunc('{unit}', ts) AS TIMESTAMP) AS bucket, event_type, "
            f"count(*) AS n, round(sum(value) * 100) / 100 AS s, "
            f"CAST(min(event_id) AS BIGINT) AS mn "
            f"FROM events{where} GROUP BY bucket, event_type "
            f"ORDER BY bucket, event_type"
        )
    if branch < 0.6:
        over = "OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        return (
            f"SELECT event_id, user_id, row_number() {over} AS rn, "
            f"lag(event_type) {over} AS prev_type "
            f"FROM events{where} ORDER BY event_id LIMIT {rng.randint(20, 400)}"
        )
    if branch < 0.8:
        return (
            f"SELECT user_id, event_type, count(*) AS n, "
            f"round(sum(value) * 100) / 100 AS s, "
            f"min(ts) AS first_ts, max(ts) AS last_ts "
            f"FROM events{where} GROUP BY user_id, event_type "
            f"ORDER BY user_id, event_type"
        )
    return (
        f"SELECT event_id, user_id, event_type, value FROM events{where} "
        f"ORDER BY event_id LIMIT {rng.randint(1, 300)}"
    )


N_EVENT_QUERIES = 16


# ---------------------------------------------------------------------------
# documents-table branch: string-function surface over free text. Only
# shapes both dialects define identically: upper/lower/length/substr/
# replace/trim, LIKE, concatenation via ||, and grouped aggregates over
# derived string keys. doc_id is unique → deterministic ORDER BY + LIMIT.


def _gen_docs_query(rng: random.Random) -> str:
    preds = []
    for _ in range(rng.randint(0, 2)):
        kind = rng.random()
        if kind < 0.4:
            preds.append(f"doc_id {rng.choice(['<', '>='])} {rng.randint(100, 900)}")
        elif kind < 0.7:
            preds.append(f"length(text) {rng.choice(['<', '>='])} {rng.randint(120, 400)}")
        else:
            w = rng.choice(["the", "and", "data", "of", "a"])
            neg = "NOT " if rng.random() < 0.3 else ""
            preds.append(f"text {neg}LIKE '%{w}%'")
    where = (" WHERE " + " AND ".join(preds)) if preds else ""
    branch = rng.random()
    if branch < 0.4:
        return (
            f"SELECT doc_id, upper(substr(text, 1, 8)) AS head, "
            f"length(text) AS n, replace(lang, 'en', 'EN') AS lang2, "
            f"source || ':' || lang AS src_lang "
            f"FROM documents{where} ORDER BY doc_id LIMIT {rng.randint(20, 300)}"
        )
    if branch < 0.75:
        return (
            f"SELECT source, lang, count(*) AS n, "
            f"CAST(sum(length(text)) AS BIGINT) AS chars, "
            f"min(doc_id) AS first_doc, "
            f"max(substr(text, 1, 4)) AS max_head "
            f"FROM documents{where} GROUP BY source, lang ORDER BY source, lang"
        )
    # floor() before the int cast: CAST(double AS BIGINT) truncates in
    # Spark (non-ANSI, the engine's pinned semantics) but ROUNDS in DuckDB
    return (
        f"SELECT substr(lang, 1, 2) AS l2, "
        f"CAST(floor(avg(length(text))) AS BIGINT) AS avg_chars, count(*) AS n "
        f"FROM documents{where} GROUP BY l2 "
        f"HAVING count(*) > {rng.randint(0, 50)} ORDER BY l2"
    )


N_DOC_QUERIES = 12


# ---------------------------------------------------------------------------
# part/supplier branch: covers the two fixture tables no other branch
# touches — dimension-style filters, a part⋈supplier-size theta-free join
# via modulo bucketing, and grouped aggregates over p_brand/p_type.


def _gen_part_query(rng: random.Random) -> str:
    preds = []
    for _ in range(rng.randint(0, 2)):
        kind = rng.random()
        if kind < 0.4:
            preds.append(f"p_size {rng.choice(['<', '>=', '='])} {rng.randint(1, 50)}")
        elif kind < 0.7:
            preds.append(f"p_retailprice {rng.choice(['<', '>='])} {rng.randint(900, 2000)}")
        else:
            b = rng.randint(1, 5)
            preds.append(f"p_brand LIKE 'Brand#{b}%'")
    where = (" WHERE " + " AND ".join(preds)) if preds else ""
    branch = rng.random()
    if branch < 0.4:
        return (
            f"SELECT p_brand, count(*) AS n, min(p_size) AS mn, max(p_size) AS mx, "
            f"round(sum(p_retailprice) * 100) / 100 AS s "
            f"FROM part{where} GROUP BY p_brand ORDER BY p_brand"
        )
    if branch < 0.7:
        return (
            f"SELECT p_partkey, p_brand, p_size, upper(substr(p_type, 1, 6)) AS t6 "
            f"FROM part{where} ORDER BY p_partkey LIMIT {rng.randint(20, 300)}"
        )
    return (
        f"SELECT s.s_nationkey, count(*) AS n, "
        f"round(sum(p.p_retailprice) * 100) / 100 AS s "
        f"FROM part p JOIN supplier s ON p.p_partkey % 100 = s.s_suppkey % 100"
        f"{where.replace('WHERE', 'WHERE') if preds else ''} "
        f"GROUP BY s.s_nationkey ORDER BY s.s_nationkey"
    )


N_PART_QUERIES = 10


# ---------------------------------------------------------------------------
# derived-partsupp branch (r9): randomized coverage of the in-query
# partsupp family behind the real tpch_q2/q11 ports — the relation both
# engines construct from part × the supplier count (queries/tpch.py
# `_PS_CTE`). All metrics are exact integer cents, so any disagreement
# is structural (the modular supplier assignment, div semantics, window
# tie-breaks), never FP. Dialect seams handled by to_duck_dialect:
# Spark `div` → DuckDB `//`, Spark `array(` → DuckDB `list_value(`.

_PS_FUZZ_CTE = (
    "WITH s_n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM supplier), "
    "ps0 AS (SELECT p_partkey AS ps_partkey, p_size, "
    "(p_partkey + (p_partkey - 1) div n + j * (n div 4)) % n + 1 AS ps_suppkey "
    "FROM part CROSS JOIN s_n "
    "CROSS JOIN (SELECT explode(array(0, 1, 2, 3)) AS j) g), "
    "ps AS (SELECT ps_partkey, ps_suppkey, p_size, "
    "(ps_partkey * 7 + ps_suppkey * 11) % 9999 + 1 AS ps_availqty, "
    "(ps_partkey * 31 + ps_suppkey * 17) % 100000 + 100 AS ps_cost_c "
    "FROM ps0) "
)


def _gen_partsupp_query(rng: random.Random) -> str:
    branch = rng.random()
    if branch < 0.3:
        op = rng.choice(["<", ">=", "="])
        return (
            f"{_PS_FUZZ_CTE}"
            f"SELECT ps_suppkey, CAST(count(*) AS BIGINT) AS n_parts, "
            f"CAST(sum(ps_cost_c * ps_availqty) AS BIGINT) AS v "
            f"FROM ps WHERE p_size {op} {rng.randint(1, 50)} "
            f"GROUP BY ps_suppkey ORDER BY v DESC, ps_suppkey "
            f"LIMIT {rng.randint(5, 60)}"
        )
    if branch < 0.55:
        return (
            f"{_PS_FUZZ_CTE}"
            f"SELECT ps_partkey, CAST(min(ps_cost_c) AS BIGINT) AS mc, "
            f"CAST(max(ps_availqty) AS BIGINT) AS mq "
            f"FROM ps GROUP BY ps_partkey "
            f"HAVING min(ps_cost_c) < {rng.randint(5000, 95000)} "
            f"ORDER BY ps_partkey LIMIT {rng.randint(20, 200)}"
        )
    if branch < 0.8:
        return (
            f"{_PS_FUZZ_CTE}"
            f"SELECT s_nationkey, "
            f"CAST(sum(ps_cost_c * ps_availqty) AS BIGINT) AS v, "
            f"CAST(count(DISTINCT ps_partkey) AS BIGINT) AS np "
            f"FROM ps JOIN supplier ON s_suppkey = ps_suppkey "
            f"WHERE ps_availqty {rng.choice(['<', '>='])} {rng.randint(1000, 9000)} "
            f"GROUP BY s_nationkey ORDER BY s_nationkey"
        )
    return (
        f"{_PS_FUZZ_CTE}"
        f"SELECT ps_partkey, ps_suppkey, ps_cost_c FROM ("
        f"SELECT ps_partkey, ps_suppkey, ps_cost_c, "
        f"row_number() OVER (PARTITION BY ps_partkey "
        f"ORDER BY ps_cost_c, ps_suppkey) AS rn FROM ps) t "
        f"WHERE rn = {rng.randint(1, 4)} "
        f"ORDER BY ps_partkey LIMIT {rng.randint(20, 200)}"
    )


N_PARTSUPP_QUERIES = 12


# ---------------------------------------------------------------------------
# events WINDOW branch (VERDICT r3 §next.8): analytic functions over
# (user, time) orderings are where engine disagreement hides — frame
# boundary inclusion, tie handling, and windowed-aggregate accumulation
# order.  Rules that keep both dialects bit-identical:
#   - every row-dependent ordering ends with event_id (unique) so frames
#     and LIMITs are deterministic;
#   - windowed sum/avg over the 2-decimal `value` column uses the
#     scaled-round shim (DuckDB evaluates window sums with segment trees,
#     a different accumulation order than Spark's running fold);
#   - ratio functions (percent_rank/cume_dist) are exact: both engines
#     divide the same two integers;
#   - RANGE numeric frames order by `value` alone (Spark requires a
#     single ORDER BY column for numeric offsets); the peer set is
#     value-determined, so ties are identical.


def _gen_window_query(rng: random.Random) -> str:
    preds = []
    for _ in range(rng.randint(0, 2)):
        kind = rng.random()
        if kind < 0.4:
            day = rng.randint(1, 28)
            preds.append(f"ts {rng.choice(['<', '>='])} TIMESTAMP '2024-01-{day:02d} 00:00:00'")
        elif kind < 0.7:
            vals = rng.sample(_EVENT_TYPES, rng.randint(1, 3))
            quoted = ", ".join(f"'{v}'" for v in vals)
            preds.append(f"event_type IN ({quoted})")
        else:
            preds.append(f"user_id {rng.choice(['<', '>='])} {rng.randint(2, 14)}")
    where = (" WHERE " + " AND ".join(preds)) if preds else ""
    part = rng.choice(["user_id", "event_type"])
    branch = rng.random()
    if branch < 0.3:
        # ROWS frame aggregates
        k = rng.randint(1, 5)
        end = rng.choice(["CURRENT ROW", "1 FOLLOWING"])
        over = (
            f"OVER (PARTITION BY {part} ORDER BY ts, event_id "
            f"ROWS BETWEEN {k} PRECEDING AND {end})"
        )
        return (
            f"SELECT event_id, {part}, "
            f"round(sum(value) {over} * 100) / 100 AS s, "
            f"min(value) {over} AS mn, max(value) {over} AS mx, "
            f"count(*) {over} AS n "
            f"FROM events{where} ORDER BY event_id LIMIT {rng.randint(50, 400)}"
        )
    if branch < 0.5:
        # ranking family over a unique (value, event_id) ordering
        d = rng.choice(["", " DESC"])
        over = f"OVER (PARTITION BY {part} ORDER BY value{d}, event_id)"
        return (
            f"SELECT event_id, {part}, "
            f"rank() {over} AS rk, dense_rank() {over} AS drk, "
            f"percent_rank() {over} AS prk, cume_dist() {over} AS cd, "
            f"ntile({rng.randint(2, 7)}) {over} AS nt "
            f"FROM events{where} ORDER BY event_id LIMIT {rng.randint(50, 400)}"
        )
    if branch < 0.7:
        # first/last/nth over an explicit full frame
        over = (
            f"OVER (PARTITION BY {part} ORDER BY ts, event_id "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
        )
        n = rng.randint(2, 4)
        return (
            f"SELECT event_id, {part}, "
            f"first_value(event_type) {over} AS fv, "
            f"last_value(event_type) {over} AS lv, "
            f"nth_value(event_type, {n}) {over} AS nv "
            f"FROM events{where} ORDER BY event_id LIMIT {rng.randint(50, 400)}"
        )
    if branch < 0.85:
        # RANGE numeric-offset frame ordered by value alone
        span = rng.randint(10, 120)
        over = (
            f"OVER (PARTITION BY {part} ORDER BY value "
            f"RANGE BETWEEN {span} PRECEDING AND CURRENT ROW)"
        )
        return (
            f"SELECT event_id, {part}, value, "
            f"count(*) {over} AS n_near, "
            f"round(sum(value) {over} * 100) / 100 AS s_near "
            f"FROM events{where} ORDER BY event_id LIMIT {rng.randint(50, 400)}"
        )
    # lead/lag with offset + default over the time ordering
    off = rng.randint(1, 3)
    over = f"OVER (PARTITION BY {part} ORDER BY ts, event_id)"
    return (
        f"SELECT event_id, {part}, "
        f"lag(value, {off}, -1.0) {over} AS lg, "
        f"lead(value, {off}, -1.0) {over} AS ld, "
        f"lag(event_type) {over} AS lg_t "
        f"FROM events{where} ORDER BY event_id LIMIT {rng.randint(50, 400)}"
    )


N_WINDOW_QUERIES = 24


# ---------------------------------------------------------------------------
# frame-spec + IGNORE NULLS branch (VERDICT r4 §next.7): the corners the
# first window branch leaves untouched — two-sided ROWS frames with both
# offsets random, RANGE frames ending in FOLLOWING, and the IGNORE NULLS
# navigation family over a column whose NULLs are data-dependent
# (value → NULL when event_id % k = 0, identical derivation both engines).
# Dialect note: Spark spells `f(x) IGNORE NULLS OVER`, DuckDB spells
# `f(x IGNORE NULLS) OVER`; queries are generated in Spark syntax and
# to_duck_dialect() rewrites them for DuckDB — a pure-syntax transform.
# Aggregates inside frames stay sum/min/max/count over 2-decimal `value`
# (integer-exact in cents); avg is excluded: its double division's low
# bits depend on accumulation order and floor()/round() at the boundary
# could legitimately disagree.


def _gen_frame_query(rng: random.Random) -> str:
    preds = []
    for _ in range(rng.randint(0, 2)):
        kind = rng.random()
        if kind < 0.4:
            day = rng.randint(1, 28)
            preds.append(
                f"ts {rng.choice(['<', '>='])} TIMESTAMP '2024-01-{day:02d} 00:00:00'"
            )
        elif kind < 0.7:
            vals = rng.sample(_EVENT_TYPES, rng.randint(1, 3))
            quoted = ", ".join(f"'{v}'" for v in vals)
            preds.append(f"event_type IN ({quoted})")
        else:
            preds.append(f"user_id {rng.choice(['<', '>='])} {rng.randint(2, 14)}")
    where = (" WHERE " + " AND ".join(preds)) if preds else ""
    part = rng.choice(["user_id", "event_type"])
    k = rng.choice([3, 4, 5, 7])
    nullable = f"CASE WHEN event_id % {k} = 0 THEN NULL ELSE value END"
    branch = rng.random()
    if branch < 0.35:
        # IGNORE NULLS navigation family over the derived nullable column
        n = rng.randint(2, 3)
        off = rng.randint(1, 3)
        over = (
            f"OVER (PARTITION BY {part} ORDER BY ts, event_id "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
        )
        lagover = f"OVER (PARTITION BY {part} ORDER BY ts, event_id)"
        return (
            f"SELECT event_id, {part}, "
            f"first_value({nullable}) IGNORE NULLS {over} AS fv, "
            f"last_value({nullable}) IGNORE NULLS {over} AS lv, "
            f"nth_value({nullable}, {n}) IGNORE NULLS {over} AS nv, "
            f"lag({nullable}, {off}) IGNORE NULLS {lagover} AS lg, "
            f"lead({nullable}, {off}) IGNORE NULLS {lagover} AS ld "
            f"FROM events{where} ORDER BY event_id LIMIT {rng.randint(50, 400)}"
        )
    if branch < 0.6:
        # two-sided ROWS frame, both offsets random (incl. frames entirely
        # in the past / future via PRECEDING-PRECEDING etc.)
        a, b = rng.randint(1, 6), rng.randint(0, 4)
        lo, hi = f"{a} PRECEDING", (f"{b} FOLLOWING" if b else "CURRENT ROW")
        if rng.random() < 0.25 and a > 2:
            lo, hi = f"{a} PRECEDING", f"{rng.randint(1, a - 1)} PRECEDING"
        elif rng.random() < 0.2:
            lo, hi = "CURRENT ROW", f"{rng.randint(1, 5)} FOLLOWING"
        over = (
            f"OVER (PARTITION BY {part} ORDER BY ts, event_id "
            f"ROWS BETWEEN {lo} AND {hi})"
        )
        return (
            f"SELECT event_id, {part}, "
            f"round(sum(value) {over} * 100) / 100 AS s, "
            f"min(value) {over} AS mn, max(value) {over} AS mx, "
            f"count({nullable}) {over} AS n_nn, count(*) {over} AS n "
            f"FROM events{where} ORDER BY event_id LIMIT {rng.randint(50, 400)}"
        )
    if branch < 0.8:
        # RANGE numeric frame with a FOLLOWING end (peer window both ways)
        lo_span, hi_span = rng.randint(5, 80), rng.randint(5, 80)
        over = (
            f"OVER (PARTITION BY {part} ORDER BY value "
            f"RANGE BETWEEN {lo_span} PRECEDING AND {hi_span} FOLLOWING)"
        )
        return (
            f"SELECT event_id, {part}, value, "
            f"count(*) {over} AS n_near, "
            f"round(sum(value) {over} * 100) / 100 AS s_near, "
            f"min(value) {over} AS mn_near "
            f"FROM events{where} ORDER BY event_id LIMIT {rng.randint(50, 400)}"
        )
    # RANGE over the time ordering with an INTERVAL offset — session-ish
    # (how many events in the trailing N minutes)
    mins = rng.randint(5, 120)
    over = (
        f"OVER (PARTITION BY {part} ORDER BY ts "
        f"RANGE BETWEEN INTERVAL '{mins}' MINUTE PRECEDING AND CURRENT ROW)"
    )
    return (
        f"SELECT event_id, {part}, "
        f"count(*) {over} AS n_trail, "
        f"round(sum(value) {over} * 100) / 100 AS s_trail "
        f"FROM events{where} ORDER BY event_id LIMIT {rng.randint(50, 400)}"
    )


N_FRAME_QUERIES = 24


def _gen_interval_frame_query(rng: random.Random) -> str:
    """RANGE BETWEEN INTERVAL frames (the events_velocity_flags surface):
    calendar-offset windows over a time ordering.  Varies the offset
    unit (SECOND..DAY), the bound shape (trailing, leading, two-sided,
    past-only, mixed-unit), the sort direction, and — the big tie
    stressor — whether the ordering column is raw microsecond ts or
    date_trunc'd to minute/hour so frames see whole peer groups.
    INTERVAL '<n>' <UNIT> literals are shared Spark/DuckDB syntax and
    pass through to_duck_dialect untouched."""
    preds = []
    if rng.random() < 0.5:
        day = rng.randint(1, 28)
        preds.append(
            f"ts {rng.choice(['<', '>='])} TIMESTAMP '2024-01-{day:02d} 00:00:00'"
        )
    if rng.random() < 0.4:
        vals = rng.sample(_EVENT_TYPES, rng.randint(1, 3))
        quoted = ", ".join(f"'{v}'" for v in vals)
        preds.append(f"event_type IN ({quoted})")
    where = (" WHERE " + " AND ".join(preds)) if preds else ""
    part = rng.choice(["user_id", "event_type"])

    def ival(unit: str | None = None) -> str:
        unit = unit or rng.choice(("SECOND", "MINUTE", "HOUR", "DAY"))
        n = {
            "SECOND": rng.randint(20, 7200),
            "MINUTE": rng.randint(1, 240),
            "HOUR": rng.randint(1, 48),
            "DAY": rng.randint(1, 7),
        }[unit]
        return f"INTERVAL '{n}' {unit}"

    shape = rng.random()
    if shape < 0.3:
        lo, hi = f"{ival()} PRECEDING", "CURRENT ROW"
    elif shape < 0.5:
        lo, hi = "CURRENT ROW", f"{ival()} FOLLOWING"
    elif shape < 0.8:
        # two-sided; Spark requires BOTH bounds to share one interval
        # unit type (DATATYPE_MISMATCH.SPECIFIED_WINDOW_FRAME_DIFF_TYPES
        # on e.g. HOUR PRECEDING + DAY FOLLOWING, where DuckDB is fine
        # with mixed) — a genuine dialect divergence this arm documents,
        # so the generator emits one unit with independent values
        unit = rng.choice(("SECOND", "MINUTE", "HOUR", "DAY"))
        lo, hi = f"{ival(unit)} PRECEDING", f"{ival(unit)} FOLLOWING"
    else:
        # entirely-in-the-past frame: lo must reach further back than hi
        unit = rng.choice(["MINUTE", "HOUR"])
        a = rng.randint(30, 300) if unit == "MINUTE" else rng.randint(5, 40)
        b = rng.randint(1, a - 1)
        lo, hi = (
            f"INTERVAL '{a}' {unit} PRECEDING",
            f"INTERVAL '{b}' {unit} PRECEDING",
        )
    # tie stressor: truncated ordering puts whole peer groups in/out of
    # the frame together; DESC flips which side PRECEDING reaches
    okey = rng.choice(["ts", "date_trunc('minute', ts)", "date_trunc('hour', ts)"])
    direction = " DESC" if rng.random() < 0.25 else ""
    over = (
        f"OVER (PARTITION BY {part} ORDER BY {okey}{direction} "
        f"RANGE BETWEEN {lo} AND {hi})"
    )
    return (
        f"SELECT event_id, {part}, "
        f"count(*) {over} AS n_w, "
        f"round(sum(value) {over} * 100) / 100 AS s_w, "
        f"min(value) {over} AS mn_w, max(value) {over} AS mx_w "
        f"FROM events{where} ORDER BY event_id LIMIT {rng.randint(50, 400)}"
    )


N_INTERVAL_FRAME_QUERIES = 48


import re as _re


def to_duck_dialect(sql: str) -> str:
    """Spark `f(args) IGNORE NULLS OVER` → DuckDB `f(args IGNORE NULLS)
    OVER`; Spark `datediff(end, start)` (day count) → DuckDB
    `date_diff('day', start, end)` (argument order flips).  Both are pure
    syntax, no semantic change; the datediff operands the generator emits
    are comma-free (column casts / literals), which the regex relies on.
    INTERVAL literals are shared syntax and pass through."""
    sql = _re.sub(r"\(([^()]*)\) IGNORE NULLS OVER", r"(\1 IGNORE NULLS) OVER", sql)
    sql = _re.sub(
        r"datediff\(([^,]+), ([^()]+?)\)", r"date_diff('day', \2, \1)", sql
    )
    # nested/array surface (case-sensitive: generators emit lowercase fn
    # names, so `filter(` the lambda HOF never collides with the
    # uppercase `FILTER (WHERE ...)` aggregate modifier). All pure
    # name-for-name maps — argument order and 1-based indexing agree.
    for spark_fn, duck_fn in _NESTED_FN_MAP:
        sql = _re.sub(r"\b" + spark_fn + r"\(", duck_fn + "(", sql)
    # Spark get_json_object(col, '$.k') → DuckDB json_extract_string —
    # same path syntax, same NULL-on-missing; a pure name map.
    sql = _re.sub(r"\bget_json_object\(", "json_extract_string(", sql)
    # partsupp branch seams: Spark's integer-division keyword and array
    # constructor (word-boundary + literal paren, so array_join /
    # array_distinct never match)
    sql = _re.sub(r"\bdiv\b", "//", sql)
    sql = _re.sub(r"\barray\(", "list_value(", sql)
    return sql


_JSON_FN_RE = None  # get_json_object handled below (argument reshape)

_NESTED_FN_MAP = [
    ("split", "string_split"),
    ("size", "len"),
    ("element_at", "list_extract"),
    ("array_contains", "list_contains"),
    ("array_distinct", "list_distinct"),
    ("sort_array", "list_sort"),
    ("array_join", "array_to_string"),
    ("collect_list", "list"),
    ("transform", "list_transform"),
    ("filter", "list_filter"),
    ("explode", "unnest"),
]


# ---------------------------------------------------------------------------
# outer-join branch: LEFT/FULL joins with a non-equi term INSIDE the join
# condition (not the WHERE) — preserved-side rows survive with NULLs,
# which is where outer-join planners disagree (condition pushdown into
# the preserved side would be wrong). count(*) vs count(right_key)
# surfaces the NULL structure; grouping includes the NULL group on FULL.


def _gen_outer_join_query(rng: random.Random) -> str:
    if rng.random() < 0.5:
        jt = rng.choice(["LEFT", "FULL"])
        thr = rng.randint(0, 8000)
        g = rng.choice(["o_orderstatus", "o_orderpriority"])
        return (
            f"SELECT {g}, count(*) AS n_all, count(c_custkey) AS n_matched, "
            f"CAST(min(c_custkey) AS BIGINT) AS mn, "
            f"count(*) - count(c_custkey) AS n_unmatched "
            f"FROM orders {jt} JOIN customer "
            f"ON o_custkey = c_custkey AND c_acctbal > {thr} "
            f"GROUP BY {g} ORDER BY {g}"
        )
    jt = rng.choice(["LEFT", "FULL"])
    thr = rng.randint(0, 400000)
    g = rng.choice(["l_returnflag", "l_linestatus"])
    return (
        f"SELECT {g}, count(*) AS n_all, count(o_orderkey) AS n_matched, "
        f"round(sum(l_extendedprice) * 100) / 100 AS s "
        f"FROM lineitem {jt} JOIN orders "
        f"ON l_orderkey = o_orderkey AND o_totalprice > {thr} "
        f"GROUP BY {g} ORDER BY {g}"
    )


N_OUTER_QUERIES = 12


def _gen_rollup_query(rng: random.Random) -> str:
    """ROLLUP/CUBE differential branch: grouping-set total rows (NULL
    group keys + grouping() markers) are a classic engine-disagreement
    area — subtotal placement, grouping() typing, HAVING over grouping
    sets. Row comparison is order-insensitive (canon_rows sorts), so no
    ORDER BY is emitted — Spark and DuckDB disagree on default NULL
    ordering, which would otherwise need NULLS FIRST/LAST pinning."""
    kind = rng.choice(["ROLLUP", "CUBE"])
    having = (
        f"HAVING count(*) > {rng.randint(0, 40)}" if rng.random() < 0.5 else ""
    )
    if rng.random() < 0.5:
        g1, g2 = rng.sample(["o_orderstatus", "o_orderpriority"], 2)
        thr = rng.randint(50000, 400000)
        return (
            f"SELECT {g1}, {g2}, count(*) AS n, "
            f"round(sum(o_totalprice) * 100) / 100 AS s, "
            f"CAST(grouping({g1}) AS INT) AS g_1, "
            f"CAST(grouping({g2}) AS INT) AS g_2 "
            f"FROM orders WHERE o_totalprice < {thr} "
            f"GROUP BY {kind} ({g1}, {g2}) {having}"
        )
    g1, g2 = rng.sample(["l_returnflag", "l_linestatus"], 2)
    q = rng.randint(10, 45)
    return (
        f"SELECT {g1}, {g2}, count(*) AS n, "
        f"round(sum(l_extendedprice) * 100) / 100 AS s, "
        f"CAST(grouping({g1}) AS INT) AS g_1, "
        f"CAST(grouping({g2}) AS INT) AS g_2 "
        f"FROM lineitem WHERE l_quantity < {q} "
        f"GROUP BY {kind} ({g1}, {g2}) {having}"
    )


N_ROLLUP_QUERIES = 12


def _gen_setop_query(rng: random.Random) -> str:
    """Set-operation differential branch: UNION / INTERSECT / EXCEPT
    with ALL vs DISTINCT multiplicity over low-cardinality projections
    (duplicates everywhere, so bag semantics actually bite). Classic
    disagreement corners: EXCEPT ALL multiplicity (count subtraction,
    not set removal), INTERSECT ALL min-count semantics, NULL-equality
    inside set ops, and the standard INTERSECT-binds-tighter precedence
    when chains are left unparenthesized. Row comparison is
    order-insensitive so no ORDER BY is emitted."""
    fam = rng.choice(["orders", "lineitem", "customer"])
    if fam == "orders":
        cols = "o_orderstatus, o_orderpriority"
        branch = lambda: (  # noqa: E731
            f"SELECT {cols} FROM orders "
            f"WHERE o_totalprice < {rng.randint(40000, 450000)}"
        )
    elif fam == "lineitem":
        cols = "l_returnflag, l_linestatus"
        branch = lambda: (  # noqa: E731
            f"SELECT {cols} FROM lineitem "
            f"WHERE l_quantity < {rng.randint(5, 48)}"
        )
    else:
        cols = "c_mktsegment"
        branch = lambda: (  # noqa: E731
            f"SELECT {cols} FROM customer "
            f"WHERE c_acctbal < {rng.randint(-500, 9500)}"
        )
    ops = ["UNION ALL", "UNION", "INTERSECT", "INTERSECT ALL",
           "EXCEPT", "EXCEPT ALL"]
    n_branches = rng.choice([2, 3])
    q = branch()
    for _ in range(n_branches - 1):
        op = rng.choice(ops)
        if rng.random() < 0.3:
            # parenthesized left side pins the association explicitly
            q = f"({q}) {op} {branch()}"
        else:
            # unparenthesized chain exercises standard precedence
            # (INTERSECT binds tighter than UNION/EXCEPT)
            q = f"{q} {op} {branch()}"
    return q


N_SETOP_QUERIES = 14


def _gen_subquery_query(rng: random.Random) -> str:
    """Subquery branch: correlated EXISTS/NOT EXISTS, [NOT] IN with a
    filtered subquery, correlated scalar compare, and IN inside a
    disjunction — the decorrelation/rewrite paths (semi/anti/left-outer
    conversion) where engines classically disagree. Scalar subqueries
    use min/max (order-insensitive exact on 2-dec money doubles), never
    avg/sum, so the comparison threshold is bit-identical. No ORDER BY:
    canon_rows compares order-insensitively."""
    kind = rng.random()
    if kind < 0.3:
        neg = "NOT " if rng.random() < 0.5 else ""
        thr = rng.randint(50000, 400000)
        extra = (
            f" AND o_orderstatus = '{rng.choice(['F', 'O', 'P'])}'"
            if rng.random() < 0.4
            else ""
        )
        return (
            f"SELECT c_mktsegment, count(*) AS n, "
            f"CAST(min(c_custkey) AS BIGINT) AS mn "
            f"FROM customer WHERE {neg}EXISTS ("
            f"SELECT 1 FROM orders WHERE o_custkey = c_custkey "
            f"AND o_totalprice > {thr}{extra}) "
            f"GROUP BY c_mktsegment"
        )
    if kind < 0.6:
        neg = "NOT " if rng.random() < 0.5 else ""
        thr = rng.randint(0, 9000)
        return (
            f"SELECT o_orderstatus, count(*) AS n, "
            f"round(sum(o_totalprice) * 100) / 100 AS s "
            f"FROM orders WHERE o_custkey {neg}IN ("
            f"SELECT c_custkey FROM customer WHERE c_acctbal > {thr}) "
            f"GROUP BY o_orderstatus"
        )
    if kind < 0.85:
        mult = rng.choice(["1.0", "2.0", "0.5"])
        agg = rng.choice(["max", "min"])
        return (
            f"SELECT c_mktsegment, count(*) AS n "
            f"FROM customer WHERE c_acctbal * {mult} > ("
            f"SELECT coalesce({agg}(o_totalprice), 0) FROM orders "
            f"WHERE o_custkey = c_custkey) "
            f"GROUP BY c_mktsegment"
        )
    seg = rng.sample(
        ["BUILDING", "MACHINERY", "HOUSEHOLD", "AUTOMOBILE", "FURNITURE"],
        rng.randint(1, 2),
    )
    quoted = ", ".join(f"'{s}'" for s in seg)
    st = rng.choice(["F", "O", "P"])
    return (
        f"SELECT count(*) AS n, CAST(min(o_orderkey) AS BIGINT) AS mn, "
        f"CAST(max(o_orderkey) AS BIGINT) AS mx "
        f"FROM orders WHERE o_orderstatus = '{st}' OR o_custkey IN ("
        f"SELECT c_custkey FROM customer WHERE c_mktsegment IN ({quoted}))"
    )


N_SUBQ_QUERIES = 12


def _gen_string_fn_query(rng: random.Random) -> str:
    """String-library branch (SURVEY §2 row 56): the fuzzer's other
    branches touch upper/substr/replace only — this one drives the rest
    of the shared-dialect string surface (lpad/rpad, split_part, instr,
    translate, reverse, repeat, md5, nested trims, concat_ws).  All are
    pure functions, so determinism needs only the unique-key ORDER BY.
    Stays inside the both-engines-identical subset: positive substr
    offsets, positive split_part indices, single-char translate maps."""
    kind = rng.random()
    if kind < 0.3:
        i, n = rng.randint(1, 10), rng.randint(1, 8)
        pad = rng.randint(2, 12)
        needle = rng.choice(["ar", "le", "o", "zz"])
        return (
            f"SELECT p_partkey, "
            f"lpad(p_brand, {pad}, '*') AS lp, "
            f"rpad(p_brand, {pad}, '.') AS rp, "
            f"substr(p_name, {i}, {n}) AS sub, "
            f"instr(p_name, '{needle}') AS pos, "
            f"reverse(p_type) AS rv "
            f"FROM part ORDER BY p_partkey LIMIT {rng.randint(20, 300)}"
        )
    if kind < 0.55:
        j = rng.randint(1, 4)
        w = rng.choice(["the", "data", "table", "row"])
        return (
            f"SELECT doc_id, md5(text) AS h, "
            f"split_part(text, ' ', {j}) AS w{j}, "
            f"length(rtrim(ltrim(text))) AS ln, "
            f"CASE WHEN text LIKE '%{w}%' THEN 1 ELSE 0 END AS has_w "
            f"FROM documents WHERE doc_id < {rng.randint(100, 450)} "
            f"ORDER BY doc_id LIMIT {rng.randint(20, 300)}"
        )
    if kind < 0.8:
        r = rng.randint(1, 3)
        return (
            f"SELECT c_custkey, "
            f"repeat(substr(c_mktsegment, 1, 2), {r}) AS rp, "
            f"translate(c_mktsegment, 'AEIOU', 'aeiou') AS tr, "
            f"concat_ws('-', c_mktsegment, 'X') AS cw, "
            f"length(c_mktsegment) AS ln "
            f"FROM customer WHERE c_custkey < {rng.randint(200, 1200)} "
            f"ORDER BY c_custkey LIMIT {rng.randint(20, 300)}"
        )
    n = rng.randint(1, 6)
    return (
        f"SELECT substr(p_type, 1, {n}) AS pref, count(*) AS n, "
        f"count(DISTINCT p_brand) AS nb, "
        f"min(length(p_name)) AS mn_ln, "
        f"max(reverse(p_brand)) AS mx_rv "
        f"FROM part GROUP BY substr(p_type, 1, {n})"
    )


N_STRFN_QUERIES = 12


def _gen_date_fn_query(rng: random.Random) -> str:
    """Timestamp-library branch (SURVEY §2 row 58): extract-style parts
    (year/month/day/hour/minute), date_trunc buckets, shared INTERVAL
    arithmetic, DATE/TIMESTAMP literals, and datediff (translated to
    DuckDB's date_diff('day', ...) by to_duck_dialect).  Excluded as
    known-divergent: dayofweek (origin differs), week (ISO vs US),
    epoch extraction (type differs)."""
    kind = rng.random()
    if kind < 0.3:
        iv = rng.choice(["3 DAY", "12 HOUR", "45 MINUTE", "1 MONTH"])
        return (
            f"SELECT o_orderkey, "
            f"year(o_orderdate) AS y, month(o_orderdate) AS m, "
            f"day(o_orderdate) AS d, "
            f"CAST(o_orderdate AS DATE) AS dt, "
            f"o_orderdate + INTERVAL {iv} AS shifted "
            f"FROM orders WHERE o_orderkey < {rng.randint(500, 5000)} "
            f"ORDER BY o_orderkey LIMIT {rng.randint(20, 300)}"
        )
    if kind < 0.55:
        # CAST around date_trunc: DuckDB returns DATE for day-or-coarser
        # units (TIMESTAMP for finer) while Spark always returns
        # TIMESTAMP — the cast makes both dialects emit TIMESTAMP.
        unit = rng.choice(["month", "day", "hour", "year"])
        return (
            f"SELECT CAST(date_trunc('{unit}', o_orderdate) AS TIMESTAMP) AS bucket, "
            f"count(*) AS n, "
            f"round(sum(o_totalprice) * 100) / 100 AS s, "
            f"CAST(min(o_orderkey) AS BIGINT) AS mn "
            f"FROM orders GROUP BY date_trunc('{unit}', o_orderdate)"
        )
    if kind < 0.8:
        d = rng.randint(1, 5)
        h = rng.randint(0, 23)
        return (
            f"SELECT hour(ts) AS h, event_type, count(*) AS n, "
            f"CAST(min(event_id) AS BIGINT) AS mn, "
            f"min(ts) AS first_ts "
            f"FROM events WHERE ts < TIMESTAMP '2024-01-0{d} {h:02d}:00:00' "
            f"GROUP BY hour(ts), event_type"
        )
    anchor = f"2024-0{rng.randint(1, 2)}-{rng.randint(1, 28):02d}"
    return (
        f"SELECT o_orderkey, "
        f"datediff(CAST(o_orderdate AS DATE), DATE '{anchor}') AS dd, "
        f"minute(o_orderdate) AS mi "
        f"FROM orders WHERE o_orderkey < {rng.randint(500, 5000)} "
        f"ORDER BY o_orderkey LIMIT {rng.randint(20, 300)}"
    )


N_DATEFN_QUERIES = 12


def _gen_distinct_agg_query(rng: random.Random) -> str:
    """Multi-DISTINCT aggregate branch: several count(DISTINCT ·) over
    different columns in one SELECT forces the Expand-based rewrite in
    Spark (one input row fans out per distinct group) — a rewrite DuckDB
    does differently, making this a classic disagreement surface.
    DISTINCT sums stay on integer-valued columns (l_quantity, p_size,
    keys) so accumulation order cannot move the result; count(*) rides
    along to pin the non-distinct path through the same Expand."""
    kind = rng.random()
    if kind < 0.35:
        thr = rng.randint(0, 4000)
        return (
            f"SELECT l_returnflag, count(*) AS n, "
            f"count(DISTINCT l_partkey) AS d_part, "
            f"count(DISTINCT l_suppkey) AS d_supp, "
            f"CAST(sum(DISTINCT l_quantity) AS BIGINT) AS s_qty "
            f"FROM lineitem WHERE l_partkey < {thr + 500} "
            f"GROUP BY l_returnflag"
        )
    if kind < 0.6:
        seg = rng.choice(
            ["BUILDING", "MACHINERY", "HOUSEHOLD", "AUTOMOBILE", "FURNITURE"]
        )
        return (
            f"SELECT o_orderstatus, "
            f"count(DISTINCT o_custkey) AS d_cust, "
            f"count(DISTINCT o_orderpriority) AS d_prio, count(*) AS n "
            f"FROM orders WHERE o_custkey IN "
            f"(SELECT c_custkey FROM customer WHERE c_mktsegment = '{seg}') "
            f"GROUP BY o_orderstatus"
        )
    if kind < 0.8:
        # global (ungrouped) multi-distinct incl. a DISTINCT over an
        # expression
        m = rng.randint(2, 9)
        return (
            f"SELECT count(DISTINCT p_brand) AS d_brand, "
            f"count(DISTINCT p_size % {m}) AS d_szmod, "
            f"count(DISTINCT p_type) AS d_type, count(*) AS n "
            f"FROM part"
        )
    # DISTINCT + HAVING over the distinct count itself
    h = rng.randint(1, 20)
    return (
        f"SELECT c_nationkey, count(DISTINCT c_mktsegment) AS d_seg, "
        f"count(*) AS n, CAST(min(c_custkey) AS BIGINT) AS mn "
        f"FROM customer GROUP BY c_nationkey "
        f"HAVING count(DISTINCT c_mktsegment) >= {min(h, 5)}"
    )


N_DISTINCT_QUERIES = 10


def _gen_star_join_query(rng: random.Random) -> str:
    """Three-table star/chain join branch: the join-reordering and
    filter-pushdown-through-join planner paths (Catalyst reorders by
    estimated size; DuckDB by its own DP) — results must agree no
    matter the order picked. Derived-table variant pins the
    aggregate-below-join shape. Money sums use the round shim."""
    kind = rng.random()
    if kind < 0.3:
        thr = rng.randint(0, 6000)
        return (
            f"SELECT c_mktsegment, l_returnflag, count(*) AS n, "
            f"round(sum(l_extendedprice) * 100) / 100 AS s "
            f"FROM customer "
            f"JOIN orders ON o_custkey = c_custkey "
            f"JOIN lineitem ON l_orderkey = o_orderkey "
            f"WHERE c_acctbal > {thr} "
            f"GROUP BY c_mktsegment, l_returnflag"
        )
    if kind < 0.55:
        b = rng.randint(1, 5)
        st = rng.choice(["F", "O", "P"])
        return (
            f"SELECT p_brand, count(*) AS n, "
            f"CAST(sum(l_quantity) AS BIGINT) AS q, "
            f"CAST(min(o_orderkey) AS BIGINT) AS mn "
            f"FROM part "
            f"JOIN lineitem ON l_partkey = p_partkey "
            f"JOIN orders ON o_orderkey = l_orderkey "
            f"WHERE p_brand LIKE 'Brand#{b}%' AND o_orderstatus = '{st}' "
            f"GROUP BY p_brand"
        )
    if kind < 0.8:
        thr = rng.randint(50000, 300000)
        return (
            f"SELECT c_mktsegment, count(*) AS n_all, "
            f"count(l_orderkey) AS n_li, "
            f"count(*) - count(l_orderkey) AS n_pad "
            f"FROM customer "
            f"JOIN orders ON o_custkey = c_custkey "
            f"LEFT JOIN lineitem "
            f"  ON l_orderkey = o_orderkey AND o_totalprice > {thr} "
            f"GROUP BY c_mktsegment"
        )
    lo = rng.randint(1, 5)
    return (
        f"SELECT c_mktsegment, count(*) AS n, "
        f"CAST(min(t.cnt) AS BIGINT) AS mn_orders, "
        f"CAST(max(t.cnt) AS BIGINT) AS mx_orders "
        f"FROM customer JOIN ("
        f"SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey "
        f"HAVING count(*) >= {lo}) t ON t.o_custkey = c_custkey "
        f"GROUP BY c_mktsegment"
    )


N_STAR_QUERIES = 10


def _gen_filter_clause_query(rng: random.Random) -> str:
    """FILTER (WHERE ...) aggregate-modifier branch (SQL:2003 T612):
    conditional aggregation without CASE rewrites, including over
    DISTINCT aggregates where the CASE rewrite is NOT equivalent unless
    the else-branch maps to NULL — both engines parse the same text, so
    any disagreement is in the filtered-aggregate evaluation itself.
    Money sums under a filter use the round shim; DISTINCT sums stay on
    integer-valued columns."""
    kind = rng.random()
    if kind < 0.35:
        q1, q2 = rng.randint(5, 45), rng.randint(1, 9) / 100.0
        return (
            f"SELECT l_returnflag, count(*) AS n_all, "
            f"count(*) FILTER (WHERE l_quantity > {q1}) AS n_hi, "
            f"round(sum(l_extendedprice) FILTER (WHERE l_discount > {q2}) "
            f"* 100) / 100 AS rev_f, "
            f"CAST(min(l_orderkey) FILTER (WHERE l_tax < {q2}) AS BIGINT) "
            f"AS mn_f "
            f"FROM lineitem GROUP BY l_returnflag"
        )
    if kind < 0.6:
        st = rng.choice(["F", "O", "P"])
        thr = rng.randint(50000, 300000)
        return (
            f"SELECT o_orderpriority, "
            f"count(DISTINCT o_custkey) FILTER (WHERE o_orderstatus = '{st}') "
            f"AS d_cust_f, "
            f"count(*) FILTER (WHERE o_totalprice > {thr}) AS n_big, "
            f"count(*) AS n "
            f"FROM orders GROUP BY o_orderpriority"
        )
    if kind < 0.8:
        # ungrouped, multiple filters over different columns
        sz = rng.randint(5, 45)
        b = rng.randint(1, 5)
        return (
            f"SELECT count(*) AS n, "
            f"count(*) FILTER (WHERE p_size > {sz}) AS n_szf, "
            f"count(*) FILTER (WHERE p_brand = 'Brand#{b}{b}') AS n_bf, "
            f"CAST(sum(p_size) FILTER (WHERE p_size <= {sz}) AS BIGINT) "
            f"AS s_szf "
            f"FROM part"
        )
    # filtered aggregate + HAVING over a filtered count
    h = rng.randint(1, 8)
    bal = rng.randint(0, 5000)
    return (
        f"SELECT c_nationkey, count(*) AS n, "
        f"count(*) FILTER (WHERE c_acctbal > {bal}) AS n_rich, "
        f"CAST(max(c_custkey) FILTER (WHERE c_acctbal <= {bal}) AS BIGINT) "
        f"AS mx_poor "
        f"FROM customer GROUP BY c_nationkey "
        f"HAVING count(*) FILTER (WHERE c_acctbal > {bal}) >= {h}"
    )


N_FILTER_QUERIES = 10

def _gen_nested_query(rng: random.Random) -> str:
    """Nested/array branch (VERDICT r5 §next.7 — the fuzz-blind wing):
    split→array derivations over documents, explode+reaggregate,
    element access, lambda HOFs (transform/filter), and collect_list
    aggregates. Generated in Spark spelling; to_duck_dialect maps the
    names onto DuckDB's list_* family (1-based indexing and lambda
    syntax agree). Array-typed OUTPUTS are always stringified through
    array_join(sort_array(...)) so row comparison stays on scalars;
    collect_list goes through array_distinct+sort_array because bare
    collection order is nondeterministic on both engines."""
    kind = rng.random()
    k = rng.randint(80, 450)
    lim = rng.randint(20, 300)
    if kind < 0.3:
        # explode + re-aggregate: token frequencies with a HAVING gate
        h = rng.randint(1, 6)
        return (
            f"SELECT tok, count(*) AS n, count(DISTINCT doc_id) AS nd "
            f"FROM (SELECT doc_id, explode(split(lower(text), ' ')) AS tok "
            f"FROM documents WHERE doc_id < {k}) t "
            f"GROUP BY tok HAVING count(*) >= {h}"
        )
    if kind < 0.55:
        # scalar array functions over the split derivation
        j = rng.randint(1, 5)
        w = rng.choice(["the", "data", "join", "row", "filter"])
        return (
            f"SELECT doc_id, size(split(text, ' ')) AS n_tok, "
            f"element_at(split(text, ' '), {j}) AS t{j}, "
            f"array_contains(split(lower(text), ' '), '{w}') AS has_w, "
            f"size(array_distinct(split(lower(text), ' '))) AS n_uniq "
            f"FROM documents WHERE doc_id < {k} "
            f"ORDER BY doc_id LIMIT {lim}"
        )
    if kind < 0.8:
        # lambda HOFs: filter by length, transform to prefixes
        n = rng.randint(2, 7)
        m = rng.randint(1, 3)
        return (
            f"SELECT doc_id, "
            f"size(filter(split(text, ' '), x -> length(x) > {n})) AS n_long, "
            f"array_join(transform(split(lower(text), ' '), "
            f"x -> substr(x, 1, {m})), '-') AS prefixes "
            f"FROM documents WHERE doc_id < {k} "
            f"ORDER BY doc_id LIMIT {lim}"
        )
    # collect_list aggregate, stringified deterministically
    q = rng.randint(10, 45)
    g = rng.choice(["l_returnflag", "l_linestatus"])
    o = "l_linestatus" if g == "l_returnflag" else "l_returnflag"
    return (
        f"SELECT {g}, "
        f"array_join(sort_array(array_distinct(collect_list({o}))), ',') "
        f"AS vals, count(*) AS n "
        f"FROM lineitem WHERE l_quantity < {q} GROUP BY {g}"
    )


N_NESTED_QUERIES = 16


def _gen_json_query(rng: random.Random) -> str:
    """JSON-function branch over events.props ('{"k": <int>}'): path
    extraction (get_json_object → json_extract_string), cast-to-int
    arithmetic, grouping on extracted values, and NULL-on-missing-path
    semantics — both engines return NULL for absent paths."""
    kind = rng.random()
    m = rng.choice([7, 10, 13])
    if kind < 0.4:
        return (
            f"SELECT CAST(get_json_object(props, '$.k') AS INT) % {m} AS kb, "
            f"count(*) AS n, "
            f"CAST(min(event_id) AS BIGINT) AS mn, "
            f"CAST(max(CAST(get_json_object(props, '$.k') AS INT)) AS INT) "
            f"AS mx "
            f"FROM events GROUP BY CAST(get_json_object(props, '$.k') AS INT) % {m}"
        )
    if kind < 0.7:
        lo = rng.randint(5, 80)
        return (
            f"SELECT event_id, event_type, "
            f"get_json_object(props, '$.k') AS raw_k, "
            f"get_json_object(props, '$.missing') AS absent, "
            f"CAST(get_json_object(props, '$.k') AS INT) + {lo} AS shifted "
            f"FROM events WHERE event_id < {rng.randint(200, 900)} "
            f"ORDER BY event_id LIMIT {rng.randint(20, 300)}"
        )
    thr = rng.randint(10, 90)
    return (
        f"SELECT event_type, count(*) AS n, "
        f"count(CASE WHEN CAST(get_json_object(props, '$.k') AS INT) > {thr} "
        f"THEN 1 END) AS n_hi "
        f"FROM events GROUP BY event_type"
    )


N_JSON_QUERIES = 10


def _gen_dialect_pair(rng: random.Random) -> tuple[str, str]:
    """Dialect-surface branch (VERDICT r6 item 6): returns an
    (engine_sql, duck_sql) PAIR because the two engines don't share one
    text for every shape. Covers the rewrite paths the r6 masked-span
    QUALIFY fix protects, plus named WINDOW and HiveQL LATERAL VIEW:

    - QUALIFY alone (alias inlined / raw window expr / alias token
      inside a string literal / LIMIT tail) — engine via
      dialect._rewrite_qualify, DuckDB native, same text;
    - named WINDOW + QUALIFY in canonical clause order (WINDOW before
      QUALIFY) — the rewriter must keep the WINDOW clause inside the
      generated subquery where the inlined OVER w refs resolve;
    - LATERAL VIEW [pos]explode over split(text) — Spark-native HiveQL,
      re-expressed with unnest/generate_subscripts for DuckDB.
    """
    fn, alias = rng.choice(
        [("row_number()", "rn"), ("rank()", "rk"), ("dense_rank()", "dr")]
    )
    part = rng.choice(["o_custkey", "o_orderstatus", "o_orderpriority"])
    order = rng.choice(
        ["o_totalprice DESC, o_orderkey", "o_orderdate, o_orderkey", "o_orderkey"]
    )
    k = rng.randint(1, 4)
    thr = rng.randint(50, 900)
    kind = rng.random()
    if kind < 0.2:
        sql = (
            f"SELECT o_orderkey, o_custkey, "
            f"{fn} OVER (PARTITION BY {part} ORDER BY {order}) AS {alias} "
            f"FROM orders WHERE o_custkey < {thr} "
            f"QUALIFY {alias} <= {k} ORDER BY o_orderkey"
        )
        return sql, sql
    if kind < 0.35:
        sql = (
            f"SELECT o_orderkey, o_orderstatus FROM orders "
            f"WHERE o_custkey < {thr} "
            f"QUALIFY {fn} OVER (PARTITION BY {part} ORDER BY {order}) = 1"
        )
        return sql, sql
    if kind < 0.5:
        st = rng.choice(["F", "O", "P"])
        lim = rng.randint(5, 60)
        sql = (
            f"SELECT o_orderkey, o_orderstatus, "
            f"{fn} OVER (PARTITION BY {part} ORDER BY {order}) AS {alias} "
            f"FROM orders WHERE o_custkey < {thr} "
            f"QUALIFY {alias} <= {k} AND o_orderstatus <> '{alias}' "
            f"AND o_orderstatus = '{st}' ORDER BY o_orderkey LIMIT {lim}"
        )
        return sql, sql
    if kind < 0.7:
        # named WINDOW shared by several functions, optionally + QUALIFY
        # in the canonical clause order (WINDOW precedes QUALIFY)
        agg = rng.choice(
            ["CAST(count(*) OVER w AS BIGINT) AS n_seen",
             "CAST(round(sum(o_totalprice) OVER w * 100) AS BIGINT) AS run_e2",
             "CAST(min(o_orderkey) OVER w AS BIGINT) AS first_key"]
        )
        qualify = (
            f"QUALIFY {alias} <= {k} " if rng.random() < 0.5 else ""
        )
        sql = (
            f"SELECT o_orderkey, o_custkey, {fn} OVER w AS {alias}, {agg} "
            f"FROM orders WHERE o_custkey < {thr} "
            f"WINDOW w AS (PARTITION BY {part} ORDER BY {order}) "
            f"{qualify}ORDER BY o_orderkey"
        )
        return sql, sql
    if kind < 0.85:
        # lexer operator spellings (sql-scanner.flex:52,155; r9 dialect
        # additions): engine text uses Impala '&&'/'||'/'!'/IREGEXP, duck
        # text the ANSI spellings / (?i) regex. Same precedence on both
        # sides (&& over ||, like AND over OR).
        lo, hi = sorted(rng.sample(range(1, 120), 2))
        st = rng.choice(["F", "O", "P"])
        if rng.random() < 0.5:
            eng = (
                f"SELECT CAST(count(*) AS BIGINT) AS n FROM orders "
                f"WHERE (o_custkey > {lo} && o_custkey < {hi}) "
                f"|| o_orderstatus = '{st}' && !(o_orderkey % 7 = 0)"
            )
            duck = (
                f"SELECT CAST(count(*) AS BIGINT) AS n FROM orders "
                f"WHERE (o_custkey > {lo} AND o_custkey < {hi}) "
                f"OR o_orderstatus = '{st}' AND NOT (o_orderkey % 7 = 0)"
            )
        else:
            pat = rng.choice(["THE", "A.E", "^T", "ING$", "E{2}"])
            form = rng.random()
            if form < 0.4:
                eng_operand, duck_pat = f"'{pat}'", f"'(?i){pat}'"
            elif form < 0.7:
                # comment between IREGEXP and the literal operand — the
                # r10 precedence fix skips it instead of wrapping it
                eng_operand = f"/* hint */ '{pat}'"
                duck_pat = f"'(?i){pat}'"
            else:
                # non-literal operand (function call): rewrites to
                # concat('(?i)', x) — exercises the operand-end scan
                eng_operand = f"upper('{pat.lower()}')"
                duck_pat = f"'(?i)' || upper('{pat.lower()}')"
            eng = (
                f"SELECT doc_id FROM documents "
                f"WHERE text IREGEXP {eng_operand} && doc_id < {hi * 5} "
                f"ORDER BY doc_id"
            )
            duck = (
                f"SELECT doc_id FROM documents "
                f"WHERE regexp_matches(text, {duck_pat}) "
                f"AND doc_id < {hi * 5} ORDER BY doc_id"
            )
        return eng, duck
    # LATERAL VIEW over documents — engine text is HiveQL, duck is unnest
    dthr = rng.randint(10, 60)
    if rng.random() < 0.5:
        eng = (
            f"SELECT doc_id, tok, CAST(pos AS INT) AS pos "
            f"FROM documents "
            f"LATERAL VIEW posexplode(split(text, ' ')) t AS pos, tok "
            f"WHERE doc_id < {dthr}"
        )
        duck = (
            f"SELECT doc_id, unnest(string_split(text, ' ')) AS tok, "
            f"CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INT) "
            f"AS pos FROM documents WHERE doc_id < {dthr}"
        )
    else:
        eng = (
            f"SELECT doc_id, upper(tok) AS tok_u, length(tok) AS tok_len "
            f"FROM documents "
            f"LATERAL VIEW explode(split(text, ' ')) t AS tok "
            f"WHERE doc_id < {dthr}"
        )
        duck = (
            f"SELECT doc_id, upper(tok) AS tok_u, length(tok) AS tok_len "
            f"FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
            f"FROM documents WHERE doc_id < {dthr}) s"
        )
    return eng, duck


_RNG = random.Random(20260813)
QUERIES = [_gen_query(_RNG) for _ in range(N_QUERIES)]
_ERNG = random.Random(20260814)
QUERIES += [_gen_events_query(_ERNG) for _ in range(N_EVENT_QUERIES)]
_DRNG = random.Random(20260815)
QUERIES += [_gen_docs_query(_DRNG) for _ in range(N_DOC_QUERIES)]
_PRNG = random.Random(20260816)
QUERIES += [_gen_part_query(_PRNG) for _ in range(N_PART_QUERIES)]
_PSRNG = random.Random(20260915)
QUERIES += [_gen_partsupp_query(_PSRNG) for _ in range(N_PARTSUPP_QUERIES)]
_WRNG = random.Random(20260817)
QUERIES += [_gen_window_query(_WRNG) for _ in range(N_WINDOW_QUERIES)]
_ORNG = random.Random(20260818)
QUERIES += [_gen_outer_join_query(_ORNG) for _ in range(N_OUTER_QUERIES)]
_RRNG = random.Random(20260819)
QUERIES += [_gen_rollup_query(_RRNG) for _ in range(N_ROLLUP_QUERIES)]
_FRNG = random.Random(20260820)
QUERIES += [_gen_frame_query(_FRNG) for _ in range(N_FRAME_QUERIES)]
_IFRNG = random.Random(20260829)
QUERIES += [
    _gen_interval_frame_query(_IFRNG) for _ in range(N_INTERVAL_FRAME_QUERIES)
]
_SORNG = random.Random(20260902)
QUERIES += [_gen_setop_query(_SORNG) for _ in range(N_SETOP_QUERIES)]
_SRNG = random.Random(20260821)
QUERIES += [_gen_subquery_query(_SRNG) for _ in range(N_SUBQ_QUERIES)]
_SFRNG = random.Random(20260822)
QUERIES += [_gen_string_fn_query(_SFRNG) for _ in range(N_STRFN_QUERIES)]
_DFRNG = random.Random(20260823)
QUERIES += [_gen_date_fn_query(_DFRNG) for _ in range(N_DATEFN_QUERIES)]
_DARNG = random.Random(20260824)
QUERIES += [_gen_distinct_agg_query(_DARNG) for _ in range(N_DISTINCT_QUERIES)]
_STRNG = random.Random(20260825)
QUERIES += [_gen_star_join_query(_STRNG) for _ in range(N_STAR_QUERIES)]
_FCRNG = random.Random(20260826)
QUERIES += [_gen_filter_clause_query(_FCRNG) for _ in range(N_FILTER_QUERIES)]
_NRNG = random.Random(20260827)
QUERIES += [_gen_nested_query(_NRNG) for _ in range(N_NESTED_QUERIES)]
_JRNG = random.Random(20260828)
QUERIES += [_gen_json_query(_JRNG) for _ in range(N_JSON_QUERIES)]


_DLRNG = random.Random(20260901)
DIALECT_PAIRS = [_gen_dialect_pair(_DLRNG) for _ in range(20)]


@pytest.mark.parametrize("idx", range(len(DIALECT_PAIRS)))
def test_dialect_pair_differential(spark, sf_dir, idx):
    # engine side goes through Engine.sql so dialect.translate (QUALIFY
    # rewrite, named-WINDOW passthrough, LATERAL VIEW) is on the path
    from minimised_impala_spark.engine import Engine
    from minimised_impala_spark.tables import register_tables

    eng_sql, duck_sql = DIALECT_PAIRS[idx]
    register_tables(spark, sf_dir, ("orders", "documents"))
    sdf = Engine(spark).sql(eng_sql)
    s_rows = canon_rows(list(sdf.columns), [tuple(r) for r in sdf.collect()])
    con = duckdb_connect(sf_dir)
    try:
        cur = con.execute(duck_sql)
        d_rows = canon_rows(
            [d[0] for d in cur.description], [tuple(r) for r in cur.fetchall()]
        )
    finally:
        con.close()
    assert s_rows == d_rows, f"mismatch for: {eng_sql}"


@pytest.mark.parametrize("idx", range(len(QUERIES)))
def test_random_differential(spark, sf_dir, idx):
    sql = QUERIES[idx]
    from minimised_impala_spark.tables import register_tables

    register_tables(
        spark,
        sf_dir,
        ("orders", "lineitem", "customer", "events", "documents", "part", "supplier"),
    )
    sdf = spark.sql(sql)
    s_rows = canon_rows(list(sdf.columns), [tuple(r) for r in sdf.collect()])

    con = duckdb_connect(sf_dir)
    try:
        cur = con.execute(to_duck_dialect(sql))
        d_cols = [d[0] for d in cur.description]
        d_rows = canon_rows(d_cols, [tuple(r) for r in cur.fetchall()])
    finally:
        con.close()

    assert s_rows == d_rows, f"mismatch for: {sql}"
