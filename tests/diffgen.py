"""Differential query generator: random specs compiled to BOTH a Spark
DataFrame plan and DuckDB oracle SQL (VERDICT r7 next-round #2).

The 197 registered oracles are fixed point-checks; this module searches the
semantic space BETWEEN them — NULL propagation, ties under LIMIT, float
aggregation order, integer overflow paths, timezone/date edges — by
generating random filter/projection/group-by/join/window/set-op specs over
the testdata schemas and comparing engines through the same
rows+schema+hash harness the driver uses (``oracle_harness.compare``).

Design rules that keep every spec a TRUE oracle (no false mismatches):

* every non-aggregate result is fully ordered (explicit NULLS FIRST/LAST
  on both sides + a unique-key tiebreak) before LIMIT — ties can never
  make row selection engine-dependent;
* double-typed SUMs go through DECIMAL(18,2) accumulation on both sides
  (exact, order-independent) and come back as DOUBLE;
* integer SUMs are cast to BIGINT on both sides (DuckDB's HUGEINT would
  otherwise fetch as float64);
* AVG is generated as CAST(SUM AS DOUBLE)/COUNT — bit-identical double
  division in both engines — never the engines' own AVG/ROUND (whose
  half-even vs half-up edges are exactly what we do NOT want to paper
  over in a *generator*; targeted tests own those);
* NULLs are synthesized with NULLIF so NULL paths are exercised even on
  fully-populated testdata columns.

Generation is seeded ``random.Random`` — the corpus is deterministic per
seed, so a discovered divergence reproduces forever with its seed number
(hypothesis adds shrinking but not determinism-across-runs for a fixed
corpus; a seed IS the minimal repro here).
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame, functions as F


# --------------------------------------------------------------------------
# schema model
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class TableModel:
    name: str
    int_cols: tuple[str, ...]          # integral, non-negative in testdata
    float_cols: tuple[str, ...]        # doubles with ≤2 meaningful decimals
    cat_cols: tuple[str, ...]          # low-cardinality strings
    str_cols: tuple[str, ...]          # ascii-ish strings (safe to compare)
    ts_cols: tuple[str, ...]
    uniq: tuple[str, ...]              # minimal unique key (tiebreak)


TABLES = {
    "orders": TableModel(
        "orders",
        ("o_orderkey", "o_custkey"), ("o_totalprice",),
        ("o_orderstatus", "o_orderpriority"), ("o_orderpriority",),
        ("o_orderdate",), ("o_orderkey",),
    ),
    "lineitem": TableModel(
        "lineitem",
        ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"),
        ("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
        ("l_returnflag", "l_linestatus"), (),
        ("l_shipdate",),
        # NOT (l_orderkey, l_linenumber): the synthetic testdata has ~14k
        # duplicate pairs at sf0.01 (deliberately — the quality-report
        # queries count them), and a non-total ORDER BY let DuckDB's
        # parallel window ranks flap run-to-run (flaky seed 38, r8). The
        # 4-column form is verified unique at every SF.
        ("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
    ),
    "customer": TableModel(
        "customer",
        ("c_custkey", "c_nationkey"), ("c_acctbal",),
        ("c_mktsegment",), ("c_name",), (), ("c_custkey",),
    ),
    "events": TableModel(
        "events",
        ("event_id", "user_id"), ("value",),
        ("event_type",), (), ("ts",), ("event_id",),
    ),
    "documents": TableModel(
        "documents",
        ("doc_id", "n_chars"), (),
        ("lang", "source"), (), (), ("doc_id",),
    ),
}

# literal pools observed in the testdata generators (any value works for
# correctness — these just keep filters selective enough to matter)
CAT_VALUES = {
    "o_orderstatus": ["O", "F", "P"],
    "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                        "5-LOW"],
    "l_returnflag": ["A", "N", "R"],
    "l_linestatus": ["O", "F"],
    "c_mktsegment": ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD",
                     "FURNITURE"],
    "event_type": ["click", "view", "purchase", "signup", "error"],
    "lang": ["en", "de", "fr", "es", "zh"],
    "source": ["src0", "src1", "src7", "src12", "src19"],
}
INT_LITERALS = [0, 1, 3, 7, 10, 100, 1000, 50000]
FLOAT_LITERALS = [0.02, 0.05, 0.5, 5.0, 50.0, 900.0, 10000.0]


# --------------------------------------------------------------------------
# paired expression builders: every helper returns (spark Column, sql text)
# --------------------------------------------------------------------------

Pair = tuple[Column, str]


def _col(name: str) -> Pair:
    return F.col(name), name


def _num_col(t: TableModel, rng: random.Random, allow_float=True) -> tuple[Pair, bool]:
    """A numeric column pair; returns (pair, is_float)."""
    pool = list(t.int_cols) + (list(t.float_cols) if allow_float else [])
    c = rng.choice(pool)
    return _col(c), c in t.float_cols


def gen_scalar(t: TableModel, rng: random.Random) -> tuple[Pair, str]:
    """A deterministic scalar projection expression; returns (pair, kind)."""
    kind = rng.choice(
        ["arith", "case", "string", "date", "nullif", "cast"]
        if t.ts_cols else ["arith", "case", "string", "nullif", "cast"]
    )
    if kind == "arith":
        (ca, sa), fa = _num_col(t, rng)
        (cb, sb), fb = _num_col(t, rng)
        op = rng.choice(["+", "-", "*"])
        # double arithmetic is bit-identical across engines for the same
        # two operands; only *accumulation order* diverges (handled in
        # aggregates) — so raw +,-,* are safe here.
        if not fa and not fb:
            # cast operands BEFORE the operator: a post-cast would let the
            # multiply run at native int width first, where Spark 4 ANSI
            # throws ARITHMETIC_OVERFLOW on int32 products (r8 review)
            la, lb = ca.cast("long"), cb.cast("long")
            lexpr = {"+": la + lb, "-": la - lb, "*": la * lb}[op]
            return (lexpr,
                    f"CAST({sa} AS BIGINT) {op} CAST({sb} AS BIGINT)"), "int"
        expr = {"+": ca + cb, "-": ca - cb, "*": ca * cb}[op]
        return (expr.cast("double"),
                f"CAST(CAST({sa} AS DOUBLE) {op} CAST({sb} AS DOUBLE) "
                "AS DOUBLE)"), "float"
    if kind == "case":
        cat = rng.choice(t.cat_cols)
        vals = CAT_VALUES[cat]
        v1, v2 = rng.sample(vals, 2)
        expr = (F.when(F.col(cat) == v1, F.lit(1))
                 .when(F.col(cat) == v2, F.lit(2))
                 .otherwise(F.lit(0)).cast("int"))
        sql = (f"CAST(CASE WHEN {cat} = '{v1}' THEN 1 "
               f"WHEN {cat} = '{v2}' THEN 2 ELSE 0 END AS INT)")
        return (expr, sql), "int"
    if kind == "string":
        pool = list(t.cat_cols) + list(t.str_cols)
        c = rng.choice(pool)
        f = rng.choice(["upper", "lower", "substr", "length", "concat"])
        if f == "upper":
            return (F.upper(F.col(c)), f"UPPER({c})"), "str"
        if f == "lower":
            return (F.lower(F.col(c)), f"LOWER({c})"), "str"
        if f == "substr":
            return (F.substring(F.col(c), 1, 4), f"SUBSTR({c}, 1, 4)"), "str"
        if f == "length":
            return (F.length(F.col(c)).cast("long"),
                    f"CAST(LENGTH({c}) AS BIGINT)"), "int"
        return (F.concat(F.col(c), F.lit("_x")), f"{c} || '_x'"), "str"
    if kind == "date":
        c = rng.choice(t.ts_cols)
        f = rng.choice(["year", "month", "trunc_month", "trunc_day"])
        if f == "year":
            return (F.year(c).cast("long"),
                    f"CAST(EXTRACT(year FROM {c}) AS BIGINT)"), "int"
        if f == "month":
            return (F.month(c).cast("long"),
                    f"CAST(EXTRACT(month FROM {c}) AS BIGINT)"), "int"
        unit = "month" if f == "trunc_month" else "day"
        return (F.date_trunc(unit, F.col(c)).cast("timestamp_ntz"),
                f"date_trunc('{unit}', {c})"), "ts"
    if kind == "nullif":
        cat = rng.choice(t.cat_cols)
        v = rng.choice(CAT_VALUES[cat])
        inner = (F.nullif(F.col(cat), F.lit(v)), f"NULLIF({cat}, '{v}')")
        if rng.random() < 0.5:
            return inner, "str"
        return (F.coalesce(inner[0], F.lit("<null>")),
                f"COALESCE({inner[1]}, '<null>')"), "str"
    # cast: int -> double and float -> bigint truncation edges
    (c, s), is_f = _num_col(t, rng)
    if is_f:
        # DIALECT TRAP (found by this fuzzer, seeds 287/296): Spark's
        # CAST(double AS BIGINT) truncates toward zero, DuckDB's ROUNDS
        # to nearest — an oracle must write CAST(trunc(x) AS BIGINT) to
        # mean what the Spark side computes.
        return (c.cast("long"), f"CAST(trunc({s}) AS BIGINT)"), "int"
    return (c.cast("double"), f"CAST({s} AS DOUBLE)"), "float"


def gen_predicate(t: TableModel, rng: random.Random) -> Pair:
    kind = rng.choice(["cmp", "between", "in", "like", "null", "compound"])
    if kind == "cmp":
        (c, s), is_f = _num_col(t, rng)
        lit = rng.choice(FLOAT_LITERALS if is_f else INT_LITERALS)
        op = rng.choice([">", "<", ">=", "<=", "<>"])
        expr = {">": c > lit, "<": c < lit, ">=": c >= lit,
                "<=": c <= lit, "<>": c != lit}[op]
        return expr, f"{s} {op} {lit}"
    if kind == "between":
        (c, s), is_f = _num_col(t, rng)
        lits = sorted(rng.sample(FLOAT_LITERALS if is_f else INT_LITERALS, 2))
        return c.between(lits[0], lits[1]), f"{s} BETWEEN {lits[0]} AND {lits[1]}"
    if kind == "in":
        cat = rng.choice(t.cat_cols)
        pool = CAT_VALUES[cat]
        vals = rng.sample(pool, min(len(pool), rng.randint(1, 3)))
        quoted = ", ".join(f"'{v}'" for v in vals)
        expr = F.col(cat).isin(vals)
        if rng.random() < 0.3:
            return ~expr, f"{cat} NOT IN ({quoted})"
        return expr, f"{cat} IN ({quoted})"
    if kind == "like":
        cat = rng.choice(t.cat_cols)
        v = rng.choice(CAT_VALUES[cat])
        pat = v[:2] + "%" if rng.random() < 0.5 else "%" + v[-2:]
        return F.col(cat).like(pat), f"{cat} LIKE '{pat}'"
    if kind == "null":
        cat = rng.choice(t.cat_cols)
        v = rng.choice(CAT_VALUES[cat])
        inner_c, inner_s = F.nullif(F.col(cat), F.lit(v)), f"NULLIF({cat}, '{v}')"
        if rng.random() < 0.5:
            return inner_c.isNull(), f"{inner_s} IS NULL"
        return inner_c.isNotNull(), f"{inner_s} IS NOT NULL"
    # compound
    a_c, a_s = gen_predicate(t, rng)
    b_c, b_s = gen_predicate(t, rng)
    if rng.random() < 0.5:
        return a_c & b_c, f"({a_s}) AND ({b_s})"
    return a_c | b_c, f"({a_s}) OR ({b_s})"


def gen_agg(t: TableModel, rng: random.Random, alias: str) -> tuple[Column, str]:
    """One aggregate, aliased identically on both sides."""
    kind = rng.choice(
        ["count_star", "count_col", "count_distinct", "sum_int",
         "sum_float", "min", "max", "avg_int", "count_nullable"]
    )
    if kind == "count_star":
        return (F.count(F.lit(1)).alias(alias),
                f"COUNT(*) AS {alias}")
    if kind == "count_col":
        (c, s), _ = _num_col(t, rng)
        return F.count(c).alias(alias), f"COUNT({s}) AS {alias}"
    if kind == "count_nullable":
        cat = rng.choice(t.cat_cols)
        v = rng.choice(CAT_VALUES[cat])
        return (F.count(F.nullif(F.col(cat), F.lit(v))).alias(alias),
                f"COUNT(NULLIF({cat}, '{v}')) AS {alias}")
    if kind == "count_distinct":
        c = rng.choice(list(t.cat_cols) + list(t.int_cols))
        return (F.countDistinct(F.col(c)).alias(alias),
                f"COUNT(DISTINCT {c}) AS {alias}")
    if kind == "sum_int" or (kind == "sum_float" and not t.float_cols):
        c = rng.choice(t.int_cols)
        return (F.sum(c).cast("long").alias(alias),
                f"CAST(SUM({c}) AS BIGINT) AS {alias}")
    if kind == "sum_float":
        c = rng.choice(t.float_cols)
        # DECIMAL accumulation: exact and order-independent on both sides
        return (F.sum(F.col(c).cast("decimal(18,2)")).cast("double")
                .alias(alias),
                f"CAST(SUM(CAST({c} AS DECIMAL(18,2))) AS DOUBLE) AS {alias}")
    if kind == "avg_int":
        c = rng.choice(t.int_cols)
        return ((F.sum(c).cast("double") / F.count(c)).alias(alias),
                f"CAST(SUM({c}) AS DOUBLE) / COUNT({c}) AS {alias}")
    (c, s), is_f = _num_col(t, rng)
    fn = F.min if kind == "min" else F.max
    return (fn(c).alias(alias), f"{kind.upper()}({s}) AS {alias}")


def _group_key(t: TableModel, rng: random.Random, alias: str) -> tuple[Column, str, str]:
    """A grouping key: cat col, int-mod bucket, or year(ts)."""
    choices = ["cat", "mod"] + (["year"] if t.ts_cols else [])
    kind = rng.choice(choices)
    if kind == "cat":
        c = rng.choice(t.cat_cols)
        return F.col(c).alias(alias), f"{c} AS {alias}", c
    if kind == "mod":
        c = rng.choice(t.int_cols)
        k = rng.choice([2, 5, 10])
        return ((F.col(c) % k).cast("long").alias(alias),
                f"CAST({c} % {k} AS BIGINT) AS {alias}", f"{c} % {k}")
    c = rng.choice(t.ts_cols)
    return (F.year(c).cast("long").alias(alias),
            f"CAST(EXTRACT(year FROM {c}) AS BIGINT) AS {alias}",
            f"EXTRACT(year FROM {c})")


def _order_clause(cols_sql: list[str], dirs: list[str]) -> str:
    parts = []
    for s, d in zip(cols_sql, dirs):
        nulls = "NULLS FIRST" if d == "ASC" else "NULLS LAST"
        parts.append(f"{s} {d} {nulls}")
    return ", ".join(parts)


def _spark_order(df_cols: list[str], dirs: list[str]) -> list[Column]:
    out = []
    for name, d in zip(df_cols, dirs):
        c = F.col(name)
        out.append(c.asc_nulls_first() if d == "ASC" else c.desc_nulls_last())
    return out


# --------------------------------------------------------------------------
# spec shapes
# --------------------------------------------------------------------------

@dataclass
class Spec:
    seed: int
    description: str
    build: Callable[[dict], DataFrame]   # tables dict -> DataFrame
    sql: str


def _projection_spec(rng: random.Random, seed: int) -> Spec:
    t = TABLES[rng.choice(list(TABLES))]
    n_proj = rng.randint(1, 3)
    pairs = [gen_scalar(t, rng) for _ in range(n_proj)]
    aliases = [f"e{i}" for i in range(n_proj)]
    preds = [gen_predicate(t, rng) for _ in range(rng.randint(0, 2))]
    limit = rng.choice([10, 50, 100])
    # deterministic full order: projected exprs then the unique key
    dirs = [rng.choice(["ASC", "DESC"]) for _ in range(n_proj + len(t.uniq))]

    sel_sql = ", ".join(f"{s} AS {a}" for (_, s), a in
                        zip([p[0] for p in pairs], aliases))
    uniq_sql = ", ".join(f"{u} AS u{i}" for i, u in enumerate(t.uniq))
    uniq_aliases = [f"u{i}" for i in range(len(t.uniq))]
    where = (" WHERE " + " AND ".join(f"({s})" for _, s in
                                      [p for p in preds]) if preds else "")
    order = _order_clause(aliases + uniq_aliases, dirs)
    sql = (f"SELECT {sel_sql}, {uniq_sql} FROM {t.name}{where} "
           f"ORDER BY {order} LIMIT {limit}")

    def build(tabs: dict) -> DataFrame:
        df = tabs[t.name]
        for c, _ in preds:
            df = df.where(c)
        cols = [p[0][0].alias(a) for p, a in zip(pairs, aliases)]
        cols += [F.col(u).alias(f"u{i}") for i, u in enumerate(t.uniq)]
        df = df.select(*cols)
        return df.orderBy(*_spark_order(aliases + uniq_aliases, dirs)).limit(limit)

    # NOTE: predicates are applied to the SAME (col, sql) pairs, so the
    # filtered set matches by construction; determinism comes from the
    # unique-key suffix in the ORDER BY.
    return Spec(seed, f"projection over {t.name}", build, sql)


def _groupby_spec(rng: random.Random, seed: int) -> Spec:
    t = TABLES[rng.choice(list(TABLES))]
    n_keys = rng.randint(1, 2)
    keys = [_group_key(t, rng, f"k{i}") for i in range(n_keys)]
    n_aggs = rng.randint(1, 3)
    aggs = [gen_agg(t, rng, f"a{i}") for i in range(n_aggs)]
    preds = [gen_predicate(t, rng) for _ in range(rng.randint(0, 2))]
    having = rng.random() < 0.3

    key_sel = ", ".join(s for _, s, _ in keys)
    key_grp = ", ".join(g for _, _, g in keys)
    agg_sel = ", ".join(s for _, s in aggs)
    where = (" WHERE " + " AND ".join(f"({s})" for _, s in preds)
             if preds else "")
    hav = " HAVING COUNT(*) > 1" if having else ""
    sql = (f"SELECT {key_sel}, {agg_sel} FROM {t.name}{where} "
           f"GROUP BY {key_grp}{hav}")

    def build(tabs: dict) -> DataFrame:
        df = tabs[t.name]
        for c, _ in preds:
            df = df.where(c)
        grouped = df.groupBy(*[c for c, _, _ in keys])
        agg_cols = [c for c, _ in aggs]
        if having:
            # HAVING inside the same aggregation (a semi-join re-compute
            # would drop NULL-keyed groups via null-unsafe equality)
            out = grouped.agg(*agg_cols,
                              F.count(F.lit(1)).alias("__having_cnt"))
            return out.where(F.col("__having_cnt") > 1).drop("__having_cnt")
        return grouped.agg(*agg_cols)

    return Spec(seed, f"groupBy over {t.name}", build, sql)


_JOINS = [
    # (left, right, left_key, right_key)
    ("orders", "customer", "o_custkey", "c_custkey"),
    ("lineitem", "orders", "l_orderkey", "o_orderkey"),
    ("customer", "nation", "c_nationkey", "n_nationkey"),
]


def _join_spec(rng: random.Random, seed: int) -> Spec:
    lname, rname, lk, rk = rng.choice(_JOINS)
    lt = TABLES.get(lname)
    how = rng.choice(["inner", "left"])
    preds = [gen_predicate(lt, rng) for _ in range(rng.randint(0, 1))]
    # aggregate over the join so output stays small; count the nullable
    # right key to exercise left-join NULL propagation
    where = (" WHERE " + " AND ".join(f"({s})" for _, s in preds)
             if preds else "")
    joinw = "JOIN" if how == "inner" else "LEFT JOIN"
    sql = (f"SELECT COUNT(*) AS n_rows, COUNT(r.{rk}) AS n_matched, "
           f"COUNT(DISTINCT l.{lk}) AS n_keys "
           f"FROM {lname} l {joinw} {rname} r ON l.{lk} = r.{rk}{where}")

    def build(tabs: dict) -> DataFrame:
        left, right = tabs[lname], tabs[rname]
        for c, _ in preds:
            left = left.where(c)
        j = left.join(right, left[lk] == right[rk], how)
        return j.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(right[rk]).alias("n_matched"),
            F.countDistinct(left[lk]).alias("n_keys"),
        )

    return Spec(seed, f"{how} join {lname}x{rname}", build, sql)


def _semi_anti_spec(rng: random.Random, seed: int) -> Spec:
    lname, rname, lk, rk = rng.choice(_JOINS)
    rt = TABLES.get(rname)
    anti = rng.random() < 0.5
    rpred_c, rpred_s = (gen_predicate(rt, rng) if rt and rng.random() < 0.7
                        else (None, None))
    ex = "NOT EXISTS" if anti else "EXISTS"
    inner_where = f" AND ({rpred_s})" if rpred_s else ""
    sql = (f"SELECT COUNT(*) AS n, CAST(SUM({lk}) AS BIGINT) AS key_sum "
           f"FROM {lname} l WHERE {ex} (SELECT 1 FROM {rname} r "
           f"WHERE r.{rk} = l.{lk}{inner_where})")

    def build(tabs: dict) -> DataFrame:
        left, right = tabs[lname], tabs[rname]
        if rpred_c is not None:
            right = right.where(rpred_c)
        j = left.join(right, left[lk] == right[rk],
                      "left_anti" if anti else "left_semi")
        return j.agg(F.count(F.lit(1)).alias("n"),
                     F.sum(lk).cast("long").alias("key_sum"))

    return Spec(seed, f"{'anti' if anti else 'semi'} {lname}~{rname}", build, sql)


def _setop_spec(rng: random.Random, seed: int) -> Spec:
    t = TABLES[rng.choice(["orders", "customer", "events", "documents"])]
    op = rng.choice(["UNION ALL", "UNION", "EXCEPT", "INTERSECT"])
    p1c, p1s = gen_predicate(t, rng)
    p2c, p2s = gen_predicate(t, rng)
    cat = rng.choice(t.cat_cols)
    uniq0 = t.uniq[0]
    branch = f"SELECT {uniq0} AS id, {cat} AS c FROM {t.name} WHERE "
    sql = (f"SELECT COUNT(*) AS n, COUNT(DISTINCT c) AS nc FROM "
           f"({branch}{p1s} {op} {branch}{p2s})")

    def build(tabs: dict) -> DataFrame:
        df = tabs[t.name]
        a = df.where(p1c).select(F.col(uniq0).alias("id"), F.col(cat).alias("c"))
        b = df.where(p2c).select(F.col(uniq0).alias("id"), F.col(cat).alias("c"))
        if op == "UNION ALL":
            u = a.unionByName(b)
        elif op == "UNION":
            u = a.unionByName(b).distinct()
        elif op == "EXCEPT":
            u = a.subtract(b)
        else:
            u = a.intersect(b)
        return u.agg(F.count(F.lit(1)).alias("n"),
                     F.countDistinct("c").alias("nc"))

    return Spec(seed, f"{op} over {t.name}", build, sql)


def _window_spec(rng: random.Random, seed: int) -> Spec:
    from pyspark.sql import Window

    t = TABLES[rng.choice(["orders", "customer", "events", "lineitem"])]
    part = rng.choice(t.cat_cols)
    (oc, osql), is_f = _num_col(t, rng)
    fn = rng.choice(["row_number", "rank", "dense_rank", "lag", "lead", "cumsum"])
    pred_c, pred_s = gen_predicate(t, rng)
    limit = 100
    uniq_sql = ", ".join(t.uniq)
    uniq_aliases = [f"u{i}" for i in range(len(t.uniq))]
    uniq_sel = ", ".join(f"{u} AS u{i}" for i, u in enumerate(t.uniq))
    # window order: value ASC NULLS FIRST + unique key (fully deterministic)
    win_order_sql = f"{osql} ASC NULLS FIRST, {uniq_sql}"

    if fn in ("row_number", "rank", "dense_rank"):
        wexpr_sql = f"{fn}() OVER (PARTITION BY {part} ORDER BY {win_order_sql})"
        out_cast = "BIGINT"
    elif fn in ("lag", "lead"):
        wexpr_sql = (f"{fn}({osql}, 1) OVER "
                     f"(PARTITION BY {part} ORDER BY {win_order_sql})")
        out_cast = "DOUBLE" if is_f else "BIGINT"
    else:  # cumsum with exact decimal accumulation
        inner = f"CAST({osql} AS DECIMAL(18,2))" if is_f else osql
        wexpr_sql = (f"SUM({inner}) OVER (PARTITION BY {part} "
                     f"ORDER BY {win_order_sql} "
                     "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
        out_cast = "DOUBLE" if is_f else "BIGINT"

    sql = (f"SELECT {part} AS p, {uniq_sel}, CAST({wexpr_sql} AS {out_cast}) AS w "
           f"FROM {t.name} WHERE {pred_s} "
           f"ORDER BY p ASC NULLS FIRST, "
           + ", ".join(f"{a} ASC NULLS FIRST" for a in uniq_aliases)
           + f" LIMIT {limit}")

    def build(tabs: dict) -> DataFrame:
        df = tabs[t.name].where(pred_c)
        w = Window.partitionBy(part).orderBy(
            oc.asc_nulls_first(), *[F.col(u).asc() for u in t.uniq]
        )
        if fn == "row_number":
            wc = F.row_number().over(w)
        elif fn == "rank":
            wc = F.rank().over(w)
        elif fn == "dense_rank":
            wc = F.dense_rank().over(w)
        elif fn in ("lag", "lead"):
            wc = (F.lag if fn == "lag" else F.lead)(oc, 1).over(w)
        else:
            inner = oc.cast("decimal(18,2)") if is_f else oc
            wc = F.sum(inner).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
        spark_cast = {"BIGINT": "long", "DOUBLE": "double"}[out_cast]
        out = df.select(
            F.col(part).alias("p"),
            *[F.col(u).alias(f"u{i}") for i, u in enumerate(t.uniq)],
            wc.cast(spark_cast).alias("w"),
        )
        order = [F.col("p").asc_nulls_first()] + [
            F.col(a).asc_nulls_first() for a in uniq_aliases
        ]
        return out.orderBy(*order).limit(limit)

    return Spec(seed, f"{fn} window over {t.name}", build, sql)


def _distinct_spec(rng: random.Random, seed: int) -> Spec:
    """SELECT DISTINCT over low-cardinality expressions — dedup semantics
    incl. NULL-as-a-value (one NULL row survives in both engines)."""
    t = TABLES[rng.choice(list(TABLES))]
    cat = rng.choice(t.cat_cols)
    v = rng.choice(CAT_VALUES[cat])
    kc, ks, _ = _group_key(t, rng, "k")
    pred_c, pred_s = gen_predicate(t, rng)
    sql = (f"SELECT DISTINCT NULLIF({cat}, '{v}') AS c, {ks} "
           f"FROM {t.name} WHERE {pred_s}")

    def build(tabs: dict) -> DataFrame:
        df = tabs[t.name].where(pred_c)
        return df.select(
            F.nullif(F.col(cat), F.lit(v)).alias("c"), kc
        ).distinct()

    return Spec(seed, f"distinct over {t.name}", build, sql)


def _offset_spec(rng: random.Random, seed: int) -> Spec:
    """LIMIT/OFFSET pagination over a fully-ordered projection — page
    boundaries are where tie/NULL-order bugs become row-content bugs."""
    t = TABLES[rng.choice(list(TABLES))]
    (oc, osql), _ = _num_col(t, rng)
    off = rng.choice([1, 7, 23, 50])
    lim = rng.choice([10, 25])
    d = rng.choice(["ASC", "DESC"])
    nulls = "NULLS FIRST" if d == "ASC" else "NULLS LAST"
    uniq_sel = ", ".join(f"{u} AS u{i}" for i, u in enumerate(t.uniq))
    uniq_aliases = [f"u{i}" for i in range(len(t.uniq))]
    order_tail = ", ".join(f"{a} ASC NULLS FIRST" for a in uniq_aliases)
    sql = (f"SELECT {osql} AS v, {uniq_sel} FROM {t.name} "
           f"ORDER BY v {d} {nulls}, {order_tail} "
           f"LIMIT {lim} OFFSET {off}")

    def build(tabs: dict) -> DataFrame:
        df = tabs[t.name].select(
            oc.alias("v"),
            *[F.col(u).alias(f"u{i}") for i, u in enumerate(t.uniq)],
        )
        first = (F.col("v").asc_nulls_first() if d == "ASC"
                 else F.col("v").desc_nulls_last())
        order = [first] + [F.col(a).asc_nulls_first() for a in uniq_aliases]
        return df.orderBy(*order).offset(off).limit(lim)

    return Spec(seed, f"offset pagination over {t.name}", build, sql)


def _null_group_spec(rng: random.Random, seed: int) -> Spec:
    """GROUP BY a NULLIF-wrapped key: both engines must produce exactly one
    NULL group, and aggregates over it must agree."""
    t = TABLES[rng.choice(list(TABLES))]
    cat = rng.choice(t.cat_cols)
    v = rng.choice(CAT_VALUES[cat])
    aggs = [gen_agg(t, rng, f"a{i}") for i in range(rng.randint(1, 2))]
    agg_sel = ", ".join(s for _, s in aggs)
    sql = (f"SELECT NULLIF({cat}, '{v}') AS k, {agg_sel} "
           f"FROM {t.name} GROUP BY NULLIF({cat}, '{v}')")

    def build(tabs: dict) -> DataFrame:
        df = tabs[t.name]
        return df.groupBy(
            F.nullif(F.col(cat), F.lit(v)).alias("k")
        ).agg(*[c for c, _ in aggs])

    return Spec(seed, f"NULL-keyed groupBy over {t.name}", build, sql)


def _rollup_cube_spec(rng: random.Random, seed: int) -> Spec:
    """ROLLUP/CUBE over two keys — the subtotal/NULL-marker rows are where
    grouping-set semantics diverge if at all."""
    t = TABLES[rng.choice(["orders", "lineitem", "customer", "events"])]
    op = rng.choice(["ROLLUP", "CUBE"])
    cats = (rng.sample(t.cat_cols, 2) if len(t.cat_cols) >= 2
            else [t.cat_cols[0], None])
    k2_sql = cats[1] if cats[1] else f"CAST({t.int_cols[0]} % 3 AS BIGINT)"
    aggs = [gen_agg(t, rng, "a0")]
    pred_c, pred_s = gen_predicate(t, rng)
    # DIALECT TRAP (found by this fuzzer, seeds 197/209): on EMPTY input
    # the SQL standard (and DuckDB) still emit the () grouping set's
    # grand-total row; Spark's rollup/cube emit zero rows. HAVING
    # COUNT(*) > 0 is a no-op on non-empty input (every emitted row
    # aggregates >= 1 base rows) and drops exactly that row when empty.
    sql = (f"SELECT {cats[0]} AS k1, {k2_sql} AS k2, {aggs[0][1]} "
           f"FROM {t.name} WHERE {pred_s} GROUP BY {op} ({cats[0]}, {k2_sql}) "
           f"HAVING COUNT(*) > 0")

    def build(tabs: dict) -> DataFrame:
        df = tabs[t.name].where(pred_c)
        k1 = F.col(cats[0]).alias("k1")
        k2 = (F.col(cats[1]).alias("k2") if cats[1]
              else (F.col(t.int_cols[0]) % 3).cast("long").alias("k2"))
        grouped = df.rollup(k1, k2) if op == "ROLLUP" else df.cube(k1, k2)
        return grouped.agg(aggs[0][0])

    return Spec(seed, f"{op} over {t.name}", build, sql)


def _text_order_spec(rng: random.Random, seed: int) -> Spec:
    """Fully-ordered LIMIT over documents.text prefixes — unicode byte-order
    (Spark UTF8_BINARY) vs DuckDB's default collation would show up as
    different rows surviving the limit."""
    t = TABLES["documents"]
    n = rng.choice([8, 16, 32])
    limit = rng.choice([25, 60])
    d = rng.choice(["ASC", "DESC"])
    nulls = "NULLS FIRST" if d == "ASC" else "NULLS LAST"
    sql = (f"SELECT substr(text, 1, {n}) AS p, doc_id AS u0 FROM documents "
           f"ORDER BY p {d} {nulls}, u0 ASC NULLS FIRST LIMIT {limit}")

    def build(tabs: dict) -> DataFrame:
        df = tabs[t.name].select(
            F.substring("text", 1, n).alias("p"), F.col("doc_id").alias("u0")
        )
        first = (F.col("p").asc_nulls_first() if d == "ASC"
                 else F.col("p").desc_nulls_last())
        return df.orderBy(first, F.col("u0").asc_nulls_first()).limit(limit)

    return Spec(seed, "unicode text ordering", build, sql)


def _join_groupby_spec(rng: random.Random, seed: int) -> Spec:
    """join → filter → groupBy over the joined shape — the most common
    real-query composition; exercises join-key NULLs (left joins) feeding
    grouping and aggregates over right-side columns."""
    lname, rname, lk, rk = rng.choice(_JOINS)
    lt, rt = TABLES.get(lname), TABLES.get(rname)
    how = rng.choice(["inner", "left"])
    preds = [gen_predicate(lt, rng) for _ in range(rng.randint(0, 1))]
    # group on a LEFT cat col; aggregate counts of both sides + a right
    # numeric (NULL-bearing under left join)
    gcat = rng.choice(lt.cat_cols)
    rnum = rng.choice(rt.int_cols) if rt else rk
    where = (" WHERE " + " AND ".join(f"({s})" for _, s in preds)
             if preds else "")
    joinw = "JOIN" if how == "inner" else "LEFT JOIN"
    sql = (f"SELECT l.{gcat} AS k, COUNT(*) AS n, COUNT(r.{rk}) AS n_r, "
           f"CAST(SUM(r.{rnum}) AS BIGINT) AS r_sum, "
           f"COUNT(DISTINCT r.{rnum}) AS r_nd "
           f"FROM {lname} l {joinw} {rname} r ON l.{lk} = r.{rk}{where} "
           f"GROUP BY l.{gcat}")

    def build(tabs: dict) -> DataFrame:
        left, right = tabs[lname], tabs[rname]
        for c, _ in preds:
            left = left.where(c)
        j = left.join(right, left[lk] == right[rk], how)
        return j.groupBy(left[gcat].alias("k")).agg(
            F.count(F.lit(1)).alias("n"),
            F.count(right[rk]).alias("n_r"),
            F.sum(right[rnum]).cast("long").alias("r_sum"),
            F.countDistinct(right[rnum]).alias("r_nd"),
        )

    return Spec(seed, f"{how} join+groupBy {lname}x{rname}", build, sql)


_SHAPES = [
    (_projection_spec, 3),
    (_groupby_spec, 3),
    (_join_spec, 2),
    (_semi_anti_spec, 2),
    (_setop_spec, 2),
    (_window_spec, 2),
    (_distinct_spec, 1),
    (_offset_spec, 1),
    (_null_group_spec, 1),
    (_rollup_cube_spec, 1),
    (_text_order_spec, 1),
    (_join_groupby_spec, 2),
]
_SHAPE_POOL = [fn for fn, w in _SHAPES for _ in range(w)]


# --------------------------------------------------------------------------
# v2 families (r9, VERDICT r8 next-round #3): the v1 generator's documented
# blind spots — engines' own ROUND/AVG, DECIMAL(p,s) arithmetic and
# cast-down rounding, interval day-second/year-month arithmetic, and
# window-over-join / window-over-union composites. Engine-pair rules these
# families bake in (probed r9; each probe is a comment below):
#
#   * DuckDB ROUND(double, n) rounds the TRUE BINARY value; Spark F.round
#     rounds the SHORTEST DECIMAL REPR half-up. On ≤2-decimal data the
#     oracle form ROUND(CAST(x AS DECIMAL(18,3)), n) reproduces Spark
#     exactly (cast at scale 3 is exact for 2-decimal reprs; DECIMAL
#     ROUND is half-away-from-zero == Java HALF_UP for all signs).
#   * Spark CAST(decimal AS decimal(p,s)) rounds HALF_UP; DuckDB's same
#     cast rounds HALF_EVEN (probed: 0.025 → 0.03 vs 0.02). The oracle
#     pin is ROUND(expr, s) BEFORE the cast (DuckDB decimal ROUND is
#     half-away-from-zero, matching).
#   * double→decimal casts are only exact when the cast scale EXCEEDS the
#     data's decimal grain (at the grain, shortest-repr vs true-binary
#     rounding diverges on .xx5 reprs — probed: 2.675 → 2.68 vs 2.67).
#   * decimals fetch as Decimal objects from Spark but floats from
#     DuckDB's fetchdf — every decimal-typed result casts to DOUBLE on
#     both sides before comparison (exactness already locked upstream).
#   * timestamp ± day-second intervals, add_months ↔ + INTERVAL n MONTH
#     (end-of-month clamp included), and datediff ↔ date_diff('day')
#     are value-identical across the engines (probed); timestamps emit
#     through date_format/strftime strings (driver canonicalizer rule).
# --------------------------------------------------------------------------

_FLOAT_TABLES = [n for n, t in TABLES.items() if t.float_cols]


def _native_round_spec(rng: random.Random, seed: int) -> Spec:
    """The engines' OWN round — Spark F.round vs the decimal-cast oracle
    pin — over real testdata floats, fully ordered."""
    t = TABLES[rng.choice(_FLOAT_TABLES)]
    c = rng.choice(t.float_cols)
    digits = rng.choice([0, 1, 2])
    limit = rng.choice([50, 100])
    uniq_sel = ", ".join(f"{u} AS u{i}" for i, u in enumerate(t.uniq))
    uniq_aliases = [f"u{i}" for i in range(len(t.uniq))]
    order_tail = ", ".join(f"{a} ASC NULLS FIRST" for a in uniq_aliases)
    pred_c, pred_s = gen_predicate(t, rng)
    sql = (f"SELECT CAST(ROUND(CAST({c} AS DECIMAL(18,3)), {digits}) "
           f"AS DOUBLE) AS r, {uniq_sel} "
           f"FROM {t.name} WHERE {pred_s} "
           f"ORDER BY r ASC NULLS FIRST, {order_tail} LIMIT {limit}")

    def build(tabs: dict) -> DataFrame:
        df = tabs[t.name].where(pred_c)
        out = df.select(
            F.round(F.col(c), digits).alias("r"),
            *[F.col(u).alias(f"u{i}") for i, u in enumerate(t.uniq)],
        )
        order = [F.col("r").asc_nulls_first()] + [
            F.col(a).asc_nulls_first() for a in uniq_aliases
        ]
        return out.orderBy(*order).limit(limit)

    return Spec(seed, f"native round({digits}) over {t.name}", build, sql)


def _native_avg_spec(rng: random.Random, seed: int) -> Spec:
    """The engines' OWN AVG (double and int inputs) per group — the v1
    generator hand-rolled SUM/COUNT instead; this compares the real
    aggregate implementations.

    Flap pin (r10 ADVICE): the 9-decimal canonicalization alone leaves a
    residual flake window — a group average landing within reassociation
    noise (~1e-12 relative) of a 9th-decimal ROUND boundary can
    canonicalize differently per engine, and the window widens with SF.
    Both sides therefore double-round through a DECIMAL collapse:
    cast to scale 8 first (a tie there needs the true average within
    noise of an exact 1e-8 half — measure ~0 for 2-decimal-grained
    inputs), then ROUND to 6. A flap now needs simultaneous boundary
    hits at BOTH scales."""
    t = TABLES[rng.choice(_FLOAT_TABLES)]
    c = rng.choice(list(t.float_cols) + list(t.int_cols))
    kc, ks, kg = _group_key(t, rng, "k")
    pred_c, pred_s = gen_predicate(t, rng)
    sql = (f"SELECT {ks}, "
           f"CAST(ROUND(CAST(AVG({c}) AS DECIMAL(27,8)), 6) AS DOUBLE) AS a, "
           f"COUNT({c}) AS n "
           f"FROM {t.name} WHERE {pred_s} GROUP BY {kg}")

    def build(tabs: dict) -> DataFrame:
        df = tabs[t.name].where(pred_c)
        return df.groupBy(kc).agg(
            F.round(F.avg(c).cast("decimal(27,8)"), 6)
            .cast("double")
            .alias("a"),
            F.count(c).alias("n"),
        )

    return Spec(seed, f"native AVG({c}) over {t.name}", build, sql)


def _decimal_arith_spec(rng: random.Random, seed: int) -> Spec:
    """DECIMAL(p,s) arithmetic: exact scale-3 ingestion, +/-/* in decimal,
    then the HALF_UP cast-down edge (oracle pins DuckDB's HALF_EVEN cast
    with an explicit decimal ROUND). Aggregate variant sums in decimal —
    exact and order-independent by construction."""
    t = TABLES[rng.choice(_FLOAT_TABLES)]
    a = rng.choice(t.float_cols)
    b = rng.choice(list(t.float_cols) + list(t.int_cols))
    op = rng.choice(["+", "-", "*"])
    agg = rng.random() < 0.5
    pred_c, pred_s = gen_predicate(t, rng)
    expr_sql = (f"CAST({a} AS DECIMAL(12,3)) {op} "
                f"CAST({b} AS DECIMAL(12,3))")
    da = F.col(a).cast("decimal(12,3)")
    db = F.col(b).cast("decimal(12,3)")
    dexpr = {"+": da + db, "-": da - db, "*": da * db}[op]

    if agg:
        sql = (f"SELECT CAST(SUM({expr_sql}) AS DOUBLE) AS s, "
               f"COUNT(*) AS n FROM {t.name} WHERE {pred_s}")

        def build(tabs: dict) -> DataFrame:
            df = tabs[t.name].where(pred_c)
            return df.agg(
                F.sum(dexpr).cast("double").alias("s"),
                F.count(F.lit(1)).alias("n"),
            )

        return Spec(seed, f"decimal SUM {a}{op}{b}", build, sql)

    limit = 100
    uniq_sel = ", ".join(f"{u} AS u{i}" for i, u in enumerate(t.uniq))
    uniq_aliases = [f"u{i}" for i in range(len(t.uniq))]
    order_tail = ", ".join(f"{x} ASC NULLS FIRST" for x in uniq_aliases)
    # cast-down to scale 2: Spark rounds HALF_UP; the oracle reproduces
    # it with decimal ROUND (half away from zero) before the cast
    sql = (f"SELECT CAST(CAST(ROUND({expr_sql}, 2) AS DECIMAL(18,2)) "
           f"AS DOUBLE) AS d, {uniq_sel} "
           f"FROM {t.name} WHERE {pred_s} "
           f"ORDER BY d ASC NULLS FIRST, {order_tail} LIMIT {limit}")

    def build(tabs: dict) -> DataFrame:
        df = tabs[t.name].where(pred_c)
        out = df.select(
            dexpr.cast("decimal(18,2)").cast("double").alias("d"),
            *[F.col(u).alias(f"u{i}") for i, u in enumerate(t.uniq)],
        )
        order = [F.col("d").asc_nulls_first()] + [
            F.col(x).asc_nulls_first() for x in uniq_aliases
        ]
        return out.orderBy(*order).limit(limit)

    return Spec(seed, f"decimal cast-down {a}{op}{b}", build, sql)


def _interval_spec(rng: random.Random, seed: int) -> Spec:
    """Interval day-second and year-month arithmetic (SURVEY §1.2 row 17):
    ts + N unit, add_months end-of-month clamping, day diffs. Timestamp
    results emit as strings (canonicalizer rule)."""
    t = TABLES[rng.choice(["events", "orders"])]
    c = t.ts_cols[0]
    kind = rng.choice(["ds_add", "ds_sub", "month_add", "day_diff"])
    limit = 100
    uniq_sel = ", ".join(f"{u} AS u{i}" for i, u in enumerate(t.uniq))
    uniq_aliases = [f"u{i}" for i in range(len(t.uniq))]
    order_tail = ", ".join(f"{x} ASC NULLS FIRST" for x in uniq_aliases)
    pred_c, pred_s = gen_predicate(t, rng)

    if kind in ("ds_add", "ds_sub"):
        n, unit = rng.choice(
            [(90, "MINUTE"), (36, "HOUR"), (7, "DAY"), (45, "SECOND")]
        )
        sign = "+" if kind == "ds_add" else "-"
        sval = (f"strftime(CAST({c} AS TIMESTAMP) {sign} "
                f"INTERVAL {n} {unit}, '%Y-%m-%d %H:%M:%S')")
        expr = F.col(c).cast("timestamp")
        delta = F.expr(f"INTERVAL {n} {unit}")
        sexpr = F.date_format(
            expr + delta if sign == "+" else expr - delta,
            "yyyy-MM-dd HH:mm:ss",
        )
        desc = f"ts {sign} {n} {unit}"
    elif kind == "month_add":
        n = rng.choice([1, 3, 13])
        # add_months clamps to end-of-month exactly like DuckDB's
        # + INTERVAL n MONTH (probed on Jan 31 / Feb 29)
        sval = (f"strftime(CAST(CAST({c} AS TIMESTAMP) + "
                f"INTERVAL {n} MONTH AS DATE), '%Y-%m-%d')")
        sexpr = F.date_format(
            F.add_months(F.col(c).cast("timestamp"), n), "yyyy-MM-dd"
        )
        desc = f"add_months {n}"
    else:
        anchor = "2024-06-15"
        sval = (f"CAST(date_diff('day', CAST({c} AS DATE), "
                f"DATE '{anchor}') AS BIGINT)")
        sexpr = F.datediff(
            F.lit(anchor).cast("date"), F.col(c).cast("date")
        ).cast("long")
        desc = "day diff"

    sql = (f"SELECT {sval} AS r, {uniq_sel} FROM {t.name} WHERE {pred_s} "
           f"ORDER BY r ASC NULLS FIRST, {order_tail} LIMIT {limit}")

    def build(tabs: dict) -> DataFrame:
        df = tabs[t.name].where(pred_c)
        out = df.select(
            sexpr.alias("r"),
            *[F.col(u).alias(f"u{i}") for i, u in enumerate(t.uniq)],
        )
        order = [F.col("r").asc_nulls_first()] + [
            F.col(x).asc_nulls_first() for x in uniq_aliases
        ]
        return out.orderBy(*order).limit(limit)

    return Spec(seed, f"interval {desc} over {t.name}", build, sql)


def _window_over_join_spec(rng: random.Random, seed: int) -> Spec:
    """Window function OVER a join — the composite the v1 generator never
    produced (windows ran on base tables only). The join key sides are
    unique on the right, so left-side uniqueness survives and the window
    order can be made total."""
    from pyspark.sql import Window

    lname, rname, lk, rk = rng.choice(
        [("orders", "customer", "o_custkey", "c_custkey"),
         ("lineitem", "orders", "l_orderkey", "o_orderkey")]
    )
    lt, rt = TABLES[lname], TABLES[rname]
    how = rng.choice(["inner", "left"])
    part = rng.choice(lt.cat_cols)
    # order by a RIGHT-side numeric — NULL-bearing under a left join, so
    # the window's NULLS FIRST rule is actually exercised
    rnum = rng.choice(rt.float_cols + rt.int_cols)
    fn = rng.choice(["row_number", "rank", "dense_rank"])
    pred_c, pred_s = gen_predicate(lt, rng)
    limit = 100
    uniq_sql = ", ".join(f"l.{u}" for u in lt.uniq)
    uniq_sel = ", ".join(f"l.{u} AS u{i}" for i, u in enumerate(lt.uniq))
    uniq_aliases = [f"u{i}" for i in range(len(lt.uniq))]
    order_tail = ", ".join(f"{x} ASC NULLS FIRST" for x in uniq_aliases)
    joinw = "JOIN" if how == "inner" else "LEFT JOIN"
    sql = (f"SELECT l.{part} AS p, {uniq_sel}, "
           f"CAST({fn}() OVER (PARTITION BY l.{part} "
           f"ORDER BY r.{rnum} ASC NULLS FIRST, {uniq_sql}) AS BIGINT) AS w "
           f"FROM {lname} l {joinw} {rname} r ON l.{lk} = r.{rk} "
           f"WHERE {pred_s} "
           f"ORDER BY p ASC NULLS FIRST, {order_tail} LIMIT {limit}")

    def build(tabs: dict) -> DataFrame:
        left, right = tabs[lname], tabs[rname]
        left = left.where(pred_c)
        j = left.join(right, left[lk] == right[rk], how)
        w = Window.partitionBy(left[part]).orderBy(
            right[rnum].asc_nulls_first(),
            *[left[u].asc() for u in lt.uniq],
        )
        wc = {"row_number": F.row_number, "rank": F.rank,
              "dense_rank": F.dense_rank}[fn]().over(w)
        out = j.select(
            left[part].alias("p"),
            *[left[u].alias(f"u{i}") for i, u in enumerate(lt.uniq)],
            wc.cast("long").alias("w"),
        )
        order = [F.col("p").asc_nulls_first()] + [
            F.col(x).asc_nulls_first() for x in uniq_aliases
        ]
        return out.orderBy(*order).limit(limit)

    return Spec(seed, f"{fn} over {how} join {lname}x{rname}", build, sql)


def _union_window_spec(rng: random.Random, seed: int) -> Spec:
    """Window OVER a set-op: two tagged filtered branches union-all'd,
    then ranked per category — branch tags keep the union a multiset
    with a total order."""
    from pyspark.sql import Window

    t = TABLES[rng.choice(["orders", "customer", "events"])]
    cat = rng.choice(t.cat_cols)
    uniq0 = t.uniq[0]
    p1c, p1s = gen_predicate(t, rng)
    p2c, p2s = gen_predicate(t, rng)
    limit = 100
    branch = (f"SELECT {cat} AS c, {uniq0} AS id, {{tag}} AS tag "
              f"FROM {t.name} WHERE ")
    inner = (branch.format(tag=1) + p1s + " UNION ALL "
             + branch.format(tag=2) + p2s)
    sql = (f"SELECT c, id, tag, "
           f"CAST(row_number() OVER (PARTITION BY c "
           f"ORDER BY tag, id) AS BIGINT) AS w "
           f"FROM ({inner}) "
           f"ORDER BY c ASC NULLS FIRST, tag ASC NULLS FIRST, "
           f"id ASC NULLS FIRST LIMIT {limit}")

    def build(tabs: dict) -> DataFrame:
        df = tabs[t.name]

        def branch_df(pred, tag):
            return df.where(pred).select(
                F.col(cat).alias("c"), F.col(uniq0).alias("id"),
                F.lit(tag).cast("int").alias("tag"),
            )

        u = branch_df(p1c, 1).unionByName(branch_df(p2c, 2))
        w = Window.partitionBy("c").orderBy(
            F.col("tag").asc(), F.col("id").asc()
        )
        out = u.select(
            "c", "id", "tag", F.row_number().over(w).cast("long").alias("w")
        )
        return out.orderBy(
            F.col("c").asc_nulls_first(), F.col("tag").asc_nulls_first(),
            F.col("id").asc_nulls_first(),
        ).limit(limit)

    return Spec(seed, f"row_number over union of {t.name}", build, sql)


_SHAPES_V2 = [
    (_native_round_spec, 3),
    (_native_avg_spec, 3),
    (_decimal_arith_spec, 3),
    (_interval_spec, 3),
    (_window_over_join_spec, 2),
    (_union_window_spec, 1),
]
_SHAPE_POOL_V2 = [fn for fn, w in _SHAPES_V2 for _ in range(w)]

#: seeds below this use the v1 pool — frozen so every historical seed
#: number keeps reproducing the exact spec that (maybe) found a bug
_V2_SEED_BASE = 360


def make_spec(seed: int) -> Spec:
    rng = random.Random(seed)
    pool = _SHAPE_POOL if seed < _V2_SEED_BASE else _SHAPE_POOL_V2
    shape = rng.choice(pool)
    return shape(rng, seed)
