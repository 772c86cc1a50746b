"""Adversarial FORMAT corpus over the sources / layout / SQL-surface
families (r10).

VERDICT r9 "What's missing #3": hostile corpora cover text (r8),
time/JSON (r8), numerics (r9), streaming (r9) — but the round-trip keys
(csv/jsonl/orc/hive-serde, merge/CDC/diff, partitioned layouts) were only
point-checked on clean data. Quoting, embedded delimiters/newlines, BOMs,
``\\N`` vs empty-string, trailing whitespace in partition values, and
mixed-case near-misses of filter constants are the classic
silent-corruption class for a connector whose reference raison d'être is
format dispatch (SURVEY.md §1.3).

This corpus poisons the STRING columns of lineitem / orders / customer /
nation coherently (numeric columns keep the real sf0.001 values, so the
r9 float discipline — accumulation-order noise ruled out — holds for
free) and replays every registered full-oracle key in the TPC-H,
relational-*, windows, and udf_surface modules against its registered
DuckDB oracle on the poisoned tables. That list deliberately supersets
the round-trip keys: group-bys, joins, windows, and pandas-UDF kernels
all see delimiter/quote/newline/BOM/unicode garbage in their key columns
too (VERDICT r9 "What's wrong #2" asked for the layout + SQL-surface
families; module-based selection gets them all and cannot silently
shrink as keys are added).

Below the replay, LazySimpleSerDe raw-text pins drive
``sources.readers.read_delimited(hive_serde=True)`` over hand-written
hostile text files — ``\\x01`` delims, ``\\N`` sentinels vs literal
backslash-N-adjacent data, ragged + over-long rows, quotes-as-data,
CRLF, and a UTF-8 BOM — where the contract is Hive's, not Spark-CSV's.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from .conftest import SF_SMOKE
from .oracle_harness import canon_frame, compare

# ---------------------------------------------------------------------------
# the poison vocabulary
# ---------------------------------------------------------------------------

# Every entry is either format-syntax (delimiter / quote / newline /
# escape), an encoding edge (BOM, control char, astral-plane emoji), a
# NULL-sentinel confusable (empty string, literal \N), or a near-miss of
# a filter constant (trailing space / case). None is a REAL NULL.
POISON: list[str | None] = [
    "plain",
    "pipe|field",          # the csv_roundtrip_agg sep
    "comma,field",         # the nations_per_region_csv list delim
    'quote"field',
    "'single'",
    "emb\nnewline",        # record-splitting hazard in any line format
    "emb\rcarriage",
    "tab\tfield",
    "back\\slash",
    "\\N",                 # Hive NULL sentinel as DATA
    "",                    # empty string — distinct from NULL
    None,                  # real NULL
    " lead-trail ",
    "\ufeffbom-prefixed",
    "naïve–café🙂",
    "\x01soh",             # the Hive default field delim as data
    "nul\x00byte",         # NUL — illegal in XML 1.0 even as an entity;
                           # DuckDB strings carry it fine (r10 advisor)
    "xml<&>chars",         # raw XML metacharacters
    "x" * 400,             # long field
]

# Partition-column poison: everything above EXCEPT the 400-char monster —
# a partition value becomes a directory name, and any value longer than
# the filesystem's 255-byte component limit fails the WRITE itself (a
# loud, correct error — pinned in test_partition_value_length_cliff
# below: the documented cliff of partitioning on unbounded user strings).
# Path metacharacters ('/', '=', '%', ':') go IN: Spark must escape them
# into the hive-style dir name and recover them on read.
POISON_PART: list[str | None] = [
    p for p in POISON
    if p is None or (len(p) <= 100 and "\x00" not in p)
] + ["a/b", "k=v", "pct%2Fenc", "c:d", "dot.dot"]
# NUL joins the long-string exclusion (r11): Hive path-escaping does not
# %-encode \x00 and the filesystem rejects it in a component, so a NUL
# partition value fails the WRITE loudly — same operational cliff, pinned
# in test_partition_value_nul_cliff below. As DATA it stays in POISON.


def _cycle_vals(orig: pd.Series, stride: int, vals: list,
                offset: int = 0) -> pd.Series:
    """Overwrite every ``stride``-th value with ``vals`` (cycled), leaving
    the rest of the column's REAL values intact so filter constants like
    'R' / 'F' keep matching rows."""
    out = orig.copy()
    j = 0
    for i in range(offset, len(out), stride):
        out.iloc[i] = vals[j % len(vals)]
        j += 1
    return out.astype("object")


def _cycle(orig: pd.Series, stride: int, extra: list[str] | None = None,
           offset: int = 0) -> pd.Series:
    return _cycle_vals(orig, stride, list(POISON) + (extra or []), offset)


def write_hostile_formats(dirpath) -> None:
    """Poison the string columns of the four TPC-H tables, keep numerics
    real. One builder, reused verbatim by the DuckDB views."""
    d = str(dirpath)

    li = pd.read_parquet(os.path.join(SF_SMOKE, "lineitem.parquet"))
    # 'R '/'r' probe partition-value trimming + case near the
    # parquet_partitioned_roundtrip filter constant 'R'
    li["l_returnflag"] = _cycle_vals(
        li["l_returnflag"], 3, POISON_PART + ["R ", "r"]
    )
    li["l_linestatus"] = _cycle(li["l_linestatus"], 7, offset=1)
    li.to_parquet(os.path.join(d, "lineitem.parquet"), index=False)

    orders = pd.read_parquet(os.path.join(SF_SMOKE, "orders.parquet"))
    orders["o_orderstatus"] = _cycle_vals(
        orders["o_orderstatus"], 3, POISON_PART + ["F ", "f"]
    )
    orders["o_orderpriority"] = _cycle(orders["o_orderpriority"], 4, offset=2)
    orders.to_parquet(os.path.join(d, "orders.parquet"), index=False)

    cust = pd.read_parquet(os.path.join(SF_SMOKE, "customer.parquet"))
    cust["c_mktsegment"] = _cycle(cust["c_mktsegment"], 2)
    cust["c_name"] = _cycle(cust["c_name"], 5, offset=3)
    cust.to_parquet(os.path.join(d, "customer.parquet"), index=False)

    nation = pd.read_parquet(os.path.join(SF_SMOKE, "nation.parquet"))
    # poison a third of the names; TPC-H filter constants (FRANCE,
    # GERMANY, BRAZIL, ...) mostly survive so q7/q8/q9 keep real rows
    nation["n_name"] = _cycle(nation["n_name"], 3, offset=1)
    nation.to_parquet(os.path.join(d, "nation.parquet"), index=False)


# ---------------------------------------------------------------------------
# replay: every full-oracle key in the format-touching modules
# ---------------------------------------------------------------------------

_MODULES = {
    "tpch",
    "relational_sources",
    "relational_joins",
    "relational_aggregates",
    "relational_sql",
    "relational_layout",
    "windows",
    "udf_surface",
}


def _format_keys() -> list[str]:
    from dask_hivemetastore_spark import plans

    keys = sorted(
        k
        for k, fn in plans.QUERIES.items()
        if fn.__module__.rsplit(".", 1)[-1] in _MODULES
        and k in plans.ORACLES
    )
    # the module set must keep covering the families this gate exists
    # for — a refactor that moves keys out should fail loudly here
    assert len(keys) >= 100, f"format-family key list shrank: {len(keys)}"
    return keys


@pytest.fixture(scope="module")
def hostile_fmt_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("hostile_format_sf")
    write_hostile_formats(d)
    done = {"lineitem.parquet", "orders.parquet", "customer.parquet",
            "nation.parquet"}
    for f in os.listdir(SF_SMOKE):
        if f not in done:
            os.symlink(os.path.join(SF_SMOKE, f), d / f)
    return str(d)


@pytest.fixture(scope="module")
def hostile_fmt_duck(hostile_fmt_dir):
    import duckdb

    from dask_hivemetastore_spark.catalog import TABLE_NAMES

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{hostile_fmt_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("key", _format_keys())
def test_format_keys_on_hostile_corpus(spark, key, hostile_fmt_dir,
                                       hostile_fmt_duck):
    from dask_hivemetastore_spark import plans

    sdf = plans.QUERIES[key](spark, hostile_fmt_dir)
    rel = hostile_fmt_duck.sql(plans.ORACLES[key])
    problems = compare(key, sdf, rel)
    assert not problems, "\n".join(problems)


# ---------------------------------------------------------------------------
# LazySimpleSerDe raw-text pins (sources.readers.read_delimited)
# ---------------------------------------------------------------------------


def _write_bytes(tmp_path, name: str, data: bytes) -> str:
    p = tmp_path / name
    p.write_bytes(data)
    return str(p)


_HIVE_COLS = [("k", "bigint"), ("s", "string"), ("v", "double")]


def _read_serde(spark, path):
    from dask_hivemetastore_spark.sources.readers import read_delimited

    df = read_delimited(spark, path, _HIVE_COLS, hive_serde=True)
    return sorted(
        [tuple(r) for r in df.collect()],
        key=lambda t: (t[0] is None, t[0]),
    )


def test_serde_null_sentinel_vs_empty(spark, tmp_path):
    """Hive text semantics: ``\\N`` is NULL, bare empty field is EMPTY
    STRING (for string columns) — never conflated. A short (ragged) row
    NULL-pads; extra trailing fields are ignored."""
    raw = (
        b"1\x01hello\x012.5\n"
        b"2\x01\\N\x013.5\n"          # \N -> NULL string
        b"3\x01\x014.5\n"              # empty -> '' (NOT NULL)
        b"4\x01short\n"                # ragged -> v NULL
        b"5\x01extra\x011.0\x01IGNORED\n"  # over-long -> extras dropped
        b"\\N\x01nullkey\x010.5\n"     # \N in a numeric column -> NULL
    )
    path = _write_bytes(tmp_path, "t.txt", raw)
    rows = _read_serde(spark, path)
    assert rows == [
        (1, "hello", 2.5),
        (2, None, 3.5),
        (3, "", 4.5),
        (4, "short", None),
        (5, "extra", 1.0),
        (None, "nullkey", 0.5),
    ]


def test_serde_no_quote_handling(spark, tmp_path):
    """LazySimpleSerDe has NO quoting: a double quote is data, and a
    delimiter inside quotes still splits the field (unlike Spark-CSV)."""
    raw = b'7\x01"quoted\x01data"\x011.5\n'
    path = _write_bytes(tmp_path, "q.txt", raw)
    rows = _read_serde(spark, path)
    # the \x01 inside the quotes SPLITS: field 2 = '"quoted',
    # field 3 = 'data"' which fails the double cast -> NULL
    assert rows == [(7, '"quoted', None)]


def test_serde_crlf_and_bom(spark, tmp_path):
    """CRLF line endings: Hadoop's line reader strips ``\\r\\n`` and
    ``\\n`` both, so a CRLF file reads clean. A file-leading UTF-8 BOM
    is STRIPPED by Hadoop's TextInputFormat (probed r10 — the same input
    format Hive's text tables read through, so this matches Hive), while
    a BOM anywhere else is data; pinned so the behavior is the documented
    one, not an accident."""
    raw = b"1\x01a\x011.0\r\n2\x01b\x012.0\r\n"
    path = _write_bytes(tmp_path, "crlf.txt", raw)
    assert _read_serde(spark, path) == [(1, "a", 1.0), (2, "b", 2.0)]

    bom = ("\ufeff3\x01c\x013.0\n4\x01\ufeffd\x014.0\n").encode()
    path2 = _write_bytes(tmp_path, "bom.txt", bom)
    assert _read_serde(spark, path2) == [(3, "c", 3.0), (4, "\ufeffd", 4.0)]


def test_partition_value_length_cliff(spark, tmp_path):
    """Partitioning on an unbounded string column has a hard operational
    cliff: the value becomes a directory name, and one longer than the
    filesystem's 255-byte component limit fails the WRITE with a loud
    TASK_WRITE_FAILED — never silent truncation or corruption (r10
    hostile-format gate, found via the 400-char poison; that is why the
    engine's partitioned layouts key on bounded/dictionary columns)."""
    from py4j.protocol import Py4JJavaError
    from pyspark.sql import functions as F

    df = spark.range(4).withColumn("pval", F.lit("x" * 400))
    with pytest.raises(Py4JJavaError):
        df.write.mode("overwrite").partitionBy("pval").parquet(
            str(tmp_path / "cliff")
        )


def test_partition_value_nul_cliff(spark, tmp_path):
    """NUL is the other partition-value cliff (r11, r10 advisor): Hive
    path-escaping does not %-encode \\x00 and no POSIX filesystem accepts
    it inside a path component, so the WRITE fails loudly — never a
    silently mangled directory name. NUL as ordinary column DATA is fine
    (covered by POISON in the main corpus); only the value-becomes-a-path
    use hits this."""
    from py4j.protocol import Py4JJavaError
    from pyspark.sql import functions as F

    df = spark.range(4).withColumn("pval", F.lit("nul\x00byte"))
    with pytest.raises(Py4JJavaError):
        df.write.mode("overwrite").partitionBy("pval").parquet(
            str(tmp_path / "nulcliff")
        )


def test_serde_custom_delim_tab(spark, tmp_path):
    """field.delim is table metadata — a TSV-declared table must split on
    TAB and keep \\x01 as data."""
    from dask_hivemetastore_spark.sources.readers import read_delimited

    raw = b"1\twith\x01soh\t9.5\n"
    path = _write_bytes(tmp_path, "tsv.txt", raw)
    df = read_delimited(spark, path, _HIVE_COLS, sep="\t", hive_serde=True)
    assert [tuple(r) for r in df.collect()] == [(1, "with\x01soh", 9.5)]


# ---------------------------------------------------------------------------
# schema-evolution, raw-JSONL, and CDC-conflict pins (r10, VERDICT r9 #3)
# ---------------------------------------------------------------------------


def test_schema_merge_widens_columns_not_types(spark, tmp_path):
    """mergeSchema's contract, pinned from both sides: ADDITIVE evolution
    (new column) merges — the certified `parquet_schema_evolution` key —
    but a TYPE change for an existing column fails LOUDLY with
    CANNOT_MERGE_SCHEMAS (probed r10: int→long and int→string both
    throw; Spark 4 parquet merge does not type-widen). Silent coercion
    would be the corruption; the loud error is the documented behavior —
    a 100 TB table changes a column's type by rewrite or by view-level
    cast, never in-place."""
    from py4j.protocol import Py4JJavaError
    from pyspark.sql import functions as F

    d = str(tmp_path)
    spark.range(3).select(F.col("id").cast("int").alias("v")).write.parquet(
        f"{d}/t/v1"
    )
    spark.range(3).select(F.col("id").cast("long").alias("v")).write.parquet(
        f"{d}/t/v2"
    )
    with pytest.raises(Py4JJavaError, match="CANNOT_MERGE_SCHEMAS"):
        spark.read.option("mergeSchema", True).option(
            "recursiveFileLookup", True
        ).parquet(f"{d}/t").collect()


def test_jsonl_hostile_records_declared_schema(spark, tmp_path):
    """Raw JSONL with a DECLARED schema (the metastore path — no
    inference), PERMISSIVE mode, pinned behaviors (probed r10):
    duplicate keys in one object → LAST value wins; a non-JSON line →
    all data columns NULL and the raw line lands in _corrupt_record; a
    missing field → NULL; a TYPE-mismatched field → the whole row is
    nulled and the original text preserved in _corrupt_record (partial
    results would silently mix good and garbage)."""
    p = str(tmp_path / "j.jsonl")
    with open(p, "w") as f:
        f.write(
            '{"k":1,"s":"a","s":"b"}\n'
            '{"k":2,"s":"ok"}\n'
            "NOT_JSON\n"
            '{"k":3}\n'
            '{"k":"oops","s":"t"}\n'
        )
    back = spark.read.schema("k bigint, s string, _corrupt_record string").json(p)
    rows = sorted(
        [tuple(r) for r in back.collect()],
        key=lambda t: (t[0] is None, t[0], str(t[2])),
    )
    assert rows == [
        (1, "b", None),            # duplicate key: last wins
        (2, "ok", None),
        (3, None, None),           # missing field -> NULL
        (None, None, "NOT_JSON"),  # bad record -> corrupt column
        (None, "t", '{"k":"oops","s":"t"}'),  # type clash -> row nulled
    ]


def test_cdc_conflicting_updates_contract(spark):
    """A change feed with MULTIPLE updates for one key: the bare
    full-outer merge join DUPLICATES the base row (pinned — this is the
    silent row-inflation failure mode, and why Delta's MERGE raises on
    multiple source matches), and the documented remedy — latest-wins
    row_number dedupe on (key ORDER BY version DESC) BEFORE the merge —
    restores exact-row semantics."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    base = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double"
    )
    upd = spark.createDataFrame(
        [(1, 11.0, 1), (1, 12.0, 2), (2, 21.0, 1)], "k long, v double, ver int"
    )
    naive = base.join(upd, "k", "full_outer")
    assert naive.count() == 4  # key 1 duplicated — the inflation, pinned

    latest = (
        upd.withColumn(
            "__rn",
            F.row_number().over(Window.partitionBy("k").orderBy(F.desc("ver"))),
        )
        .where(F.col("__rn") == 1)
        .drop("__rn", "ver")
    )
    merged = (
        base.alias("b")
        .join(latest.alias("u"), "k", "full_outer")
        .select("k", F.coalesce("u.v", "b.v").alias("v"))
    )
    assert sorted(tuple(r) for r in merged.collect()) == [
        (1, 12.0),
        (2, 21.0),
        (3, 30.0),
    ]


# ---------------------------------------------------------------------------
# seeded round-trip fuzz of the lossless delimited protocol (r10)
# ---------------------------------------------------------------------------

# alphabet biased toward protocol metacharacters: separators, quotes,
# backslashes, newlines, the NULL sentinel's letters, whitespace, unicode
_FUZZ_ALPHABET = list('|,"\\\n\r\t N\x01\x00;ab 0ré🙂') + ["\\N", '""', "  ", "\\0", "\\r"]


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(8))
def test_delimited_lossless_roundtrip_fuzz(spark, tmp_path, seed):
    """Property: write_delimited_lossless ∘ read_delimited_lossless is
    the IDENTITY on any frame — seeded random strings drawn from a
    metacharacter-heavy alphabet (every combination of backslashes,
    sentinels, quotes, newlines, delimiters adjacency), plus NULLs,
    empties, ints and doubles. 8 seeds × 60 rows; exact canonical-frame
    equality."""
    import random

    from dask_hivemetastore_spark.sources.readers import (
        read_delimited_lossless,
        write_delimited_lossless,
    )

    rng = random.Random(seed)

    def rand_str():
        r = rng.random()
        if r < 0.08:
            return None
        if r < 0.16:
            return ""
        return "".join(
            rng.choice(_FUZZ_ALPHABET)
            for _ in range(rng.randint(1, 12))
        )

    rows = [
        (
            i,
            rand_str(),
            rand_str(),
            None if rng.random() < 0.1 else round(rng.uniform(-1e4, 1e4), 2),
        )
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "k bigint, s1 string, s2 string, v double")
    out = str(tmp_path / "fuzz_csv")
    write_delimited_lossless(df, out)
    back = read_delimited_lossless(
        spark, out,
        [("k", "bigint"), ("s1", "string"), ("s2", "string"), ("v", "double")],
    )
    want = canon_frame(df.toPandas())
    got = canon_frame(back.toPandas())
    assert got == want
