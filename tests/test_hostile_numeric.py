"""Adversarial NUMERIC corpus over the UDF-surface and aggregate keys (r9).

The r8 hostile corpora poisoned TEXT (documents) and TIME/JSON (events);
the numeric tables — lineitem, orders, customer, supplier — stayed
well-formed, so the pandas-UDF surface (Arrow NULL→NaN conversion,
domain errors like log(negative), degenerate groups) and the numeric
aggregate family (NULL/zero/negative/huge values, NULL group keys, NULL
join keys, value ties) were never adversarially replayed. This corpus
poisons all four tables coherently (foreign keys partially dangle on
purpose) and replays every registered full-oracle key that reads them,
against its registered DuckDB oracle.

Float discipline: magnitudes stay ≤ 2e4 with ≤2 decimals and small
groups — EXCEPT deliberately-placed edges (one 1e12 row in its own
group, cent-boundary x.xx5 values) — so any failure is semantic, not
accumulation-order noise.
"""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd
import pytest

from .oracle_harness import compare


def _d(s: str):
    return dt.date.fromisoformat(s) if s else None


# ---------------------------------------------------------------------------
# the corpus: four coherently-poisoned tables
# ---------------------------------------------------------------------------

# customer: NULL segment, NULL nationkey, dangling nationkey, NULL /
# negative / zero / huge / tied acctbal, a single-customer segment
# (STDDEV_SAMP -> NULL), an all-equal segment (std = 0 -> 0/0)
_CUSTOMER = [
    # (c_custkey, c_name, c_nationkey, c_mktsegment, c_acctbal)
    (1, "Customer#1", 0, "BUILDING", 100.50),
    (2, "Customer#2", 0, "BUILDING", -999.99),
    (3, "Customer#3", 1, "BUILDING", None),
    (4, "Customer#4", 1, "BUILDING", 0.0),
    (5, "Customer#5", 2, "AUTOMOBILE", 55.55),
    (6, "Customer#6", 2, "AUTOMOBILE", 55.55),   # tie
    (7, "Customer#7", 3, "AUTOMOBILE", 55.55),   # all-equal group → std 0
    (8, "Customer#8", None, "MACHINERY", 17.25),  # NULL nationkey
    (9, "Customer#9", 99, "MACHINERY", 8194.925),  # dangling nation, cent edge
    (10, "Customer#10", 4, None, 42.0),           # NULL segment
    (11, "Customer#11", 4, None, 43.0),
    (12, "Customer#12", 5, "HOUSEHOLD", 1.005),   # single-row segment
    (13, "Customer#13", 6, "FURNITURE", 2e4),
    (14, "Customer#14", 6, "FURNITURE", -2e4),
    (15, "Customer#15", 7, "FURNITURE", 0.01),
]

_SUPPLIER = [
    # (s_suppkey, s_name, s_nationkey, s_acctbal)
    (1, "Supplier#1", 0, 10.0),
    (2, "Supplier#2", 1, None),
    (3, "Supplier#3", 2, -5.25),
    (4, "Supplier#4", None, 7.0),
    (5, "Supplier#5", 99, 0.0),
    (6, "Supplier#6", 6, 123.45),
]

# orders: NULL custkey, dangling custkey, NULL/zero/negative/huge
# totalprice (huge isolated in status "X"), NULL orderdate, NULL status,
# cent-edge prices, duplicate priorities
_ORDERS = [
    # (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
    #  o_orderpriority)
    (1, 1, "O", 100.00, _d("2024-01-05"), "1-URGENT"),
    (2, 1, "O", 2.675, _d("2024-01-12"), "2-HIGH"),      # cent edge
    (3, 2, "O", 0.01, _d("2024-01-19"), "3-MEDIUM"),
    (4, 3, "F", 55.55, _d("2024-02-02"), "1-URGENT"),
    (5, 4, "F", 55.55, _d("2024-02-09"), "5-LOW"),       # tie
    (6, 5, "F", None, _d("2024-02-16"), "4-NOT SPECIFIED"),  # NULL price
    (7, None, "F", 19.99, _d("2024-02-23"), "2-HIGH"),   # NULL custkey
    (8, 999, "P", 7.50, _d("2024-03-01"), "3-MEDIUM"),   # dangling custkey
    (9, 5, "P", 0.0, _d("2024-03-08"), "5-LOW"),         # zero → LN edge
    (10, 6, "P", -42.42, _d("2024-03-15"), "1-URGENT"),  # negative → LN NaN
    (11, 7, None, 11.11, _d("2024-03-22"), "2-HIGH"),    # NULL status
    (12, 8, "X", 1.0e12, _d("2024-03-29"), "3-MEDIUM"),  # huge, own group
    (13, 9, "O", 8194.925, None, "1-URGENT"),            # NULL date
    (14, 10, "O", 33.33, _d("1970-01-01"), "5-LOW"),     # epoch date
    (15, 12, "F", 44.44, _d("2024-04-05"), "4-NOT SPECIFIED"),
    # r9 window-family block: keys divisible by 19/101 reach the
    # window_value_funcs (%101) and window_price_band (%19) filters;
    # custkey 9 gets a SECOND order with a real date so the NULL-date
    # order 13 is no longer alone in its cumsum partition (NULL-position
    # in ASC ordering is where Spark NULLS FIRST and DuckDB NULLS LAST
    # defaults diverge); equal prices inside one status exercise the
    # pinned tiebreaks; a NULL price and NULL status land inside the
    # %19/%101 subsets too.
    (19, 1, "O", 500.00, _d("2024-05-01"), "1-URGENT"),
    (38, 2, "O", 500.00, _d("2024-05-02"), "2-HIGH"),     # price tie
    (57, 3, "O", None, _d("2024-05-03"), "3-MEDIUM"),     # NULL price
    (76, 4, None, 750.00, _d("2024-05-04"), "5-LOW"),     # NULL status
    (95, 9, "F", 1250.50, _d("2024-05-05"), "4-NOT SPECIFIED"),
    (101, 9, "O", 10.00, _d("2024-05-06"), "1-URGENT"),   # 2nd custkey-9 row
    (202, 5, "O", None, _d("2024-05-07"), "2-HIGH"),      # NULL price
    (303, None, "F", 1250.50, _d("2024-05-08"), "3-MEDIUM"),  # NULL custkey
    (404, 6, "O", 10.00, None, "5-LOW"),                  # NULL date, %101
]

# part: NULL brand, NULL/tied/negative/zero retailprice — the E5/E6
# ranking frames order by retailprice DESC with a partkey tiebreak, so
# the poison probes NULL placement under DESC and tie determinism
_PART = [
    # (p_partkey, p_name, p_brand, p_type, p_size, p_retailprice)
    (1, "part 1", "Brand#11", "STANDARD", 5, 100.00),
    (2, "part 2", "Brand#11", "STANDARD", 10, 100.00),   # tie
    (3, "part 3", "Brand#11", "SMALL", 15, None),        # NULL price
    (4, "part 4", "Brand#11", "LARGE", 20, -7.25),
    (5, "part 5", "Brand#11", "MEDIUM", 25, 0.0),
    (6, "part 6", "Brand#22", "STANDARD", 1, 8194.925),  # cent edge
    (7, "part 7", "Brand#22", "SMALL", None, 55.55),
    (8, "part 8", None, "LARGE", 3, 55.55),              # NULL brand
    (9, "part 9", None, "MEDIUM", 4, None),              # NULL brand+price
    (10, "part 10", "Brand#33", "STANDARD", 50, 1.005),  # single-part brand
]

# lineitem: duplicate (orderkey, linenumber) pairs (a testdata trait the
# quality reports count), NULL/zero/negative/boundary quantities (the
# UDF-surface filters select >= 48 and <= 3), NULL/negative/cent-edge
# prices, discount 0 and 1, NULL flags/dates
_LINEITEM = [
    # (l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
    #  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
    #  l_shipdate)
    (1, 1, 1, 1, 17.0, 1000.00, 0.05, 0.02, "N", "O", _d("2024-01-10")),
    (1, 2, 2, 2, 36.0, 2000.50, 0.10, 0.06, "N", "O", _d("2024-01-11")),
    (1, 3, 1, 2, 8.0, 500.25, 0.00, 0.00, "A", "F", _d("2024-01-12")),  # dup (1,2)
    (2, 1, 3, 1, 49.0, 4900.00, 0.07, 0.03, "R", "F", _d("2024-01-20")),  # qty>=48
    (2, 2, 1, 2, 48.0, 4800.00, 0.00, 0.08, "R", "F", _d("2024-01-21")),  # boundary
    (3, 4, 2, 1, 3.0, 300.00, 0.01, 0.01, "N", "O", _d("2024-01-25")),    # qty<=3
    (3, 5, 3, 2, 2.0, 150.75, 0.09, 0.05, "A", "O", _d("2024-01-26")),
    (4, 1, 1, 1, 1.0, 2.675, 0.50, 0.00, "A", "F", _d("2024-02-05")),     # cent edge
    (4, 2, 2, 2, None, 400.00, 0.02, 0.04, "N", "F", _d("2024-02-06")),   # NULL qty
    (5, 3, 1, 1, 0.0, 0.00, 0.00, 0.00, "R", "O", _d("2024-02-10")),      # zeros
    (5, 4, 2, 2, -4.0, -100.00, 0.03, 0.02, "R", "O", _d("2024-02-11")),  # negatives
    (6, 5, 3, 1, 12.0, None, 0.04, 0.01, "N", "O", _d("2024-02-15")),     # NULL price
    (6, 1, 1, 2, 25.0, 1250.00, None, 0.05, "A", "F", _d("2024-02-16")),  # NULL disc
    (7, 2, 2, 1, 30.0, 1500.00, 1.00, None, "R", "F", _d("2024-02-20")),  # disc=1
    (8, 3, 3, 1, 50.0, 5000.00, 0.06, 0.07, None, "O", _d("2024-02-25")), # NULL flag
    (8, 4, 1, 2, 55.0, 5500.00, 0.08, 0.02, "N", None, _d("2024-02-26")), # NULL status
    (9, 5, 2, 1, 60.0, 6000.00, 0.02, 0.03, "A", "O", None),              # NULL date
    (9, 5, 2, 1, 60.0, 6000.00, 0.02, 0.03, "A", "O", None),              # full dup row
    (10, 1, 3, 1, 48.5, 19999.99, 0.05, 0.04, "N", "F", _d("2024-03-05")),
    (10, 2, 1, 2, 3.0, 8194.925, 0.10, 0.06, "R", "O", _d("2024-03-06")), # cent edge
]


def _ts(d):
    """date → midnight timestamp (testdata stores dates as timestamp[us]).
    NULL must be None, not pd.NaT: pyarrow's pa.array coerces NaT to
    0001-01-01 (a valid-looking year-1 timestamp!) instead of null."""
    return pd.Timestamp(d) if d is not None else None


def write_hostile_numeric(dirpath) -> None:
    """Write the four poisoned tables under ``dirpath`` with EXACTLY the
    physical types the sf* testdata uses (verified against
    /root/testdata/sf0.001): int64 surrogate keys, int32 nationkey /
    linenumber, plain double money columns, timestamp[us] dates.  Fidelity
    matters: the first run of this gate used int64 linenumber and date32
    dates and produced a spurious ArrowColumnVector accessor crash in
    `map_arrow_net_price` that no real table can trigger."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    base = str(dirpath)
    papq.write_table(pa.table(
        {
            "c_custkey": pa.array([r[0] for r in _CUSTOMER], pa.int64()),
            "c_name": pa.array([r[1] for r in _CUSTOMER], pa.string()),
            "c_nationkey": pa.array([r[2] for r in _CUSTOMER], pa.int32()),
            "c_acctbal": pa.array([r[4] for r in _CUSTOMER], pa.float64()),
            "c_mktsegment": pa.array([r[3] for r in _CUSTOMER], pa.string()),
        }
    ), os.path.join(base, "customer.parquet"))
    papq.write_table(pa.table(
        {
            "s_suppkey": pa.array([r[0] for r in _SUPPLIER], pa.int64()),
            "s_name": pa.array([r[1] for r in _SUPPLIER], pa.string()),
            "s_nationkey": pa.array([r[2] for r in _SUPPLIER], pa.int32()),
            "s_acctbal": pa.array([r[3] for r in _SUPPLIER], pa.float64()),
        }
    ), os.path.join(base, "supplier.parquet"))
    papq.write_table(pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in _ORDERS], pa.int64()),
            "o_custkey": pa.array([r[1] for r in _ORDERS], pa.int64()),
            "o_orderstatus": pa.array([r[2] for r in _ORDERS], pa.string()),
            "o_totalprice": pa.array([r[3] for r in _ORDERS], pa.float64()),
            "o_orderdate": pa.array(
                [_ts(r[4]) for r in _ORDERS], pa.timestamp("us")
            ),
            "o_orderpriority": pa.array([r[5] for r in _ORDERS], pa.string()),
        }
    ), os.path.join(base, "orders.parquet"))
    papq.write_table(pa.table(
        {
            "p_partkey": pa.array([r[0] for r in _PART], pa.int64()),
            "p_name": pa.array([r[1] for r in _PART], pa.string()),
            "p_brand": pa.array([r[2] for r in _PART], pa.string()),
            "p_type": pa.array([r[3] for r in _PART], pa.string()),
            "p_size": pa.array([r[4] for r in _PART], pa.int32()),
            "p_retailprice": pa.array([r[5] for r in _PART], pa.float64()),
        }
    ), os.path.join(base, "part.parquet"))
    papq.write_table(pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in _LINEITEM], pa.int64()),
            "l_partkey": pa.array([r[1] for r in _LINEITEM], pa.int64()),
            "l_suppkey": pa.array([r[2] for r in _LINEITEM], pa.int64()),
            "l_linenumber": pa.array([r[3] for r in _LINEITEM], pa.int32()),
            "l_quantity": pa.array([r[4] for r in _LINEITEM], pa.float64()),
            "l_extendedprice": pa.array(
                [r[5] for r in _LINEITEM], pa.float64()
            ),
            "l_discount": pa.array([r[6] for r in _LINEITEM], pa.float64()),
            "l_tax": pa.array([r[7] for r in _LINEITEM], pa.float64()),
            "l_returnflag": pa.array([r[8] for r in _LINEITEM], pa.string()),
            "l_linestatus": pa.array([r[9] for r in _LINEITEM], pa.string()),
            "l_shipdate": pa.array(
                [_ts(r[10]) for r in _LINEITEM], pa.timestamp("us")
            ),
        }
    ), os.path.join(base, "lineitem.parquet"))


# every full-oracle key whose inputs are (a subset of) the poisoned
# tables. TPC-H q1/q6 are the flagship aggregate scans; the J-family
# keys exercise the Arrow NULL→NaN conversion and domain-error edges.
_KEYS = [
    # UDF surface (J)
    "custom_agg_geomean",
    "grouped_map_zscore",
    "map_partitions_net_price",
    "cogrouped_map_ratio",
    "map_arrow_net_price",
    "grouped_arrow_minmax",
    # aggregates (D) on poisoned numerics
    "agg_var_std",
    "quantile_value",
    "agg_collect",
    "agg_misc",
    "argmin_argmax_orders",
    "decimal_money_agg",
    "describe_lineitem",
    "median_mode_agg",
    "mad_robust_outliers",
    "corr_price_qty",
    "regression_price_qty",
    "price_histogram",
    "crosstab_status_segment",
    "cube_segment_status",
    "rollup_grouping_id",
    "data_quality_report",
    "quality_report_by_status",
    "unpivot_lineitem_metrics",
    # joins (C) with NULL/dangling keys
    "join_orders_customer",
    "left_join_customer_orders",
    "semi_join_customers",
    "anti_join_customers",
    "join_indicator",
    "null_safe_join",
    "salted_join_revenue",
    # filters / pivots / sql-surface over poisoned values
    "case_when_bucketing",
    "null_handling",
    "filter_in_list",
    "pivot_status_by_segment",
    "paginate_orders",
    "try_arithmetic_safety",
    # TPC-H flagship aggregate scans
    "q1_pricing_summary",
    "q6_revenue_delta",
    # window family (E) — NULL sort keys probe the engines' default
    # NULL placement (Spark ASC → NULLS FIRST, DuckDB → NULLS LAST),
    # ties probe the pinned tiebreaks, NULL partition keys group as one
    "window_rank_orders",
    "window_rank_kinds",
    "cumsum_orders",
    "topn_parts_per_brand",
    "window_value_funcs",
    "window_price_band",
    # join-then-window-then-sort composite over three poisoned tables
    "q3_top_orders",
    # r10 extension (VERDICT r9 "What's wrong #2"): the layout, source
    # round-trip, and SQL-surface families read the same poisoned tables
    # but were never replayed here — the string-poison twin
    # (test_hostile_formats.py) covers them on format garbage; this list
    # runs them over the NUMERIC edges (NULL keys, cent boundaries, the
    # isolated 1e12 row, ties)
    "sorted_layout_roundtrip",
    "zorder_layout_roundtrip",
    "compact_small_files",
    "compact_partition_scoped",
    "bucketed_join_agg",
    "csv_roundtrip_agg",
    "orc_roundtrip_agg",
    "jsonl_roundtrip_agg",
    "parquet_partitioned_roundtrip",
    "parquet_schema_evolution",
    "thin_metastore_scan",
    "merge_upsert_orders",
    "cdc_apply_changes",
    "table_diff_snapshots",
    "xml_parse_orders",
    "lateral_top_lineitems",
    "recursive_month_spine",
    "parameterized_sql_orders",
    "union_mismatched_schemas",
    "quantile_approx_value",
]


@pytest.fixture(scope="module")
def hostile_num_dir(tmp_path_factory) -> str:
    from .conftest import SF_SMOKE

    d = tmp_path_factory.mktemp("hostile_numeric_sf")
    write_hostile_numeric(d)
    done = {"customer.parquet", "supplier.parquet", "orders.parquet",
            "lineitem.parquet", "part.parquet"}
    for f in os.listdir(SF_SMOKE):
        if f not in done:
            os.symlink(os.path.join(SF_SMOKE, f), d / f)
    return str(d)


@pytest.fixture(scope="module")
def hostile_num_duck(hostile_num_dir):
    import duckdb

    from dask_hivemetastore_spark.catalog import TABLE_NAMES

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{hostile_num_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("key", _KEYS)
def test_hostile_numeric_parity(key, spark, hostile_num_dir,
                                hostile_num_duck):
    from dask_hivemetastore_spark import plans

    sdf = plans.QUERIES[key](spark, hostile_num_dir)
    problems = compare(key, sdf, hostile_num_duck.sql(plans.ORACLES[key]))
    assert not problems, "\n".join(problems)
