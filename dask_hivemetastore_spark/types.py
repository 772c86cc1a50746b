"""Hive metastore type strings → Spark ``DataType``.

This is the reference connector's central data-model artifact re-expressed
for Spark: dask-hivemetastore maps each ``FieldSchema.type`` string from the
metastore to a pandas dtype to build Dask's ``_meta`` (SURVEY.md §1.2,
[PK-HIGH]). Spark's type system is a strict superset (DECIMAL, ARRAY, MAP,
STRUCT are first-class), so the mapping here is both the parity piece and an
upgrade.

Supports the full recursive Hive grammar::

    primitive | array<T> | map<K,V> | struct<name:T, ...> | decimal(p,s)
    | varchar(n) | char(n)
"""

from __future__ import annotations

from pyspark.sql import types as T

_PRIMITIVES: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "tinyint": T.ByteType(),
    "smallint": T.ShortType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "bigint": T.LongType(),
    "float": T.FloatType(),
    "real": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "binary": T.BinaryType(),
    "timestamp": T.TimestampNTZType(),  # Hive timestamps are tz-naive
    "date": T.DateType(),
    "interval_year_month": T.YearMonthIntervalType(),
    "interval_day_time": T.DayTimeIntervalType(),
    "void": T.NullType(),
}


class HiveTypeError(ValueError):
    pass


def parse_hive_type(type_str: str) -> T.DataType:
    """Parse a Hive metastore type string into a Spark DataType."""
    dt, rest = _parse(type_str.strip().lower())
    if rest.strip():
        raise HiveTypeError(f"trailing input {rest!r} in {type_str!r}")
    return dt


def _parse(s: str) -> tuple[T.DataType, str]:
    s = s.lstrip()
    name, rest = _ident(s)
    if name == "array":
        rest = _expect(rest, "<")
        elem, rest = _parse(rest)
        rest = _expect(rest, ">")
        return T.ArrayType(elem), rest
    if name == "map":
        rest = _expect(rest, "<")
        key, rest = _parse(rest)
        rest = _expect(rest, ",")
        val, rest = _parse(rest)
        rest = _expect(rest, ">")
        return T.MapType(key, val), rest
    if name == "struct":
        rest = _expect(rest, "<")
        fields = []
        while True:
            fname, rest = _ident(rest)
            rest = _expect(rest, ":")
            ftype, rest = _parse(rest)
            fields.append(T.StructField(fname, ftype))
            rest = rest.lstrip()
            if rest.startswith(","):
                rest = rest[1:]
                continue
            rest = _expect(rest, ">")
            return T.StructType(fields), rest
    if name == "decimal":
        rest = rest.lstrip()
        if rest.startswith("("):
            args, rest = _parens(rest)
            parts = [int(p) for p in args.split(",")]
            prec, scale = (parts + [0])[:2]
            return T.DecimalType(prec, scale), rest
        return T.DecimalType(10, 0), rest  # Hive default
    if name in ("varchar", "char"):
        rest = rest.lstrip()
        if rest.startswith("("):
            _, rest = _parens(rest)  # length is metadata-only; normalize to string
        return T.StringType(), rest
    if name in _PRIMITIVES:
        return _PRIMITIVES[name], rest
    raise HiveTypeError(f"unknown Hive type {name!r}")


def _ident(s: str) -> tuple[str, str]:
    s = s.lstrip()
    i = 0
    while i < len(s) and (s[i].isalnum() or s[i] in "_"):
        i += 1
    if i == 0:
        raise HiveTypeError(f"expected identifier at {s!r}")
    return s[:i], s[i:]


def _expect(s: str, ch: str) -> str:
    s = s.lstrip()
    if not s.startswith(ch):
        raise HiveTypeError(f"expected {ch!r} at {s!r}")
    return s[len(ch):]


def _parens(s: str) -> tuple[str, str]:
    assert s.startswith("(")
    depth, i = 0, 0
    for i, c in enumerate(s):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                break
    else:
        raise HiveTypeError(f"unbalanced parens in {s!r}")
    return s[1:i], s[i + 1:]


def hive_schema_to_struct(cols: list[tuple[str, str]]) -> T.StructType:
    """``[(name, hive_type_str), ...]`` → Spark StructType.

    Mirrors the reference's FieldSchema-list → dtype-dict step
    (SURVEY.md §3 step 2).
    """
    return T.StructType(
        [T.StructField(name, parse_hive_type(ht)) for name, ht in cols]
    )


def spark_type_to_hive(dt: T.DataType) -> str:
    """Inverse mapping, used when registering tables into a metastore."""
    m = {
        T.BooleanType: "boolean", T.ByteType: "tinyint", T.ShortType: "smallint",
        T.IntegerType: "int", T.LongType: "bigint", T.FloatType: "float",
        T.DoubleType: "double", T.StringType: "string", T.BinaryType: "binary",
        T.DateType: "date", T.TimestampType: "timestamp",
        T.TimestampNTZType: "timestamp", T.NullType: "void",
    }
    if type(dt) in m:
        return m[type(dt)]
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    # char/varchar and the interval types parse_hive_type accepts must
    # round-trip — a table read through the forward mapping could not be
    # re-registered otherwise (r7 review)
    if isinstance(dt, T.VarcharType):
        return f"varchar({dt.length})"
    if isinstance(dt, T.CharType):
        return f"char({dt.length})"
    if isinstance(dt, T.YearMonthIntervalType):
        return "interval_year_month"
    if isinstance(dt, T.DayTimeIntervalType):
        return "interval_day_time"
    if isinstance(dt, T.ArrayType):
        return f"array<{spark_type_to_hive(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return f"map<{spark_type_to_hive(dt.keyType)},{spark_type_to_hive(dt.valueType)}>"
    if isinstance(dt, T.StructType):
        inner = ",".join(f"{f.name}:{spark_type_to_hive(f.dataType)}" for f in dt.fields)
        return f"struct<{inner}>"
    raise HiveTypeError(f"no Hive equivalent for {dt}")
