"""Local replica of the driver's correctness gate: run every
queries()/oracle_sql() pair at a given SF and compare row count, column
names, column TYPES, and an order-insensitive, type-sensitive value hash.

Driver-faithful since round 4: the round-3 driver flagged four oracles
whose integer ``sum()`` DuckDB typed as HUGEINT (int128) — values were
row-for-row identical but the driver's type-sensitive hash differed,
while this gate's old Python-equality compare (``int == int`` regardless
of width, floats rounded to 9 digits) reported them green. This version
closes that gap:

* the DuckDB result is fetched as **Arrow** (``rel.arrow()``) so the
  physical output types are visible — HUGEINT surfaces as
  ``decimal128(38,0)``, not a Python ``int``;
* both schemas are canonicalized and compared column-by-column (sorted
  by name); any HUGEINT/DECIMAL reaching a DuckDB oracle output where
  Spark emits int64 is a FAIL with a "cast the oracle to BIGINT" hint;
* values are hashed exactly (repr round-trips doubles bit-faithfully;
  no rounding) and tagged with the canonical column type, so an int64
  and an int128 with equal values can never collide.

NOTE for oracle authors: DuckDB types ``sum()`` of any integer column as
HUGEINT. Always write ``CAST(sum(x) AS BIGINT)`` (and cast windowed
cumsums and anything derived from them) — see queries/__init__.py.

Driver-faithful since round 5 — "driver-sortable scalars only": the
round-4 driver crashed on 7 entries whose output schema carried a
top-level ``array<>`` column. The driver canonicalizes results with a
pandas ``sort_values`` over all columns, and pandas cannot factorize
list/struct/map cells (``TypeError: unhashable type: 'list'``) — so a
query can be value-correct and still red at the hard signal. This gate
now FAILS any registered query (oracle or rows-only) whose Spark output
schema — or whose oracle's Arrow schema — contains a top-level
list/struct/map column, with a "scalarize with concat_ws/to_json" hint.
See the authoring rules in queries/__init__.py.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pyarrow as pa

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon_spark_type(dt) -> str:
    """Canonical name for a Spark DataType."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.LongType,)):
        return "i64"
    if isinstance(dt, (T.IntegerType,)):
        return "i32"
    if isinstance(dt, T.ShortType):
        return "i16"
    if isinstance(dt, T.ByteType):
        return "i8"
    if isinstance(dt, T.DoubleType):
        return "f64"
    if isinstance(dt, T.FloatType):
        return "f32"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.BinaryType):
        return "bin"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.TimestampType) or isinstance(dt, T.TimestampNTZType):
        return "ts"
    if isinstance(dt, T.DecimalType):
        return f"dec({dt.precision},{dt.scale})"
    if isinstance(dt, T.ArrayType):
        return f"list<{canon_spark_type(dt.elementType)}>"
    if isinstance(dt, T.StructType):
        inner = ",".join(
            f"{f.name}:{canon_spark_type(f.dataType)}" for f in dt.fields
        )
        return f"struct<{inner}>"
    if isinstance(dt, T.MapType):
        return (
            f"map<{canon_spark_type(dt.keyType)},"
            f"{canon_spark_type(dt.valueType)}>"
        )
    if isinstance(dt, T.NullType):
        return "null"
    return dt.simpleString()


def canon_arrow_type(t: pa.DataType) -> str:
    """Canonical name for an Arrow DataType (DuckDB result side)."""
    if pa.types.is_int64(t):
        return "i64"
    if pa.types.is_int32(t):
        return "i32"
    if pa.types.is_int16(t):
        return "i16"
    if pa.types.is_int8(t):
        return "i8"
    if pa.types.is_uint64(t) or pa.types.is_uint32(t):
        return f"u{t.bit_width}"
    if pa.types.is_float64(t):
        return "f64"
    if pa.types.is_float32(t):
        return "f32"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bin"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_decimal(t):
        return f"dec({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canon_arrow_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(
            f"{t.field(i).name}:{canon_arrow_type(t.field(i).type)}"
            for i in range(t.num_fields)
        )
        return f"struct<{inner}>"
    if pa.types.is_null(t):
        return "null"
    return str(t)


def coarse(t: str) -> str:
    """Collapse a canonical type to the class the driver's value hash
    actually distinguishes: all native int widths hash as the same
    Python int, but DECIMAL/HUGEINT surfaces as decimal.Decimal and
    hashes differently. Recurse into list/struct element types."""
    if t.startswith("list<") and t.endswith(">"):
        return f"list<{coarse(t[5:-1])}>"
    if t in ("i8", "i16", "i32", "i64", "u32", "u64"):
        return "i"
    if t in ("f32", "f64"):
        return "f"
    return t


def types_compatible(s: str, d: str) -> tuple[bool, bool]:
    """(ok, width_warning). Pure int/float width differences pass with a
    warning (the driver's hash tolerates them — both sides yield the
    same Python value); anything crossing a type CLASS (int vs decimal,
    int vs float, str vs int, ...) fails."""
    if s == d:
        return True, False
    # an all-NULL column types as null on one side
    if "null" in (s, d):
        return True, False
    if coarse(s) == coarse(d):
        return True, True
    return False, False


def norm_value(v):
    """Exact, hashable normal form. No rounding: repr() round-trips
    doubles bit-faithfully, so two different float64 bit patterns
    (other than equal values) always differ here — like the driver's
    byte hash."""
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:NaN"
        return f"f:{v!r}"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, (bytes, bytearray)):
        return "y:" + bytes(v).hex()
    if isinstance(v, str):
        return "s:" + v
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return (
            "{"
            + ",".join(f"{k}={norm_value(x)}" for k, x in sorted(v.items()))
            + "}"
        )
    # Row (Spark struct) → treat as dict by field name
    if hasattr(v, "asDict"):
        return norm_value(v.asDict())
    import decimal

    if isinstance(v, decimal.Decimal):
        return f"d:{v}"
    return f"{type(v).__name__}:{v!r}"


def normalize(rows, cols, canon_types):
    """Sort columns by name, tag every value with its canonical column
    type, sort rows — the order-insensitive type-sensitive normal form
    both sides are compared in."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(
            tuple(f"{coarse(canon_types[i])}|{norm_value(r[i])}" for i in order)
        )
    out.sort()
    return out


def partitions_sweep(sf_dir: str, only: set[str], levels=(3, 32)) -> int:
    """Determinism probe (VERDICT r5 #6): run every query's SPARK side
    at each shuffle-partition level and diff the order-insensitive
    normalized row multiset. Any query whose normal form moves between
    levels has an under-specified ordering (a LIMIT/top-k without a
    total tiebreak, a first()/head dependence, a non-total window) —
    exactly the class the round-5 fileset fixture bug belonged to.
    ``spark.sql.shuffle.partitions`` is runtime-settable, so one
    session serves all levels (each query is re-planned per level —
    the battery's split-aware ``_t`` reads the conf at build time)."""
    import __spark_entry__ as entrymod
    from sandcrawler_spark.session import get_spark

    spark = get_spark("oracle-psweep", cores=8, shuffle_partitions=levels[0])
    queries = entrymod.queries()
    if only:
        queries = {n: f for n, f in queries.items() if n in only}
    failures = []
    for name, fn in queries.items():
        forms = []
        try:
            for lv in levels:
                spark.conf.set("spark.sql.shuffle.partitions", str(lv))
                sdf = fn(spark, sf_dir)
                cols = sdf.columns
                types = [canon_spark_type(f.dataType) for f in sdf.schema.fields]
                rows = [tuple(r) for r in sdf.collect()]
                forms.append(normalize(rows, cols, types))
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            continue
        if any(f != forms[0] for f in forms[1:]):
            failures.append(name)
            diff = next(
                (a, b)
                for f in forms[1:]
                for a, b in zip(forms[0], f)
                if a != b
            ) if all(len(f) == len(forms[0]) for f in forms) else (
                f"rowcounts {[len(f) for f in forms]}", ""
            )
            print(
                f"FAIL {name}: result differs across shuffle.partitions="
                f"{levels} — under-specified ordering; first diff: {diff}"
            )
        else:
            print(f"PASS {name} ({len(forms[0])} rows stable across {levels})")
    print(f"\n{len(queries) - len(failures)}/{len(queries)} partition-stable")
    return 1 if failures else 0


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--partitions-sweep"]
    sweep = "--partitions-sweep" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    if sweep:
        return partitions_sweep(sf_dir, only)

    import __spark_entry__ as entrymod
    from sandcrawler_spark.session import get_spark

    spark = get_spark("oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    if only:
        queries = {n: f for n, f in queries.items() if n in only}
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        sql = oracles.get(name)
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_types = [canon_spark_type(f.dataType) for f in sdf.schema.fields]
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            continue
        spark_sec = time.perf_counter() - t0
        nested = [
            (c, t)
            for c, t in zip(s_cols, s_types)
            if t.startswith(("list<", "struct<", "map<"))
        ]
        if nested:
            failures.append(name)
            print(
                f"FAIL {name}: non-scalar output column(s) "
                + "; ".join(f"{c}:{t}" for c, t in nested)
                + " — the driver's pandas canonicalizer cannot sort "
                "list/struct/map cells; scalarize at the query boundary "
                "with concat_ws('|', col) or to_json(col) and mirror it "
                "in the oracle SQL (DuckDB list_aggr/to_json)"
            )
            continue
        if sql is None:
            print(f"ok?  {name}: rows={len(s_rows)} ({spark_sec:.1f}s, rows-only check, no oracle)")
            continue
        try:
            tbl = con.sql(sql).arrow()
            d_cols = tbl.schema.names
            d_types = [canon_arrow_type(f.type) for f in tbl.schema]
            d_rows = list(zip(*[c.to_pylist() for c in tbl.columns])) if tbl.num_columns else []
            if tbl.num_rows and not d_rows:
                d_rows = [() for _ in range(tbl.num_rows)]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error {str(e)[:300]}")
            continue
        d_nested = [
            (c, t)
            for c, t in zip(d_cols, d_types)
            if t.startswith(("list<", "struct<", "map<"))
        ]
        if d_nested:
            failures.append(name)
            print(
                f"FAIL {name}: non-scalar ORACLE column(s) "
                + "; ".join(f"{c}:{t}" for c, t in d_nested)
                + " — driver-sortable scalars only; rewrite the oracle "
                "with list_aggr(col, 'string_agg', '|') or to_json(col)"
            )
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        else:
            s_tmap = dict(zip(s_cols, s_types))
            d_tmap = dict(zip(d_cols, d_types))
            bad, warns = [], []
            for c in s_cols:
                ok, warn = types_compatible(s_tmap[c], d_tmap[c])
                if not ok:
                    bad.append((c, s_tmap[c], d_tmap[c]))
                elif warn:
                    warns.append(f"{c}: spark={s_tmap[c]} duck={d_tmap[c]}")
            if warns:
                print(f"warn {name}: int/float width differs ({'; '.join(warns)})")
            if bad:
                hints = []
                for c, st, dt in bad:
                    hint = ""
                    if dt.startswith("dec(38,0)"):
                        hint = " (DuckDB HUGEINT — CAST the oracle aggregate AS BIGINT)"
                    hints.append(f"{c}: spark={st} duck={dt}{hint}")
                problems.append("type mismatch " + "; ".join(hints))
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            # an all-NULL column types as 'null' on one side; tag it
            # with the OTHER side's type so the null tolerance in
            # types_compatible isn't defeated by the value compare
            s_tmap = dict(zip(s_cols, s_types))
            d_tmap = dict(zip(d_cols, d_types))
            eff_s = [
                d_tmap[c] if s_tmap[c] == "null" else s_tmap[c]
                for c in s_cols
            ]
            eff_d = [
                s_tmap[c] if d_tmap[c] == "null" else d_tmap[c]
                for c in d_cols
            ]
            ns = normalize(s_rows, s_cols, eff_s)
            nd = normalize(d_rows, list(d_cols), eff_d)
            mism = [(a, b) for a, b in zip(ns, nd) if a != b]
            if mism:
                problems.append(f"{len(mism)} value mismatches; first: {mism[0]}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + " | ".join(problems))
        else:
            print(f"PASS {name} ({len(s_rows)} rows, {spark_sec:.1f}s)")
    print(f"\n{len(queries) - len(failures)}/{len(queries)} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
