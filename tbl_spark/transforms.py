"""The reference's relational transform surface, Spark-first.

Mirrors the fixed operator ordering the reference hard-codes
(crates/tbl-cli/src/transform.rs:9-22):

    with_columns → filter → drop → cast → set → nullify → replace →
    select → offset → head → tail → value_counts → sort → rename

Semantic consequences preserved (SURVEY.md §2.2 note): filters see
pre-rename names; select happens after set/replace; value_counts REPLACES
the relation before sort; rename is applied last.

All operators are declarative DataFrame ops — Catalyst handles pushdown /
pruning / ordering; the fixed order here is a semantic contract, not an
optimization (the reference likewise delegates optimization to polars,
SURVEY.md §4.1).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# tbl type names (transform.rs:61-79) → Spark DDL. Unsigned types widen the
# same way Spark's own parquet reader widens unsigned logical types
# (SURVEY.md §1.2).
TBL_TYPE_TO_SPARK = {
    "i8": "tinyint", "i16": "smallint", "i32": "int", "i64": "bigint",
    "u8": "smallint", "u16": "int", "u32": "bigint", "u64": "decimal(20,0)",
    "f32": "float", "f64": "double",
    "bool": "boolean", "str": "string", "string": "string",
    "binary": "binary", "date": "date", "datetime": "timestamp_ntz",
}


def spark_type(tbl_type: str) -> str:
    t = tbl_type.strip().lower()
    if t not in TBL_TYPE_TO_SPARK:
        raise ValueError(f"unknown type {tbl_type!r}; "
                         f"expected one of {sorted(TBL_TYPE_TO_SPARK)}")
    return TBL_TYPE_TO_SPARK[t]


@dataclass
class TransformSpec:
    """One field per reference CLI flag (crates/tbl-cli/src/cli/args.rs)."""
    with_columns: list[str] = field(default_factory=list)  # NAME:TYPE[=VAL]
    filters: list[str] = field(default_factory=list)       # COL{op}VAL
    drop: list[str] = field(default_factory=list)
    cast: list[str] = field(default_factory=list)          # COL=TYPE
    set: list[str] = field(default_factory=list)           # COL=VALUE
    nullify: list[str] = field(default_factory=list)
    replace: list[str] = field(default_factory=list)       # COL.OLD=NEW
    select: list[str] = field(default_factory=list)
    offset: int | None = None
    head: int | None = None
    tail: int | None = None
    value_counts: str | None = None
    sort: list[str] = field(default_factory=list)          # col[:desc]
    rename: list[str] = field(default_factory=list)        # old=new


def _typed_lit(raw: str, ddl: str) -> Column:
    """Literal coercion, schema-driven like raw_str_to_lit
    (transform.rs:415-480): hex 0x… for binary and ints, %Y-%m-%d dates."""
    ddl = ddl.lower()
    if ddl == "binary":
        if not raw.lower().startswith("0x"):
            raise ValueError(f"binary literal must be 0x-hex: {raw!r}")
        return F.unhex(F.lit(raw[2:]))
    if ddl in ("tinyint", "smallint", "int", "bigint") or \
            ddl.startswith("decimal"):
        v = int(raw, 16) if raw.lower().startswith("0x") else int(raw)
        return F.lit(v).cast(ddl)
    if ddl in ("float", "double"):
        return F.lit(float(raw)).cast(ddl)
    if ddl == "boolean":
        return F.lit(raw.lower() in ("true", "1", "t"))
    if ddl == "date":
        return F.to_date(F.lit(raw), "yyyy-MM-dd")
    if ddl in ("timestamp", "timestamp_ntz"):
        return F.to_timestamp(F.lit(raw)).cast(ddl)
    return F.lit(raw)  # string


_FILTER_RE = re.compile(r"^(.*?)(!=|>=|<=|=|>|<)(.*)$")

# tail ≤ this collects the last n rows in ONE job; bigger tails fall back
# to the distributed count+offset plan (two jobs, zero driver memory)
_TAIL_COLLECT_MAX = 100_000       # fixed-width rows: bounded bytes
_TAIL_COLLECT_MAX_VAR = 1_000     # rows carrying unbounded-size columns


def _tail_collect_cap(schema) -> int:
    """Row cap for the single-job collected tail. Fixed-width schemas
    have arithmetic byte bounds; any string/binary/array/map/struct
    column makes a row unboundedly large (a documents row can carry
    megabytes of text), so the cap drops to keep the driver safe and
    bigger tails stay distributed (count + offset, two jobs)."""
    from pyspark.sql.types import (ArrayType, BinaryType, MapType,
                                   StringType, StructType)
    var = (StringType, BinaryType, ArrayType, MapType, StructType)
    if any(isinstance(f.dataType, var) for f in schema.fields):
        return _TAIL_COLLECT_MAX_VAR
    return _TAIL_COLLECT_MAX


def _parse_filter(df: DataFrame, expr: str) -> Column:
    """Comparison + null-predicate filters (transform.rs:158-325)."""
    if expr.endswith(".is_not_null"):
        return F.col(expr[: -len(".is_not_null")]).isNotNull()
    if expr.endswith(".is_null"):
        return F.col(expr[: -len(".is_null")]).isNull()
    m = _FILTER_RE.match(expr)
    if not m:
        raise ValueError(f"cannot parse filter {expr!r}")
    name, op, raw = m.group(1).strip(), m.group(2), m.group(3).strip()
    ddl = dict((f.name, f.dataType.simpleString())
               for f in df.schema.fields)[name]
    lit = _typed_lit(raw, ddl)
    col = F.col(name)
    return {"=": col == lit, "!=": col != lit, ">": col > lit,
            "<": col < lit, ">=": col >= lit, "<=": col <= lit}[op]


def _field_ddl(df: DataFrame, name: str) -> str:
    for f in df.schema.fields:
        if f.name == name:
            return f.dataType.simpleString()
    raise ValueError(f"no such column: {name}")


def apply_transforms(df: DataFrame, spec: TransformSpec) -> DataFrame:
    # 1. with_columns (transform.rs:26-59). The reference's
    # parse_new_column_expr splits on ':' into ≤3 segments with the value
    # inside the third ('NAME:TYPE:x=VAL', transform.rs:42-59); the compact
    # 'NAME:TYPE=VAL' form is also accepted — including values that
    # themselves contain ':' (URLs, timestamps), which is why the
    # 3-segment reading only applies when segment 2 is a bare type name.
    # No '=' anywhere → typed null.
    #
    # Intentional divergence (documented, ADVICE r2): for a value that
    # itself contains '=' ('a:str:x=k=v'), the reference's split('=')
    # .nth(1) silently truncates to 'k'; we keep the full remainder
    # 'k=v' — truncating user data is a reference bug, not a semantic.
    #
    # TYPE may carry '@IDX' to INSERT the new column at schema position
    # IDX instead of appending — the library surface of tbl-core's
    # streaming insert-at-index (parquet_insert.rs:27,101-118), which
    # the reference CLI itself never exposes.
    def _apply_with_column(df: DataFrame, name: str, t: str,
                           raw: str | None) -> DataFrame:
        idx = None
        if "@" in t:
            t, idx_raw = t.split("@", 1)
            idx = int(idx_raw)
        existing = list(df.columns)
        if idx is not None and name in existing:
            # an @IDX on an existing column would otherwise overwrite the
            # value but silently keep the old position (ADVICE r3) —
            # refuse loudly rather than surprise
            raise ValueError(
                f"@{idx}: column {name!r} already exists; insert-at-index "
                f"only applies to NEW columns (use set/rename to modify)")
        df = df.withColumn(
            name, _typed_lit(raw, spark_type(t)) if raw is not None
            else F.lit(None).cast(spark_type(t)))
        if idx is not None:
            if not 0 <= idx <= len(existing):
                raise ValueError(
                    f"insert index {idx} out of range for "
                    f"{len(existing)}-column schema")
            df = df.select(*existing[:idx], name, *existing[idx:])
        return df

    for wc in spec.with_columns:
        if ":" not in wc:
            raise ValueError(f"invalid with_column spec: {wc!r}")
        name, rest = wc.split(":", 1)
        t, raw = rest, None
        if ":" in rest:
            ref_t, third = rest.split(":", 1)
            if ref_t.strip().lower().split("@", 1)[0] in TBL_TYPE_TO_SPARK:
                # reference form — value is whatever follows '=' in the
                # third segment (may contain more ':')
                raw = third.split("=", 1)[1] if "=" in third else None
                df = _apply_with_column(df, name, ref_t, raw)
                continue
        if "=" in rest:  # compact form NAME:TYPE=VAL (VAL may contain ':')
            t, raw = rest.split("=", 1)
        df = _apply_with_column(df, name, t, raw)
    # 2. filter — chained = AND (transform.rs:146-155)
    for fx in spec.filters:
        df = df.filter(_parse_filter(df, fx))
    # 3. drop
    if spec.drop:
        df = df.drop(*spec.drop)
    # 4. cast COL=TYPE
    for cx in spec.cast:
        name, t = cx.split("=", 1)
        df = df.withColumn(name, F.col(name).cast(spark_type(t)))
    # 5. set COL=VALUE — cast to existing column type (transform.rs:381-413)
    for sx in spec.set:
        name, raw = sx.split("=", 1)
        df = df.withColumn(name, _typed_lit(raw, _field_ddl(df, name)))
    # 6. nullify — typed null (transform.rs:482-507)
    for name in spec.nullify:
        df = df.withColumn(name, F.lit(None).cast(_field_ddl(df, name)))
    # 7. replace COL.OLD=NEW — typed equality replace (transform.rs:509-547)
    for rx in spec.replace:
        target, new_raw = rx.split("=", 1)
        name, old_raw = target.split(".", 1)
        ddl = _field_ddl(df, name)
        old, new = _typed_lit(old_raw, ddl), _typed_lit(new_raw, ddl)
        df = df.withColumn(
            name, F.when(F.col(name) == old, new).otherwise(F.col(name)))
    # 8. select — keep listed columns in order (transform.rs:575-586)
    if spec.select:
        df = df.select(*spec.select)
    # 9-11. offset / head / tail (transform.rs:588-607)
    if spec.offset is not None:
        df = df.offset(spec.offset)
    if spec.head is not None:
        df = df.limit(spec.head)
    if spec.tail is not None:
        if spec.tail <= _tail_collect_cap(df.schema):
            # ONE job: DataFrame.tail collects the last n rows in plan
            # order (the count()+offset form ran the upstream plan twice
            # — VERDICT r3). The cap is schema-aware so the local
            # relation is byte-bounded, not just row-bounded.
            rows = df.tail(spec.tail)
            df = df.sparkSession.createDataFrame(rows, df.schema)
        else:
            # huge tails stay distributed: a count job + offset job
            # instead of collecting gigabytes to the driver
            total = df.count()
            df = df.offset(max(0, total - spec.tail))
    # 12. value_counts REPLACES the relation (transform.rs:609-623)
    if spec.value_counts is not None:
        df = (df.groupBy(spec.value_counts).agg(F.count("*").alias("count"))
              .orderBy(F.desc("count"), F.col(spec.value_counts)))
    # 13. sort col[:desc] (transform.rs:549-573)
    if spec.sort:
        cols = []
        for s in spec.sort:
            if ":" in s:
                name, direction = s.split(":", 1)
                cols.append(F.col(name).desc()
                            if direction.lower() == "desc"
                            else F.col(name).asc())
            else:
                cols.append(F.col(s).asc())
        df = df.orderBy(*cols)
    # 14. rename old=new — LAST (transform.rs:327-350)
    if spec.rename:
        mapping = dict(r.split("=", 1) for r in spec.rename)
        df = df.withColumnsRenamed(mapping)
    return df


def merge(dfs: list[DataFrame]) -> DataFrame:
    """UNION ALL with strict schema-equality enforcement
    (parquet_merge.rs:49-58): fail fast on mismatch, no data read."""
    if not dfs:
        raise ValueError("merge of zero inputs")
    first = dfs[0].schema
    for i, d in enumerate(dfs[1:], 1):
        if d.schema != first:
            raise ValueError(
                f"schema mismatch at input {i}: {d.schema.simpleString()} "
                f"!= {first.simpleString()}")
    return reduce(DataFrame.unionByName, dfs)
