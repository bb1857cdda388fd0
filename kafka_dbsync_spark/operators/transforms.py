"""Composable DataFrame→DataFrame transforms — the reference's SMT chain.

Each function mirrors one operator from SURVEY.md §2.3 (T1–T14) but is
expressed as narrow, codegen-friendly column logic: the whole chain is
shuffle-free, exactly like the reference's record-local SMTs (its chain
runs in the sink task thread; ours runs inside one WholeStageCodegen span).

Transforms compose with ``df.transform(...)`` or via
plans.pipeline.build_chain (the analog of `transforms=a,b` connector
lists).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_dbsync_spark.functions.entrytype import OP_CORRUPT, OP_DELETE, OP_UPSERT, map_entry_type
from kafka_dbsync_spark.functions.timestamps import (
    coerce_date,
    coerce_time,
    coerce_timestamp,
)


# ---------------------------------------------------------------------------
# T1/T2 — Debezium envelope unwrap (ExtractNewRecordState equivalents)
# ---------------------------------------------------------------------------
def unwrap_envelope(
    df: DataFrame,
    envelope_col: str = "envelope",
    mode: str = "drop",  # 'drop' | 'rewrite' | 'tombstone'
    add_fields: Sequence[str] = (),
) -> DataFrame:
    """Project the row image out of a typed Debezium envelope column.

    Modes (matching the reference's connector configs, e.g. the source
    configs' delete.handling.mode / drop.tombstones options):

    - ``drop``: deletes removed entirely.
    - ``rewrite``: deletes kept as rows (from ``before``) with
      ``__deleted=true``.
    - ``tombstone``: deletes kept with null row image + ``op='d'`` so a
      downstream keyed sink can apply them (delete-to-tombstone).

    ``add_fields`` projects envelope metadata (op, table, lsn, ts_ms) as
    ``__<field>`` columns, like the unwrap SMT's add.fields.
    """
    env = F.col(envelope_col)
    op = env["op"]
    is_delete = op == "d"
    image = F.when(is_delete, env["before"]).otherwise(env["after"])

    meta: list[Column] = []
    for f in add_fields:
        src = {"op": op, "table": env["source"]["table"], "lsn": env["source"]["lsn"], "ts_ms": env["ts_ms"]}[f]
        meta.append(src.alias(f"__{f}"))

    if mode == "drop":
        out = df.filter(~is_delete).select(env["after"].alias("row"), *meta)
    elif mode == "rewrite":
        out = df.select(image.alias("row"), is_delete.alias("__deleted"), *meta)
        return out.select("row.*", "__deleted", *[f"__{f}" for f in add_fields])
    elif mode == "tombstone":
        out = df.select(
            F.when(is_delete, F.lit(None).cast(df.schema[envelope_col].dataType["after"].dataType)).otherwise(env["after"]).alias("row"),
            op.alias("__op"),
            *meta,
        )
        return out
    else:
        raise ValueError(f"unknown unwrap mode: {mode}")
    return out.select("row.*", *[f"__{f}" for f in add_fields])


# ---------------------------------------------------------------------------
# T3/T7 — header-based routing + identifier case conversion
# ---------------------------------------------------------------------------
def with_target_table(
    df: DataFrame,
    table_format: str = "${TableName}",
    table_col: str = "table_name",
    topic_col: str = "topic",
    case: str = "none",  # 'none' | 'lower' | 'upper'
) -> DataFrame:
    """Resolve the target table from the routing template.

    Supports the reference's `${TableName}` / `${topic}` templates
    (IidrCdcSinkTask.java:222-227) and table.name.case conversion
    (IidrToJdbcSinkTransform.java:55-58).
    """
    def literal(c: Column) -> Column:
        # escape regex-replacement metacharacters ($ group refs, \)
        # — Oracle identifiers like ORDERS$1 are legal table names
        return F.regexp_replace(F.coalesce(c, F.lit("")), r"([\\$])", r"\\$1")

    expr = F.lit(table_format)
    expr = F.regexp_replace(expr, r"\$\{TableName\}", literal(F.col(table_col)))
    if topic_col in df.columns:
        expr = F.regexp_replace(expr, r"\$\{topic\}", literal(F.col(topic_col)))
    if case == "lower":
        expr = F.lower(expr)
    elif case == "upper":
        expr = F.upper(expr)
    return df.withColumn("target_table", expr)


def case_convert(df: DataFrame, case: str = "lower") -> DataFrame:
    """field.name.case — rename every column (PostgreSQL lowercases
    unquoted identifiers; IidrToJdbcSinkTransform.java:212-220)."""
    if case == "none":
        return df
    fn = str.lower if case == "lower" else str.upper
    return df.toDF(*[fn(c) for c in df.columns])


# ---------------------------------------------------------------------------
# T6 — table-name filter (record-level predicate pushdown)
# ---------------------------------------------------------------------------
def filter_table(df: DataFrame, table: str, table_col: str = "table_name") -> DataFrame:
    """Keep only records routed to ``table`` (case-insensitive, matching
    IidrToJdbcSinkTransform.java:155-159). Catalyst pushes this ahead of
    any downstream shuffle automatically."""
    return df.filter(F.upper(F.col(table_col)) == table.upper())


# ---------------------------------------------------------------------------
# T4/T5/T11 — op mapping + validation → error_reason column
# ---------------------------------------------------------------------------
def with_operation(df: DataFrame, entry_type_col: str = "entry_type") -> DataFrame:
    return df.withColumn("op", map_entry_type(entry_type_col))


def validate_iidr(
    df: DataFrame,
    key_col: str = "record_key",
    value_col: str = "record_value",
    table_col: str = "table_name",
    entry_type_col: str = "entry_type",
) -> DataFrame:
    """Produce ``error_reason`` (NULL = valid), mirroring the reference's
    validation ladder (IidrCdcSinkTask.java:169-195):

    1. missing required headers (TableName / A_ENTTYP)
    2. unknown entry-type code
    3. DELETE without a key; UPSERT without a value
    """
    op = F.col("op") if "op" in df.columns else map_entry_type(entry_type_col)
    reason = (
        F.when(F.col(table_col).isNull(), F.lit("missing required header: TableName"))
        .when(F.col(entry_type_col).isNull(), F.lit("missing required header: A_ENTTYP"))
        .when(op == OP_CORRUPT, F.concat(F.lit("unknown entry type: "), F.col(entry_type_col)))
        .when((op == OP_DELETE) & F.col(key_col).isNull(), F.lit("delete record requires a key"))
        .when((op == OP_UPSERT) & F.col(value_col).isNull(), F.lit("upsert record requires a value"))
    )
    return df.withColumn("error_reason", reason)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid, corrupt) branches off the validated stream. Both branches
    share the parent plan; Spark evaluates the scan once per action."""
    return df.filter(F.col("error_reason").isNull()), df.filter(
        F.col("error_reason").isNotNull()
    )


# ---------------------------------------------------------------------------
# T9 — field.type.overrides coercion
# ---------------------------------------------------------------------------
_COERCERS = {
    "timestamp": coerce_timestamp,
    "date": coerce_date,
    "time": coerce_time,
}

_DECIMAL_RE = r"decimal\((\d+),\s*(\d+)\)"


def coerce_fields(df: DataFrame, overrides: dict[str, str]) -> DataFrame:
    """Apply ``{"col": "timestamp|date|time|decimal(p,s)"}`` overrides
    with the reference's multi-pattern parse
    (IidrToJdbcSinkTransform.java:258-294). ``decimal(p,s)`` covers the
    source-side ``decimal.handling.mode=string`` wire format (numerics
    shipped as strings, hack/source-debezium/oracle-datatype-test.json).
    Unparseable non-null values are surfaced per-column as
    ``<col>__parse_error`` so callers can route them to the corrupt branch
    (the reference throws DataException → DLQ)."""
    import re

    out = df
    for col_name, kind in overrides.items():
        m = re.fullmatch(_DECIMAL_RE, kind)
        if m:
            p, s = int(m.group(1)), int(m.group(2))
            parsed = F.expr(f"try_cast(`{col_name}` AS DECIMAL({p},{s}))")
        elif kind in _COERCERS:
            parsed = _COERCERS[kind](col_name)
        else:
            raise ValueError(f"unsupported override type: {kind}")
        out = out.withColumn(
            f"{col_name}__parse_error",
            F.col(col_name).isNotNull() & parsed.isNull(),
        ).withColumn(col_name, parsed)
    return out


# ---------------------------------------------------------------------------
# T8 — schema inference from runtime values (schemaless mode)
# ---------------------------------------------------------------------------
_INT32_MIN, _INT32_MAX = -(2**31), 2**31 - 1


def _infer_one(v) -> T.DataType | None:
    # mirrors IidrToJdbcSinkTransform.java:299-320 (Jackson gives Integer
    # for 32-bit ints, Long beyond, Double for any float, Boolean, String;
    # anything else falls back to String)
    if v is None:
        return None
    if isinstance(v, bool):
        return T.BooleanType()
    if isinstance(v, int):
        return T.IntegerType() if _INT32_MIN <= v <= _INT32_MAX else T.LongType()
    if isinstance(v, float):
        return T.DoubleType()
    return T.StringType()


_WIDEN = {
    (T.IntegerType(), T.LongType()): T.LongType(),
    (T.IntegerType(), T.DoubleType()): T.DoubleType(),
    (T.LongType(), T.DoubleType()): T.DoubleType(),
}


def _merge_types(a: T.DataType | None, b: T.DataType | None) -> T.DataType | None:
    if a is None:
        return b
    if b is None or a == b:
        return a
    return _WIDEN.get((a, b)) or _WIDEN.get((b, a)) or T.StringType()


def infer_row_schema(
    df: DataFrame, value_col: str = "record_value", sample_size: int = 1000
) -> T.StructType:
    """Infer a row schema from a bounded sample of JSON row images.

    The reference infers per record at apply time
    (IidrToJdbcSinkTransform.java:226-238,299-320); a vectorized engine
    infers once from a sample and pins the schema for the whole stream —
    same value-class rules (String/Int32/Int64/Float64/Boolean, every
    field optional, fallback String), conflicting observations widened
    (int→long→double, anything vs string → string).
    """
    import json

    fields: dict[str, T.DataType | None] = {}
    for row in df.select(value_col).filter(F.col(value_col).isNotNull()).limit(
        sample_size
    ).collect():
        try:
            obj = json.loads(row[0])
        except (TypeError, ValueError):
            continue
        if not isinstance(obj, dict):
            continue
        for k, v in obj.items():
            fields[k] = _merge_types(fields.get(k), _infer_one(v))
    return T.StructType(
        [
            T.StructField(name, dt if dt is not None else T.StringType(), True)
            for name, dt in fields.items()
        ]
    )


# ---------------------------------------------------------------------------
# T8b — permissive row-image decoding (schemaless mode)
# ---------------------------------------------------------------------------
def decode_row_image(
    df: DataFrame,
    value_col: str = "record_value",
    schema: T.StructType | None = None,
    out_col: str = "row_image",
) -> DataFrame:
    """Decode the JSON row image. With an explicit schema this is the
    fixed-schema mode; without one it falls back to map<string,string>
    (the reference's inferSchema treats every field as optional and
    coerces by value — IidrToJdbcSinkTransform.java:299-320; declared
    schemas are the scale-safe path and preferred)."""
    v = F.col(value_col)
    decoded = (
        F.from_json(v, schema)
        if schema is not None
        else F.from_json(v, T.MapType(T.StringType(), T.StringType()))
    )
    return df.withColumn(out_col, decoded)
