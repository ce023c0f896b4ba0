"""Iceberg JSON schema ⇄ Spark StructType bridge.

The reference carries table schemas as opaque Iceberg struct-JSON strings
(``TableMetadata.schema: String``, modules/domain/TableMetadata.scala:15;
literal fixtures in WriteSyncReadWorkflowE2ESpec.scala:66-67, 206-207).
This module makes them first-class: parse to StructType for reads/writes,
serialize back with stable field ids.

Type mapping (SURVEY §1.2): long↔LongType, int↔IntegerType,
string↔StringType, timestamp↔TimestampType, timestamptz↔TimestampType,
decimal(p,s)↔DecimalType, double/float/boolean/date/binary likewise;
struct/list/map recurse.  A bare ``decimal`` (the reference leaves
precision unstated in one fixture) pins DECIMAL(12,2) per FIXTURES.md §B.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import types as T

_PRIMITIVES: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "timestamp": T.TimestampType(),
    "timestamptz": T.TimestampType(),
    "date": T.DateType(),
    "binary": T.BinaryType(),
    "uuid": T.StringType(),
}

_DECIMAL_RE = re.compile(r"^decimal\((\d+),\s*(\d+)\)$")
# FIXTURES.md §B pins the reference's bare `decimal` to (12,2)
_DEFAULT_DECIMAL = T.DecimalType(12, 2)


class SchemaParseError(ValueError):
    pass


def _parse_type(t) -> T.DataType:
    if isinstance(t, str):
        if t in _PRIMITIVES:
            return _PRIMITIVES[t]
        m = _DECIMAL_RE.match(t)
        if m:
            return T.DecimalType(int(m.group(1)), int(m.group(2)))
        if t == "decimal":
            return _DEFAULT_DECIMAL
        raise SchemaParseError(f"unsupported Iceberg type {t!r}")
    if isinstance(t, dict):
        kind = t.get("type")
        if kind == "struct":
            return _parse_struct(t)
        if kind == "list":
            return T.ArrayType(_parse_type(t["element"]), t.get("element-required", False) is False)
        if kind == "map":
            return T.MapType(
                _parse_type(t["key"]), _parse_type(t["value"]),
                t.get("value-required", False) is False,
            )
    raise SchemaParseError(f"unsupported Iceberg type node {t!r}")


def _parse_struct(node: dict) -> T.StructType:
    fields = []
    for f in node.get("fields", []):
        fields.append(
            T.StructField(
                f["name"],
                _parse_type(f["type"]),
                nullable=not f.get("required", False),
                metadata={"iceberg.field-id": f["id"]} if "id" in f else {},
            )
        )
    return T.StructType(fields)


def iceberg_schema_to_struct(schema_json: str) -> T.StructType:
    """Parse an Iceberg struct-JSON schema string into a Spark StructType."""
    try:
        node = json.loads(schema_json)
    except json.JSONDecodeError as e:
        raise SchemaParseError(f"invalid JSON: {e}") from e
    if node.get("type") != "struct":
        raise SchemaParseError("top-level Iceberg schema must be a struct")
    return _parse_struct(node)


def _type_to_iceberg(dt: T.DataType):
    for name, t in _PRIMITIVES.items():
        if dt == t and name not in ("integer", "timestamptz", "uuid"):
            return name
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.StructType):
        raise SchemaParseError("nested struct serialization requires field ids; use struct_to_iceberg_schema")
    if isinstance(dt, T.ArrayType):
        return {"type": "list", "element": _type_to_iceberg(dt.elementType)}
    if isinstance(dt, T.MapType):
        return {
            "type": "map",
            "key": _type_to_iceberg(dt.keyType),
            "value": _type_to_iceberg(dt.valueType),
        }
    raise SchemaParseError(f"unsupported Spark type {dt!r}")


def struct_to_iceberg_schema(st: T.StructType) -> str:
    """Serialize a flat StructType to Iceberg struct JSON with stable
    sequential field ids (preserving any iceberg.field-id metadata)."""
    fields = []
    for i, f in enumerate(st.fields, start=1):
        fid = f.metadata.get("iceberg.field-id", i) if f.metadata else i
        fields.append(
            {
                "id": fid,
                "name": f.name,
                "type": _type_to_iceberg(f.dataType),
                "required": not f.nullable,
            }
        )
    return json.dumps({"type": "struct", "fields": fields})
