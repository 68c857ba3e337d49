"""Avro compatibility checker (`avro/compat.py`) — the registry
write-path gate.

The reference registers its product schema with compatibility FULL
(/root/reference/notebooks/msk/producer.scala:60-61); its actual v1->v2
evolution (schema/product-v1.avsc -> product-v2.avsc: one added field
WITH a default) is exactly the kind of change FULL permits, so that
pair is the anchor case here. Pure schema-model tests, no Spark.
"""

from __future__ import annotations

import json

import pytest

from databricks_end_to_end_streaming_spark.avro.compat import (
    IncompatibleSchemaError,
    assert_compatible,
    can_read,
    check_compatibility,
)

V1 = json.dumps(
    {
        "type": "record",
        "name": "product",
        "fields": [
            {"name": "productId", "type": "string"},
            {"name": "timestamp", "type": "long"},
        ],
    }
)
# the reference's v2 adds a defaulted field — FULL-compatible
V2 = json.dumps(
    {
        "type": "record",
        "name": "product",
        "fields": [
            {"name": "productId", "type": "string"},
            {"name": "timestamp", "type": "long"},
            {"name": "category", "type": "string", "default": "unknown"},
        ],
    }
)
# adds a field WITHOUT default — backward-incompatible (new reader
# can't fill it from old data)
V2_NO_DEFAULT = json.dumps(
    {
        "type": "record",
        "name": "product",
        "fields": [
            {"name": "productId", "type": "string"},
            {"name": "timestamp", "type": "long"},
            {"name": "category", "type": "string"},
        ],
    }
)


def test_reference_v1_to_v2_is_full_compatible():
    assert check_compatibility(V2, V1, "FULL") == []
    assert_compatible(V2, V1, "FULL")  # no raise


def test_added_field_without_default_fails_backward_only():
    issues = check_compatibility(V2_NO_DEFAULT, V1, "FULL")
    assert issues and all(i.startswith("BACKWARD") for i in issues)
    assert check_compatibility(V2_NO_DEFAULT, V1, "FORWARD") == []
    with pytest.raises(IncompatibleSchemaError) as ei:
        assert_compatible(V2_NO_DEFAULT, V1, "BACKWARD")
    assert ei.value.issues


def test_removed_field_without_default_fails_forward():
    # dropping a no-default field: old readers can't read new data
    v_drop = json.dumps(
        {
            "type": "record",
            "name": "product",
            "fields": [{"name": "productId", "type": "string"}],
        }
    )
    issues = check_compatibility(v_drop, V1, "FULL")
    assert any("FORWARD" in i and "timestamp" in i for i in issues)
    assert check_compatibility(v_drop, V1, "BACKWARD") == []


def test_type_promotions_follow_the_avro_spec():
    def rec(t):
        return json.dumps(
            {
                "type": "record",
                "name": "r",
                "fields": [{"name": "x", "type": t}],
            }
        )

    assert can_read(rec("int"), rec("long")) == []
    assert can_read(rec("int"), rec("double")) == []
    assert can_read(rec("float"), rec("double")) == []
    assert can_read(rec("string"), rec("bytes")) == []
    assert can_read(rec("bytes"), rec("string")) == []
    # demotions are NOT readable
    assert can_read(rec("long"), rec("int"))
    assert can_read(rec("double"), rec("float"))
    assert can_read(rec("string"), rec("long"))


def test_union_resolution_both_sides():
    def rec(t):
        return json.dumps(
            {
                "type": "record",
                "name": "r",
                "fields": [{"name": "x", "type": t}],
            }
        )

    # widening to nullable is readable; narrowing from nullable is not
    assert can_read(rec("string"), rec(["null", "string"])) == []
    assert can_read(rec(["null", "string"]), rec("string"))
    # union-to-union: writer branches must each land somewhere
    assert can_read(rec(["null", "int"]), rec(["null", "long"])) == []
    assert can_read(rec(["null", "double"]), rec(["null", "long"]))


def test_nested_containers_resolve_recursively():
    def rec(t):
        return json.dumps(
            {
                "type": "record",
                "name": "r",
                "fields": [{"name": "x", "type": t}],
            }
        )

    arr_int = {"type": "array", "items": "int"}
    arr_long = {"type": "array", "items": "long"}
    assert can_read(rec(arr_int), rec(arr_long)) == []
    assert can_read(rec(arr_long), rec(arr_int))
    map_i = {"type": "map", "values": "int"}
    map_s = {"type": "map", "values": "string"}
    assert can_read(rec(map_i), rec(map_i)) == []
    assert can_read(rec(map_i), rec(map_s))


def test_enum_and_fixed_rules():
    def rec(t):
        return json.dumps(
            {
                "type": "record",
                "name": "r",
                "fields": [{"name": "x", "type": t}],
            }
        )

    e_ab = {"type": "enum", "name": "e", "symbols": ["A", "B"]}
    e_abc = {"type": "enum", "name": "e", "symbols": ["A", "B", "C"]}
    e_ab_dflt = {"type": "enum", "name": "e", "symbols": ["A", "B"], "default": "A"}
    assert can_read(rec(e_ab), rec(e_abc)) == []  # reader superset ok
    assert can_read(rec(e_abc), rec(e_ab))  # writer symbol C unreadable
    assert can_read(rec(e_abc), rec(e_ab_dflt)) == []  # enum default saves it
    f8 = {"type": "fixed", "name": "f", "size": 8}
    f16 = {"type": "fixed", "name": "f", "size": 16}
    assert can_read(rec(f8), rec(f8)) == []
    assert can_read(rec(f8), rec(f16))


def test_none_level_accepts_anything():
    incompatible = json.dumps(
        {
            "type": "record",
            "name": "other",
            "fields": [{"name": "z", "type": "boolean"}],
        }
    )
    assert check_compatibility(incompatible, V1, "NONE") == []


def test_unknown_level_rejected():
    with pytest.raises(ValueError, match="unknown compatibility level"):
        check_compatibility(V2, V1, "SIDEWAYS")


def test_in_memory_registry_register_schema_gates_on_full():
    from databricks_end_to_end_streaming_spark.registry import (
        InMemorySchemaRegistry,
    )

    reg = InMemorySchemaRegistry({})
    id1 = reg.register_schema("product", V1)
    id2 = reg.register_schema("product", V2)
    assert id2 == id1 + 1
    # idempotent: same schema returns the same id, no new version
    assert reg.register_schema("product", V2) == id2
    # checks run against the LATEST version (Confluent non-transitive
    # semantics): V2_NO_DEFAULT is fine vs V2 (category exists there)...
    id_nd = reg.register_schema("product", V2_NO_DEFAULT)
    assert id_nd == id2 + 1
    # ...but a type change is incompatible in both directions
    v_retype = json.dumps(
        {
            "type": "record",
            "name": "product",
            "fields": [
                {"name": "productId", "type": "string"},
                {"name": "timestamp", "type": "string"},
                {"name": "category", "type": "string"},
            ],
        }
    )
    with pytest.raises(IncompatibleSchemaError):
        reg.register_schema("product", v_retype)
    # a different subject starts its own lineage
    other = json.dumps(
        {
            "type": "record",
            "name": "other",
            "fields": [{"name": "z", "type": "boolean"}],
        }
    )
    id3 = reg.register_schema("orders", other)
    assert id3 == id_nd + 1
    assert reg.get_schema(id3).name == "other"


def test_record_rename_is_flagged():
    """Avro resolution requires matching record names; a rename with
    identical fields must NOT pass the gate (the production registry
    rejects it)."""
    renamed = json.dumps(
        {
            "type": "record",
            "name": "item",
            "fields": json.loads(V1)["fields"],
        }
    )
    issues = check_compatibility(renamed, V1, "FULL")
    assert issues and any("record name" in i for i in issues)


# ---------------------------------------------------------- properties
from hypothesis import given, settings
from hypothesis import strategies as st

_PRIMS = ["boolean", "int", "long", "float", "double", "bytes", "string"]


def _field(name: str, typ, default=None, with_default=False) -> dict:
    f = {"name": name, "type": typ}
    if with_default:
        f["default"] = default
    return f


@st.composite
def record_schemas(draw):
    n = draw(st.integers(min_value=1, max_value=5))
    fields = []
    for i in range(n):
        typ = draw(st.sampled_from(_PRIMS))
        with_default = draw(st.booleans())
        default = {"boolean": True, "bytes": "", "string": ""}.get(typ, 0)
        fields.append(_field(f"f{i}", typ, default, with_default))
    return json.dumps({"type": "record", "name": "r", "fields": fields})


@settings(max_examples=80, deadline=None)
@given(record_schemas())
def test_every_schema_is_full_compatible_with_itself(s):
    assert check_compatibility(s, s, "FULL") == []


@settings(max_examples=80, deadline=None)
@given(record_schemas(), record_schemas())
def test_full_equals_backward_intersect_forward(a, b):
    full_ok = check_compatibility(a, b, "FULL") == []
    bwd_ok = check_compatibility(a, b, "BACKWARD") == []
    fwd_ok = check_compatibility(a, b, "FORWARD") == []
    assert full_ok == (bwd_ok and fwd_ok)


@settings(max_examples=80, deadline=None)
@given(record_schemas())
def test_adding_a_defaulted_field_preserves_full(s):
    d = json.loads(s)
    d["fields"] = d["fields"] + [
        {"name": "added", "type": "string", "default": "x"}
    ]
    assert check_compatibility(json.dumps(d), s, "FULL") == []


@settings(max_examples=80, deadline=None)
@given(record_schemas(), record_schemas())
def test_backward_and_forward_are_mirror_images(a, b):
    # BACKWARD(a vs b) is by definition can_read(writer=b, reader=a),
    # which is FORWARD(b vs a)
    assert (check_compatibility(a, b, "BACKWARD") == []) == (
        check_compatibility(b, a, "FORWARD") == []
    )
