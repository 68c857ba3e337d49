"""Product-event schema versions — the engine's copy of the data contract
defined by the reference's Avro schemas (/root/reference/schema/
product-v1.avsc and product-v2.avsc), expressed as Python dicts.

v2 adds `size` and `color` with defaults so v1 and v2 writers coexist
(FULL compatibility — SURVEY §1.4); after mergeSchema ingestion, v1 rows
carry NULL (not the Avro default) for the v2-only columns.
"""

from __future__ import annotations

import json

PRODUCT_V1: dict = {
    "type": "record",
    "name": "productEvent",
    "namespace": "product.events",
    "fields": [
        {"name": "productId", "type": "string"},
        {"name": "eventId", "type": "string"},
        {"name": "type", "type": "string"},
        {"name": "timestamp", "type": "long"},
    ],
}

PRODUCT_V2: dict = {
    "type": "record",
    "name": "productEvent",
    "namespace": "product.events",
    "fields": [
        {"name": "productId", "type": "string"},
        {"name": "eventId", "type": "string"},
        {"name": "type", "type": "string"},
        {"name": "timestamp", "type": "long"},
        {"name": "size", "type": "string", "default": "none"},
        {"name": "color", "type": "string", "default": "none"},
    ],
}

PRODUCT_V1_JSON = json.dumps(PRODUCT_V1)
PRODUCT_V2_JSON = json.dumps(PRODUCT_V2)

# Generator value domains (producer.scala:76-91, producer.py:67-78).
PRODUCT_IDS = ["prod-a1", "prod-b2", "prod-c3"]
TYPES = ["shirt", "pants", "shoes"]
SIZES = ["xs", "s", "m", "l", "xl"]
COLORS = ["black", "blue", "red"]
