"""Deterministic synthetic nested-event corpus (the `nestedSchema` fixture).

The reference's marquee feature is recursive `nestedSchema` validation over
document payloads (validator_src/helpers/validationHelpers.js:38-63; 14 of 36
GA4 fixture schemas use `array`+`nestedSchema`, e.g. terraform_backend/src/
"GA4 Recommended"/schemas/purchase.json:40-118). This corpus is its typed-
column analog: a purchase-like event table with

    event_id: int64
    currency: string
    value_cents: int64
    items: list<struct<item_id: string, item_name: string,
                       price_cents: int64, quantity: int64>>
    meta: struct<source: string, session_id: string>

Everything is a pure function of n_events (deterministic modular arithmetic,
no RNG) — same caching/atomic-write contract as sources/transcripts.py. Violations are injected at deterministic
global-row positions: bad/null currency, null item lists, null items, item_id
regex breaks, null item_name (type error), null price_cents, null meta, enum
breaks in meta.source, session_id regex breaks.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from .cache import ensure_cached_table

EVENTS_PER_SF = 400_000  # sf0.01 -> 4k events, sf0.1 -> 40k
DEFAULT_ROOT = "/tmp/graft_nested_v2"  # bump suffix when generation changes

NESTED_SPEC_JSON: dict = {
    "event_id": {"type": "number"},
    "currency": {"type": "string", "enum": ["USD", "EUR", "GBP"]},
    "value_cents": {"type": "number"},
    "items": {
        "type": "array",
        "nestedSchema": {
            "item_id": {"type": "string", "regex": "^sku_[0-9]+$"},
            "item_name": {"type": "string"},
            "price_cents": {"type": "number"},
            "quantity": {"type": "number", "optional": True},
        },
    },
    "meta": {
        "type": "object",
        "nestedSchema": {
            "source": {"type": "string", "enum": ["web", "app", "api"]},
            "session_id": {"type": "string", "regex": "^sess_[0-9]+$", "optional": True},
        },
    },
    # list<list<string>>: the JS property walk over ARRAY items
    # (validationHelpers.js:38-48 + checkWithSchema hasOwnProperty) — index
    # keys resolve positionally, 'length' is a number property, index 2 is
    # frequently out of range -> missing
    "tags": {
        "type": "array",
        "nestedSchema": {
            "0": {"type": "string", "regex": "^t[0-9]+$"},
            "1": {"type": "string", "optional": True},
            "2": {"type": "string"},
            "length": {"type": "number", "value": 2},
        },
    },
}

_NAMES = np.array(["widget", "gadget", "doohickey", "gizmo", "sprocket", "flange"])
_SOURCES = np.array(["web", "app", "api"])


def generate_nested_events(n_events: int) -> pa.Table:
    """Build the corpus as one Arrow table (vectorized; no Python row loops).
    Every value is modular arithmetic on the global event/item index, so the
    table is a pure function of ``n_events`` alone — no RNG involved."""
    eid = np.arange(n_events, dtype=np.int64)

    currency = np.array(["USD", "EUR", "GBP"])[eid % 3].astype(object)
    currency[eid % 101 == 5] = "XXX"  # enum violation
    currency[eid % 113 == 7] = None  # null -> enum + type violations
    value_cents = (eid * 37) % 100_000

    # --- items: 0..4 per event; null list every %89==3
    n_items = (eid % 5).astype(np.int64)
    null_list = eid % 89 == 3
    n_items[null_list] = 0
    total = int(n_items.sum())
    parent = np.repeat(eid, n_items)
    # within-list index
    starts = np.concatenate([[0], np.cumsum(n_items)[:-1]])
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, n_items)

    gi = np.arange(total, dtype=np.int64)  # global item index
    item_id = np.char.add("sku_", ((parent * 7 + pos) % 10_000).astype("U8")).astype(object)
    item_id[gi % 53 == 9] = "SKU-BAD"  # regex violation
    item_id[gi % 67 == 21] = None  # type 'object' + regex empty_value
    item_name = _NAMES[gi % len(_NAMES)].astype(object)
    item_name[gi % 59 == 17] = None  # type violation (string/object)
    price_cents = ((parent * 13 + pos * 7) % 50_000).astype(object)
    price_null = gi % 61 == 19
    price_cents[price_null] = None  # type violation (number/object)
    quantity = ((gi % 9) + 1).astype(object)
    quantity[gi % 11 == 4] = None  # optional -> skipped

    null_item = gi % 97 == 11  # whole item null -> required keys missing

    child = pa.StructArray.from_arrays(
        [
            pa.array(item_id, type=pa.string()),
            pa.array(item_name, type=pa.string()),
            pa.array(price_cents, type=pa.int64()),
            pa.array(quantity, type=pa.int64()),
        ],
        names=["item_id", "item_name", "price_cents", "quantity"],
        mask=pa.array(null_item),
    )
    offsets = np.concatenate([[0], np.cumsum(n_items)]).astype(np.int32)
    items = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), child, mask=pa.array(null_list)
    )

    # --- meta struct
    source = _SOURCES[eid % len(_SOURCES)].astype(object)
    source[eid % 103 == 15] = "bot"  # enum violation
    source[eid % 107 == 25] = None  # enum + type violations
    session = np.char.add("sess_", (eid % 100_000).astype("U8")).astype(object)
    session[eid % 109 == 33] = "oops"  # regex violation
    session[eid % 127 == 45] = None  # optional -> skipped
    null_meta = eid % 71 == 13
    meta = pa.StructArray.from_arrays(
        [pa.array(source, type=pa.string()), pa.array(session, type=pa.string())],
        names=["source", "session_id"],
        mask=pa.array(null_meta),
    )

    # --- tags: list<list<string>>; 0..2 inner lists per event, inner length
    # 1..3 (so index '2' is often an absent property and 'length' often != 2),
    # with injected regex breaks, null elements and null inner lists
    n_tags = (eid % 3).astype(np.int64)
    null_tags = eid % 83 == 29
    n_tags[null_tags] = 0
    ttotal = int(n_tags.sum())
    tparent = np.repeat(eid, n_tags)
    tstarts = np.concatenate([[0], np.cumsum(n_tags)[:-1]])
    tpos = np.arange(ttotal, dtype=np.int64) - np.repeat(tstarts, n_tags)
    inner_len = ((tparent + tpos) % 3 + 1).astype(np.int64)
    null_inner = np.arange(ttotal, dtype=np.int64) % 73 == 31
    inner_len[null_inner] = 0
    etotal = int(inner_len.sum())
    ei = np.arange(etotal, dtype=np.int64)
    estarts = np.concatenate([[0], np.cumsum(inner_len)[:-1]])
    eparent = np.repeat(np.arange(ttotal, dtype=np.int64), inner_len)
    epos = ei - np.repeat(estarts, inner_len)
    elem = np.char.add(
        "t", ((tparent[eparent] * 3 + epos) % 100).astype("U4")
    ).astype(object)
    elem[ei % 41 == 7] = "bad!"  # regex violation when consulted at index 0
    elem[ei % 47 == 13] = None  # null element -> type ('string','object')
    eoff = np.concatenate([[0], np.cumsum(inner_len)]).astype(np.int32)
    inner = pa.ListArray.from_arrays(
        pa.array(eoff, type=pa.int32()),
        pa.array(elem, type=pa.string()),
        mask=pa.array(null_inner),
    )
    toff = np.concatenate([[0], np.cumsum(n_tags)]).astype(np.int32)
    tags = pa.ListArray.from_arrays(
        pa.array(toff, type=pa.int32()), inner, mask=pa.array(null_tags)
    )

    return pa.table(
        {
            "event_id": pa.array(eid),
            "currency": pa.array(currency, type=pa.string()),
            "value_cents": pa.array(value_cents, type=pa.int64()),
            "items": items,
            "meta": meta,
            "tags": tags,
        }
    )


def n_events_for_sf(sf: float) -> int:
    return max(500, int(round(EVENTS_PER_SF * sf)))


def nested_dir(sf: float, root: str = DEFAULT_ROOT) -> str:
    return os.path.join(root, f"sf{sf:g}")


def ensure_nested_events(sf: float, root: str = DEFAULT_ROOT, n_files: int | None = None) -> str:
    """Generate-and-cache; atomic (tmp dir + rename), race-safe."""
    return ensure_cached_table(
        lambda: generate_nested_events(n_events_for_sf(sf)),
        nested_dir(sf, root),
        "nested",
        n_files=n_files,
        shard_rows=20_000,
        max_files=32,
        marker_key="n_events",
    )


def nested_glob(sf: float, root: str = DEFAULT_ROOT) -> str:
    return os.path.join(nested_dir(sf, root), "nested_*.parquet")
