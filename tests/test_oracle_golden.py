"""Golden-semantics corpus (FIXTURES.md §3): 24 cases executed against the
actual reference functions (Node 20) and recorded verbatim. The oracle must
reproduce every row byte-for-byte in (field, error_type, expected, actual)."""

import math

import pytest

from events_validator_ray.oracle import UNDEFINED, validate_event
from events_validator_ray.spec import load_spec

NAN = float("nan")

# (rule_json, data, expected_rows)
CASES = [
    # 1: version key skipped
    ({"version": {"type": "number", "value": 99}}, {}, []),
    # 2: value passes via toString coercion; type fails
    ({"a": {"type": "number", "value": 1}}, {"a": "1"}, [("a", "type", "number", "string")]),
    # 3: NaN passes number
    ({"a": {"type": "number"}}, {"a": NAN}, []),
    # 4: whitespace string fails with special text
    ({"a": {"type": "string"}}, {"a": "   "}, [("a", "type", "non-empty string", "empty string")]),
    # 5: optional empty skipped
    ({"a": {"type": "string", "optional": True}}, {"a": ""}, []),
    # 6: missing required
    ({"a": {"type": "string"}}, {}, [("a", "missing", "field present", "field missing")]),
    # 7: extra fields ignored
    ({"a": {"type": "string"}}, {"a": "x", "zzz": 5}, []),
    # 8: string length
    ({"a": {"type": "string", "length": 3}}, {"a": "abcd"}, [("a", "length", "3", "4")]),
    # 9: length of a number is undefined
    ({"a": {"type": "number", "length": 3}}, {"a": 123}, [("a", "length", "3", None)]),
    # 10: unanchored partial regex match passes
    ({"a": {"type": "string", "regex": "\\d+"}}, {"a": "abc123xyz"}, []),
    # 11: regex on null -> empty_value
    ({"a": {"regex": "^x$"}}, {"a": None}, [("a", "regex", "^x$", "empty_value")]),
    # 12: regex coerces number
    ({"a": {"regex": "^12$"}}, {"a": 12}, []),
    # 13: array per-item recursion; scalar wrapped as {'': item}
    (
        {"a": {"type": "array", "nestedSchema": {"id": {"type": "string"}}}},
        {"a": [1, {"id": "x"}, {"id": 2}]},
        [
            ("a[0].id", "missing", "field present", "field missing"),
            ("a[2].id", "type", "string", "number"),
        ],
    ),
    # 14: nested object dotted path
    (
        {"o": {"type": "object", "nestedSchema": {"b": {"type": "boolean"}}}},
        {"o": {"b": "true"}},
        [("o.b", "type", "boolean", "string")],
    ),
    # 15/16: typeof null === 'object'
    ({"a": {"type": "string"}}, {"a": None}, [("a", "type", "string", "object")]),
    ({"a": {"type": "number"}}, {"a": None}, [("a", "type", "number", "object")]),
    # 17: all rules fire independently in order value->type->length->regex
    (
        {"a": {"type": "string", "value": "x", "regex": "^x$", "length": 1}},
        {"a": 7},
        [
            ("a", "value", "x", "7"),
            ("a", "type", "string", "number"),
            ("a", "length", "1", None),
            ("a", "regex", "^x$", "7"),
        ],
    ),
    # 18: boolean/string toString equality
    ({"a": {"type": "boolean", "value": "true"}}, {"a": True}, []),
    # 19: optional null skips all checks incl. value
    ({"a": {"type": "string", "value": "x", "optional": True}}, {"a": None}, []),
    # 20: required:false === optional:true
    ({"a": {"type": "string", "required": False}}, {}, []),
    # 21: array length with valid nested items
    (
        {"a": {"type": "array", "length": 2, "nestedSchema": {"id": {"type": "string"}}}},
        {"a": [{"id": "x"}]},
        [("a", "length", "2", "1")],
    ),
    # 22: RegExp.test(undefined) tests the string "undefined"
    ({"a": {"regex": "^undefined$"}}, {"a": UNDEFINED}, []),
    # 23: value:null vs present value
    ({"a": {"type": "string", "value": None}}, {"a": "x"}, [("a", "value", None, "x")]),
    # 24: empty-key path artifact
    (
        {"a": {"type": "array", "nestedSchema": {"": {"type": "number"}}}},
        {"a": ["s"]},
        [("a[0].", "type", "number", "string")],
    ),
    # 25: nested-array item walked UNWRAPPED (typeof array === 'object' and
    # not null, validationHelpers.js:41): index keys and 'length' resolve
    (
        {
            "a": {
                "type": "array",
                "nestedSchema": {"0": {"type": "string"}, "length": {"type": "number"}},
            }
        },
        {"a": [["x", "y"]]},
        [],
    ),
    # 26: nested-array item: non-index keys (incl. '') are missing properties
    (
        {"a": {"type": "array", "nestedSchema": {"id": {"type": "string"}, "": {"type": "number"}}}},
        {"a": [["x"]]},
        [
            ("a[0].id", "missing", "field present", "field missing"),
            ("a[0].", "missing", "field present", "field missing"),
        ],
    ),
    # 27: null item IS wrapped ({'': null}): required keys missing
    (
        {"a": {"type": "array", "nestedSchema": {"id": {"type": "string"}}}},
        {"a": [None]},
        [("a[0].id", "missing", "field present", "field missing")],
    ),
    # 28: a[0][1]-style DEEP nesting (round-3 item 8): an index-key rule with
    # its own nestedSchema recurses into the inner array via the same JS
    # property walk (validationHelpers.js:38-48) — path a[0].1[0].id; index
    # keys beyond the array's length are missing properties
    (
        {
            "a": {
                "type": "array",
                "nestedSchema": {
                    "1": {"type": "array", "nestedSchema": {"id": {"type": "string"}}},
                    "length": {"type": "number", "value": 2},
                    "2": {"type": "string"},
                },
            }
        },
        {"a": [[["ig"], [{"id": 5}]]]},
        [
            ("a[0].1[0].id", "type", "string", "number"),
            ("a[0].2", "missing", "field present", "field missing"),
        ],
    ),
    # 29: the 'length' property participates in value checks like any field
    (
        {
            "a": {
                "type": "array",
                "nestedSchema": {
                    "1": {"type": "array", "nestedSchema": {"id": {"type": "string"}}},
                    "length": {"type": "number", "value": 2},
                    "2": {"type": "string"},
                },
            }
        },
        {"a": [["x"]]},
        [
            ("a[0].1", "missing", "field present", "field missing"),
            ("a[0].length", "value", "2", "1"),
            ("a[0].2", "missing", "field present", "field missing"),
        ],
    ),
]


@pytest.mark.parametrize("rule_json,data,expected", CASES, ids=[str(i + 1) for i in range(len(CASES))])
def test_golden_case(rule_json, data, expected):
    spec = load_spec(rule_json, event_name="t")
    got = validate_event(spec.fields, data)
    assert got == expected


def test_value_both_absent_passes():
    # actual?.toString() !== expected?.toString() is false when both undefined
    spec = load_spec({"a": {"value": None, "type": "string", "optional": True}})
    assert validate_event(spec.fields, {"a": None}) == []


def test_enum_extension():
    spec = load_spec({"role": {"type": "string", "enum": ["user", "assistant"]}})
    assert validate_event(spec.fields, {"role": "robot"}) == [
        ("role", "enum", "user|assistant", "robot")
    ]
    assert validate_event(spec.fields, {"role": "user"}) == []
    # null fails both enum (like the reference's value rule on null) and type
    assert validate_event(spec.fields, {"role": None}) == [
        ("role", "enum", "user|assistant", None),
        ("role", "type", "string", "object"),
    ]


def test_length_zero_and_falsy():
    # JS: ('' || []).length === 0 ; (0 || []).length === 0
    spec = load_spec({"a": {"length": 0}})
    assert validate_event(spec.fields, {"a": ""}) == []
    assert validate_event(spec.fields, {"a": 0}) == []
    spec2 = load_spec({"a": {"length": 2}})
    assert validate_event(spec2.fields, {"a": None}) == [("a", "length", "2", "0")]
