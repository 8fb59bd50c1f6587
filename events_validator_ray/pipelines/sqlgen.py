"""Generate ANSI/DuckDB oracle SQL from a Spec.

The engine and its correctness oracle share ONE spec definition: every
vectorized branch in stages/validate.py and every wide check in
stages/conversation.py has a SQL twin generated here, so the driver's
side-by-side comparison (CORRECTNESS_r{N}.json) exercises the identical rule
set. Column names match the Ray outputs exactly (driver compares by sorted
column name + value hash).

Semantics parity notes:
- `regexp_matches` (DuckDB, RE2) is partial-match like JS RegExp.test and
  pyarrow's match_substring_regex.
- trim(c, <ws>) strips ASCII whitespace (space/tab/newline/CR/FF/VT) to match
  JS String.trim() / pyarrow utf8_trim_whitespace on the fixtures' content.
- timestamps are compared/emitted as epoch-microsecond strings (epoch_us) to
  sidestep VARCHAR formatting differences.
- value/enum compare after string cast (the reference's bilateral toString,
  validationHelpers.js:108); avoid float-valued rules in SQL-checked specs
  (CAST(2.0 AS VARCHAR) differs between engines).
"""

from __future__ import annotations

from ..spec import FieldRule, Spec

VIOL_COLS = "event_id, field, error_type, expected, actual, event_name, status"


def _eid(key_cols: tuple[str, ...]) -> str:
    # NULL contract (functions/kernels.py:make_event_id): NULL iff the FIRST
    # key is NULL; later NULL keys render 'null' so the conv prefix survives
    parts = [f"CAST({key_cols[0]} AS VARCHAR)"] + [
        f"COALESCE(CAST({c} AS VARCHAR), 'null')" for c in key_cols[1:]
    ]
    joined = " || ':' || ".join(parts)
    return joined


def _lit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


#: ASCII whitespace set for trim() — matches JS String.trim() on ASCII text
_WS = "' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)"


def _trim(c: str) -> str:
    return f"trim({c}, {_WS})"


def _branch(
    table: str,
    key_cols: tuple[str, ...],
    cond: str,
    field: str,
    etype: str,
    expected_sql: str,
    actual_sql: str,
    event_name: str,
    date_col: str | None = None,
    field_sql: str | None = None,
) -> str:
    date_sel = (
        f", COALESCE(strftime({date_col}, '%Y-%m-%d'), '(null)') AS date_utc"
        if date_col
        else ""
    )
    fsql = field_sql if field_sql is not None else _lit(field)
    return (
        f"SELECT {_eid(key_cols)} AS event_id, {fsql} AS field, "
        f"{_lit(etype)} AS error_type, {expected_sql} AS expected, "
        f"{actual_sql} AS actual, {_lit(event_name)} AS event_name, "
        f"'error' AS status{date_sel} FROM {table} WHERE {cond}"
    )


def _scalar_conditions(rule: FieldRule, col_kind: str) -> list[tuple[str, str, str, str, str]]:
    """Per-rule violation branches as (cond, field, etype, expected_sql,
    actual_sql) templates with {c} for the column. col_kind in
    {'string','number','timestamp'} (the flat transcript/event column kinds)."""
    c = rule.name
    out = []
    opt = rule.optional
    # optional-skip: optional && (null || trim-empty) skips every rule
    if col_kind == "string":
        skip = f"({c} IS NULL OR {_trim(c)} = '')" if opt else "FALSE"
    else:
        skip = f"({c} IS NULL)" if opt else "FALSE"
    alive = f"NOT {skip}" if opt else "TRUE"

    if rule.has_value:
        v = rule.value_str()
        if v is None:
            cond = f"{alive} AND {c} IS NOT NULL"
            exp_sql, act_sql = "CAST(NULL AS VARCHAR)", f"CAST({c} AS VARCHAR)"
        else:
            cond = f"{alive} AND ({c} IS NULL OR CAST({c} AS VARCHAR) <> {_lit(v)})"
            exp_sql, act_sql = _lit(v), f"CAST({c} AS VARCHAR)"
        out.append((cond, c, "value", exp_sql, act_sql))

    if rule.enum is not None:
        vals = ", ".join(_lit(e) for e in rule.enum_strs() if e is not None)
        null_ok = None in rule.enum_strs()
        null_cond = "FALSE" if null_ok else f"{c} IS NULL"
        cond = f"{alive} AND (({c} IS NOT NULL AND CAST({c} AS VARCHAR) NOT IN ({vals})) OR {null_cond})"
        expected = "|".join(e or "" for e in rule.enum_strs())
        out.append((cond, c, "enum", _lit(expected), f"CAST({c} AS VARCHAR)"))

    if rule.type is not None:
        t = rule.type
        if t == col_kind == "string":
            if not opt:
                out.append((f"{c} IS NULL", c, "type", "'string'", "'object'"))
                out.append(
                    (
                        f"{c} IS NOT NULL AND {_trim(c)} = ''",
                        c,
                        "type",
                        "'non-empty string'",
                        "'empty string'",
                    )
                )
        elif t == col_kind:
            out.append((f"{alive} AND {c} IS NULL", c, "type", _lit(t), "'object'"))
        else:
            # column-level type mismatch: non-null rows fail with the column's
            # JS typeof; null rows with 'object'
            out.append((f"{alive} AND {c} IS NOT NULL", c, "type", _lit(t), _lit(col_kind)))
            if not (opt and t == "string"):
                out.append((f"{alive} AND {c} IS NULL", c, "type", _lit(t), "'object'"))

    if rule.length is not None:
        L = rule.length
        if col_kind == "string":
            cond = f"{alive} AND coalesce(length({c}), 0) <> {L}"
            out.append(
                (cond, c, "length", _lit(str(L)), f"CAST(coalesce(length({c}), 0) AS VARCHAR)")
            )
        elif col_kind == "timestamp":
            # JS Date objects are always truthy: non-null -> .length undefined
            out.append((f"{alive} AND {c} IS NOT NULL", c, "length", _lit(str(L)), "CAST(NULL AS VARCHAR)"))
            if L != 0:
                out.append((f"{alive} AND {c} IS NULL", c, "length", _lit(str(L)), "'0'"))
        else:
            # numbers: truthy -> .length undefined (always violates, actual NULL)
            out.append((f"{alive} AND {c} IS NOT NULL AND {c} <> 0", c, "length", _lit(str(L)), "CAST(NULL AS VARCHAR)"))
            if L != 0:
                out.append((f"{alive} AND ({c} IS NULL OR {c} = 0)", c, "length", _lit(str(L)), "'0'"))

    if rule.regex is not None:
        p = rule.regex
        if col_kind == "string":
            empty = f"({c} IS NULL OR {_trim(c)} = '')"
            out.append((f"{alive} AND {empty}", c, "regex", _lit(p), "'empty_value'"))
            out.append(
                (
                    f"{alive} AND NOT {empty} AND NOT regexp_matches({c}, {_lit(p)})",
                    c,
                    "regex",
                    _lit(p),
                    c,
                )
            )
        else:
            out.append((f"{alive} AND {c} IS NULL", c, "regex", _lit(p), "'empty_value'"))
            out.append(
                (
                    f"{alive} AND {c} IS NOT NULL AND NOT regexp_matches(CAST({c} AS VARCHAR), {_lit(p)})",
                    c,
                    "regex",
                    _lit(p),
                    f"CAST({c} AS VARCHAR)",
                )
            )
    return out


def column_kinds_for_transcripts() -> dict[str, str]:
    return {
        "conv_id": "string",
        "turn_idx": "number",
        "role": "string",
        "text": "string",
        "tool": "string",
        "ts": "timestamp",
    }


def scalar_violations_sql(
    spec: Spec,
    table: str,
    col_kinds: dict[str, str],
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    include_refs: bool = True,
    date_col: str | None = None,
) -> str:
    """UNION ALL of every scalar-rule violation branch (the SQL twin of
    ValidateBatch with log_valid=False)."""
    branches: list[str] = []
    for rule in spec.fields.values():
        kind = col_kinds.get(rule.name)
        if kind is None:
            if not rule.optional:
                branches.append(
                    _branch(
                        table,
                        key_cols,
                        "TRUE",
                        rule.name,
                        "missing",
                        "'field present'",
                        "'field missing'",
                        spec.event_name,
                        date_col,
                    )
                )
            continue
        for cond, field, etype, exp, act in _scalar_conditions(rule, kind):
            branches.append(
                _branch(table, key_cols, cond, field, etype, exp, act, spec.event_name, date_col)
            )
    if include_refs:
        for r in spec.table.refs:
            expected = f"present iff {r.when_field}={r.when_value}"
            branches.append(
                _branch(
                    table,
                    key_cols,
                    f"{r.when_field} = {_lit(r.when_value)} AND {r.field} IS NULL",
                    r.field,
                    "ref",
                    _lit(expected),
                    "'missing'",
                    spec.event_name,
                    date_col,
                )
            )
            if r.iff:
                branches.append(
                    _branch(
                        table,
                        key_cols,
                        f"(({r.when_field} IS NULL) OR {r.when_field} <> {_lit(r.when_value)}) AND {r.field} IS NOT NULL",
                        r.field,
                        "ref",
                        _lit(expected),
                        "'unexpected'",
                        spec.event_name,
                        date_col,
                    )
                )
    return "\nUNION ALL\n".join(branches)


def valid_rows_condition(spec: Spec, col_kinds: dict[str, str], include_refs: bool = True) -> str:
    """SQL predicate: this ROW produces no scalar/ref violation (the
    logPassed analog, exact per-row even under duplicated keys)."""
    conds: list[str] = []
    for rule in spec.fields.values():
        kind = col_kinds.get(rule.name)
        if kind is None:
            if not rule.optional:
                conds.append("TRUE")
            continue
        for cond, *_ in _scalar_conditions(rule, kind):
            conds.append(f"({cond})")
    if include_refs:
        for r in spec.table.refs:
            conds.append(f"({r.when_field} = {_lit(r.when_value)} AND {r.field} IS NULL)")
            if r.iff:
                conds.append(
                    f"((({r.when_field} IS NULL) OR {r.when_field} <> {_lit(r.when_value)}) AND {r.field} IS NOT NULL)"
                )
    if not conds:
        return "TRUE"
    return "NOT (" + " OR ".join(conds) + ")"


def valid_fields_sql(
    spec: Spec,
    table: str,
    col_kinds: dict[str, str],
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> str:
    """SQL twin of ValidateBatch(log_valid_fields=True)'s status='valid'
    per-field rows (logValidField, loggingHelpers.js:33-46; M9): one row per
    (event, field) whose TYPE check passed — optional fields skip null /
    trim-empty values; `value` = JSON.stringify(rule.type)."""
    import json as _json

    eid = _eid(key_cols)
    parts: list[str] = []
    for rule in spec.fields.values():
        kind = col_kinds.get(rule.name)
        if rule.type is None or kind is None:
            continue
        if rule.type in ("array", "object") and rule.nested:
            continue  # nested recursion logs inner fields, not the parent
        type_conds = [
            cond
            for cond, _f, etype, _e, _a in _scalar_conditions(rule, kind)
            if etype == "type"
        ]
        fail = " OR ".join(f"({c})" for c in type_conds) if type_conds else "FALSE"
        c = rule.name
        if rule.optional:
            if kind == "string":
                skip = f"({c} IS NULL OR {_trim(c)} = '')"
            else:
                skip = f"({c} IS NULL)"
            where = f"NOT ({fail}) AND NOT {skip}"
        else:
            where = f"NOT ({fail})"
        parts.append(
            f"SELECT {eid} AS event_id, {_lit(c)} AS field, "
            f"{_lit(_json.dumps(rule.type))} AS value, 'valid' AS status, "
            f"{_lit(spec.event_name)} AS event_name FROM {table} WHERE {where}"
        )
    return "\nUNION ALL\n".join(parts)


def nested_array_violations_sql(
    rule: FieldRule,
    table: str,
    key_cols: tuple[str, ...],
    event_name: str,
    child_kinds: dict[str, str],
) -> list[str]:
    """SQL twin of the vectorized list<struct> `nestedSchema` walk
    (stages/validate.py _make_array_nested_check): UNNEST + generate_subscripts
    for parent/item indices, item paths `name[i].key`, null items -> required
    keys missing, null lists -> ('array','object')."""
    c = rule.name
    keysel = ", ".join(key_cols)
    out: list[str] = []
    null_cond = f"{c} IS NULL" if not rule.optional else "FALSE"
    if not rule.optional:
        out.append(_branch(table, key_cols, null_cond, c, "type", "'array'", "'object'", event_name))
    child_cols = ", ".join(
        f"__item.{k} AS {_q(k)}" for k in (rule.nested or {}) if k in child_kinds
    )
    sub = (
        f"(SELECT {keysel}, __ord - 1 AS __i, __item{', ' + child_cols if child_cols else ''} "
        f"FROM (SELECT {keysel}, unnest({c}) AS __item, generate_subscripts({c}, 1) AS __ord "
        f"FROM {table} WHERE {c} IS NOT NULL))"
    )

    def path(key: str) -> str:
        return f"'{c}[' || CAST(__i AS VARCHAR) || '].{key}'"

    for key, r in (rule.nested or {}).items():
        kind = child_kinds.get(key)
        if not r.optional and key != "":
            # null items walk {'': null} -> required keys missing; keys ABSENT
            # from the struct type (kind None) are missing for EVERY item
            cond = "TRUE" if kind is None else "__item IS NULL"
            out.append(
                _branch(
                    sub,
                    key_cols,
                    cond,
                    key,
                    "missing",
                    "'field present'",
                    "'field missing'",
                    event_name,
                    field_sql=path(key),
                )
            )
        if kind is None:
            continue
        for cond, _f, etype, exp, act in _scalar_conditions(r, kind):
            out.append(
                _branch(
                    sub,
                    key_cols,
                    f"__item IS NOT NULL AND ({cond})",
                    key,
                    etype,
                    exp,
                    act,
                    event_name,
                    field_sql=path(key),
                )
            )
    return out


def nested_jsarray_violations_sql(
    rule: FieldRule,
    table: str,
    key_cols: tuple[str, ...],
    event_name: str,
    elem_kind: str,
) -> list[str]:
    """SQL twin of the JS property walk over list<list<elem>> items
    (stages/validate.py jswalk mode): canonical index keys resolve via
    1-based DuckDB list indexing gated on len(), 'length' is len(__item),
    any other key is an absent property -> missing; null items walk
    {'': null} -> required keys missing."""
    import dataclasses as _dc

    c = rule.name
    keysel = ", ".join(key_cols)
    out: list[str] = []
    if not rule.optional:
        out.append(
            _branch(table, key_cols, f"{c} IS NULL", c, "type", "'array'", "'object'", event_name)
        )
    aliases: list[str] = []
    keyinfo: list[tuple[str, FieldRule, tuple, str | None]] = []
    for key, r in (rule.nested or {}).items():
        if key == "length":
            alias = "__klength"
            aliases.append(f"len(__item) AS {alias}")
            keyinfo.append((key, r, ("length",), alias))
        elif key.isdigit() and str(int(key)) == key:
            i = int(key)
            alias = f"__k{i}"
            aliases.append(f"__item[{i + 1}] AS {alias}")
            keyinfo.append((key, r, ("index", i), alias))
        else:
            keyinfo.append((key, r, ("absent",), None))
    alias_sel = (", " + ", ".join(aliases)) if aliases else ""
    sub = (
        f"(SELECT {keysel}, __ord - 1 AS __i, __item{alias_sel} "
        f"FROM (SELECT {keysel}, unnest({c}) AS __item, generate_subscripts({c}, 1) AS __ord "
        f"FROM {table} WHERE {c} IS NOT NULL))"
    )

    def path(key: str) -> str:
        return f"'{c}[' || CAST(__i AS VARCHAR) || '].{key}'"

    for key, r, kind, alias in keyinfo:
        if not r.optional and key != "":
            if kind[0] == "absent":
                cond = "TRUE"
            elif kind[0] == "length":
                cond = "__item IS NULL"
            else:
                cond = f"(__item IS NULL OR len(__item) <= {kind[1]})"
            out.append(
                _branch(
                    sub, key_cols, cond, key, "missing",
                    "'field present'", "'field missing'", event_name,
                    field_sql=path(key),
                )
            )
        if kind[0] == "absent":
            continue
        present = (
            "__item IS NOT NULL"
            if kind[0] == "length"
            else f"(__item IS NOT NULL AND len(__item) > {kind[1]})"
        )
        kkind = "number" if kind[0] == "length" else elem_kind
        r_alias = _dc.replace(r, name=alias)
        for cond, _f, etype, exp, act in _scalar_conditions(r_alias, kkind):
            out.append(
                _branch(
                    sub, key_cols, f"{present} AND ({cond})", key, etype, exp, act,
                    event_name, field_sql=path(key),
                )
            )
    return out


def nested_object_violations_sql(
    rule: FieldRule,
    table: str,
    key_cols: tuple[str, ...],
    event_name: str,
    child_kinds: dict[str, str],
) -> list[str]:
    """SQL twin of the vectorized struct `nestedSchema` walk
    (_make_object_nested_check): dotted paths `name.key`, null struct ->
    ('object','object')."""
    c = rule.name
    keysel = ", ".join(key_cols)
    out: list[str] = []
    if not rule.optional:
        out.append(_branch(table, key_cols, f"{c} IS NULL", c, "type", "'object'", "'object'", event_name))
    child_cols = ", ".join(
        f"{c}.{k} AS {_q(k)}" for k in (rule.nested or {}) if k in child_kinds
    )
    sub = (
        f"(SELECT {keysel}{', ' + child_cols if child_cols else ''} "
        f"FROM {table} WHERE {c} IS NOT NULL)"
    )
    for key, r in (rule.nested or {}).items():
        kind = child_kinds.get(key)
        if kind is None:
            if not r.optional:
                # key absent from the struct type: missing for every non-null
                # struct (the walk only runs on present structs)
                out.append(
                    _branch(
                        sub, key_cols, "TRUE", f"{c}.{key}", "missing",
                        "'field present'", "'field missing'", event_name,
                    )
                )
            continue
        for cond, _f, etype, exp, act in _scalar_conditions(r, kind):
            out.append(
                _branch(sub, key_cols, cond, f"{c}.{key}", etype, exp, act, event_name)
            )
    return out


def _q(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


def nested_spec_violations_sql(
    spec: Spec,
    table: str,
    col_kinds: dict[str, str],
    key_cols: tuple[str, ...] = ("event_id",),
    nested_kinds: dict[str, dict[str, str]] | None = None,
) -> str:
    """UNION ALL of flat-rule branches plus nested list<struct>/struct
    branches — the SQL twin of ValidateBatch over a nested-typed table.
    `nested_kinds` maps each nested field to its child column kinds."""
    nested_kinds = nested_kinds or {}
    branches: list[str] = []
    for rule in spec.fields.values():
        if rule.nested and rule.type == "array":
            nk = nested_kinds.get(rule.name, {})
            if "__elem__" in nk:
                # list<list<elem>>: JS property walk (index keys / 'length')
                branches += nested_jsarray_violations_sql(
                    rule, table, key_cols, spec.event_name, nk["__elem__"]
                )
                continue
            branches += nested_array_violations_sql(
                rule, table, key_cols, spec.event_name, nk
            )
        elif rule.nested and rule.type == "object":
            branches += nested_object_violations_sql(
                rule, table, key_cols, spec.event_name, nested_kinds.get(rule.name, {})
            )
        else:
            kind = col_kinds.get(rule.name)
            if kind is None:
                if not rule.optional:
                    branches.append(
                        _branch(
                            table, key_cols, "TRUE", rule.name, "missing",
                            "'field present'", "'field missing'", spec.event_name,
                        )
                    )
                continue
            for cond, field, etype, exp, act in _scalar_conditions(rule, kind):
                branches.append(
                    _branch(table, key_cols, cond, field, etype, exp, act, spec.event_name)
                )
    return "\nUNION ALL\n".join(branches)


def conversation_violations_sql(spec: Spec, table: str) -> str:
    """SQL twin of stages/conversation.py (unique, contiguity, ts ordering,
    first_role)."""
    ename = _lit(spec.event_name)
    parts: list[str] = []
    order = spec.table.order
    within = order.within if order else "conv_id"
    by = order.by if order else "turn_idx"
    ts = order.ts_column if order else "ts"
    # rows with a NULL grouping key or NULL order key are outside the
    # conversation plane (stages/conversation.py:_project drops them — they
    # are scalar-plane type violations, not placeable in the order lattice)
    table = (
        f"(SELECT * FROM {table} "
        f"WHERE {within} IS NOT NULL AND {by} IS NOT NULL)"
    )

    if spec.table.unique:
        parts.append(
            f"SELECT {within} || ':' || CAST({by} AS VARCHAR) AS event_id, "
            f"'{by}' AS field, 'unique' AS error_type, '1' AS expected, "
            f"CAST(COUNT(*) AS VARCHAR) AS actual, {ename} AS event_name, "
            f"'error' AS status FROM {table} GROUP BY {within}, {by} HAVING COUNT(*) > 1"
        )
    if order and order.contiguous:
        parts.append(
            f"""SELECT {within} || ':' || CAST({by} AS VARCHAR) AS event_id,
 '{by}' AS field, 'order' AS error_type,
 CASE WHEN prev IS NULL THEN '0' ELSE CAST(prev + 1 AS VARCHAR) END AS expected,
 CAST({by} AS VARCHAR) AS actual, {ename} AS event_name, 'error' AS status
 FROM (SELECT {within}, {by}, LAG({by}) OVER (PARTITION BY {within} ORDER BY {by}) AS prev
       FROM (SELECT DISTINCT {within}, {by} FROM {table}))
 WHERE (prev IS NULL AND {by} <> 0) OR (prev IS NOT NULL AND {by} - prev > 1)"""
        )
    if order and order.ts_monotone:
        parts.append(
            f"""SELECT {within} || ':' || CAST({by} AS VARCHAR) AS event_id,
 '{ts}' AS field, 'order' AS error_type,
 CAST(epoch_us(prevmax) AS VARCHAR) AS expected,
 CAST(epoch_us({ts}) AS VARCHAR) AS actual, {ename} AS event_name, 'error' AS status
 FROM (SELECT {within}, {by}, {ts},
              MAX({ts}) OVER (PARTITION BY {within} ORDER BY {by}
                  RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
       FROM {table} WHERE {ts} IS NOT NULL)
 WHERE {ts} < prevmax"""
        )
    if order and order.alternate:
        alts = ", ".join(_lit(r) for r in order.alternate)
        expected = "alternating " + "|".join(order.alternate)
        parts.append(
            f"""SELECT {within} || ':' || CAST({by} AS VARCHAR) AS event_id,
 'role' AS field, 'alt' AS error_type, {_lit(expected)} AS expected,
 turn_role AS actual, {ename} AS event_name, 'error' AS status
 FROM (SELECT {within}, {by}, turn_role,
              LAG(turn_role) OVER (PARTITION BY {within} ORDER BY {by}) AS prev
       FROM (SELECT {within}, {by}, MIN(role) AS turn_role FROM {table}
             WHERE role IS NOT NULL GROUP BY {within}, {by}))
 WHERE turn_role = prev AND turn_role IN ({alts})"""
        )
    if spec.table.first_role:
        fr = _lit(spec.table.first_role)
        parts.append(
            f"""SELECT {within} || ':' || CAST(min_turn AS VARCHAR) AS event_id,
 'role' AS field, 'ref' AS error_type,
 'first_role=' || {fr} AS expected, min_role AS actual,
 {ename} AS event_name, 'error' AS status
 FROM (SELECT {within}, MIN({by}) AS min_turn FROM {table} GROUP BY {within}) m
 JOIN (SELECT {within} AS w2, {by} AS b2,
              MAX(CASE WHEN role = {fr} THEN 1 ELSE 0 END) AS hit,
              MIN(role) AS min_role
       FROM {table} GROUP BY {within}, {by}) r
 ON m.{within} = r.w2 AND m.min_turn = r.b2
 WHERE hit = 0"""
        )
    return "\nUNION ALL\n".join(parts)
