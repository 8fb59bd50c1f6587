"""Schema-document sources and the control-plane helpers.

The reference keeps one JSON schema per event name in a GCS bucket
(`${event_name}.json`, validator_src/index.js:45; bucket listing at
streamlit_ev/app/helpers/gcp.py:92-101) plus a 47-parameter master repository
(`repo.json`) whose params are canonicalized into schema rules by
`construct_schema_definition` (streamlit_ev/app/helpers/updater.py:7-83) and
indexed by `find_impacted_schemas` (updater.py:85-93).

Here the bucket is a local/spec directory: load once at driver startup,
compile, and broadcast the `{event_name -> Spec}` plan inside the map stage —
the reference re-downloads per event (AGENTS.md:807); we never do.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any

from ..spec import Spec, _normalize_value, load_spec


def list_spec_names(spec_dir: str) -> list[str]:
    """Bucket-listing analog (gcp.py:92-101): event names with a spec."""
    return sorted(
        os.path.basename(p).removesuffix(".json")
        for p in glob.glob(os.path.join(spec_dir, "*.json"))
        if os.path.basename(p) != "repo.json"
    )


def load_spec_dir(spec_dir: str) -> dict[str, Spec]:
    """Load every `${event_name}.json` into a compiled plan keyed by event
    name (the broadcast side of the event_name -> schema lookup, SURVEY.md
    §2.4 J1)."""
    out: dict[str, Spec] = {}
    for name in list_spec_names(spec_dir):
        with open(os.path.join(spec_dir, f"{name}.json")) as f:
            out[name] = load_spec(json.load(f), event_name=name)
    return out


def canonicalize_param(param: dict[str, Any]) -> dict[str, Any]:
    """Repo param -> schema rule, following `construct_schema_definition`
    (updater.py:7-83): keeps type/description, casts numeric-string values
    ("1.5" -> 1.5 by the has-a-dot rule, updater.py:30), recurses into nested
    schemas, drops empty/"Any" values and never emits `regex`."""
    rule: dict[str, Any] = {}
    if param.get("type"):
        rule["type"] = param["type"]
    if param.get("description"):
        rule["description"] = param["description"]
    v = param.get("value")
    if v not in (None, "", "Any"):
        rule["value"] = _normalize_value(v)
    if param.get("optional") is True or param.get("required") is False:
        rule["optional"] = True
    nested = param.get("nestedSchema") or param.get("nested")
    if isinstance(nested, dict):
        rule["nestedSchema"] = {k: canonicalize_param(p) for k, p in nested.items()}
    return rule


def find_impacted_specs(repo: dict[str, Any], param_name: str) -> list[str]:
    """Inverted index param -> usedInSchemas[] (updater.py:85-93)."""
    meta = repo.get(param_name) or {}
    return sorted(meta.get("usedInSchemas", []))


def spec_from_repo(repo: dict[str, Any], event_name: str) -> Spec:
    """Rebuild a spec for an event from the param repository (the dry-run
    rebuild analog, updater.py:95-118)."""
    fields = {
        name: canonicalize_param(meta.get("definition", meta))
        for name, meta in repo.items()
        if event_name in (meta.get("usedInSchemas") or [])
    }
    return load_spec(fields, event_name=event_name)
