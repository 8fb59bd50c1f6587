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


def save_spec(spec: Spec, spec_dir: str) -> str:
    """Write one `${event_name}.json` schema document (the upload analog of
    streamlit_ev/app/helpers/gcp.py:62-90). Atomic tmp + os.replace; the
    document round-trips through load_spec with an identical spec_hash."""
    from ..spec import spec_to_dict

    os.makedirs(spec_dir, exist_ok=True)
    path = os.path.join(spec_dir, f"{spec.event_name}.json")
    payload = spec_to_dict(spec)
    if spec.version is not None:
        payload = {"version": spec.version, **payload}
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=2, sort_keys=False)
    os.replace(tmp, path)
    return path


def save_spec_dir(specs: dict[str, Spec], spec_dir: str) -> list[str]:
    """Write every spec of a plan back to a directory (bucket-upload analog)."""
    return [save_spec(spec, spec_dir) for spec in specs.values()]


def update_repo_usage(repo: dict[str, Any], spec: Spec) -> dict[str, Any]:
    """Record a schema's field usage in the master param repository — the
    analog of the reference's repo usage update (streamlit_ev/app/helpers.py:
    372-397): every field of `spec` gets `event_name` appended to its
    `usedInSchemas` list (created if the param is new); params no longer used
    by this schema have it removed. Returns the updated repo (copy)."""
    out = {k: dict(v) for k, v in repo.items()}
    fields = set(spec.fields)
    for name in fields:
        meta = out.setdefault(name, {})
        used = list(meta.get("usedInSchemas", []))
        if spec.event_name not in used:
            used.append(spec.event_name)
        meta["usedInSchemas"] = sorted(used)
    for name, meta in out.items():
        if name not in fields and spec.event_name in meta.get("usedInSchemas", []):
            meta["usedInSchemas"] = sorted(
                u for u in meta["usedInSchemas"] if u != spec.event_name
            )
    return out


def save_repo(repo: dict[str, Any], path: str) -> str:
    """Atomic write of the param repository (`repo.json` upload analog)."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(repo, f, indent=2, sort_keys=True)
    os.replace(tmp, path)
    return path


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
