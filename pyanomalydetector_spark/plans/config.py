"""YAML-declarative suite & detector configuration.

Reference: utils/config_loader.py:15-97 — defaults file + per-key dict-merge
override, environment/context templating, and the *cascade* rule: every
top-level key (except admdb/data_sources/logging/view_sources) is copied
into each data source that does not already define it, with item_conds /
item_diff_conds cascading only into ``data_sources``
(config_loader.py:83-97). samples/unified.yml:108-150 is the rule shape:
``{name, filter, condition: {operator, value}}``; a rule WITHOUT a
``condition`` removes every matching item unconditionally
(detector.py:168-169: ``_evaluate_cond`` returns False).

Templating: the reference renders the config through jinja2 with env vars +
secrets as context; its configs only use plain ``{{ NAME }}`` interpolation,
which is replicated here with a regex so no jinja dependency is needed.

This module turns YAML into the engine's native objects: ``Check`` suites,
``Condition`` rule lists, and ``DetectorConfig`` threshold sets — so the
whole check suite is data, and ``CheckpointStore.suite_hash`` invalidation
flows from config edits (tests/test_config_suite.py).
"""

from __future__ import annotations

import dataclasses
import os
import re

import yaml

from pyanomalydetector_spark.checks.core import Check
from pyanomalydetector_spark.operators.conditions import Condition
from pyanomalydetector_spark.operators.detect import DetectorConfig

NON_CASCADE_KEYS = {"admdb", "data_sources", "logging", "view_sources"}
CONDS_ONLY_INTO_DATA_SOURCES = {"item_conds", "item_diff_conds"}


def _render(text: str, context: dict) -> str:
    return re.sub(r"\{\{\s*(\w+)\s*\}\}",
                  lambda m: str(context.get(m.group(1), m.group(0))), text)


def load_config(default_path: str, override_path: str | None = None,
                context: dict | None = None) -> dict:
    """Load defaults, merge an override per top-level key (dicts update,
    scalars/lists replace), render templates, cascade into data sources —
    the reference loader's exact pipeline."""
    ctx = dict(os.environ)
    ctx.update(context or {})

    # render templates over the RAW file text BEFORE parsing — the
    # reference renders after a yaml.dump round-trip (config_loader.py:49),
    # where a substituted value containing a quote/newline/# corrupts the
    # re-parse; raw-text-first has the same semantics for {{ VAR }}
    # interpolation without that failure mode
    def load_rendered(path: str) -> dict:
        with open(path) as f:
            return yaml.safe_load(_render(f.read(), ctx)) or {}

    conf = load_rendered(default_path)
    if override_path:
        for key, value in load_rendered(override_path).items():
            if isinstance(value, dict) and key in conf:
                conf[key].update(value)
            else:
                conf[key] = value

    _cascade(conf, "data_sources")
    _cascade(conf, "view_sources")
    return conf


def _cascade(conf: dict, target: str) -> None:
    for _, src in (conf.get(target) or {}).items():
        for key, value in conf.items():
            if key in NON_CASCADE_KEYS:
                continue
            if key in CONDS_ONLY_INTO_DATA_SOURCES and target != "data_sources":
                continue
            if key not in src:
                src[key] = value


def _source(conf: dict, data_source: str | None) -> dict:
    return conf["data_sources"][data_source] if data_source else conf


def suite_from_config(conf: dict, data_source: str | None = None) -> list[Check]:
    """``checks:`` list → Check suite. Each entry:
    ``{id, kind, params: {...}}`` — the declarative seed of the whole
    validation run; its content feeds ``suite_hash``, so editing a threshold
    in YAML invalidates checkpoint state exactly like a code change."""
    return [Check(c["id"], c["kind"], dict(c.get("params") or {}))
            for c in _source(conf, data_source).get("checks", [])]


def conditions_from_config(conf: dict, data_source: str | None = None,
                           key: str = "item_conds",
                           metric: str = "mean_h") -> list[Condition]:
    """``item_conds`` / ``item_diff_conds`` → Condition rules. The metric
    defaults mirror the reference: item_conds judge ``mean_h``,
    item_diff_conds judge ``diff`` (detector.py:247, 267). A rule may name
    its metric explicitly (engine extension)."""
    if key == "item_diff_conds" and metric == "mean_h":
        metric = "diff"
    out = []
    for rule in _source(conf, data_source).get(key) or []:
        cond = rule.get("condition")
        if cond is None:
            out.append(Condition(rule["filter"], rule.get("metric", metric),
                                 None, None))
        else:
            out.append(Condition(rule["filter"], rule.get("metric", metric),
                                 cond["operator"], float(cond["value"])))
    return out


def detector_config_from_source(src: dict) -> DetectorConfig:
    """Data-source threshold keys → DetectorConfig (the exact key names the
    reference's test configs use, tests/test_detector_all.py:24-38)."""
    fields = {f.name for f in dataclasses.fields(DetectorConfig)}
    return DetectorConfig(**{k: v for k, v in src.items() if k in fields})
