"""Lightweight Hydra-style config composition (YAML + defaults + overrides).

Reference analog: Hydra 1.3 over ``configs/`` (SURVEY.md §5 "Config / flag
system").  Hydra isn't available in this environment, so this module
implements the subset the framework needs:

  * a root config with a ``defaults`` list of ``group: name`` entries,
  * group YAMLs under ``<config_dir>/<group>/<name>.yaml`` merged into the
    root under the group key,
  * experiment overlays (``experiment=<name>``) deep-merged last over the
    whole tree (the analog of ``# @package _global_`` overlays),
  * dotted CLI overrides ``a.b.c=value`` (values YAML-parsed), including
    selecting a different group file via ``<group>=<name>``,
  * ``${a.b}`` interpolation resolved after merging.
"""

from __future__ import annotations

import copy
import os
import re
from typing import Any, Dict, List, Optional, Sequence

import yaml

_INTERP = re.compile(r"^\$\{([^}]+)\}$")
_INTERP_INLINE = re.compile(r"\$\{([^}]+)\}")


def deep_merge(base: Dict, overlay: Dict) -> Dict:
    out = dict(base)
    for k, v in overlay.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _load_yaml(path: str) -> Dict:
    with open(path) as f:
        return yaml.safe_load(f) or {}


_SCI_FLOAT = re.compile(r"^[+-]?\d+(\.\d*)?[eE][+-]?\d+$")


def _parse_override_value(val: str) -> Any:
    """YAML-parse a CLI override value.  pyyaml implements YAML 1.1, whose
    float grammar requires a dot before the exponent — ``lr=1e-05`` parses
    as the STRING '1e-05' (and then reaches the optimizer as a string; a
    TPE sweep hitting its log-uniform bound produced exactly this).  Treat
    bare scientific notation as float.

    Accepted tradeoff (ADVICE r3): a value INTENDED as a string that looks
    like bare scientific notation (e.g. a run name ``2e5``) is coerced too —
    quote it through the shell to keep it a string: ``name='"2e5"'``."""
    parsed = yaml.safe_load(val)
    if isinstance(parsed, str) and _SCI_FLOAT.match(parsed):
        return float(parsed)
    return parsed


def _get_path(cfg: Dict, dotted: str) -> Any:
    node: Any = cfg
    for part in dotted.split("."):
        node = node[part]
    return node


def _set_path(cfg: Dict, dotted: str, value: Any) -> None:
    parts = dotted.split(".")
    node = cfg
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _resolve_interpolations(cfg: Dict) -> Dict:
    def resolve(node: Any, depth: int = 0) -> Any:
        if depth > 20:
            raise ValueError("interpolation cycle")
        if isinstance(node, dict):
            return {k: resolve(v, depth) for k, v in node.items()}
        if isinstance(node, list):
            return [resolve(v, depth) for v in node]
        if isinstance(node, str):
            m = _INTERP.match(node)
            if m:
                return resolve(_get_path(cfg, m.group(1)), depth + 1)
            return _INTERP_INLINE.sub(
                lambda mm: str(resolve(_get_path(cfg, mm.group(1)), depth + 1)), node
            )
        return node

    return resolve(cfg)


def compose(
    config_dir: str,
    config_name: str = "train",
    overrides: Optional[Sequence[str]] = None,
) -> Dict:
    """Compose the config tree.

    ``overrides``: e.g. ``["experiment=nrms_demo", "data.batch_size=32",
    "model=naml"]``.
    """
    overrides = list(overrides or [])
    root = _load_yaml(os.path.join(config_dir, f"{config_name}.yaml"))
    defaults: List = root.pop("defaults", [])

    # group selection overrides (group=name) replace entries in defaults
    group_sel: Dict[str, str] = {}
    leaf_overrides: List[str] = []
    experiment = None
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"invalid override {ov!r}")
        key, val = ov.split("=", 1)
        if key == "experiment":
            experiment = val
        elif "." not in key and os.path.isdir(os.path.join(config_dir, key)):
            group_sel[key] = val
        else:
            leaf_overrides.append(ov)

    cli_groups = set(group_sel)
    cfg: Dict = dict(root)
    for entry in defaults:
        if isinstance(entry, str):
            if entry == "_self_":
                continue
            group, name = entry.split("/", 1) if "/" in entry else (entry, None)
        else:
            (group, name), = entry.items()
        name = group_sel.pop(group, name)
        if name in (None, "null"):
            continue
        group_cfg = _load_yaml(os.path.join(config_dir, group, f"{name}.yaml"))
        cfg = deep_merge(cfg, {group: group_cfg})
    # groups selected on the CLI but absent from defaults
    for group, name in group_sel.items():
        group_cfg = _load_yaml(os.path.join(config_dir, group, f"{name}.yaml"))
        cfg = deep_merge(cfg, {group: group_cfg})

    if experiment:
        exp = _load_yaml(os.path.join(config_dir, "experiment", f"{experiment}.yaml"))
        # experiment files may themselves select groups via a defaults list —
        # but explicit CLI group selections (group=name) take precedence
        for entry in exp.pop("defaults", []):
            if isinstance(entry, str):
                continue
            (group, name), = entry.items()
            group = group.removeprefix("override /").removeprefix("/")
            if name in (None, "null") or group in cli_groups:
                continue
            group_cfg = _load_yaml(os.path.join(config_dir, group, f"{name}.yaml"))
            cfg[group] = group_cfg
        # drop experiment leaf-overrides for groups the CLI re-selected
        for group in cli_groups:
            exp.pop(group, None)
        cfg = deep_merge(cfg, exp)
        cfg["experiment_name"] = experiment

    for ov in leaf_overrides:
        key, val = ov.split("=", 1)
        _set_path(cfg, key, _parse_override_value(val))

    return _resolve_interpolations(cfg)
