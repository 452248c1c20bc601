"""YAML config system with single-inheritance chaining.

API-parity with the reference config loader (reference: config.py:4-52):
configs may contain an ``inherit_from`` key pointing at a parent YAML; parents
are loaded recursively and child keys are deep-merged over parent keys.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import yaml


def update_recursive(dst: Dict[str, Any], src: Dict[str, Any]) -> None:
    """Deep-merge ``src`` into ``dst`` in place (child overrides parent)."""
    for k, v in src.items():
        if k not in dst:
            dst[k] = dict() if isinstance(v, dict) else v
        if isinstance(v, dict):
            if not isinstance(dst[k], dict):
                dst[k] = dict()
            update_recursive(dst[k], v)
        else:
            dst[k] = v


def load_config(path: str, default_path: str | None = None) -> Dict[str, Any]:
    """Load a YAML config, resolving the ``inherit_from`` chain recursively.

    Relative ``inherit_from`` paths are resolved against the current working
    directory first (matching the reference behavior of paths like
    ``configs/BS3D/BS3D.yaml``), then against the directory of the child file.
    """
    with open(path, "r") as f:
        cfg_special = yaml.full_load(f)

    inherit_from = cfg_special.get("inherit_from")

    if inherit_from is not None:
        candidates = [
            inherit_from,
            os.path.join(os.path.dirname(os.path.abspath(path)), inherit_from),
            os.path.join(os.path.dirname(os.path.abspath(path)), "..", inherit_from),
        ]
        for cand in candidates:
            if os.path.exists(cand):
                inherit_from = cand
                break
        cfg = load_config(inherit_from, default_path)
    elif default_path is not None:
        with open(default_path, "r") as f:
            cfg = yaml.full_load(f)
    else:
        cfg = dict()

    update_recursive(cfg, cfg_special)
    return cfg
