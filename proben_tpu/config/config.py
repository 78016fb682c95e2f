"""Minimal yacs-compatible config system (reference ``detectron2/config/``).

``CfgNode``: attribute-style nested dict with YAML loading, ``_BASE_``
inheritance, dotted-key list overrides, cloning and freezing — the surface the
reference's configs and demos rely on (``get_cfg``, ``merge_from_file``,
``merge_from_list``)."""

from __future__ import annotations

import copy
import os
from typing import Any, Dict, List, Sequence

import yaml

BASE_KEY = "_BASE_"


class CfgNode(dict):
    def __init__(self, init: Dict = None):
        super().__init__()
        object.__setattr__(self, "_frozen", False)
        for k, v in (init or {}).items():
            self[k] = CfgNode(v) if isinstance(v, dict) else v

    # attribute access -----------------------------------------------------
    def __getattr__(self, name: str):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name: str, value: Any):
        if getattr(self, "_frozen", False):
            raise AttributeError(f"cannot set {name} on a frozen CfgNode")
        self[name] = CfgNode(value) if isinstance(value, dict) and not isinstance(value, CfgNode) else value

    # lifecycle ------------------------------------------------------------
    def clone(self) -> "CfgNode":
        return copy.deepcopy(self)

    def freeze(self):
        object.__setattr__(self, "_frozen", True)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.freeze()

    def defrost(self):
        object.__setattr__(self, "_frozen", False)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.defrost()

    def __deepcopy__(self, memo):
        out = CfgNode()
        for k, v in self.items():
            out[k] = copy.deepcopy(v, memo)
        return out

    # merging --------------------------------------------------------------
    def merge_from_other(self, other: "CfgNode"):
        for k, v in other.items():
            if isinstance(v, dict) and isinstance(self.get(k), CfgNode):
                self[k].merge_from_other(v)
            else:
                self[k] = CfgNode(v) if isinstance(v, dict) else v

    def merge_from_file(self, path: str, allow_unsafe: bool = False):
        with open(path) as f:
            loaded = yaml.safe_load(f) or {}
        if BASE_KEY in loaded:
            base = loaded.pop(BASE_KEY)
            if not os.path.isabs(base):
                base = os.path.join(os.path.dirname(path), base)
            self.merge_from_file(base)
        loaded = CfgNode(loaded)

        # VERSION migration (reference config.py merge_from_file + compat.py):
        # downgrade defaults to the file's schema, merge, upgrade back
        self_ver = self.get("VERSION")
        if self_ver is not None:
            from .compat import downgrade_config, guess_version, upgrade_config

            loaded_ver = loaded.get("VERSION")
            if loaded_ver is None:
                loaded_ver = guess_version(loaded, path)
            if loaded_ver > self_ver:
                raise ValueError(
                    f"config {path} is v{loaded_ver}, newer than runtime v{self_ver}"
                )
            if loaded_ver < self_ver:
                old_self = downgrade_config(self, to_version=loaded_ver)
                old_self.merge_from_other(loaded)
                upgraded = upgrade_config(old_self, to_version=self_ver)
                self.clear()
                self.merge_from_other(upgraded)
                return
        self.merge_from_other(loaded)

    def merge_from_list(self, opts: Sequence):
        assert len(opts) % 2 == 0, f"override list must be key value pairs, got {opts}"
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            leaf = parts[-1]
            old = node.get(leaf)
            node[leaf] = _coerce(value, old)

    def dump(self) -> str:
        def plain(d):
            return {k: plain(v) if isinstance(v, dict) else v for k, v in d.items()}

        return yaml.safe_dump(plain(self), default_flow_style=None)


def _coerce(value: Any, old: Any) -> Any:
    """Parse a CLI string override to the type of the existing value."""
    if not isinstance(value, str):
        return value
    try:
        parsed = yaml.safe_load(value)
    except yaml.YAMLError:
        parsed = value
    if isinstance(old, tuple) and isinstance(parsed, list):
        parsed = tuple(parsed)
    return parsed
