"""Lightweight YAML config system with dotted CLI overrides.

Replaces the reference's Hydra/OmegaConf layer (track_mjx/train.py:56 and
io/load.py:41-58) without the dependency: configs are YAML files loaded into
attribute-accessible dicts; overrides use the same `a.b.c=value` dotted syntax
as Hydra CLI overrides, with YAML-typed values.
"""

from __future__ import annotations

import copy
from pathlib import Path
from typing import Any, Iterable, Optional, Union

import yaml

CONFIG_DIR = Path(__file__).resolve().parent.parent / "config"


class ConfigDict(dict):
    """dict with attribute access, deep conversion, and to_dict()."""

    def __init__(self, data: Optional[dict] = None):
        super().__init__()
        for k, v in (data or {}).items():
            self[k] = _convert(v)

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = _convert(value)

    def __setitem__(self, key, value):
        super().__setitem__(key, _convert(value))

    def to_dict(self) -> dict:
        """Plain nested dict (JSON/YAML serializable)."""

        def conv(v):
            if isinstance(v, ConfigDict):
                return {k: conv(x) for k, x in v.items()}
            if isinstance(v, list):
                return [conv(x) for x in v]
            return v

        return {k: conv(v) for k, v in self.items()}

    def copy(self) -> "ConfigDict":
        return ConfigDict(copy.deepcopy(self.to_dict()))


def _convert(v: Any) -> Any:
    if isinstance(v, ConfigDict):
        return v
    if isinstance(v, dict):
        return ConfigDict(v)
    if isinstance(v, list):
        return [_convert(x) for x in v]
    return v


def load_config(
    name_or_path: Union[str, Path],
    overrides: Iterable[str] = (),
    config_dir: Optional[Union[str, Path]] = None,
) -> ConfigDict:
    """Loads `<config_dir>/<name>.yaml` (or an explicit path) and applies
    dotted overrides like "train_setup.train_config.num_envs=128"."""
    config_dir = Path(config_dir) if config_dir else CONFIG_DIR
    path = Path(name_or_path)
    if not path.suffix:
        path = path.with_suffix(".yaml")
    if not path.is_absolute() and not path.exists():
        path = config_dir / path
    with open(path) as f:
        cfg = ConfigDict(yaml.safe_load(f) or {})
    return apply_overrides(cfg, overrides)


def apply_overrides(cfg: ConfigDict, overrides: Iterable[str]) -> ConfigDict:
    """Applies `a.b.c=value` overrides in place (values parsed as YAML)."""
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override '{ov}' is not of the form key=value")
        key, _, raw = ov.partition("=")
        value = yaml.safe_load(raw) if raw != "" else None
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            if p not in node or not isinstance(node[p], ConfigDict):
                node[p] = ConfigDict()
            node = node[p]
        node[parts[-1]] = value
    return cfg
