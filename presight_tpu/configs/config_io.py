"""Config (de)serialization + CLI overrides for nested frozen dataclasses.

Reference spec: the nerfstudio config system (configs/base_config.py:47-54
typed dataclasses, method registry method_configs.py:67-465, tyro CLI with
`--a.b.c value` overrides, per-run `config.yml` reloaded verbatim by
eval/extraction — utils/eval_utils.py:68-110). tyro is not available in
this environment, so this module provides the same contract with a small
dependency-free implementation: yaml round-trip of nested dataclasses and
dotted-path CLI overrides with field-type coercion.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict, Tuple, Type, get_args, get_origin


def to_dict(obj: Any) -> Any:
    """Nested dataclass -> plain python (json/yaml-safe)."""
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        out = {"__dataclass__": f"{type(obj).__module__}.{type(obj).__qualname__}"}
        for f in dataclasses.fields(obj):
            out[f.name] = to_dict(getattr(obj, f.name))
        return out
    if isinstance(obj, Path):
        return {"__path__": str(obj)}
    if isinstance(obj, (tuple, list)):
        return [to_dict(v) for v in obj]
    if isinstance(obj, dict):
        return {k: to_dict(v) for k, v in obj.items()}
    return obj


def _import_type(qualname: str) -> Type:
    mod, _, name = qualname.rpartition(".")
    import importlib

    m = importlib.import_module(mod)
    return getattr(m, name)


def from_dict(data: Any) -> Any:
    """Inverse of to_dict."""
    if isinstance(data, dict):
        if "__path__" in data:
            return Path(data["__path__"])
        if "__dataclass__" in data:
            cls = _import_type(data["__dataclass__"])
            kwargs = {k: from_dict(v) for k, v in data.items() if k != "__dataclass__"}
            # Tuples come back as lists; coerce via field types where declared.
            field_types = {f.name: f.type for f in dataclasses.fields(cls)}
            for k, v in list(kwargs.items()):
                if isinstance(v, list):
                    kwargs[k] = tuple(v)
            return cls(**kwargs)
        return {k: from_dict(v) for k, v in data.items()}
    if isinstance(data, list):
        return [from_dict(v) for v in data]
    return data


def save_config(config: Any, path: Path) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    try:
        import yaml

        path.write_text(yaml.safe_dump(to_dict(config), sort_keys=False))
    except ImportError:
        path.with_suffix(".json").write_text(json.dumps(to_dict(config), indent=2))


def load_config(path: Path) -> Any:
    path = Path(path)
    if path.exists():
        import yaml

        return from_dict(yaml.safe_load(path.read_text()))
    jpath = path.with_suffix(".json")
    if jpath.exists():
        return from_dict(json.loads(jpath.read_text()))
    raise FileNotFoundError(path)


def _coerce(value: str, typ) -> Any:
    origin = get_origin(typ)
    if typ in (int,) or typ == "int":
        return int(value)
    if typ in (float,) or typ == "float":
        return float(value)
    if typ in (bool,) or typ == "bool":
        return value.lower() in ("1", "true", "yes", "on")
    if typ in (Path,) or typ == "Path" or typ == "pathlib.Path":
        return Path(value)
    if origin in (tuple, list):
        args = get_args(typ)
        elem = args[0] if args else str
        parts = [p for p in value.replace(",", " ").split() if p]
        return tuple(_coerce(p, elem) for p in parts)
    if origin is not None:  # Optional[...] etc.
        args = [a for a in get_args(typ) if a is not type(None)]
        if args:
            return _coerce(value, args[0])
    return value


def apply_overrides(config: Any, overrides: Dict[str, str]) -> Any:
    """Apply {'pipeline.model.num_levels': '8'} style overrides to a nested
    frozen dataclass (tyro-style dotted paths; '-' and '_' both accepted)."""
    import typing

    for dotted, raw in overrides.items():
        parts = dotted.replace("-", "_").split(".")
        config = _apply_one(config, parts, raw)
    return config


def _apply_one(obj: Any, parts, raw: str) -> Any:
    name = parts[0]
    if dataclasses.is_dataclass(obj):
        field_map = {f.name: f for f in dataclasses.fields(obj)}
        if name not in field_map:
            raise KeyError(f"unknown config field: {name} on {type(obj).__name__}")
        current = getattr(obj, name)
        if len(parts) == 1:
            try:
                hints = __import__("typing").get_type_hints(type(obj))
                typ = hints.get(name, str)
            except Exception:  # noqa: BLE001
                typ = type(current) if current is not None else str
            new = _coerce(raw, typ)
        else:
            new = _apply_one(current, parts[1:], raw)
        return dataclasses.replace(obj, **{name: new})
    if isinstance(obj, dict):
        key = name
        if key not in obj and name.isdigit():
            key = int(name)
        new_inner = _apply_one(obj[key], parts[1:], raw) if len(parts) > 1 else raw
        out = dict(obj)
        out[key] = new_inner
        return out
    raise TypeError(f"cannot override into {type(obj)}")


def parse_cli_overrides(argv) -> Dict[str, str]:
    """['--a.b', '1', '--c', '2'] -> {'a.b': '1', 'c': '2'}"""
    out: Dict[str, str] = {}
    i = 0
    while i < len(argv):
        tok = argv[i]
        if not tok.startswith("--"):
            raise ValueError(f"expected --key, got {tok}")
        key = tok[2:]
        if "=" in key:
            key, val = key.split("=", 1)
            out[key] = val
            i += 1
        else:
            if i + 1 >= len(argv):
                raise ValueError(f"missing value for {tok}")
            out[key] = argv[i + 1]
            i += 2
    return out
