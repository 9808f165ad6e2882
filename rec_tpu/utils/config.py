"""Dataclass config system with Sacred-style CLI overrides.

The reference uses Sacred experiments with ``python file.py with key=value``
(ref README.md:24-29, train_generative_model.py:33-164).  Here configs are
frozen dataclasses; ``apply_overrides`` accepts ``key=value`` tokens (dotted
paths descend into nested dataclasses) with literal-eval'd values, and
``print_config`` mirrors Sacred's print_config.
"""

from __future__ import annotations

import ast
import dataclasses
from typing import Any, List, Sequence


def _convert(value: str) -> Any:
    # Accept shell-style booleans/none: `verify=false` must not become the
    # truthy string "false".
    low = value.lower()
    if low in ("true", "false"):
        return low == "true"
    if low in ("none", "null"):
        return None
    try:
        return ast.literal_eval(value)
    except (ValueError, SyntaxError):
        return value


def apply_overrides(cfg: Any, tokens: Sequence[str]) -> Any:
    """Return a copy of ``cfg`` with ``key=value`` / ``a.b=value`` applied.
    Tokens without '=' (e.g. a leading "with") are ignored."""
    for token in tokens:
        if "=" not in token:
            continue
        key, value = token.split("=", 1)
        cfg = _set_path(cfg, key.split("."), _convert(value))
    return cfg


def _set_path(cfg: Any, path: List[str], value: Any) -> Any:
    name = path[0]
    if not hasattr(cfg, name):
        raise KeyError(f"unknown config key {name!r} on {type(cfg).__name__}")
    if len(path) == 1:
        return dataclasses.replace(cfg, **{name: value})
    return dataclasses.replace(
        cfg, **{name: _set_path(getattr(cfg, name), path[1:], value)})


def print_config(cfg: Any, indent: int = 0) -> None:
    pad = "  " * indent
    for f in dataclasses.fields(cfg):
        v = getattr(cfg, f.name)
        if dataclasses.is_dataclass(v):
            print(f"{pad}{f.name}:")
            print_config(v, indent + 1)
        else:
            print(f"{pad}{f.name} = {v!r}")
