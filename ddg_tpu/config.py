"""Hydra-compatible configuration engine.

Hydra/OmegaConf are not available in this environment, so the framework
ships a compact engine preserving the reference's public config API
(/root/reference/configs/config.yaml, main.py:25-36):

  * YAML config groups composed through a `defaults` list
    (`/data: lm1b`, `/noise: loglinear`, `_self_`, `null` groups);
  * `${a.b}` interpolation (absolute), `${.sibling}` (relative), and
    resolver calls `${cwd:}`, `${device_count:}`, `${eval:expr}`,
    `${div_up:a, b}`, `${if_then_else:cond, a, b}`;
  * CLI-style overrides: `key=value` (replace / group select),
    `+key=value` (add new key), `~key` (delete), `key=null`.

Values resolve lazily at access time, so derived quantities
(accumulate_grad_batches, per-device batch sizes) follow overrides, as
with Hydra.
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict, List, Optional

import yaml

# ---------------------------------------------------------------------------
# Dot-access container
# ---------------------------------------------------------------------------


class Config:
    """Attribute/key access over a nested dict with interpolation."""

    def __init__(self, data: Dict[str, Any], root: 'Config' = None,
                 path: str = ''):
        object.__setattr__(self, '_data', data)
        object.__setattr__(self, '_root', root if root is not None else self)
        object.__setattr__(self, '_path', path)

    # -- access ------------------------------------------------------------
    def __getattr__(self, name: str):
        if name.startswith('_'):
            raise AttributeError(name)
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(
                f'Config key {self._join(name)!r} not found') from e

    def __getitem__(self, name: str):
        val = self._data[name]
        return self._wrap(val, name)

    def get(self, name: str, default=None):
        try:
            return self[name]
        except KeyError:
            return default

    def __contains__(self, name: str) -> bool:
        return name in self._data

    def __iter__(self):
        return iter(self._data)

    def keys(self):
        return self._data.keys()

    def items(self):
        return [(k, self[k]) for k in self._data]

    def _join(self, name):
        return f'{self._path}.{name}' if self._path else name

    def _wrap(self, val, name):
        if isinstance(val, dict):
            return Config(val, self._root, self._join(name))
        if isinstance(val, str):
            return _resolve_str(val, self._root, self)
        if isinstance(val, list):
            return [self._wrap(v, name) for v in val]
        return val

    # -- mutation (host-side config assembly only) -------------------------
    def __setattr__(self, name, value):
        self._data[name] = value

    def __setitem__(self, name, value):
        self._data[name] = value

    def to_dict(self, resolve: bool = True) -> Dict[str, Any]:
        if not resolve:
            return copy.deepcopy(self._data)
        out = {}
        for k in self._data:
            v = self[k]
            if isinstance(v, Config):
                out[k] = v.to_dict()
            elif isinstance(v, list):
                out[k] = [x.to_dict() if isinstance(x, Config) else x
                          for x in v]
            else:
                out[k] = v
        return out

    def pretty(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)

    def __repr__(self):
        return f'Config({self._data!r})'


# ---------------------------------------------------------------------------
# Interpolation
# ---------------------------------------------------------------------------

def _device_count() -> int:
    try:
        import jax
        return jax.device_count()
    except Exception:
        return 1


RESOLVERS = {
    'cwd': lambda: os.getcwd(),
    'device_count': _device_count,
    'eval': lambda expr: eval(expr),  # noqa: S307 (parity with reference)
    'div_up': lambda x, y: (int(x) + int(y) - 1) // int(y),
    'if_then_else': lambda cond, a, b: a if cond else b,
}


def _parse_scalar(s: str):
    try:
        return yaml.safe_load(s)
    except Exception:
        return s


def _lookup(root: Config, local: Config, ref: str):
    if ref.startswith('.'):
        node = local
        ref = ref[1:]
        while ref.startswith('.'):
            raise KeyError(f'multi-level relative ref not supported: {ref}')
    else:
        node = root
    cur: Any = node
    for part in ref.split('.'):
        cur = cur[part]
    return cur


def _find_interpolation(s: str):
    """Find the first ${...} with balanced nesting; returns (start, end)."""
    start = s.find('${')
    if start < 0:
        return None
    depth = 0
    i = start
    while i < len(s):
        if s.startswith('${', i):
            depth += 1
            i += 2
            continue
        if s[i] == '}':
            depth -= 1
            if depth == 0:
                return start, i + 1
        i += 1
    raise ValueError(f'unbalanced interpolation in {s!r}')


def _split_args(s: str) -> List[str]:
    """Split resolver args on top-level commas."""
    out, depth, cur = [], 0, ''
    for ch in s:
        if ch == ',' and depth == 0:
            out.append(cur)
            cur = ''
        else:
            if ch in '$({[':
                depth += ch != '$'
            elif ch in ')}]':
                depth -= 1
            cur += ch
    out.append(cur)
    return out


def _resolve_str(s: str, root: Config, local: Config):
    span = _find_interpolation(s)
    if span is None:
        return s
    start, end = span
    inner = s[start + 2:end - 1]
    # Recursively resolve nested interpolations inside the expression.
    while (isp := _find_interpolation(inner)) is not None:
        a, b = isp
        inner = inner[:a] + str(
            _resolve_str(inner[a:b], root, local)) + inner[b:]

    if ':' in inner and inner.split(':', 1)[0] in RESOLVERS:
        name, argstr = inner.split(':', 1)
        args = [_parse_scalar(a.strip())
                for a in _split_args(argstr)] if argstr.strip() else []
        val = RESOLVERS[name](*args)
    else:
        val = _lookup(root, local, inner)
        if isinstance(val, Config):
            val = val.to_dict()

    if start == 0 and end == len(s):
        return val
    rest = s[:start] + str(val) + s[end:]
    return _resolve_str(rest, root, local)


# ---------------------------------------------------------------------------
# Composition
# ---------------------------------------------------------------------------

def _deep_merge(dst: Dict, src: Dict) -> Dict:
    for k, v in src.items():
        if (k in dst and isinstance(dst[k], dict)
                and isinstance(v, dict)):
            _deep_merge(dst[k], v)
        else:
            dst[k] = copy.deepcopy(v)
    return dst


def _load_group_file(config_dir: str, group: str, option: str) -> Dict:
    path = os.path.join(config_dir, group.lstrip('/'), f'{option}.yaml')
    with open(path) as f:
        return yaml.safe_load(f) or {}


def load_config(config_dir: str, config_name: str = 'config',
                overrides: Optional[List[str]] = None) -> Config:
    """Compose the root config with its defaults list + CLI overrides."""
    overrides = list(overrides or [])
    with open(os.path.join(config_dir, f'{config_name}.yaml')) as f:
        raw = yaml.safe_load(f) or {}
    defaults = raw.pop('defaults', [])

    # Group selections may be overridden by `group=option` CLI entries.
    group_overrides = {}
    kv_overrides = []
    for ov in overrides:
        if ov.startswith('~'):
            kv_overrides.append(ov)
            continue
        add = ov.startswith('+')
        key, _, value = ov.lstrip('+').partition('=')
        if (not add and '.' not in key
                and _group_exists(config_dir, key)):
            group_overrides[key] = value
        else:
            kv_overrides.append(ov)

    merged: Dict[str, Any] = {}
    self_merged = False
    for entry in defaults:
        if entry == '_self_':
            _deep_merge(merged, raw)
            self_merged = True
            continue
        if isinstance(entry, str):
            continue
        (group, option), = entry.items()
        group_key = group.lstrip('/')
        option = group_overrides.pop(group_key, option)
        if option is None or option == 'null':
            merged.setdefault(group_key, None)
            continue
        if isinstance(option, list):
            sub = {}
            for opt in option:
                _deep_merge(sub, {opt: _load_group_file(
                    config_dir, group_key, opt)})
            _deep_merge(merged, {group_key: sub})
        else:
            _deep_merge(merged,
                        {group_key: _load_group_file(
                            config_dir, group_key, option)})
    if not self_merged:
        _deep_merge(merged, raw)
    # Remaining group overrides (group wasn't in defaults):
    for group_key, option in group_overrides.items():
        merged[group_key] = _load_group_file(config_dir, group_key,
                                             option)

    for ov in kv_overrides:
        _apply_override(merged, ov)
    return Config(merged)


def _group_exists(config_dir: str, group: str) -> bool:
    return os.path.isdir(os.path.join(config_dir, group))


def _apply_override(data: Dict, override: str) -> None:
    if override.startswith('~'):
        parts = override[1:].split('.')
        cur = data
        for p in parts[:-1]:
            cur = cur[p]
        cur.pop(parts[-1], None)
        return
    add = override.startswith('+')
    key, _, value = override.lstrip('+').partition('=')
    parts = key.split('.')
    cur = data
    for p in parts[:-1]:
        if p not in cur or cur[p] is None:
            if not add:
                raise KeyError(
                    f'Override path {key!r} not in config (use +{key})')
            cur[p] = {}
        cur = cur[p]
    if not add and parts[-1] not in cur:
        raise KeyError(
            f'Override key {key!r} not in config (use +{key} to add)')
    cur[parts[-1]] = _parse_scalar(value)
