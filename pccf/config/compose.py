"""Native YAML config composition: Hydra-compatible surface, zero dependencies.

Implements the subset of Hydra used by the reference config tree
(/root/reference/configs, e.g. ``configs/experiment/defaults.yaml``):

- ``defaults:`` lists with group entries (``- model: vqvae``), relative
  entries (``- ../optuna``), ``_self_`` ordering and bare includes.
- ``${dotted.path}`` interpolation resolved against the merged tree.
- Dotted CLI overrides (``a.b.c=value``) with YAML-typed values, ``+a.b=v``
  additions, ``~a.b`` deletions and group selections (``data/dataset=shapenet``).
- ``# @package _global_`` header directive.

The result is a plain nested dict ready for pydantic validation.
"""

from __future__ import annotations

import copy
import functools
import pathlib
import re
from typing import Any

import yaml

_INTERP_RE = re.compile(r'\$\{([a-zA-Z0-9_.]+)\}')
# pyyaml implements YAML 1.1, where `1e-3` (no dot) is a *string*; configs and
# CLI overrides use scientific notation freely, so coerce such strings
_SCI_RE = re.compile(r'^[+-]?(\d+\.?\d*|\.\d+)[eE][+-]?\d+$')


def _coerce_numbers(node: Any) -> Any:
    """Recursively convert YAML-1.1 stringified scientific notation to float."""
    if isinstance(node, str) and _SCI_RE.match(node):
        return float(node)
    if isinstance(node, dict):
        return {k: _coerce_numbers(v) for k, v in node.items()}
    if isinstance(node, list):
        return [_coerce_numbers(v) for v in node]
    return node


class ComposeError(RuntimeError):
    pass


@functools.lru_cache(maxsize=256)
def _read_yaml_cached(path_str: str, _mtime_ns: int) -> tuple[dict[str, Any], str | None]:
    text = pathlib.Path(path_str).read_text()
    package = None
    for line in text.splitlines()[:5]:
        m = re.match(r'#\s*@package\s+(\S+)', line)
        if m:
            package = m.group(1)
            break
    data = _coerce_numbers(yaml.safe_load(text))
    if data is None:
        data = {}
    if not isinstance(data, dict):
        raise ComposeError(f'{path_str}: top-level YAML must be a mapping')
    return data, package


def _read_yaml(path: pathlib.Path) -> tuple[dict[str, Any], str | None]:
    """Read YAML; return (content, package directive).

    Parse results are memoized on (path, mtime): composition consults each
    group option file twice (content + package directive), and callers
    mutate the returned dict — hence the defensive deepcopy, still far
    cheaper than re-read + parse + number coercion."""
    data, package = _read_yaml_cached(str(path), path.stat().st_mtime_ns)
    return copy.deepcopy(data), package


def _deep_merge(base: dict[str, Any], overlay: dict[str, Any]) -> dict[str, Any]:
    """Merge overlay into base (overlay wins); dicts merge recursively."""
    out = dict(base)
    for k, v in overlay.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _set_path(tree: dict[str, Any], dotted: str, value: Any) -> None:
    parts = dotted.split('.')
    node: Any = tree
    for i, p in enumerate(parts[:-1]):
        if isinstance(node, list) and p.lstrip('-').isdigit():
            node = node[int(p)]
            continue
        nxt = node.get(p)
        if not isinstance(nxt, (dict, list)):
            nxt = {}
            node[p] = nxt
        node = nxt
    last = parts[-1]
    if isinstance(node, list) and last.lstrip('-').isdigit():
        node[int(last)] = value
    else:
        node[last] = value


def _get_path(tree: Any, dotted: str) -> Any:
    node = tree
    for p in dotted.split('.'):
        if isinstance(node, dict):
            if p not in node:
                raise KeyError(dotted)
            node = node[p]
        elif isinstance(node, (list, tuple)) and p.lstrip('-').isdigit():
            node = node[int(p)]
        else:
            raise KeyError(dotted)
    return node


def _del_path(tree: dict[str, Any], dotted: str) -> None:
    parts = dotted.split('.')
    node = tree
    for p in parts[:-1]:
        node = node[p]
    del node[parts[-1]]


def _compose_file(
    path: pathlib.Path, groups: dict[str, str], used: set[str] | None = None
) -> dict[str, Any]:
    """Load a YAML file, recursively resolving its defaults list.

    ``groups`` maps group paths *relative to this file* (e.g. ``model`` or
    ``model/encoder``) to the selected option name; group keys consumed by a
    defaults entry (at any depth) are recorded in ``used`` so the caller can
    reject typo'd selections.
    """
    used = set() if used is None else used
    data, _package = _read_yaml(path)
    defaults = data.pop('defaults', None)
    own = data
    if defaults is None:
        return own
    merged: dict[str, Any] = {}
    self_done = False
    for entry in defaults:
        if entry == '_self_':
            merged = _deep_merge(merged, own)
            self_done = True
            continue
        if isinstance(entry, str):
            # bare include: relative file (e.g. ../optuna); schema registration
            # names with no file (e.g. all_config) are no-ops.
            candidate = (path.parent / f'{entry}.yaml').resolve()
            if candidate.exists():
                merged = _deep_merge(merged, _compose_file(candidate, {}))
            continue
        if isinstance(entry, dict):
            [(group, name)] = entry.items()
            if group in groups:
                name = groups[group]
                used.add(group)
            if name is None:
                continue
            sub_path = path.parent / group / f'{name}.yaml'
            if not sub_path.exists():
                raise ComposeError(f'{path}: missing config group file {sub_path}')
            nested = {g.split('/', 1)[1]: n for g, n in groups.items() if g.startswith(f'{group}/')}
            nested_used: set[str] = set()
            sub = _compose_file(sub_path, nested, nested_used)
            used.update(f'{group}/{u}' for u in nested_used)
            _, sub_package = _read_yaml(sub_path)
            if sub_package == '_global_':
                # '# @package _global_' places the option's keys at the root
                # instead of under the group key (Hydra semantics)
                merged = _deep_merge(merged, sub)
            elif sub_package and sub_package != '_group_':
                placed: dict[str, Any] = {}
                _set_path(placed, sub_package, sub)
                merged = _deep_merge(merged, placed)
            else:
                merged = _deep_merge(merged, {group.split('/')[-1]: sub})
            continue
        raise ComposeError(f'{path}: bad defaults entry {entry!r}')
    if not self_done:
        merged = _deep_merge(merged, own)
    return merged


def _resolve_interpolations(tree: dict[str, Any]) -> dict[str, Any]:
    """Resolve ${a.b.c} references (possibly chained) against the root tree."""

    def resolve(node: Any, depth: int = 0) -> Any:
        if depth > 20:
            raise ComposeError('interpolation depth exceeded (cycle?)')
        if isinstance(node, str):
            m = _INTERP_RE.fullmatch(node)
            if m:  # whole-value reference keeps the referent's type
                return resolve(_get_path(tree, m.group(1)), depth + 1)
            return _INTERP_RE.sub(
                lambda mm: str(resolve(_get_path(tree, mm.group(1)), depth + 1)), node
            )
        if isinstance(node, dict):
            return {k: resolve(v, depth) for k, v in node.items()}
        if isinstance(node, list):
            return [resolve(v, depth) for v in node]
        return node

    for _ in range(10):  # iterate to fixpoint (references to references)
        new = resolve(tree)
        if new == tree:
            return new
        tree = new
    return tree


def _parse_override_value(raw: str) -> Any:
    try:
        return _coerce_numbers(yaml.safe_load(raw))
    except yaml.YAMLError:
        return raw


def apply_overrides(tree: dict[str, Any], overrides: list[str]) -> dict[str, Any]:
    """Apply dotted CLI value overrides to a composed tree (Hydra syntax).

    Hydra strictness: a plain ``a.b.c=v`` must target an existing key — a
    typo'd path would otherwise create a junk key that validation ignores
    while the user believes the override took effect.  ``+a.b.c=v`` adds a
    new key explicitly."""
    tree = copy.deepcopy(tree)
    for ov in overrides:
        ov = ov.strip()
        if not ov:
            continue
        if ov.startswith('~'):
            # Hydra grammar: '~a.b.c' deletes; '~a.b.c=v' also deletes (the
            # value is advisory). Same friendly strictness as plain
            # overrides: a typo'd path must not escape as a raw KeyError.
            key = ov[1:].split('=', 1)[0]
            try:
                _del_path(tree, key)
            except KeyError:
                raise ComposeError(
                    f'deletion override key {key!r} does not exist in the '
                    f'composed config'
                ) from None
            continue
        additive = ov.startswith('+')
        if additive:
            ov = ov[1:]
        if '=' not in ov:
            raise ComposeError(f'override {ov!r} must be key=value')
        key, raw = ov.split('=', 1)
        if not additive:
            try:
                _get_path(tree, key)
            except KeyError:
                raise ComposeError(
                    f'override key {key!r} does not exist in the composed config; '
                    f"prefix with '+' to add a new key"
                ) from None
        _set_path(tree, key, _parse_override_value(raw))
    return tree


def split_overrides(overrides: list[str]) -> tuple[dict[str, str], list[str]]:
    """Split CLI overrides into group selections and value overrides."""
    groups: dict[str, str] = {}
    values: list[str] = []
    for ov in overrides:
        key = ov.split('=', 1)[0]
        if '=' in ov and '/' in key and not ov.startswith(('+', '~')):
            groups[key] = ov.split('=', 1)[1]
        else:
            values.append(ov)
    return groups, values


def compose(
    config_path: str | pathlib.Path,
    config_name: str = 'defaults',
    overrides: list[str] | None = None,
    group_overrides: dict[str, str] | None = None,
) -> dict[str, Any]:
    """Compose a config tree (Hydra-style).

    Args:
        config_path: directory holding the YAML tree (e.g. ``configs/experiment``).
        config_name: root file name without extension.
        overrides: dotted CLI overrides applied after composition; entries with
            a ``/`` in the key select config-group options instead.
        group_overrides: extra group selections merged with those parsed from
            ``overrides``.

    Returns:
        Plain nested dict with interpolations resolved.
    """
    root_dir = pathlib.Path(config_path)
    root_file = root_dir / f'{config_name}.yaml'
    if not root_file.exists():
        raise ComposeError(f'config root {root_file} not found')
    groups, value_overrides = split_overrides(list(overrides or []))
    # a plain key=value whose key names a config-group directory is a group
    # selection (Hydra semantics: `tune=learn` selects configs/.../tune/learn.yaml)
    remaining = []
    for ov in value_overrides:
        key = ov.split('=', 1)[0].lstrip('+~')
        if '=' in ov and '.' not in key and (root_dir / key).is_dir():
            groups[key] = ov.split('=', 1)[1]
        else:
            remaining.append(ov)
    value_overrides = remaining
    groups = {**groups, **(group_overrides or {})}
    used: set[str] = set()
    tree = _compose_file(root_file, groups, used)
    unknown = sorted(set(groups) - used)
    if unknown:
        raise ComposeError(
            f'unknown config group selection(s) {unknown}: no defaults entry '
            f'matches (check for typos, e.g. data/datset vs data/dataset)'
        )
    tree = apply_overrides(tree, value_overrides)
    tree = _resolve_interpolations(tree)
    return tree
