"""Minimal HOCON parser — conf-file compatibility without pyhocon.

Parses the subset of HOCON that the reference's conf files use
(`/root/reference/confs/*.conf`, read via pyhocon at
`exp_runner.py:88-94`): nested ``name { ... }`` sections, ``key = value``,
quoted keys, numbers (incl. ``5e-4``), ``True/False`` booleans, unquoted
strings/paths, lists, trailing commas, ``#``/``//`` comments.

The resulting ConfigTree mirrors the pyhocon accessors the runner relies
on: get / get_int / get_float / get_bool / get_string / get_list / put and
dotted-path ``in`` checks.
"""

from __future__ import annotations

import re
from typing import Any

__all__ = ["ConfigTree", "parse_string", "parse_file"]

_MISSING = object()


class ConfigTree(dict):
    """dict with dotted-path access like pyhocon's ConfigTree."""

    def _resolve(self, path: str, default=_MISSING):
        node: Any = self
        parts = path.split(".")
        for p in parts:
            if isinstance(node, dict) and dict.__contains__(node, p):
                node = dict.__getitem__(node, p)
            else:
                if default is _MISSING:
                    raise KeyError(path)
                return default
        return node

    def __getitem__(self, path):
        if isinstance(path, str) and "." in path:
            return self._resolve(path)
        return dict.__getitem__(self, path)

    def __contains__(self, path):
        try:
            self._resolve(path)  # type: ignore[arg-type]
            return True
        except (KeyError, TypeError):
            return False

    def get(self, path, default=None):
        return self._resolve(path, default)

    def get_int(self, path, default=_MISSING):
        v = self._resolve(path, default)
        if v is default and default is not _MISSING:
            return v
        return int(v)

    def get_float(self, path, default=_MISSING):
        v = self._resolve(path, default)
        if v is default and default is not _MISSING:
            return v
        return float(v)

    def get_bool(self, path, default=_MISSING):
        v = self._resolve(path, default)
        if isinstance(v, str):
            return v.strip().lower() in ("true", "yes", "on", "1")
        return bool(v)

    def get_string(self, path, default=_MISSING):
        v = self._resolve(path, default)
        return v if v is None else str(v)

    def get_list(self, path, default=_MISSING):
        v = self._resolve(path, default)
        return v

    def put(self, path: str, value):
        parts = path.split(".")
        node = self
        for p in parts[:-1]:
            nxt = dict.get(node, p)
            if not isinstance(nxt, ConfigTree):
                nxt = ConfigTree()
                dict.__setitem__(node, p, nxt)
            node = nxt
        dict.__setitem__(node, parts[-1], value)

    def as_plain_dict(self):
        out = {}
        for k, v in self.items():
            out[k] = v.as_plain_dict() if isinstance(v, ConfigTree) else v
        return out


_NUM_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")


def _coerce(token: str):
    token = token.strip()
    if token.startswith('"') and token.endswith('"') and len(token) >= 2:
        return token[1:-1]
    low = token.lower()
    if low == "true":
        return True
    if low == "false":
        return False
    if low in ("none", "null"):
        return None
    if _NUM_RE.match(token):
        if re.match(r"^[+-]?\d+$", token):
            return int(token)
        return float(token)
    return token


def _strip_comment(line: str) -> str:
    out = []
    in_str = False
    i = 0
    while i < len(line):
        ch = line[i]
        if ch == '"':
            in_str = not in_str
        if not in_str:
            if ch == "#":
                break
            if ch == "/" and i + 1 < len(line) and line[i + 1] == "/":
                break
        out.append(ch)
        i += 1
    return "".join(out)


def _parse_list(text: str):
    inner = text.strip()[1:-1]
    items = [t for t in (s.strip() for s in inner.split(",")) if t]
    return [_coerce(t) for t in items]


def parse_string(text: str) -> ConfigTree:
    root = ConfigTree()
    stack = [root]
    pending_key = None  # key whose "{" may come on the next line
    pending_list = None  # (key, accumulated text) for multi-line lists

    for raw in text.splitlines():
        line = _strip_comment(raw).strip()
        if not line:
            continue

        if pending_list is not None:
            key, acc = pending_list
            acc += " " + line
            if "]" in line:
                stack[-1].put(key, _parse_list(acc))
                pending_list = None
            else:
                pending_list = (key, acc)
            continue

        while line:
            line = line.strip()
            if not line:
                break
            if line.startswith("}"):
                if len(stack) > 1:
                    stack.pop()
                line = line[1:]
                continue

            if pending_key is not None and line.startswith("{"):
                sub = ConfigTree()
                stack[-1].put(pending_key, sub)
                stack.append(sub)
                pending_key = None
                line = line[1:]
                continue

            # section opening on same line: name {   |   key = value
            m = re.match(r'^("(?:[^"]*)"|[\w.\-/]+)\s*([={:])\s*(.*)$', line)
            if m is None:
                # bare token (e.g. section name awaiting "{" on next line)
                m2 = re.match(r'^("(?:[^"]*)"|[\w.\-/]+)\s*$', line)
                if m2:
                    pending_key = m2.group(1).strip('"')
                    line = ""
                    continue
                raise ValueError(f"cannot parse HOCON line: {raw!r}")

            key = m.group(1).strip('"')
            sep, rest = m.group(2), m.group(3)

            if sep in "={" and (rest == "" and sep == "{"):
                sub = ConfigTree()
                stack[-1].put(key, sub)
                stack.append(sub)
                line = ""
                continue
            if sep == "{":
                sub = ConfigTree()
                stack[-1].put(key, sub)
                stack.append(sub)
                line = rest
                continue
            # sep is '=' or ':'
            if rest.startswith("{"):
                sub = ConfigTree()
                stack[-1].put(key, sub)
                stack.append(sub)
                line = rest[1:]
                continue
            if rest.startswith("["):
                if "]" in rest:
                    end = rest.rindex("]")
                    stack[-1].put(key, _parse_list(rest[: end + 1]))
                    line = rest[end + 1:].lstrip(", ")
                else:
                    pending_list = (key, rest)
                    line = ""
                continue
            # scalar value: may be followed by "}" or by another
            # "key = value" pair (comma-separated) on the same line
            trail = ""
            if "}" in rest:
                idx = rest.index("}")
                trail = rest[idx:]
                rest = rest[:idx]
            m_next = re.match(
                r'^(.*?),\s*(("(?:[^"]*)"|[\w.\-/]+)\s*[=:{].*)$', rest)
            if m_next:
                rest = m_next.group(1)
                trail = m_next.group(2) + trail
            value = rest.strip().rstrip(",").strip()
            stack[-1].put(key, _coerce(value))
            line = trail
    return root


def parse_file(path: str, replacements=None) -> ConfigTree:
    with open(path) as f:
        text = f.read()
    if replacements:
        for k, v in replacements.items():
            text = text.replace(k, v)
    return parse_string(text)
