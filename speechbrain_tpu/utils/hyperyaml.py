"""HyperPyYAML-compatible config loader (from-scratch implementation).

The reference's single most load-bearing design decision is that recipes
are YAML object graphs instantiated at load time (SURVEY.md §1): tags

- ``!new:pkg.Class``  instantiate with mapping/sequence args
- ``!name:pkg.func``  a partial / class reference (not called)
- ``!apply:pkg.func`` call at load time, result goes in the tree
- ``!ref <key>``      reference another top-level node; supports nested
                      access ``<enc[layer]>``, arithmetic ``<lr> * 2``
                      and string concatenation ``<dir>/file.txt``
- ``!copy <key>``     deep copy of a referenced node
- ``!tuple``          sequence -> python tuple
- ``!PLACEHOLDER``    must be overridden, else raises

``load_hyperpyyaml(stream, overrides)`` returns a dict of instantiated
objects; ``overrides`` (dict or YAML string) replace top-level keys
before resolution.  ``resolve_references`` returns re-dumpable YAML for
archiving the resolved hyperparameters.

The external ``hyperpyyaml`` package is not available in this
environment, so this module provides the same surface natively.
"""

import copy
import functools
import importlib
import io
import re

import yaml

__all__ = ["load_hyperpyyaml", "resolve_references", "dump_hyperyaml"]


# ---------------------------------------------------------------------------
# Placeholder nodes built by the YAML constructors
# ---------------------------------------------------------------------------

class _Node:
    pass


class _Ref(_Node):
    def __init__(self, expr, do_copy=False):
        self.expr = expr
        self.do_copy = do_copy

    def __repr__(self):
        return f"_Ref({self.expr!r})"


class _Call(_Node):
    """Base for !new: / !name: / !apply: — a python callable + args."""

    kind = None

    def __init__(self, path, args=None, kwargs=None):
        self.path = path
        self.args = args if args is not None else []
        self.kwargs = kwargs if kwargs is not None else {}

    def __repr__(self):
        return f"{type(self).__name__}({self.path!r})"


class _New(_Call):
    kind = "new"


class _Name(_Call):
    kind = "name"


class _Apply(_Call):
    kind = "apply"


class _Tuple(_Node):
    def __init__(self, items):
        self.items = items


class _Placeholder(_Node):
    pass


def _construct_call(cls, loader, tag_suffix, node):
    if isinstance(node, yaml.MappingNode):
        kwargs = loader.construct_mapping(node, deep=True)
        return cls(tag_suffix, kwargs=kwargs)
    elif isinstance(node, yaml.SequenceNode):
        args = loader.construct_sequence(node, deep=True)
        return cls(tag_suffix, args=args)
    else:
        scalar = loader.construct_scalar(node)
        if scalar in (None, ""):
            return cls(tag_suffix)
        return cls(tag_suffix, args=[scalar])


class _HyperLoader(yaml.SafeLoader):
    pass


_HyperLoader.add_multi_constructor(
    "!new:", lambda l, s, n: _construct_call(_New, l, s, n)
)
_HyperLoader.add_multi_constructor(
    "!name:", lambda l, s, n: _construct_call(_Name, l, s, n)
)
_HyperLoader.add_multi_constructor(
    "!apply:", lambda l, s, n: _construct_call(_Apply, l, s, n)
)
_HyperLoader.add_constructor(
    "!ref", lambda l, n: _Ref(l.construct_scalar(n))
)
_HyperLoader.add_constructor(
    "!copy", lambda l, n: _Ref(l.construct_scalar(n), do_copy=True)
)
_HyperLoader.add_constructor(
    "!tuple", lambda l, n: _Tuple(l.construct_sequence(n, deep=True))
)
_HyperLoader.add_constructor("!PLACEHOLDER", lambda l, n: _Placeholder())
# Also accept scalar-style "!tuple (a, b)"


# ---------------------------------------------------------------------------
# Reference resolution + object instantiation
# ---------------------------------------------------------------------------

_REF_PATTERN = re.compile(r"<([^<>]*)>")


class _Resolver:
    def __init__(self, tree):
        self.tree = tree
        self.cache = {}
        self.resolving = set()

    def resolve(self, node):
        """Resolve a parsed node tree into python objects."""
        node_id = id(node)
        if node_id in self.cache:
            return self.cache[node_id]
        if isinstance(node, _Node) or isinstance(node, (dict, list)):
            if node_id in self.resolving:
                raise ValueError("Circular reference in YAML config")
            self.resolving.add(node_id)
        try:
            value = self._resolve_inner(node)
        finally:
            self.resolving.discard(node_id)
        self.cache[node_id] = value
        return value

    def _resolve_inner(self, node):
        if isinstance(node, dict):
            return {k: self.resolve(v) for k, v in node.items()}
        if isinstance(node, list):
            return [self.resolve(v) for v in node]
        if isinstance(node, _Tuple):
            return tuple(self.resolve(v) for v in node.items)
        if isinstance(node, _Placeholder):
            raise ValueError(
                "A !PLACEHOLDER value was not overridden"
            )
        if isinstance(node, _Ref):
            value = self._resolve_ref_expr(node.expr)
            if node.do_copy:
                value = copy.deepcopy(value)
            return value
        if isinstance(node, _Call):
            return self._resolve_call(node)
        return node

    def _lookup(self, key_expr):
        """Navigate ``a[b][0]`` style reference paths from the tree root."""
        parts = re.split(r"[\[\]]+", key_expr.strip())
        parts = [p for p in parts if p != ""]
        current = self.tree
        for part in parts:
            current = self._step(current, part)
        return self.resolve(current)

    def _step(self, current, part):
        # Resolve the container before stepping into it if it's a node.
        if isinstance(current, (_Node,)):
            current = self.resolve(current)
        if isinstance(current, dict):
            if part in current:
                return current[part]
            raise KeyError(f"Reference to undefined key {part!r} in YAML")
        if isinstance(current, (list, tuple)):
            return current[int(part)]
        # Fall back to attribute access on instantiated objects.
        return getattr(current, part)

    def _resolve_ref_expr(self, expr):
        expr = expr.strip()
        matches = _REF_PATTERN.findall(expr)
        if not matches:
            return expr
        # Pure single reference "<key>" -> the referenced value itself.
        if expr == f"<{matches[0]}>":
            return self._lookup(matches[0])
        values = [self._lookup(m) for m in matches]
        # Arithmetic if every substituted value is numeric and the
        # residual text is only operators/whitespace/digits.
        residual = _REF_PATTERN.sub("", expr)
        if all(isinstance(v, (int, float, bool)) for v in values) and re.fullmatch(
            r"[\d\s+\-*/().%]*", residual
        ):
            substituted = expr
            for m, v in zip(matches, values):
                substituted = substituted.replace(f"<{m}>", repr(v), 1)
            try:
                return eval(substituted, {"__builtins__": {}}, {})
            except Exception:
                pass
        # Otherwise: string interpolation.
        substituted = expr
        for m, v in zip(matches, values):
            substituted = substituted.replace(f"<{m}>", str(v), 1)
        return substituted

    def _resolve_call(self, node):
        obj = _import_path(node.path)
        args = [self.resolve(a) for a in node.args]
        kwargs = {k: self.resolve(v) for k, v in node.kwargs.items()}
        if node.kind == "name":
            if args or kwargs:
                return functools.partial(obj, *args, **kwargs)
            return obj
        return obj(*args, **kwargs)


def _import_path(path):
    """Import ``pkg.mod.attr`` (attr may be nested: ``mod.Class.method``)."""
    parts = path.split(".")
    for split in range(len(parts) - 1, 0, -1):
        module_name = ".".join(parts[:split])
        try:
            module = importlib.import_module(module_name)
        except ImportError:
            continue
        obj = module
        try:
            for attr in parts[split:]:
                obj = getattr(obj, attr)
        except AttributeError:
            continue
        return obj
    # Maybe it's a builtin like "int"
    import builtins

    if hasattr(builtins, path):
        return getattr(builtins, path)
    raise ImportError(f"Cannot import {path}")


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def _parse_overrides(overrides):
    if overrides is None:
        return {}
    if isinstance(overrides, str):
        return yaml.load(overrides, Loader=_HyperLoader) or {}
    return dict(overrides)


def _overrides_as_text(overrides):
    """Overrides as key -> raw single-line YAML text for textual
    substitution into the archived config (keeps !tags intact —
    !tuple etc. have no safe_dump representer by design).
    """
    if overrides is None:
        return {}
    if isinstance(overrides, str):
        out = {}
        for line in overrides.splitlines():
            m = re.match(r"^([A-Za-z_][\w]*)\s*:\s*(.*)$", line)
            if m:
                out[m.group(1)] = m.group(2)
        return out
    return {
        k: yaml.safe_dump(v, default_flow_style=True).strip()
        for k, v in dict(overrides).items()
    }


def load_hyperpyyaml(
    yaml_stream, overrides=None, overrides_must_match=False
):
    """Load a HyperPyYAML document into a dict of python objects."""
    if hasattr(yaml_stream, "read"):
        yaml_text = yaml_stream.read()
    else:
        yaml_text = yaml_stream
    tree = yaml.load(yaml_text, Loader=_HyperLoader)
    if tree is None:
        tree = {}
    overrides = _parse_overrides(overrides)
    for key, value in overrides.items():
        if overrides_must_match and key not in tree:
            raise KeyError(
                f"Override {key!r} does not match any key in the YAML"
            )
        tree[key] = value
    resolver = _Resolver(tree)
    return {key: resolver.resolve(value) for key, value in tree.items()}


def resolve_references(yaml_stream, overrides=None):
    """Apply overrides and return a YAML stream for archiving.

    Object-instantiating tags are preserved textually; only overrides are
    applied (scalar ``!ref`` resolution is left to load time so that the
    archived file remains a valid, rerunnable config).
    """
    if hasattr(yaml_stream, "read"):
        yaml_text = yaml_stream.read()
    else:
        yaml_text = yaml_stream
    overrides = _overrides_as_text(overrides)
    if overrides:
        # Textual top-level key replacement keeps tags intact.
        lines = yaml_text.split("\n")
        done = set()
        out_lines = []
        for line in lines:
            m = re.match(r"^([A-Za-z_][\w]*)\s*:", line)
            if m and m.group(1) in overrides:
                key = m.group(1)
                done.add(key)
                out_lines.append(f"{key}: {overrides[key]}")
                # skip continuation lines (indented block of this key)
                continue
            if out_lines and re.match(r"^\s+", line) and out_lines[-1].split(":")[0] in done and not re.match(r"^([A-Za-z_][\w]*)\s*:", line):
                # skip the overridden key's original block
                continue
            out_lines.append(line)
        for key, value in overrides.items():
            if key not in done:
                out_lines.append(f"{key}: {value}")
        yaml_text = "\n".join(out_lines)
    return io.StringIO(yaml_text)


def dump_hyperyaml(tree, stream):
    """Best-effort YAML dump of a resolved tree (objects as repr strings)."""

    def default_representer(dumper, data):
        return dumper.represent_scalar("tag:yaml.org,2002:str", repr(data))

    class _Dumper(yaml.SafeDumper):
        pass

    _Dumper.add_representer(None, default_representer)
    _Dumper.add_multi_representer(object, default_representer)
    for t in (dict, list, str, int, float, bool, type(None)):
        _Dumper.add_representer(
            t, yaml.SafeDumper.yaml_representers.get(t, default_representer)
        )
    yaml.dump(tree, stream, Dumper=_Dumper, default_flow_style=False)
