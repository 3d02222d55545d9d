"""Reflective object-graph construction from parsed INI configs.

Rebuild of the reference builder (SURVEY.md §3.1, reference:
nm/config/builder.py): each ``[section]`` with a ``class=`` key becomes
one object; ``<section>`` references are resolved recursively with
memoization and cycle detection.

Class symbols written against the reference package (either bare, e.g.
``encoders.recurrent.SentenceEncoder``, or fully qualified,
``neuralmonkey.encoders.recurrent.SentenceEncoder``) resolve into this
package through the :data:`MODULE_ALIASES` table — the compatibility
contract that lets existing experiment INI files run unchanged.
"""

from __future__ import annotations

import importlib
from typing import Any, Dict, List, Set

from ..logging import debug
from .exceptions import ConfigBuildException, ConfigInvalidValueException
from .parsing import ClassSymbol, ObjectRef

# Reference-relative module prefix -> this package's module.
# (The reference's internals are TF1; ours are JAX — same public names.)
MODULE_ALIASES = {
    "encoders": "neuralmonkey_tpu.models.encoders",
    "decoders": "neuralmonkey_tpu.models.decoders",
    "attention": "neuralmonkey_tpu.models.attention",
    "model": "neuralmonkey_tpu.model",
    "trainers": "neuralmonkey_tpu.trainers",
    "runners": "neuralmonkey_tpu.runners",
    "evaluators": "neuralmonkey_tpu.evaluators",
    "processors": "neuralmonkey_tpu.processors",
    "readers": "neuralmonkey_tpu.readers",
    "dataset": "neuralmonkey_tpu.dataset",
    "vocabulary": "neuralmonkey_tpu.vocabulary",
    "functions": "neuralmonkey_tpu.functions",
    # parity package mirroring the reference's per-file nn/ layout
    # (implementations live in ops/nn.py)
    "nn": "neuralmonkey_tpu.nn",
    # The reference's TensorFlowManager maps onto the TPU runtime manager.
    "tf_manager": "neuralmonkey_tpu.runtime",
    "config": "neuralmonkey_tpu.config",
}

# Specific class renames where a 1:1 module mapping is not enough.
# TF optimizer names map to optax-wrapping factories so reference
# configs' [optimizer] sections work unchanged.
_OPT = "neuralmonkey_tpu.trainers.optimizers."
CLASS_ALIASES = {
    "tf_manager.TensorFlowManager": "neuralmonkey_tpu.runtime.TPUManager",
    "neuralmonkey.tf_manager.TensorFlowManager":
        "neuralmonkey_tpu.runtime.TPUManager",
    "tf.train.AdamOptimizer": _OPT + "AdamOptimizer",
    "tf.train.GradientDescentOptimizer":
        _OPT + "GradientDescentOptimizer",
    "tf.train.MomentumOptimizer": _OPT + "MomentumOptimizer",
    "tf.train.AdadeltaOptimizer": _OPT + "AdadeltaOptimizer",
    "tf.train.RMSPropOptimizer": _OPT + "RMSPropOptimizer",
    "tf.contrib.opt.LazyAdamOptimizer": _OPT + "LazyAdamOptimizer",
    "tensorflow.train.AdamOptimizer": _OPT + "AdamOptimizer",
}


def _import_symbol(dotted: str) -> Any:
    """Import ``pkg.module.Symbol`` (symbol may be class or function)."""
    parts = dotted.split(".")
    for split in range(len(parts) - 1, 0, -1):
        module_name = ".".join(parts[:split])
        try:
            module = importlib.import_module(module_name)
        except ImportError:
            continue
        obj: Any = module
        try:
            for attr in parts[split:]:
                obj = getattr(obj, attr)
        except AttributeError:
            continue
        return obj
    raise ImportError(f"Cannot import symbol '{dotted}'")


def resolve_class_symbol(clazz: str) -> Any:
    """Resolve a class symbol, applying the reference-name alias tables."""
    if clazz in CLASS_ALIASES:
        return _import_symbol(CLASS_ALIASES[clazz])

    candidates: List[str] = []
    stripped = clazz
    if stripped.startswith("neuralmonkey_tpu."):
        candidates.append(stripped)
        stripped = stripped[len("neuralmonkey_tpu."):]
    if stripped.startswith("neuralmonkey."):
        stripped = stripped[len("neuralmonkey."):]
    if stripped in CLASS_ALIASES:
        return _import_symbol(CLASS_ALIASES[stripped])

    head = stripped.split(".", 1)[0]
    if head in MODULE_ALIASES:
        rest = stripped[len(head):]
        candidates.append(MODULE_ALIASES[head] + rest)
    candidates.append("neuralmonkey_tpu." + stripped)
    candidates.append(clazz)  # user-provided fully-qualified symbol

    errors = []
    for cand in candidates:
        try:
            return _import_symbol(cand)
        except ImportError as exc:
            errors.append(str(exc))
    raise ImportError(
        f"Cannot resolve class symbol '{clazz}'; tried {candidates}")


def build_object(value: Any,
                 all_dicts: Dict[str, Any],
                 existing_objects: Dict[str, Any],
                 depth: int) -> Any:
    """Recursively build the object a config value describes."""
    if depth > 40:
        raise AssertionError(
            "Config object nesting too deep (cycle in <references>?)")

    if isinstance(value, ObjectRef):
        if value.name not in all_dicts:
            raise ConfigInvalidValueException(
                value, f"Undefined section <{value.name}>")
        obj = build_section(value.name, all_dicts, existing_objects,
                            depth + 1)
        value.bind(obj)
        return obj
    if isinstance(value, ClassSymbol):
        return value.create()
    if isinstance(value, list):
        return [build_object(v, all_dicts, existing_objects, depth + 1)
                for v in value]
    if isinstance(value, tuple):
        return tuple(build_object(v, all_dicts, existing_objects, depth + 1)
                     for v in value)
    return value


_BUILDING = object()


def build_section(name: str,
                  all_dicts: Dict[str, Any],
                  existing_objects: Dict[str, Any],
                  depth: int = 0) -> Any:
    """Build (or fetch memoized) the object for section *name*."""
    if name in existing_objects:
        if existing_objects[name] is _BUILDING:
            raise ConfigInvalidValueException(
                name, f"Circular reference involving section [{name}]")
        return existing_objects[name]

    section = all_dicts[name]
    if "class" not in section:
        raise ConfigInvalidValueException(
            name, f"Section [{name}] has no 'class' key")
    clazz = section["class"]
    if not isinstance(clazz, ClassSymbol):
        raise ConfigInvalidValueException(
            name, f"Section [{name}]: 'class' must be a class symbol")

    existing_objects[name] = _BUILDING
    try:
        ctor = clazz.create()
        kwargs = {}
        for key, value in section.items():
            if key == "class":
                continue
            kwargs[key] = build_object(value, all_dicts, existing_objects,
                                       depth + 1)
        # Parts constructed from a [section] get the section name as their
        # default `name` (the reference used it as the TF variable scope;
        # we use it as the parameter-tree / checkpoint key).
        import inspect
        try:
            sig = inspect.signature(ctor)
            if "name" in sig.parameters and "name" not in kwargs:
                kwargs["name"] = name
        except (TypeError, ValueError):
            pass
        debug(f"Building [{name}] as {clazz.clazz}", "config")
        obj = ctor(**kwargs)
    except Exception as exc:
        existing_objects.pop(name, None)
        if isinstance(exc, (ConfigBuildException,
                            ConfigInvalidValueException)):
            raise
        raise ConfigBuildException(name, exc) from exc
    existing_objects[name] = obj
    return obj


def build_config(config_dicts: Dict[str, Any],
                 ignore_names: Set[str],
                 warn_unused: bool = False) -> Dict[str, Any]:
    """Build the whole object graph rooted at the [main] section."""
    if "main" not in config_dicts:
        raise ConfigInvalidValueException(
            "main", "Configuration does not contain the [main] block")

    existing_objects: Dict[str, Any] = {}
    main_config = config_dicts["main"]

    configuration: Dict[str, Any] = {}
    for key, value in main_config.items():
        if key in ignore_names:
            continue
        configuration[key] = build_object(
            value, config_dicts, existing_objects, 0)

    if warn_unused:
        from ..logging import warn as _warn
        unused = (set(config_dicts.keys()) - set(existing_objects.keys())
                  - {"main"})
        if unused:
            _warn(f"Unused config sections: {sorted(unused)}")
    return configuration
