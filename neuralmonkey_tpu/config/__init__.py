"""INI experiment config system (reference nm/config/, SURVEY.md §2 L8)."""

from .configuration import Configuration
from .parsing import parse_file, parse_value, ObjectRef, ClassSymbol
from .builder import build_config, resolve_class_symbol
from .exceptions import (IniError, ConfigInvalidValueException,
                         ConfigBuildException)

__all__ = [
    "Configuration", "parse_file", "parse_value", "ObjectRef",
    "ClassSymbol", "build_config", "resolve_class_symbol", "IniError",
    "ConfigInvalidValueException", "ConfigBuildException",
]
