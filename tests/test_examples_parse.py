"""The example INIs in examples/ must parse, resolve every class=
dotted name, and reference only existing sections — they are
documentation that must not rot."""

import glob
import os

import pytest

from neuralmonkey_tpu.config.builder import resolve_class_symbol
from neuralmonkey_tpu.config.parsing import parse_file

EXAMPLES = sorted(glob.glob(os.path.join(
    os.path.dirname(__file__), "..", "examples", "*.ini")))


@pytest.mark.parametrize("path", EXAMPLES,
                         ids=[os.path.basename(p) for p in EXAMPLES])
def test_example_parses_and_classes_resolve(path):
    with open(path, encoding="utf-8") as f:
        raw, parsed = parse_file(f)
    assert "main" in raw
    for section, body in raw.items():
        for key, value in body.items():
            if key == "class" and section != "main":
                assert resolve_class_symbol(value) is not None, (
                    f"{path} [{section}] class={value} does not resolve")
            # every <ref> must name an existing section
            if "<" in value:
                import re
                for ref in re.findall(r"<([A-Za-z0-9_]+)>", value):
                    assert ref in raw, (
                        f"{path} [{section}] {key} references missing "
                        f"section <{ref}>")
