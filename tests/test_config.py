"""Config-system tests (mirrors reference test_config.py intent:
INI grammar, refs, class symbols, overrides, error cases)."""

import pytest

from neuralmonkey_tpu.config.parsing import (ClassSymbol, ObjectRef,
                                             parse_file, parse_value)
from neuralmonkey_tpu.config.builder import (build_config,
                                             resolve_class_symbol)
from neuralmonkey_tpu.config.exceptions import (ConfigInvalidValueException,
                                                IniError)


def test_parse_scalars():
    assert parse_value("42") == 42
    assert parse_value("-7") == -7
    assert parse_value("3.14") == 3.14
    assert parse_value("1e3") == 1000
    assert parse_value("6.25e-2") == 0.0625
    assert parse_value("True") is True
    assert parse_value("False") is False
    assert parse_value("None") is None
    assert parse_value('"hello world"') == "hello world"


def test_parse_structures():
    assert parse_value("[1, 2, 3]") == [1, 2, 3]
    assert parse_value("[]") == []
    assert parse_value("(1, 2)") == (1, 2)
    assert parse_value('[("a", 1), ("b", 2)]') == [("a", 1), ("b", 2)]
    nested = parse_value('[[1, 2], [3, 4]]')
    assert nested == [[1, 2], [3, 4]]


def test_parse_refs_and_symbols():
    ref = parse_value("<encoder>")
    assert isinstance(ref, ObjectRef) and ref.name == "encoder"
    sym = parse_value("evaluators.bleu.BLEU")
    assert isinstance(sym, ClassSymbol)
    mixed = parse_value("[<a>, <b>]")
    assert all(isinstance(x, ObjectRef) for x in mixed)


def test_parse_time_spec():
    assert parse_value("30m") == "30m"
    assert parse_value("2h") == "2h"


def test_parse_bad_value():
    with pytest.raises(ValueError):
        parse_value("@#$%^")


def test_parse_file_sections():
    ini = """
; comment
[main]
name="test"
batch_size=16
epochs=2
runners=[<runner>]

[runner]
class=runners.GreedyRunner
output_series="target"
""".splitlines()
    raw, parsed = parse_file(ini)
    assert parsed["main"]["name"] == "test"
    assert parsed["main"]["batch_size"] == 16
    assert isinstance(parsed["main"]["runners"][0], ObjectRef)
    assert isinstance(parsed["runner"]["class"], ClassSymbol)


def test_parse_file_vars():
    ini = """
[vars]
data_dir="tests/data"

[main]
path="{$data_dir}/train.en"
""".splitlines()
    _, parsed = parse_file(ini)
    assert parsed["main"]["path"] == "tests/data/train.en"


def test_parse_file_overrides():
    ini = """
[main]
batch_size=16
""".splitlines()
    _, parsed = parse_file(ini, {"main.batch_size": "32"})
    assert parsed["main"]["batch_size"] == 32


def test_duplicate_section_raises():
    ini = ["[a]", "x=1", "[a]", "y=2"]
    with pytest.raises(IniError):
        parse_file(ini)


def test_resolve_reference_class_names():
    # Reference-era dotted names must resolve into this package.
    bleu = resolve_class_symbol("evaluators.bleu.BLEU")
    assert bleu.name.startswith("BLEU")
    bleu2 = resolve_class_symbol("neuralmonkey.evaluators.bleu.BLEU")
    assert bleu2 is bleu
    vocab_fn = resolve_class_symbol("vocabulary.from_wordlist")
    assert callable(vocab_fn)


def test_build_config_simple():
    ini = """
[main]
evaluator=<bleu>
number=7

[bleu]
class=evaluators.bleu.BLEUEvaluator
n=2
name="my_bleu"
""".splitlines()
    _, parsed = parse_file(ini)
    cfg = build_config(parsed, ignore_names=set())
    assert cfg["number"] == 7
    assert cfg["evaluator"].name == "my_bleu"
    assert cfg["evaluator"].n == 2


def test_build_config_cycle_detection():
    ini = """
[main]
a=<a>

[a]
class=evaluators.bleu.BLEUEvaluator
n=<b>

[b]
class=evaluators.bleu.BLEUEvaluator
n=<a>
""".splitlines()
    _, parsed = parse_file(ini)
    with pytest.raises(Exception):
        build_config(parsed, ignore_names=set())


def test_build_config_missing_main():
    with pytest.raises(ConfigInvalidValueException):
        build_config({"other": {}}, ignore_names=set())
