"""Packaging smoke test (reference bin/ shims + setup.py).

The reference installs console scripts (``neuralmonkey-train`` etc. in
``bin/``); this asserts our ``pyproject.toml`` equivalent produces a
wheel whose entry points import and run outside the repo checkout.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def installed(tmp_path_factory):
    target = tmp_path_factory.mktemp("pkg")
    result = subprocess.run(
        [sys.executable, "-m", "pip", "install", "--no-build-isolation",
         "--no-deps", "--no-index", "--quiet",
         f"--target={target}", REPO],
        capture_output=True, text=True, timeout=600)
    assert result.returncode == 0, result.stderr
    return target


def _run_script(target, name, *args):
    env = dict(os.environ,
               PYTHONPATH=str(target),
               PALLAS_AXON_POOL_IPS="",
               JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, str(target / "bin" / name), *args],
        capture_output=True, text=True, timeout=120, env=env)


def test_wheel_installs_package(installed):
    assert (installed / "neuralmonkey_tpu" / "__init__.py").exists()


def test_console_scripts_exist(installed):
    for name in ("neuralmonkey-train", "neuralmonkey-run",
                 "neuralmonkey-server", "neuralmonkey-logbook",
                 "neuralmonkey-average-checkpoints"):
        assert (installed / "bin" / name).exists(), name


def test_train_help_runs_from_install(installed):
    result = _run_script(installed, "neuralmonkey-train", "--help")
    assert result.returncode == 0, result.stderr
    assert "INI experiment file" in result.stdout


def test_run_help_runs_from_install(installed):
    result = _run_script(installed, "neuralmonkey-run", "--help")
    assert result.returncode == 0, result.stderr
