"""Batch inference CLI (reference nm/run.py + bin/neuralmonkey-run).

Usage: python -m neuralmonkey_tpu.run exp.ini data.ini [ckpt ...]

The data INI declares datasets (series + output files) without
training-only keys. Multiple checkpoint paths => ensemble.
"""

from __future__ import annotations

import argparse
import sys
from typing import List

from .config.configuration import Configuration
from .experiment import Experiment
from .logging import log


def load_data_config(path: str) -> List:
    config = Configuration()
    config.add_argument("test_datasets", required=False, default=None)
    config.add_argument("eval_datasets", required=False, default=None)
    config.load_file(path)
    config.build_model()
    datasets = (getattr(config.model, "test_datasets", None)
                or getattr(config.model, "eval_datasets", None))
    if datasets is None:
        raise ValueError(
            f"Data config {path} must define [main] test_datasets")
    return datasets if isinstance(datasets, list) else [datasets]


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="neuralmonkey-run",
        description="Run a trained model over datasets.")
    parser.add_argument("config", help="experiment INI file")
    parser.add_argument("datasets", help="data INI file")
    parser.add_argument("checkpoints", nargs="*",
                        help="checkpoint path(s); several = ensemble")
    parser.add_argument("--grid", action="store_true",
                        help="sliding-window grid decoding "
                             "(long inputs)")
    args = parser.parse_args(argv)
    if args.grid:
        from .logging import warn
        warn("--grid (sliding-window decoding) is not implemented; "
             "decoding normally")

    exp = Experiment(args.config, train_mode=False)
    exp.build_model()
    exp.restore_variables(args.checkpoints or None)

    for dataset in load_data_config(args.datasets):
        exp.run_model(dataset, write_out=True)
    log("Done.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
