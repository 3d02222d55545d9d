"""Training CLI (reference nm/train.py + bin/neuralmonkey-train).

Usage: python -m neuralmonkey_tpu.train exp.ini [section.key=value ...]
"""

from __future__ import annotations

from typing import List, Optional

import argparse
import sys

from .experiment import Experiment
from .logging import log


def main(argv: Optional[List[str]] = None) -> int:
    parser = argparse.ArgumentParser(
        prog="neuralmonkey-train",
        description="Train a model from an INI experiment file.")
    parser.add_argument("config", help="experiment INI file")
    parser.add_argument("overrides", nargs="*",
                        help="section.key=value config overrides")
    parser.add_argument("--overwrite", "-f", action="store_true",
                        help="overwrite the output directory")
    parser.add_argument("--profile", metavar="DIR", default=None,
                        help="write a jax.profiler trace (Perfetto/"
                             "TensorBoard-compatible) to DIR")
    args = parser.parse_args(argv)

    # multi-host: connect to the coordinator before any backend init
    # (no-op unless NM_COORDINATOR_ADDRESS / NM_DISTRIBUTED is set)
    from .parallel.distributed import maybe_initialize
    maybe_initialize()

    exp = Experiment(args.config, train_mode=True,
                     overwrite_output_dir=args.overwrite,
                     config_changes=args.overrides)
    if args.profile:
        import jax
        jax.profiler.start_trace(args.profile)
        try:
            exp.train()
        finally:
            jax.profiler.stop_trace()
            log(f"Profiler trace written to {args.profile}")
    else:
        exp.train()
    log("Done.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
