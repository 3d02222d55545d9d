"""Checkpoint parameter averaging (the complement of runtime logit
ensembling; BASELINE.json's 'checkpoint ensembling' admits both).

Usage: python -m neuralmonkey_tpu.utils.average_checkpoints \
           out.npz ckpt1 ckpt2 [...]
"""

from __future__ import annotations

import argparse
import sys
from typing import Dict, List, Optional

import numpy as np

from ..logging import log
from .saving import load_flat


def average_flat(flats: List[Dict[str, np.ndarray]]
                 ) -> Dict[str, np.ndarray]:
    keys = set(flats[0])
    for flat in flats[1:]:
        if set(flat) != keys:
            raise ValueError(
                "Checkpoints have different parameter sets; "
                f"e.g. {sorted(keys ^ set(flat))[:3]}")
    # accumulate in float32 and cast back to the stored dtype (the
    # runtime.restore docstring promises this; with bf16-saved leaves
    # a plain same-dtype mean would lose a mantissa bit per add)
    def mean(key):
        stack = [flat[key] for flat in flats]
        out = np.mean(stack, axis=0, dtype=np.float64
                      if stack[0].dtype == np.float64 else np.float32)
        return out.astype(stack[0].dtype)

    return {key: mean(key) for key in keys}


def average_checkpoints(paths: List[str], out_path: str) -> None:
    flats = [load_flat(path) for path in paths]
    averaged = average_flat(flats)
    tmp = out_path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **averaged)
    import os
    os.replace(tmp, out_path)
    log(f"Averaged {len(paths)} checkpoints -> {out_path}")


def main(argv: Optional[List[str]] = None) -> int:
    parser = argparse.ArgumentParser(
        prog="neuralmonkey-average-checkpoints")
    parser.add_argument("output", help="output checkpoint path")
    parser.add_argument("checkpoints", nargs="+",
                        help="input checkpoint paths")
    args = parser.parse_args(argv)
    average_checkpoints(args.checkpoints, args.output)
    return 0


if __name__ == "__main__":
    sys.exit(main())
