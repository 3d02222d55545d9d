"""Batch inference CLI (reference nm/run.py + bin/neuralmonkey-run).

Usage: python -m neuralmonkey_tpu.run exp.ini data.ini [ckpt ...]

The data INI declares datasets (series + output files) without
training-only keys. Multiple checkpoint paths => ensemble.

``--grid`` enables sliding-window decoding for token-aligned models
(sequence labeling): inputs longer than the encoder's max_input_len are
split into half-overlapping windows, each window is decoded, and every
position takes its label from the window whose center is nearest
(reference nm/run.py grid decoding, used for diacritization).
"""

from __future__ import annotations

import argparse
import sys
from typing import Any, Dict, List, Optional, Tuple

from .config.configuration import Configuration
from .dataset import Dataset
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


def main(argv: Optional[List[str]] = None) -> int:
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
    parser.add_argument("--average", action="store_true",
                        help="average the checkpoints into one "
                             "parameter set instead of running a "
                             "logit-ensemble (1 forward pass vs K)")
    args = parser.parse_args(argv)

    from .parallel.distributed import maybe_initialize
    maybe_initialize()

    exp = Experiment(args.config, train_mode=False)
    exp.build_model()
    exp.restore_variables(args.checkpoints or None,
                          average=args.average)

    for dataset in load_data_config(args.datasets):
        if args.grid:
            grid_decode(exp, dataset)
        else:
            exp.run_model(dataset, write_out=True)
    log("Done.")
    return 0


def _grid_windows(length: int, window: int
                  ) -> List[Tuple[int, int, int, int]]:
    """Half-overlapping windows covering [0, length) plus each
    window's responsibility span: every position is labeled by the
    window whose center is nearest. Returns
    (start, end, claim_start, claim_end) tuples."""
    if length <= window:
        return [(0, length, 0, length)]
    stride = max(window // 2, 1)
    starts = list(range(0, length - window + stride, stride))
    if starts[-1] + window < length:
        starts.append(length - window)
    starts[-1] = min(starts[-1], length - window)
    spans = []
    for i, start in enumerate(starts):
        end = min(start + window, length)
        claim_start = 0 if i == 0 else (start + starts[i - 1]
                                        + window) // 2
        claim_end = (length if i == len(starts) - 1
                     else (end + starts[i + 1]) // 2)
        spans.append((start, end, claim_start, claim_end))
    return spans


def grid_decode(exp: Experiment, dataset: Dataset) -> None:
    """Sliding-window decoding for token-aligned (labeling) models."""
    model = exp.model
    runners = model.runners
    if len(runners) != 1:
        raise ValueError("--grid needs exactly one runner")
    runner = runners[0]
    decoder = runner.decoder
    encoder = getattr(decoder, "encoder", None)
    window = getattr(encoder, "max_input_len", None) if encoder \
        else None
    data_id = getattr(encoder, "data_id", None) if encoder else None
    if window is None or data_id is None:
        raise ValueError(
            "--grid needs a decoder whose encoder sets max_input_len "
            "and data_id (token-aligned labeling models)")

    sentences = dataset.get_series(data_id)
    window_items: List[List[str]] = []
    claims: List[List[Tuple[int, int, int]]] = []  # per sentence
    for sentence in sentences:
        spans = _grid_windows(len(sentence), window)
        claims.append([])
        for start, end, claim_start, claim_end in spans:
            claims[-1].append((len(window_items),
                               claim_start - start,
                               claim_end - start))
            window_items.append(list(sentence[start:end]))

    windows_ds = Dataset(f"{dataset.name}.grid",
                         {data_id: window_items})
    _, outputs = exp.run_model(windows_ds, write_out=False)
    window_outputs = outputs[runner.output_series]

    stitched: List[List[Any]] = []
    for sentence, claim in zip(sentences, claims):
        merged: List[Any] = []
        for index, claim_start, claim_end in claim:
            piece = window_outputs[index]
            merged.extend(piece[claim_start:claim_end])
        # pad/trim defensively to the source length
        merged = merged[:len(sentence)]
        stitched.append(merged)

    if runner.output_series in dataset.series_outputs:
        path = dataset.series_outputs[runner.output_series]
        with open(path, "w", encoding="utf-8") as f:
            for item in stitched:
                f.write(" ".join(str(t) for t in item) + "\n")
        log(f"Series '{runner.output_series}' (grid-decoded) "
            f"written to {path}")
    else:
        log(f"No output file for series '{runner.output_series}'")


if __name__ == "__main__":
    sys.exit(main())
