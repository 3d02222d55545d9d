"""Dataset: named parallel series + batching.

Rebuild of the reference dataset (SURVEY.md §3.1, reference:
nm/dataset.py). A dataset is a dictionary of named *series* — parallel
sequences (tokenized sentences, feature arrays, image tensors). Config
factories keep the reference signatures: ``load_dataset_from_files`` with
``s_<series>=path`` kwargs (value may be a path string or a
``(path, reader)`` tuple), ``preprocessors``, ``lazy``.

TPU-specific: :class:`BatchingScheme` supports length-bucketed batching
into a small set of static shapes so jitted steps don't recompile per
batch (SURVEY.md §8.3 item 2).
"""

from __future__ import annotations

import glob as _glob
import os
import random
from typing import (Any, Callable, Dict, Iterable, Iterator, List, Optional,
                    Sequence, Tuple)

import numpy as np

from .logging import log, warn
from .readers.plain_text_reader import UtfPlainTextReader

# A series reader takes a list of file paths and yields items.
Reader = Callable[[List[str]], Iterable[Any]]

SERIES_OUTPUT_PREFIX = "s_"
OUTPUT_SUFFIX = "_out"


class BatchingScheme:
    """How to cut a dataset into batches.

    - ``batch_size``: number of examples per batch, or when
      ``token_level_batching`` is on, the per-batch token budget.
    - ``bucket_boundaries``: sorted max-lengths defining length buckets;
      with buckets, each batch comes from a single bucket and is padded
      to that bucket's boundary → a *static* set of shapes for XLA.
    - ``bucket_batch_sizes``: per-bucket batch sizes
      (len = len(boundaries)+1); defaults to ``batch_size`` everywhere.
    """

    def __init__(self,
                 batch_size: int = None,
                 batch_bucket_span: int = None,
                 token_level_batching: bool = False,
                 bucketing_ignore_series: List[str] = None,
                 bucket_boundaries: List[int] = None,
                 bucket_batch_sizes: List[int] = None,
                 ignore_series: List[str] = None) -> None:
        if batch_size is None and bucket_boundaries is None:
            raise ValueError(
                "BatchingScheme needs batch_size or bucket_boundaries")
        self.batch_size = batch_size
        self.batch_bucket_span = batch_bucket_span
        self.token_level_batching = token_level_batching
        self.bucketing_ignore_series = (
            bucketing_ignore_series or ignore_series or [])
        self.bucket_boundaries = bucket_boundaries
        self.bucket_batch_sizes = bucket_batch_sizes
        if bucket_boundaries is not None and bucket_batch_sizes is None:
            if batch_size is None:
                raise ValueError("Need bucket_batch_sizes or batch_size")
            self.bucket_batch_sizes = (
                [batch_size] * (len(bucket_boundaries) + 1))


class Dataset:
    """An in-memory dataset of named parallel series."""

    def __init__(self, name: str,
                 series: Dict[str, List[Any]],
                 outputs: Dict[str, str] = None,
                 preprocessors: List[Tuple[str, str, Callable]] = None,
                 shuffled: bool = False) -> None:
        self.name = name
        self._series = dict(series)
        self.series_outputs = dict(outputs or {})
        self.shuffled = shuffled

        for source, target, func in (preprocessors or []):
            if isinstance(source, (tuple, list)):
                # multi-series preprocessor (e.g. editops over
                # (source, target) pairs): items are zipped tuples
                for name in source:
                    if name not in self._series:
                        raise ValueError(
                            f"Preprocessor source series '{name}' "
                            "not in dataset")
                items = zip(*(self._series[name] for name in source))
                self._series[target] = [func(item) for item in items]
            else:
                if source not in self._series:
                    raise ValueError(
                        f"Preprocessor source series '{source}' not "
                        "in dataset")
                self._series[target] = [func(item)
                                        for item in self._series[source]]

        lengths = {k: len(v) for k, v in self._series.items()}
        if len(set(lengths.values())) > 1:
            raise ValueError(
                f"Series of dataset '{name}' have different lengths: "
                f"{lengths}")

    # ------------------------------------------------------------------ #
    def __len__(self) -> int:
        if not self._series:
            return 0
        return len(next(iter(self._series.values())))

    @property
    def series_ids(self) -> List[str]:
        return list(self._series.keys())

    def has_series(self, name: str) -> bool:
        return name in self._series

    def get_series(self, name: str) -> List[Any]:
        return self._series[name]

    def maybe_get_series(self, name: str) -> Optional[List[Any]]:
        return self._series.get(name)

    def add_series(self, name: str, values: List[Any]) -> None:
        if len(values) != len(self):
            raise ValueError("New series has wrong length")
        self._series[name] = values

    def subset(self, start: int, length: int) -> "Dataset":
        return Dataset(
            name=f"{self.name}.{start}",
            series={k: v[start:start + length]
                    for k, v in self._series.items()},
            outputs={k: f"{v}.{start}"
                     for k, v in self.series_outputs.items()})

    # ------------------------------------------------------------------ #
    def batches(self, scheme: BatchingScheme,
                shuffled: Optional[bool] = None) -> Iterator["Dataset"]:
        """Yield batch sub-datasets according to *scheme*.

        ``shuffled`` overrides the dataset's own flag — evaluation code
        passes False so outputs stay aligned with reference series even
        when the same Dataset object is used for training."""
        order = list(range(len(self)))
        if self.shuffled if shuffled is None else shuffled:
            random.shuffle(order)

        if scheme.bucket_boundaries is not None:
            yield from self._bucketed_batches(scheme, order)
            return

        if scheme.token_level_batching:
            yield from self._token_batches(scheme, order)
            return

        bs = scheme.batch_size
        for start in range(0, len(order), bs):
            idx = order[start:start + bs]
            yield self._take(idx)

    def _take(self, indices: List[int]) -> "Dataset":
        return Dataset(
            name=f"{self.name}.batch",
            series={k: [v[i] for i in indices]
                    for k, v in self._series.items()})

    def _example_len(self, index: int,
                     ignore: Sequence[str]) -> int:
        max_len = 0
        for key, series in self._series.items():
            if key in ignore:
                continue
            item = series[index]
            if hasattr(item, "__len__") and not isinstance(item, str):
                max_len = max(max_len, len(item))
        return max_len

    def _bucketed_batches(self, scheme: BatchingScheme,
                          order: List[int]) -> Iterator["Dataset"]:
        boundaries = scheme.bucket_boundaries
        sizes = scheme.bucket_batch_sizes
        buckets: List[List[int]] = [[] for _ in range(len(boundaries) + 1)]
        for i in order:
            length = self._example_len(i, scheme.bucketing_ignore_series)
            bucket_id = len(boundaries)
            for b, bound in enumerate(boundaries):
                if length <= bound:
                    bucket_id = b
                    break
            buckets[bucket_id].append(i)
            if len(buckets[bucket_id]) >= sizes[bucket_id]:
                yield self._take(buckets[bucket_id])
                buckets[bucket_id] = []
        for bucket in buckets:
            if bucket:
                yield self._take(bucket)

    def _token_batches(self, scheme: BatchingScheme,
                       order: List[int]) -> Iterator["Dataset"]:
        budget = scheme.batch_size
        batch: List[int] = []
        max_len = 0
        for i in order:
            length = max(1, self._example_len(
                i, scheme.bucketing_ignore_series))
            new_max = max(max_len, length)
            if batch and new_max * (len(batch) + 1) > budget:
                yield self._take(batch)
                batch, max_len = [], 0
                new_max = length
            batch.append(i)
            max_len = new_max
        if batch:
            yield self._take(batch)


# ---------------------------------------------------------------------- #
# config-visible factories (reference names preserved)
# ---------------------------------------------------------------------- #
def _expand_paths(spec: str) -> List[str]:
    paths: List[str] = []
    for part in spec.split(","):
        part = part.strip()
        matched = sorted(_glob.glob(part))
        if matched:
            paths.extend(matched)
        else:
            paths.append(part)
    return paths


def load_dataset_from_files(name: str = None,
                            lazy: bool = False,
                            preprocessors: List[Tuple] = None,
                            **kwargs) -> Dataset:
    """Build a dataset from ``s_<series>=...`` keyword arguments.

    Values may be a path string (read with the plain-text reader), a
    ``(path, reader)`` tuple, or for ``s_<series>_out=`` keys an output
    path. ``lazy`` is accepted for config compatibility; series are
    materialized eagerly (host RAM is ample relative to these corpora and
    eager series enable global length bucketing).
    """
    series: Dict[str, List[Any]] = {}
    outputs: Dict[str, str] = {}

    if lazy:
        warn("lazy=True requested; series will be materialized eagerly")

    for key, value in kwargs.items():
        if not key.startswith(SERIES_OUTPUT_PREFIX):
            raise ValueError(f"Unexpected dataset argument: {key}")
        series_name = key[len(SERIES_OUTPUT_PREFIX):]
        if series_name.endswith(OUTPUT_SUFFIX):
            outputs[series_name[: -len(OUTPUT_SUFFIX)]] = value
            continue
        if isinstance(value, tuple) and len(value) == 2:
            path_spec, reader = value
        else:
            path_spec, reader = value, UtfPlainTextReader
        paths = _expand_paths(path_spec)
        for p in paths:
            if not os.path.exists(p):
                raise FileNotFoundError(
                    f"File not found for series '{series_name}': {p}")
        series[series_name] = list(reader(paths))

    if name is None:
        name = "dataset"
    ds = Dataset(name=name, series=series, outputs=outputs,
                 preprocessors=preprocessors)
    log(f"Dataset '{name}' loaded: {len(ds)} examples, "
        f"series {ds.series_ids}")
    return ds


def load(name: str = None,
         series: List[str] = None,
         data: List[Any] = None,
         outputs: List[Tuple[str, str]] = None,
         preprocessors: List[Tuple] = None,
         lazy: bool = False,
         buffer_size: int = None,
         shuffled: bool = False) -> Dataset:
    """Newer-style reference factory: parallel ``series``/``data`` lists."""
    del buffer_size
    if lazy:
        warn("lazy=True requested; series will be materialized eagerly")
    series = series or []
    data = data or []
    if len(series) != len(data):
        raise ValueError("series and data must have the same length")
    series_dict: Dict[str, List[Any]] = {}
    for series_name, spec in zip(series, data):
        if isinstance(spec, tuple) and len(spec) == 2 \
                and not isinstance(spec[0], str):
            # (reader, path) or (path, reader)
            spec = (spec[1], spec[0])
        if isinstance(spec, tuple):
            path_spec, reader = spec
        elif isinstance(spec, str):
            path_spec, reader = spec, UtfPlainTextReader
        elif isinstance(spec, list):
            series_dict[series_name] = spec
            continue
        else:
            raise ValueError(f"Cannot interpret data spec {spec!r}")
        series_dict[series_name] = list(reader(_expand_paths(path_spec)))
    out_dict = {k: v for k, v in (outputs or [])}
    ds = Dataset(name=name or "dataset", series=series_dict,
                 outputs=out_dict, preprocessors=preprocessors,
                 shuffled=shuffled)
    log(f"Dataset '{ds.name}' loaded: {len(ds)} examples, "
        f"series {ds.series_ids}")
    return ds


def from_dict(series: Dict[str, List[Any]],
              name: str = "runtime_dataset") -> Dataset:
    """In-memory dataset (used by the REST server)."""
    return Dataset(name=name, series=series)


# reference-era alias
from_files = load_dataset_from_files
