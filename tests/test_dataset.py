"""Dataset/batching tests (mirrors reference test_dataset.py intent)."""

import pytest

from neuralmonkey_tpu.dataset import (BatchingScheme, Dataset, from_dict,
                                      load_dataset_from_files)


def _toy():
    return Dataset(
        name="toy",
        series={
            "source": [["a"] * n for n in (1, 2, 3, 4, 5, 6, 7, 8)],
            "target": [["b"] * n for n in (1, 2, 3, 4, 5, 6, 7, 8)],
        })


def test_series_access():
    ds = _toy()
    assert len(ds) == 8
    assert ds.has_series("source")
    assert not ds.has_series("nope")
    assert ds.maybe_get_series("nope") is None
    assert len(ds.get_series("target")) == 8


def test_mismatched_series_raise():
    with pytest.raises(ValueError):
        Dataset(name="bad", series={"a": [[1]], "b": [[1], [2]]})


def test_fixed_batching():
    ds = _toy()
    batches = list(ds.batches(BatchingScheme(batch_size=3)))
    assert [len(b) for b in batches] == [3, 3, 2]
    # order preserved when not shuffled
    assert batches[0].get_series("source")[0] == ["a"]


def test_token_level_batching():
    ds = _toy()
    scheme = BatchingScheme(batch_size=8, token_level_batching=True)
    batches = list(ds.batches(scheme))
    assert sum(len(b) for b in batches) == 8
    for b in batches:
        max_len = max(len(s) for s in b.get_series("source"))
        assert max_len * len(b) <= 8


def test_bucketed_batching():
    ds = _toy()
    scheme = BatchingScheme(batch_size=2, bucket_boundaries=[3, 6])
    batches = list(ds.batches(scheme))
    assert sum(len(b) for b in batches) == 8
    for b in batches:
        lengths = [len(s) for s in b.get_series("source")]
        # all examples in one batch fall in the same bucket
        buckets = set()
        for length in lengths:
            if length <= 3:
                buckets.add(0)
            elif length <= 6:
                buckets.add(1)
            else:
                buckets.add(2)
        assert len(buckets) == 1


def test_from_files(tmp_path):
    src = tmp_path / "train.src"
    src.write_text("a b c\nd e\n", encoding="utf-8")
    tgt = tmp_path / "train.tgt"
    tgt.write_text("x y\nz\n", encoding="utf-8")
    ds = load_dataset_from_files(
        name="files", s_source=str(src), s_target=str(tgt),
        s_output_out=str(tmp_path / "out.txt"))
    assert len(ds) == 2
    assert ds.get_series("source") == [["a", "b", "c"], ["d", "e"]]
    assert ds.series_outputs["output"].endswith("out.txt")


def test_preprocessors():
    ds = Dataset(
        name="pre",
        series={"source": [["A", "B"], ["C"]]},
        preprocessors=[("source", "source_lc",
                        lambda s: [t.lower() for t in s])])
    assert ds.get_series("source_lc") == [["a", "b"], ["c"]]


def test_from_dict_and_subset():
    ds = from_dict({"s": [[1], [2], [3], [4]]})
    sub = ds.subset(1, 2)
    assert len(sub) == 2
    assert sub.get_series("s") == [[2], [3]]
