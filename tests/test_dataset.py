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


# ---------------------------------------------------------------------- #
# lazy / streaming datasets
# ---------------------------------------------------------------------- #
def _write_corpus(tmp_path, n=37):
    src = tmp_path / "src.txt"
    tgt = tmp_path / "tgt.txt"
    src.write_text("\n".join(
        " ".join(f"s{i}w{j}" for j in range(1 + i % 5))
        for i in range(n)) + "\n")
    tgt.write_text("\n".join(
        " ".join(f"t{i}w{j}" for j in range(1 + (i + 2) % 4))
        for i in range(n)) + "\n")
    return str(src), str(tgt)


def test_lazy_matches_eager_in_order(tmp_path):
    from neuralmonkey_tpu.dataset import (BatchingScheme, LazyDataset,
                                          load_dataset_from_files)
    src, tgt = _write_corpus(tmp_path)
    eager = load_dataset_from_files(s_source=src, s_target=tgt)
    lazy = load_dataset_from_files(s_source=src, s_target=tgt,
                                   lazy=True)
    assert isinstance(lazy, LazyDataset)
    scheme = BatchingScheme(batch_size=8)
    for be, bl in zip(eager.batches(scheme, shuffled=False),
                      lazy.batches(scheme, shuffled=False)):
        assert be.get_series("source") == bl.get_series("source")
        assert be.get_series("target") == bl.get_series("target")
    # and a second epoch re-reads the files identically
    first = [b.get_series("source")
             for b in lazy.batches(scheme, shuffled=False)]
    second = [b.get_series("source")
              for b in lazy.batches(scheme, shuffled=False)]
    assert first == second


def test_lazy_streams_incrementally(tmp_path):
    """The first batch must be produced after a bounded number of
    reader pulls — never after materializing the whole corpus."""
    from neuralmonkey_tpu.dataset import BatchingScheme, LazyDataset
    pulls = []

    def counting_reader(paths):
        for i in range(10_000):
            pulls.append(i)
            yield [f"w{i}"]

    lazy = LazyDataset("big", {"source": ([], counting_reader)},
                       buffer_size=16)
    batches = lazy.batches(BatchingScheme(batch_size=4), shuffled=True)
    first = next(batches)
    assert len(first) == 4
    # shuffle buffer (16) + one batch of slack, not 10k
    assert len(pulls) <= 16 + 8


def test_lazy_shuffle_buffer_covers_all(tmp_path):
    from neuralmonkey_tpu.dataset import (BatchingScheme,
                                          load_dataset_from_files)
    src, tgt = _write_corpus(tmp_path, n=25)
    lazy = load_dataset_from_files(s_source=src, s_target=tgt,
                                   lazy=True, buffer_size=7)
    seen = []
    for b in lazy.batches(BatchingScheme(batch_size=4), shuffled=True):
        seen.extend(tuple(s) for s in b.get_series("source"))
    assert len(seen) == 25
    assert len(set(seen)) == 25  # every example exactly once


def test_lazy_bucketing_and_preprocessors(tmp_path):
    from neuralmonkey_tpu.dataset import (BatchingScheme,
                                          load_dataset_from_files)
    src, tgt = _write_corpus(tmp_path)
    lazy = load_dataset_from_files(
        s_source=src, s_target=tgt, lazy=True,
        preprocessors=[("source", "source_up",
                        lambda s: [t.upper() for t in s])])
    assert lazy.has_series("source_up")
    scheme = BatchingScheme(batch_size=6, bucket_boundaries=[2, 4])
    total = 0
    for b in lazy.batches(scheme, shuffled=False):
        # bucket key = max length across series (same rule as eager)
        lens = [max(len(s), len(t))
                for s, t in zip(b.get_series("source"),
                                b.get_series("target"))]
        bucket_of = [0 if l <= 2 else (1 if l <= 4 else 2)
                     for l in lens]
        assert len(set(bucket_of)) == 1  # single bucket per batch
        up = b.get_series("source_up")
        assert all(t == t.upper() for s in up for t in s)
        total += len(b)
    assert total == 37
