"""ImageNet encoders, wordpiece, audio features, speech-to-CTC wiring."""

import os
import wave

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralmonkey_tpu.dataset import Dataset
from neuralmonkey_tpu.model.part import (Context, collect_parts,
                                         init_all_params)
from neuralmonkey_tpu.models.encoders.imagenet_encoder import ImageNet
from neuralmonkey_tpu.processors.wordpiece import (
    WordpiecePostprocessor, WordpiecePreprocessor,
    build_wordpiece_vocabulary)
from neuralmonkey_tpu.readers.audio_reader import (audio_reader,
                                                   log_mel_features,
                                                   mfcc_features)
from neuralmonkey_tpu.vocabulary import Vocabulary

RNG = np.random.RandomState(0)


@pytest.mark.parametrize("net,grid,dim", [
    ("vgg_16", 4, 512),
    ("resnet_v2_50", 2, 2048),
])
def test_imagenet_encoder(net, grid, dim):
    ds = Dataset("d", {"img": [RNG.randn(64, 64, 3).astype(np.float32)
                               for _ in range(2)]})
    enc = ImageNet(name=f"inet_{net}", data_id="img",
                   network_type=net, input_size=64)
    parts = collect_parts([enc])
    params = init_all_params(parts, jax.random.PRNGKey(0))
    batch = {}
    for p in parts:
        batch.update(p.featurize(ds))
    ctx = Context(params, {k: jnp.asarray(v)
                           for k, v in batch.items()})
    assert enc.spatial_states(ctx).shape == (2, grid, grid, dim)
    assert enc.output(ctx).shape == (2, dim)


def test_imagenet_frozen_gradients():
    ds = Dataset("d", {"img": [RNG.randn(32, 32, 3).astype(np.float32)]})
    enc = ImageNet(name="inet", data_id="img", network_type="vgg_16",
                   fine_tune=False)
    parts = collect_parts([enc])
    params = init_all_params(parts, jax.random.PRNGKey(0))
    batch = {}
    for p in parts:
        batch.update(p.featurize(ds))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    def loss(p):
        return jnp.sum(enc.output(Context(p, batch)) ** 2)
    grads = jax.grad(loss)(params)
    total = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree_util.tree_leaves(grads["inet"]))
    assert total == 0.0  # frozen


def test_wordpiece_roundtrip():
    corpus = [s.split() for s in
              ["the quick brown fox", "the quicker fox jumps",
               "quick thinking"] * 3]
    vocab = build_wordpiece_vocabulary(corpus, max_size=200,
                                       min_freq=1)
    pre = WordpiecePreprocessor(vocab)
    post = WordpiecePostprocessor()
    for sent in corpus:
        pieces = pre(sent)
        assert all(p in vocab or p == "<unk>" for p in pieces)
        assert post([pieces])[0] == sent


def test_wordpiece_unknown_char():
    vocab = Vocabulary()
    vocab.add_word("a")
    pre = WordpiecePreprocessor(vocab)
    assert pre(["☂"]) == ["<unk>"]


def _write_wav(path, seconds=0.3, rate=8000):
    t = np.linspace(0, seconds, int(rate * seconds))
    signal = (0.3 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(signal.tobytes())


def test_audio_features(tmp_path):
    wav = str(tmp_path / "tone.wav")
    _write_wav(wav)
    listing = tmp_path / "list.txt"
    listing.write_text("tone.wav\n")

    reader = audio_reader(prefix=str(tmp_path), features="logmel",
                          n_filters=20)
    feats = list(reader([str(listing)]))
    assert len(feats) == 1
    assert feats[0].shape[1] == 20
    assert feats[0].shape[0] > 10  # ~28 frames for 0.3 s / 10 ms step
    assert np.isfinite(feats[0]).all()

    mfcc_reader = audio_reader(prefix=str(tmp_path), features="mfcc",
                               n_coeffs=13)
    mfcc = list(mfcc_reader([str(listing)]))[0]
    assert mfcc.shape[1] == 13


def test_audio_to_ctc_pipeline(tmp_path):
    """Speech features feed the RawRNN + CTC path end to end."""
    from neuralmonkey_tpu.models.decoders.ctc_decoder import CTCDecoder
    from neuralmonkey_tpu.models.encoders.raw_rnn_encoder import \
        RawRNNEncoder
    wav = str(tmp_path / "a.wav")
    _write_wav(wav)
    reader = audio_reader(prefix=str(tmp_path), n_filters=8)
    listing = tmp_path / "list.txt"
    listing.write_text("a.wav\na.wav\n")
    feats = list(reader([str(listing)]))
    vt = Vocabulary()
    vt.add_tokenized_text(["h", "i"])
    ds = Dataset("d", {"audio": feats, "chars": [["h", "i"], ["h"]]})
    enc = RawRNNEncoder(name="aenc", data_id="audio", input_size=8,
                        rnn_size=6)
    ctc = CTCDecoder(name="ctc", encoder=enc, vocabulary=vt,
                     data_id="chars")
    parts = collect_parts([ctc])
    params = init_all_params(parts, jax.random.PRNGKey(0))
    batch = {}
    for p in parts:
        batch.update(p.featurize(ds))
    ctx = Context(params, {k: jnp.asarray(v)
                           for k, v in batch.items()})
    assert np.isfinite(float(ctc.train_loss(ctx)))


def test_write_png_valid():
    """Pure-numpy PNG writer emits decodable files (magic, IHDR dims,
    IDAT inflates to the right pixel count)."""
    import struct
    import zlib
    import numpy as np
    from neuralmonkey_tpu.utils.png import write_png
    import tempfile, os
    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "m.png")
        write_png(path, arr, scale=2)
        blob = open(path, "rb").read()
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    width, height = struct.unpack(">II", blob[16:24])
    assert (width, height) == (8, 6)
    # locate IDAT and inflate
    idx = blob.index(b"IDAT")
    size = struct.unpack(">I", blob[idx - 4:idx])[0]
    raw = zlib.decompress(blob[idx + 4:idx + 4 + size])
    assert len(raw) == height * (width + 1)  # +1 filter byte per row


def test_visualize_embeddings_projection(tmp_path):
    """[main] visualize_embeddings writes projector-compatible TSVs."""
    import numpy as np
    from neuralmonkey_tpu.experiment import Experiment
    from neuralmonkey_tpu.model.sequence import EmbeddedSequence
    from neuralmonkey_tpu.vocabulary import Vocabulary

    vocab = Vocabulary()
    for w in ("aa", "bb", "cc"):
        vocab.add_word(w)
    seq = EmbeddedSequence(name="emb", vocabulary=vocab,
                           data_id="source", embedding_size=4)

    exp = Experiment.__new__(Experiment)
    exp.output_dir = str(tmp_path)

    class FakeManager:
        params = {"emb": {"embeddings":
                          np.arange(len(vocab) * 4,
                                    dtype=np.float32).reshape(-1, 4)}}
    exp.tf_manager = FakeManager()
    exp._write_embedding_projections([seq])

    vecs = open(tmp_path / "emb_embeddings.tsv").read().splitlines()
    meta = open(tmp_path / "emb_metadata.tsv").read().splitlines()
    assert len(vecs) == len(meta) == len(vocab)
    assert meta[-1] == "cc"
    assert len(vecs[0].split("\t")) == 4
