"""Image-side unit tests: CNN encoder, fillers, temporal view,
multi-source attention combinators, image reader."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralmonkey_tpu.dataset import Dataset
from neuralmonkey_tpu.model.part import (Context, collect_parts,
                                         init_all_params)
from neuralmonkey_tpu.models.attention.combination import (
    FlatMultiAttention, HierarchicalMultiAttention)
from neuralmonkey_tpu.models.attention.feed_forward import Attention
from neuralmonkey_tpu.models.decoders.beam_search_decoder import \
    BeamSearchDecoder
from neuralmonkey_tpu.models.decoders.decoder import Decoder
from neuralmonkey_tpu.models.encoders.cnn_encoder import (CNNEncoder,
                                                          CNNTemporalView)
from neuralmonkey_tpu.models.encoders.numpy_stateful_filler import (
    SpatialFiller, StatefulFiller)
from neuralmonkey_tpu.models.encoders.recurrent import SentenceEncoder
from neuralmonkey_tpu.vocabulary import Vocabulary

RNG = np.random.RandomState(0)


def _ctx(parts, ds, train=False):
    all_parts = collect_parts(parts)
    params = init_all_params(all_parts, jax.random.PRNGKey(0))
    batch = {}
    for p in all_parts:
        batch.update(p.featurize(ds, train=train))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    return Context(params, batch, train=train,
                   rng=jax.random.PRNGKey(1)), params


def test_stateful_filler():
    ds = Dataset("d", {"vec": [RNG.randn(8).astype(np.float32)
                               for _ in range(3)]})
    filler = StatefulFiller(name="sf", dimension=8, data_id="vec",
                            output_shape=4)
    ctx, _ = _ctx([filler], ds)
    assert filler.output(ctx).shape == (3, 4)
    assert filler.output_dim == 4


def test_spatial_filler():
    ds = Dataset("d", {"maps": [RNG.randn(4, 4, 8).astype(np.float32)
                                for _ in range(2)]})
    filler = SpatialFiller(name="spf", input_shape=[4, 4, 8],
                           data_id="maps", projection_dim=16)
    ctx, _ = _ctx([filler], ds)
    assert filler.spatial_states(ctx).shape == (2, 4, 4, 16)
    assert filler.spatial_mask(ctx).shape == (2, 4, 4)
    assert filler.output(ctx).shape == (2, 16)


def test_spatial_filler_shape_check():
    ds = Dataset("d", {"maps": [RNG.randn(2, 2, 8).astype(np.float32)]})
    filler = SpatialFiller(name="spf", input_shape=[4, 4, 8],
                           data_id="maps")
    with pytest.raises(ValueError):
        filler.featurize(ds)


def test_cnn_encoder():
    ds = Dataset("d", {"img": [RNG.randn(16, 16, 3).astype(np.float32)
                               for _ in range(2)]})
    cnn = CNNEncoder(
        name="cnn", data_id="img",
        convolutions=[("C", 3, 1, 8), ("M", 2, 2), ("C", 3, 2, 12)],
        image_height=16, image_width=16, pixel_dim=3,
        fully_connected=[20], batch_normalize=True)
    ctx, _ = _ctx([cnn], ds)
    spatial = cnn.spatial_states(ctx)
    assert spatial.shape == (2, 4, 4, 12)  # 16 -> pool/2=8 -> stride2=4
    assert cnn.output(ctx).shape == (2, 20)

    view = CNNTemporalView(name="view", cnn=cnn)
    ctx2, _ = _ctx([view], ds)
    assert view.temporal_states(ctx2).shape == (2, 16, 12)
    assert view.temporal_mask(ctx2).shape == (2, 16)


def test_spatial_attention_from_decoder():
    """A decoder can attend over a SpatialStateful directly."""
    vt = Vocabulary()
    vt.add_tokenized_text(["x", "y"])
    ds = Dataset("d", {
        "maps": [RNG.randn(3, 3, 8).astype(np.float32)
                 for _ in range(2)],
        "caption": [["x", "y"], ["y"]]})
    filler = SpatialFiller(name="spf", input_shape=[3, 3, 8],
                           data_id="maps")
    att = Attention(name="att", encoder=filler, state_size=16)
    dec = Decoder(name="dec", vocabulary=vt, data_id="caption",
                  max_output_len=4, rnn_size=12, encoders=[filler],
                  attentions=[att], embedding_size=8)
    ctx, _ = _ctx([dec], ds, train=True)
    assert np.isfinite(float(dec.train_loss(ctx)))
    aux_weights = dec.decode_step(
        dec.decode_constants(ctx),
        dec.decode_initial_state(ctx, dec.decode_constants(ctx)),
        jnp.zeros((2,), jnp.int32), 0)[2]["attention_weights"]
    assert aux_weights[0].shape == (2, 9)  # 3x3 grid flattened


@pytest.fixture(scope="module")
def multimodal():
    vs, vt = Vocabulary(), Vocabulary()
    vs.add_tokenized_text(["a", "b"])
    vt.add_tokenized_text(["x", "y"])
    ds = Dataset("d", {
        "source": [["a", "b"], ["b"]],
        "target": [["x"], ["y", "x"]],
        "maps": [RNG.randn(2, 2, 6).astype(np.float32)
                 for _ in range(2)]})
    text_enc = SentenceEncoder(name="tenc", vocabulary=vs,
                               data_id="source", embedding_size=8,
                               rnn_size=6)
    img_enc = SpatialFiller(name="ienc", input_shape=[2, 2, 6],
                            data_id="maps", projection_dim=12)
    return vs, vt, ds, text_enc, img_enc


def test_flat_multi_attention(multimodal):
    vs, vt, ds, text_enc, img_enc = multimodal
    flat = FlatMultiAttention(
        name="flat", encoders=[text_enc, img_enc],
        attention_state_size=10)
    dec = Decoder(name="dec", vocabulary=vt, data_id="target",
                  max_output_len=4, rnn_size=9,
                  encoders=[text_enc, img_enc], attentions=[flat],
                  embedding_size=8)
    ctx, params = _ctx([dec], ds, train=True)
    assert np.isfinite(float(dec.train_loss(ctx)))
    constants = flat.precompute(ctx)
    # concat length = T_text + H*W
    assert constants.mask.shape == (2, 2 + 4)
    context, weights = flat.step(params["flat"], constants,
                                 jnp.ones((2, 9)))
    assert context.shape == (2, 10)
    np.testing.assert_allclose(np.asarray(weights).sum(1), 1.0,
                               atol=1e-5)


def test_hierarchical_multi_attention(multimodal):
    vs, vt, ds, text_enc, img_enc = multimodal
    att_text = Attention(name="att_t", encoder=text_enc, state_size=10)
    att_img = Attention(name="att_i", encoder=img_enc, state_size=10)
    hier = HierarchicalMultiAttention(
        name="hier", attentions=[att_text, att_img],
        attention_state_size=10)
    dec = Decoder(name="dec", vocabulary=vt, data_id="target",
                  max_output_len=4, rnn_size=9,
                  encoders=[text_enc, img_enc], attentions=[hier],
                  embedding_size=8)
    ctx, params = _ctx([dec], ds, train=True)
    assert np.isfinite(float(dec.train_loss(ctx)))

    # beam search through hierarchical attention (tiling correctness)
    bs = BeamSearchDecoder(name="bs", parent_decoder=dec, beam_size=3)
    ctx_eval = Context(ctx.params, ctx.batch, train=False)
    out = bs.search(ctx_eval)
    assert np.asarray(out.token_ids).shape == (2, 3, 4)
    # beam=1 equals greedy through the combinator too
    bs1 = BeamSearchDecoder(name="bs1", parent_decoder=dec,
                            beam_size=1, length_normalization=0.0)
    np.testing.assert_array_equal(
        np.asarray(bs1.search(ctx_eval).token_ids)[:, 0],
        np.asarray(dec.decoded(ctx_eval)))


def test_image_reader(tmp_path):
    from PIL import Image
    from neuralmonkey_tpu.readers.image_reader import (image_reader,
                                                       imagenet_reader)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(2):
        Image.new("RGB", (10 + i * 4, 8), color=(i * 100, 50, 0)).save(
            str(img_dir / f"im{i}.png"))
    listing = tmp_path / "list.txt"
    listing.write_text("im0.png\nim1.png\n")

    reader = image_reader(prefix=str(img_dir), pad_w=12, pad_h=12)
    images = list(reader([str(listing)]))
    assert all(im.shape == (12, 12, 3) for im in images)

    inet = imagenet_reader(prefix=str(img_dir), target_width=8,
                           target_height=8, vgg_normalization=True)
    images = list(inet([str(listing)]))
    assert all(im.shape == (8, 8, 3) for im in images)
    assert images[0].min() < 0  # mean-subtracted
