"""NN primitives: initializers, projections, recurrent cells.

Rebuild of reference nm/nn/ (ortho_gru_cell.py, projection.py, mlp.py,
highway.py, utils.py). Everything is a pure ``init(rng, ...) -> params`` /
``apply(params, ...) -> out`` pair over plain dict pytrees — the
functional replacement for TF variable scopes.

Cell equations match TF1 conventions exactly (SURVEY.md §8.3 item 3):

- GRU (tf.nn.rnn_cell.GRUCell): joint gate matmul over ``[x, h]`` with
  bias init 1.0; ``r, u = split(sigmoid(gates))``; candidate
  ``c = tanh(W_c [x, r*h] + b_c)``; ``h' = u*h + (1-u)*c``.
- LSTM (tf.nn.rnn_cell.LSTMCell): gates ``i, j, f, o`` from
  ``[x, h]``; forget bias 1.0; ``c' = c*σ(f+1) + σ(i)*tanh(j)``;
  ``h' = tanh(c')*σ(o)``.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jnp.ndarray]


# ---------------------------------------------------------------------- #
# initializers
# ---------------------------------------------------------------------- #
def glorot_uniform(rng: Any, shape: Sequence[int],
                   dtype: Any = jnp.float32) -> jnp.ndarray:
    fan_in, fan_out = shape[-2], shape[-1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, dtype, -limit, limit)


def orthogonal(rng: Any, shape: Sequence[int],
               dtype: Any = jnp.float32) -> jnp.ndarray:
    """Orthogonal init (used by OrthoGRUCell for recurrent weights)."""
    if len(shape) < 2:
        raise ValueError("Orthogonal init needs >= 2 dims")
    rows = shape[0]
    cols = int(np.prod(shape[1:]))
    size = max(rows, cols)
    a = jax.random.normal(rng, (size, size), dtype)
    q, r = jnp.linalg.qr(a)
    q = q * jnp.sign(jnp.diag(r))
    return q[:rows, :cols].reshape(shape)


def zeros(rng: Any, shape: Sequence[int],
          dtype: Any = jnp.float32) -> jnp.ndarray:
    del rng
    return jnp.zeros(shape, dtype)


# ---------------------------------------------------------------------- #
# linear / projections (reference nm/nn/projection.py)
# ---------------------------------------------------------------------- #
def linear_init(rng, in_dim: int, out_dim: int, use_bias: bool = True,
                init: Callable = glorot_uniform) -> Params:
    k_w, _ = jax.random.split(rng)
    params = {"w": init(k_w, (in_dim, out_dim))}
    if use_bias:
        params["b"] = jnp.zeros((out_dim,))
    return params



def pdot(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Param matmul under the compute-precision policy: when the
    weight was cast to bf16 (ops/policy.py), the activation joins it
    so the MXU runs a true bf16xbf16 pass; accumulation is pinned to
    float32 either way."""
    if w.dtype == jnp.bfloat16 and x.dtype != jnp.bfloat16:
        x = x.astype(jnp.bfloat16)
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


def linear(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = pdot(x, params["w"])
    if "b" in params:
        y = y + params["b"]
    return y


def nonlinear(params: Params, x: jnp.ndarray,
              activation=jnp.tanh) -> jnp.ndarray:
    return activation(linear(params, x))


def maxout_init(rng, in_dim: int, out_dim: int, pool_size: int = 2
                ) -> Params:
    return linear_init(rng, in_dim, out_dim * pool_size)


def maxout(params: Params, x: jnp.ndarray, pool_size: int = 2
           ) -> jnp.ndarray:
    """Maxout projection (Goodfellow et al.; used by the Bahdanau-style
    decoder output layer, reference nm/nn/projection.py)."""
    y = linear(params, x)
    y = y.reshape(y.shape[:-1] + (y.shape[-1] // pool_size, pool_size))
    return jnp.max(y, axis=-1)


def multilayer_projection_init(rng, in_dim: int,
                               layer_sizes: Sequence[int]) -> List[Params]:
    layers = []
    dim = in_dim
    for i, size in enumerate(layer_sizes):
        rng, sub = jax.random.split(rng)
        layers.append(linear_init(sub, dim, size))
        dim = size
    return layers


def multilayer_projection(layers: List[Params], x: jnp.ndarray,
                          activation=jnp.tanh,
                          dropout_fn=None) -> jnp.ndarray:
    for layer in layers:
        x = activation(linear(layer, x))
        if dropout_fn is not None:
            x = dropout_fn(x)
    return x


def highway_init(rng, dim: int) -> Params:
    k1, k2 = jax.random.split(rng)
    return {
        "h": linear_init(k1, dim, dim),
        "t": {"w": glorot_uniform(k2, (dim, dim)),
              # gate bias init -1 biases toward carry (standard highway)
              "b": jnp.full((dim,), -1.0)},
    }


def highway(params: Params, x: jnp.ndarray, activation=jnp.tanh
            ) -> jnp.ndarray:
    """Highway layer (reference nm/nn/highway.py)."""
    h = activation(linear(params["h"], x))
    t = jax.nn.sigmoid(linear(params["t"], x))
    return h * t + x * (1.0 - t)


# ---------------------------------------------------------------------- #
# dropout (reference nm/nn/utils.py)
# ---------------------------------------------------------------------- #
def dropout(x: jnp.ndarray, keep_prob: float, rng,
            train: bool) -> jnp.ndarray:
    """Inverted dropout; identity when not training or keep_prob == 1."""
    if not train or keep_prob >= 1.0:
        return x
    mask = jax.random.bernoulli(rng, keep_prob, x.shape)
    return jnp.where(mask, x / keep_prob, 0.0)


def maybe_dropout(x: jnp.ndarray, keep_prob: float,
                  rng) -> jnp.ndarray:
    """Inverted dropout iff an rng was drawn for this site (the caller
    draws one exactly when ``Context.dropout`` would have applied it,
    so remat-wrapped layer bodies stay pure functions of their args)."""
    if rng is None:
        return x
    return dropout(x, keep_prob, rng, True)


# ---------------------------------------------------------------------- #
# recurrent cells
# ---------------------------------------------------------------------- #
class GRUCell:
    """TF1-convention GRU. State: h (B, H)."""

    def __init__(self, input_dim: int, hidden_dim: int,
                 recurrent_init: Callable = glorot_uniform) -> None:
        self.input_dim = input_dim
        self.hidden_dim = hidden_dim
        self.recurrent_init = recurrent_init
        self.state_size = hidden_dim
        self.output_dim = hidden_dim

    def init(self, rng: Any) -> Params:
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        h = self.hidden_dim
        return {
            "gates_x": glorot_uniform(k1, (self.input_dim, 2 * h)),
            "gates_h": self.recurrent_init(k2, (h, 2 * h)),
            # gate bias 1.0 → start remembering (TF1 GRUCell convention)
            "gates_b": jnp.ones((2 * h,)),
            "cand_x": glorot_uniform(k3, (self.input_dim, h)),
            "cand_h": self.recurrent_init(k4, (h, h)),
            "cand_b": jnp.zeros((h,)),
        }

    def initial_state(self, batch: int, dtype=jnp.float32) -> jnp.ndarray:
        return jnp.zeros((batch, self.state_size), dtype)

    def __call__(self, params: Params, h: jnp.ndarray, x: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        gates = jax.nn.sigmoid(
            pdot(x, params["gates_x"])
            + pdot(h, params["gates_h"])
            + params["gates_b"])
        r, u = jnp.split(gates, 2, axis=-1)
        cand = jnp.tanh(
            pdot(x, params["cand_x"])
            + pdot(r * h, params["cand_h"])
            + params["cand_b"])
        new_h = u * h + (1.0 - u) * cand
        return new_h, new_h  # (new_state, output)

    def output(self, state: jnp.ndarray) -> jnp.ndarray:
        return state


class OrthoGRUCell(GRUCell):
    """GRU with orthogonally-initialized recurrent weights
    (reference nm/nn/ortho_gru_cell.py)."""

    def __init__(self, input_dim: int, hidden_dim: int) -> None:
        super().__init__(input_dim, hidden_dim, recurrent_init=orthogonal)


class LayerNormGRUCell(GRUCell):
    """GRU with layer normalization on gate/candidate preactivations."""

    def init(self, rng: Any) -> Params:
        params = super().init(rng)
        h = self.hidden_dim
        params["ln_gates_scale"] = jnp.ones((2 * h,))
        params["ln_cand_scale"] = jnp.ones((h,))
        return params

    @staticmethod
    def _ln(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray
            ) -> jnp.ndarray:
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + 1e-6) * scale + bias

    def __call__(self, params, h, x):
        pre_gates = (
            pdot(x, params["gates_x"])
            + pdot(h, params["gates_h"]))
        gates = jax.nn.sigmoid(self._ln(
            pre_gates, params["ln_gates_scale"], params["gates_b"]))
        r, u = jnp.split(gates, 2, axis=-1)
        pre_cand = (
            pdot(x, params["cand_x"])
            + pdot(r * h, params["cand_h"]))
        cand = jnp.tanh(self._ln(
            pre_cand, params["ln_cand_scale"], params["cand_b"]))
        new_h = u * h + (1.0 - u) * cand
        return new_h, new_h


class NoisyGRUCell(GRUCell):
    """Noisy-activation GRU (reference nm/nn/noisy_gru_cell.py; Gülçehre
    et al. 2016 "Noisy Activation Functions"). At inference it uses the
    hard-saturating activations; during training, when a ``noise_rng``
    is threaded in (recurrent scans fold a per-timestep key), half-
    normal noise is injected in the saturated regions:

        y = α·h(x) + (1−α)·u(x) + d(x)·σ(x)·|ξ|,   ξ ~ N(0, 1)

    with h the hard function, u its linearization, Δ = h − u,
    σ(x) = c·(sigmoid(Δ) − ½)² (zero in the linear region, growing
    with saturation depth — the annealing is input-adaptive),
    d(x) = sgn(x)·sgn(α−1).
    """

    ALPHA = 1.15
    C = 0.5

    def __init__(self, input_dim: int, hidden_dim: int,
                 training: bool = False) -> None:
        super().__init__(input_dim, hidden_dim)
        self.training = training

    @staticmethod
    def _hard_sigmoid(x):
        return jnp.clip(0.25 * x + 0.5, 0.0, 1.0)

    @staticmethod
    def _hard_tanh(x):
        return jnp.clip(x, -1.0, 1.0)

    @classmethod
    def _noisy(cls, hard_value, linear_value, x, rng):
        delta = hard_value - linear_value
        sigma = cls.C * jnp.square(jax.nn.sigmoid(delta) - 0.5)
        d = jnp.sign(x) * jnp.sign(cls.ALPHA - 1.0)
        xi = jnp.abs(jax.random.normal(rng, x.shape, x.dtype))
        return (cls.ALPHA * hard_value
                + (1.0 - cls.ALPHA) * linear_value
                + d * sigma * xi)

    def __call__(self, params, h, x, noise_rng=None):
        gates_pre = (
            pdot(x, params["gates_x"])
            + pdot(h, params["gates_h"])
            + params["gates_b"])
        gates = self._hard_sigmoid(gates_pre)
        if noise_rng is not None:
            k1, k2 = jax.random.split(noise_rng)
            gates = self._noisy(gates, 0.25 * gates_pre + 0.5,
                                gates_pre, k1)
        r, u = jnp.split(gates, 2, axis=-1)
        cand_pre = (
            pdot(x, params["cand_x"])
            + pdot(r * h, params["cand_h"])
            + params["cand_b"])
        cand = self._hard_tanh(cand_pre)
        if noise_rng is not None:
            cand = self._noisy(cand, cand_pre, cand_pre, k2)
        new_h = u * h + (1.0 - u) * cand
        return new_h, new_h


class LSTMCell:
    """TF1-convention LSTM. State: (c, h) tuple."""

    def __init__(self, input_dim: int, hidden_dim: int,
                 forget_bias: float = 1.0) -> None:
        self.input_dim = input_dim
        self.hidden_dim = hidden_dim
        self.forget_bias = forget_bias
        self.state_size = hidden_dim
        self.output_dim = hidden_dim

    def init(self, rng: Any) -> Params:
        k1, k2 = jax.random.split(rng)
        h = self.hidden_dim
        return {
            "kernel_x": glorot_uniform(k1, (self.input_dim, 4 * h)),
            "kernel_h": glorot_uniform(k2, (h, 4 * h)),
            "bias": jnp.zeros((4 * h,)),
        }

    def initial_state(self, batch: int, dtype=jnp.float32):
        return (jnp.zeros((batch, self.hidden_dim), dtype),
                jnp.zeros((batch, self.hidden_dim), dtype))

    def __call__(self, params: Params, state, x: jnp.ndarray):
        c, h = state
        z = (pdot(x, params["kernel_x"])
             + pdot(h, params["kernel_h"])
             + params["bias"])
        i, j, f, o = jnp.split(z, 4, axis=-1)
        new_c = (c * jax.nn.sigmoid(f + self.forget_bias)
                 + jax.nn.sigmoid(i) * jnp.tanh(j))
        new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o)
        return (new_c, new_h), new_h

    def output(self, state: Any) -> jnp.ndarray:
        return state[1]


CELL_TYPES = {
    "GRU": GRUCell,
    "OrthoGRU": OrthoGRUCell,
    "LayerNormGRU": LayerNormGRUCell,
    "NoisyGRU": NoisyGRUCell,
    "LSTM": LSTMCell,
}


def make_cell(cell_type: str, input_dim: int, hidden_dim: int):
    if cell_type not in CELL_TYPES:
        raise ValueError(
            f"Unknown rnn_cell '{cell_type}' "
            f"(choose from {sorted(CELL_TYPES)})")
    return CELL_TYPES[cell_type](input_dim, hidden_dim)
