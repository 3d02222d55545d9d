"""Self-critical sequence training
(reference nm/trainers/self_critical_objective.py; Rennie et al. 2017).

REINFORCE with the greedy decode as baseline: sample a sequence, score
both the sample and the greedy output against the reference with a
sentence-level metric (GLEU/BLEU), and weight the sample's log-prob by
the advantage. Rewards are computed on host via ``jax.pure_callback``
(the XLA-era replacement for the reference's tf.py_func).
"""

from __future__ import annotations

from typing import Any, Callable, List

import jax
import jax.numpy as jnp
import numpy as np

from ..evaluators.gleu import gleu_sentence
from ..model.part import Context
from ..vocabulary import END_TOKEN_INDEX, PAD_TOKEN_INDEX
from .generic_trainer import Objective


def _ids_to_lists(ids: np.ndarray) -> List[List[int]]:
    out = []
    for row in ids:
        sent: List[int] = []
        for token in row:
            token = int(token)
            if token == END_TOKEN_INDEX:
                break
            if token != PAD_TOKEN_INDEX:
                sent.append(token)
        out.append(sent)
    return out


def sentence_gleu(hyp_ids: Any, ref_ids: Any) -> float:
    return gleu_sentence([str(i) for i in hyp_ids],
                         [str(i) for i in ref_ids])


def sentence_bleu(hyp_ids: Any, ref_ids: Any) -> float:
    from ..evaluators.bleu import BLEUEvaluator
    return BLEUEvaluator.bleu(
        [[str(i) for i in hyp_ids]], [[[str(i) for i in ref_ids]]])


def _batch_rewards(reward_function: Callable,
                   hyp: np.ndarray, ref: np.ndarray) -> np.ndarray:
    hyps = _ids_to_lists(np.asarray(hyp))
    refs = _ids_to_lists(np.asarray(ref))
    return np.array(
        [reward_function(h, r) for h, r in zip(hyps, refs)],
        np.float32)


def self_critical_objective(decoder,
                            reward_function: Callable = sentence_gleu,
                            weight: float = 1.0,
                            name: str = None) -> Objective:

    def loss(ctx: Context) -> jnp.ndarray:
        targets = ctx.batch[decoder.target_ids_key]
        sampled, sampled_logprob = decoder.sample_outputs(ctx)
        _, greedy, _ = decoder.greedy_outputs(ctx)
        batch = targets.shape[0]

        def host_rewards(hyp, ref):
            return _batch_rewards(reward_function, hyp, ref)

        result_shape = jax.ShapeDtypeStruct((batch,), jnp.float32)
        sampled_reward = jax.pure_callback(
            host_rewards, result_shape, sampled, targets,
            vmap_method="sequential")
        greedy_reward = jax.pure_callback(
            host_rewards, result_shape, greedy, targets,
            vmap_method="sequential")
        advantage = jax.lax.stop_gradient(
            sampled_reward - greedy_reward)
        return -jnp.mean(advantage * sampled_logprob)

    return Objective(
        name=name or f"{decoder.name} - self-critical",
        decoder=decoder, loss=loss, weight=weight)


def reinforce_objective(decoder,
                        reward_function: Callable = sentence_gleu,
                        subtract_baseline: bool = True,
                        weight: float = 1.0,
                        name: str = None) -> Objective:
    """Plain REINFORCE (reference nm/trainers/rl_trainer.py): sampled
    reward, optional running-mean-free batch baseline."""

    def loss(ctx: Context) -> jnp.ndarray:
        targets = ctx.batch[decoder.target_ids_key]
        sampled, sampled_logprob = decoder.sample_outputs(ctx)
        batch = targets.shape[0]

        def host_rewards(hyp, ref):
            return _batch_rewards(reward_function, hyp, ref)

        reward = jax.pure_callback(
            host_rewards,
            jax.ShapeDtypeStruct((batch,), jnp.float32),
            sampled, targets, vmap_method="sequential")
        if subtract_baseline:
            reward = reward - jnp.mean(reward)
        return -jnp.mean(jax.lax.stop_gradient(reward)
                         * sampled_logprob)

    return Objective(
        name=name or f"{decoder.name} - reinforce",
        decoder=decoder, loss=loss, weight=weight)


# reference module-name compatibility
rl_objective = reinforce_objective
