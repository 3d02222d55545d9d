"""CTC debug runner (reference nm/runners/ctc_debug_runner.py): raw
per-frame argmax symbols before collapse (blank as '_')."""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from ..model.part import Context
from ..vocabulary import PAD_TOKEN_INDEX
from .base_runner import BaseRunner, ExecutionResult


class CTCDebugRunner(BaseRunner):

    def fetches(self, ctx: Context) -> Dict:
        logits = self.decoder.logits(ctx)
        return {
            "frames": jnp.argmax(logits, axis=-1),
            "mask": self.decoder.encoder.temporal_mask(ctx),
        }

    def collect_results(self, fetched: Dict[str, Any], num_examples: int) -> ExecutionResult:
        frames = np.asarray(fetched["frames"])[:num_examples]
        mask = np.asarray(fetched["mask"])[:num_examples]
        vocabulary = self.decoder.vocabulary
        outputs = []
        for row, m in zip(frames, mask):
            length = int(m.sum())
            outputs.append([
                "_" if int(i) == PAD_TOKEN_INDEX
                else vocabulary.index_to_word[int(i)]
                for i in row[:length]])
        return ExecutionResult(outputs=outputs, losses={},
                               size=num_examples)
