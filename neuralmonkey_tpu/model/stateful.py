"""Typed interfaces between model parts (reference nm/model/stateful.py).

The best idea in the reference, kept verbatim in spirit: any part
exposing an interface can feed any part consuming it, which is what
makes multimodal models a pure-config exercise.

- :class:`Stateful` — a single vector per example: ``output(ctx)`` →
  ``(B, d)``.
- :class:`TemporalStateful` — a sequence of states + mask:
  ``temporal_states(ctx)`` → ``(B, T, d)``, ``temporal_mask(ctx)`` →
  ``(B, T)``.
- :class:`SpatialStateful` — a conv map + mask:
  ``spatial_states(ctx)`` → ``(B, H, W, d)``, ``spatial_mask(ctx)`` →
  ``(B, H, W)``.

All methods take the functional :class:`~..model.part.Context` instead
of reading TF graph properties; dimensions are exposed statically via
``output_dim`` / ``state_dim`` properties so parts can size their
parameters at construction time (the rebuild's answer to @tensor-time
shape propagation, SURVEY.md §8.3 item 4).
"""

from __future__ import annotations

from typing import Any

from abc import abstractmethod


class Stateful:
    @abstractmethod
    def output(self, ctx: Any):  # (B, output_dim)
        raise NotImplementedError

    @property
    @abstractmethod
    def output_dim(self) -> int:
        raise NotImplementedError


class TemporalStateful:
    @abstractmethod
    def temporal_states(self, ctx: Any):  # (B, T, state_dim)
        raise NotImplementedError

    @abstractmethod
    def temporal_mask(self, ctx: Any):  # (B, T)
        raise NotImplementedError

    @property
    @abstractmethod
    def state_dim(self) -> int:
        raise NotImplementedError


class SpatialStateful:
    @abstractmethod
    def spatial_states(self, ctx: Any):  # (B, H, W, state_dim)
        raise NotImplementedError

    @abstractmethod
    def spatial_mask(self, ctx: Any):  # (B, H, W)
        raise NotImplementedError

    @property
    @abstractmethod
    def state_dim(self) -> int:
        raise NotImplementedError


class TemporalStatefulWithOutput(TemporalStateful, Stateful):
    pass


class SpatialStatefulWithOutput(SpatialStateful, Stateful):
    pass
