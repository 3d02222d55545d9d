"""Model-part layer (reference nm/model/, SURVEY.md §2 L3)."""

from .part import Context, ModelPart, tensor, collect_parts
from .stateful import Stateful, TemporalStateful, SpatialStateful
