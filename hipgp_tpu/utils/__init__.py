"""Support utilities: statistics, block indexing, config, metrics, checkpointing."""
from . import blocks, stats

__all__ = ["blocks", "stats"]
