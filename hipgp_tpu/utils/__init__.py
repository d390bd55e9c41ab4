"""Support utilities: statistics, block indexing, config, metrics, checkpointing."""
from . import blocks, checkpoint, metrics, stats

__all__ = ["blocks", "checkpoint", "metrics", "stats"]
