"""Support utilities: statistics, block indexing, config, metrics, checkpointing."""
from . import blocks, checkpoint, metrics, naming, profiling, stats

__all__ = ["blocks", "checkpoint", "metrics", "naming", "profiling", "stats"]
