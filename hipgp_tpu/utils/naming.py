"""Run naming helpers (parity: `ziggy/misc/util.py:24-50`)."""
from __future__ import annotations

import datetime
import json

import numpy as np

__all__ = ["add_date_time", "NumpyEncoder"]


def add_date_time(s: str = "") -> str:
    """Append a _Dyymmdd_HHMMSS stamp to a run name."""
    d = datetime.datetime.now()
    return s + d.strftime("_D%y%m%d_%H%M%S")


class NumpyEncoder(json.JSONEncoder):
    """JSON encoder accepting numpy scalars and arrays."""

    def default(self, obj):
        if isinstance(obj, np.integer):
            return int(obj)
        if isinstance(obj, np.floating):
            return float(obj)
        if isinstance(obj, np.ndarray):
            return obj.tolist()
        return super().default(obj)


def print_vec(name, vec):
    """Debug summary of a vector (parity: `ziggy/misc/util.py:13-21`)."""
    import jax.numpy as jnp

    a = jnp.abs(jnp.asarray(vec))
    print(
        f"{name} max = {float(jnp.max(a))}, min = {float(jnp.min(a))}, "
        f"mean = {float(jnp.mean(a))}"
    )
