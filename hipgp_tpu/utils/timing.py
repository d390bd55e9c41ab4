"""Chained-input steady-state timing for the axon-tunneled TPU.

Two measured hazards (CLAUDE.md): identical dispatches may be served from
a cache, and first executions on fresh operand buffers run ~30x slower
than steady state.  The helper defeats both by (a) warming up with
several chained calls and (b) making every rep's input DATA-DEPENDENT on
the previous rep's output — a zero-valued nudge (0 * sum(out)) keeps the
numerics identical while forcing the runtime to serialize reps, so the
measured time is honest per-call latency rather than overlapped
throughput.

This is the single canonical implementation (previously triplicated
across bench.py / run_pcg_vs_cholesky / precision_study).
"""
from __future__ import annotations

import time


def chain_time(f, x, reps: int = 5, warmup: int = 3):
    """Return (seconds_per_call, last_output) of ``f(x)`` at steady state.

    ``x`` may be any pytree of arrays; ``f``'s output may be any pytree
    with at least one array leaf.
    """
    import jax
    import jax.numpy as jnp

    def link(x, out):
        leaf = jax.tree.leaves(out)[0]
        dep = jnp.sum(leaf) * 0
        return jax.tree.map(lambda a: a + dep.astype(a.dtype), x)

    out = jax.block_until_ready(f(x))
    for _ in range(warmup):
        x = link(x, out)
        out = jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    for _ in range(reps):
        x = link(x, out)
        out = f(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out
