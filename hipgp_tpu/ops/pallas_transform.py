"""Fused 2-D circulant-apply Pallas kernel.

The hot op of every PCG iteration on 2-D grids is the real-eigenbasis
sandwich
    out = Q0 ((Q0^T x Q1) * W) Q1^T        (per batch sample)
— four (L, L) matmuls plus an elementwise scale.  As an einsum chain XLA
materializes each intermediate in HBM (~5 round trips of the batch tensor);
this kernel keeps a sample resident in VMEM across all four MXU calls: one
HBM read of x, one write of out, with Q0/Q1 (and their transposes) and W
loaded once.

v2 design (same lessons as the 1-D radix kernel, `radix_fft.py`):
  * per-sample python loop over the block — every operand is a natural 2-D
    VMEM tile and every dot is a plain (L, L) matmul (the v1 blocked
    rank-3 dot_generals lowered poorly in Mosaic);
  * dots at the HIGH-equivalent bf16 hi/lo 3-pass emulation
    (`radix_fft._make_dot`) — Mosaic has no HIGH, and HIGHEST's 6 passes
    measured 7x slower than the einsum chain at the old design.
Measured at the paper shapes (5-deep scan chains, v5e): (250, 250) batch
256: 2.06 vs 2.50 ms/apply for the HIGH einsum chain; (256, 256) batch
1000: 4.56 vs 5.55 ms (-18% both), 1e-5 vs the f64 oracle.  Inside the
whitening SOLVE, however, the einsum chain wins back (35.4 vs 36.4 ms per
20-iteration batch-256 solve at M=125^2): XLA fuses the PCG axpys into the
chain while pallas_call is a fusion barrier.  OFF by default
(`bttb.USE_PALLAS_TRANSFORM`); flip it for apply-dominated workloads.

Gradients: the operator is linear and symmetric in x, so the VJP w.r.t. x is
the same kernel; the VJP w.r.t. W is (analysis of x) * (analysis of g),
computed with the plain einsum path (never on the hot loop).

Parity: behavioral twin of the reference's 2-D FFT applies
(`ziggy/misc/toeplitz_tensor.py:70-125`), rebuilt in the real eigenbasis.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .radix_fft import HIGH, _make_dot

__all__ = ["circulant_apply_2d", "PALLAS_MAX_LEN"]

PALLAS_MAX_LEN = 512  # Q0/Q0^T/Q1/Q1^T/W + 2S sample planes must fit 16MB VMEM


def _analysis_2d(x, Q0, Q1, precision):
    """coefficients A = Q0^T x Q1 for (..., L0, L1) x."""
    a = jnp.einsum("...ij,ik->...kj", x, Q0, precision=precision)
    return jnp.einsum("...kj,jl->...kl", a, Q1, precision=precision)


def _apply_einsum(x, Q0, Q1, w, precision):
    a = jnp.einsum("...ij,jl->...il", x, Q1, precision=precision)
    a = jnp.einsum("...il,ik->...kl", a, Q0, precision=precision)
    a = a * w
    a = jnp.einsum("...kl,kc->...cl", a, Q0.T, precision=precision)
    return jnp.einsum("...cl,ld->...cd", a, Q1.T, precision=precision)


def _kernel(q0_ref, q0t_ref, q1_ref, q1t_ref, w_ref, x_ref, o_ref, *, S):
    dot = _make_dot(HIGH, x_ref.dtype)
    q0 = q0_ref[...]
    q0t = q0t_ref[...]
    q1 = q1_ref[...]
    q1t = q1t_ref[...]
    w = w_ref[...]
    for s in range(S):
        x = x_ref[s]
        t = dot(x, q1)      # analysis, minor axis
        u = dot(q0t, t)     # analysis, leading axis
        u = u * w
        v = dot(q0, u)      # synthesis, leading axis
        o_ref[s] = dot(v, q1t).astype(o_ref.dtype)  # synthesis, minor axis


def _pallas_apply(x, Q0, Q1, w, interpret=False, samples_per_block=8):
    import functools as ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L0, L1 = x.shape
    # block size: divides the (padded) batch and fits VMEM alongside the
    # five resident (L, L) constants and the dot intermediates
    S = min(samples_per_block, B)
    budget = max(1, (6 * 1024 * 1024) // (L0 * L1 * 4 * 2))
    S = max(1, min(S, budget))
    nb = -(-B // S)
    pad = nb * S - B
    xp = jnp.pad(x, ((0, pad), (0, 0), (0, 0))) if pad else x

    sq0 = pl.BlockSpec((L0, L0), lambda b: (0, 0), memory_space=pltpu.VMEM)
    sq1 = pl.BlockSpec((L1, L1), lambda b: (0, 0), memory_space=pltpu.VMEM)
    wsp = pl.BlockSpec((L0, L1), lambda b: (0, 0), memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((S, L0, L1), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        ft.partial(_kernel, S=S),
        grid=(nb,),
        in_specs=[sq0, sq0, sq1, sq1, wsp, tile],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((nb * S, L0, L1), x.dtype),
        interpret=interpret,
    )(Q0, Q0.T, Q1, Q1.T, w, xp)
    return out[:B] if pad else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def circulant_apply_2d(x, Q0, Q1, w, interpret=False):
    """out[b] = Q0 ((Q0^T x[b] Q1) * w) Q1^T, fused on TPU.

    x: (B, L0, L1); Q0: (L0, L0); Q1: (L1, L1); w: (L0, L1) real spectrum.
    """
    return _pallas_apply(x, Q0, Q1, w, interpret=interpret)


def _fwd(x, Q0, Q1, w, interpret):
    return _pallas_apply(x, Q0, Q1, w, interpret=interpret), (x, Q0, Q1, w)


def _bwd(interpret, res, g):
    x, Q0, Q1, w = res
    hi = jax.lax.Precision.HIGHEST
    # symmetric in x: d/dx = same operator applied to the cotangent
    gx = _pallas_apply(g, Q0, Q1, w, interpret=interpret)
    # d/dw = sum_b analysis(x_b) * analysis(g_b)  (cold path: einsum is fine)
    ax = _analysis_2d(x, Q0, Q1, hi)
    ag = _analysis_2d(g, Q0, Q1, hi)
    gw = jnp.sum(ax * ag, axis=0)
    # Q0/Q1 are constants (cached bases) — zero cotangents keep jax happy
    return gx, jnp.zeros_like(Q0), jnp.zeros_like(Q1), gw


circulant_apply_2d.defvjp(_fwd, _bwd)
