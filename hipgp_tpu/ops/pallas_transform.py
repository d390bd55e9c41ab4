"""Fused 2-D circulant-apply Pallas kernel.

The hot op of every PCG iteration is the real-eigenbasis sandwich
    out = Q0 ((Q0^T x Q1) * W) Q1^T        (per batch sample)
— four (L, L) matmuls plus an elementwise scale.  As an einsum chain XLA
materializes each intermediate in HBM (~5 round trips of the batch tensor);
this kernel keeps a sample resident in VMEM across all four MXU calls: one
HBM read of x, one write of out, with Q0/Q1/W loaded once.

Gradients: the operator is linear and symmetric in x, so the VJP w.r.t. x is
the same kernel; the VJP w.r.t. W is (analysis of x) * (analysis of g),
computed with the plain einsum path (never on the hot loop).

Status: OPT-IN (bttb.USE_PALLAS_TRANSFORM, default False).  Measured on v5e
the fused kernel LOSES to the einsum chain (522 ms vs 74 ms, 30-iteration
whiten, batch 1000, 128x128): at HIGHEST matmul precision the einsum path is
already MXU-compute-bound — HBM traffic is not the bottleneck this fusion
removes — and Mosaic lowers the blocked rank-3 dot_generals suboptimally.
Kept with full tests as the starting point for a future hand-scheduled
variant.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["circulant_apply_2d", "PALLAS_MAX_LEN"]

PALLAS_MAX_LEN = 512  # Q0, Q1, W and ~4 sample buffers must fit 16MB VMEM


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


def _kernel(x_ref, q0_ref, q1_ref, wt_ref, o_ref, *, S, L0, L1):
    """S samples resident in VMEM; all contractions are (S*L, L) matmuls so
    the MXU sees full tiles.  wt is w TRANSPOSED ((L1, L0)) to match the
    intermediate layout."""
    hi = jax.lax.Precision.HIGHEST

    def mm(a, b, dn):
        return jax.lax.dot_general(
            a, b, (dn, ((), ())), precision=hi,
            preferred_element_type=jnp.float32,
        )

    x = x_ref[:]  # (S, L0, L1)
    q0 = q0_ref[:]
    q1 = q1_ref[:]
    # 1) minor-axis analysis: 'sij,jl->sil' as one (S*L0, L1) matmul
    t = mm(x.reshape(S * L0, L1), q1, (((1,), (0,)))).reshape(S, L0, L1)
    # 2) leading-axis analysis: 'sil,ik->slk' (contract dim 1)
    u = mm(t, q0, (((1,), (0,))))  # (S, L1, L0)
    u = u * wt_ref[:]  # wt: (L1, L0)
    # 3) leading-axis synthesis: 'slk,ck->slc' (contract with Q0^T)
    v = mm(u, q0, (((2,), (1,))))  # (S, L1, L0)
    # 4) minor-axis synthesis: 'slc,dl->scd' (contract with Q1^T)
    o = mm(v, q1, (((1,), (1,))))  # (S, L0, L1)
    o_ref[:] = o.astype(o_ref.dtype)


def _pallas_apply(x, Q0, Q1, w, interpret=False, samples_per_block=64):
    import functools as ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L0, L1 = x.shape
    # pick a block size that divides the (padded) batch and fits VMEM
    S = min(samples_per_block, B)
    budget = 1024 * 1024 // (L0 * L1 * 4)  # ~1MB blocks: x/out double-buffered + 3 intermediates must fit 16MB VMEM
    S = max(1, min(S, budget))
    nb = -(-B // S)
    pad = nb * S - B
    xp = jnp.pad(x, ((0, pad), (0, 0), (0, 0))) if pad else x

    out = pl.pallas_call(
        ft.partial(_kernel, S=S, L0=L0, L1=L1),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((S, L0, L1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L0, L0), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L1, L1), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L1, L0), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, L0, L1), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * S, L0, L1), x.dtype),
        interpret=interpret,
    )(xp, Q0, Q1, w.T)
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
