"""Fused cropped 2-D sandwich kernel + PCG vs the einsum path (Pallas
interpret mode on CPU; compiled on TPU via the verify recipe and the
protocol runs).

Parity target: the 2-D FFT applies / PCG of `ziggy/misc/toeplitz_tensor.py:
54-125`, rebuilt as the cropped-IO blocked kernel in ops/mxu2d.py and the
fused solver in solve._mxu2d_solver.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hipgp_tpu.ops import (
    make_spectrum,
    matmul_by_Cinv,
    matmul_by_K,
    matmul_by_RT,
    pcg,
    pcg_scan,
)
from hipgp_tpu.ops.bttb import _full_weights
from hipgp_tpu.ops import mxu2d
from hipgp_tpu.ops.mxu2d import sandwich_apply, sandwich_apply_selfdot
from hipgp_tpu.ops.solve import _mxu2d_pcg


def _spec(dims=(12, 9), ell=0.07):
    grids = [jnp.linspace(0.0, 1.0, m) for m in dims]
    kf = lambda a, b: jnp.exp(
        -0.5 * jnp.sum(((a[:, None, :] - b[None, :, :]) / ell) ** 2, -1)
    )
    return make_spectrum(grids, kf, jitter=1e-3)


@pytest.mark.parametrize("dims", [(12, 9), (16, 16), (7, 20)])
def test_sandwich_matches_einsum_applies(dims, rng):
    spec = _spec(dims)
    w = _full_weights(spec.eigs, spec.edims[-1])
    B = 5
    v = jnp.asarray(rng.standard_normal((B, spec.M)))
    x3 = v.reshape((B,) + spec.dims)
    got = sandwich_apply(x3, w, spec.dims, spec.edims).reshape(B, -1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(matmul_by_K(spec, v)),
                               rtol=1e-12, atol=1e-12)
    got = sandwich_apply(x3, 1.0 / w, spec.dims, spec.edims).reshape(B, -1)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(matmul_by_Cinv(spec, v)),
                               rtol=1e-12, atol=1e-12)
    got = sandwich_apply(x3, jnp.sqrt(w), spec.dims, spec.edims,
                         out_expanded=True).reshape(B, -1)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(matmul_by_RT(spec, v)),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("merged", [False, True])
def test_selfdot_emits_inner_products(merged, rng, monkeypatch):
    monkeypatch.setattr(mxu2d, "MERGED_MIDDLE", merged)
    spec = _spec((16, 16))  # edims (32, 32); merged path needs no lane gate
    w = _full_weights(spec.eigs, spec.edims[-1])
    B = 7  # exercises the block padding (S=8 default)
    v = jnp.asarray(rng.standard_normal((B, spec.M)))
    y, dots = sandwich_apply_selfdot(v.reshape((B,) + spec.dims), w,
                                     spec.dims, spec.edims)
    want = matmul_by_K(spec, v)
    np.testing.assert_allclose(np.asarray(y.reshape(B, -1)), np.asarray(want),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(dots),
                               np.asarray(jnp.sum(v * want, axis=-1)),
                               rtol=1e-10)


def test_sandwich_gradients_match_einsum_operator(rng):
    spec = _spec((12, 9))
    w = _full_weights(spec.eigs, spec.edims[-1])
    B = 3
    x3 = jnp.asarray(rng.standard_normal((B,) + spec.dims))
    g = jnp.asarray(rng.standard_normal((B,) + spec.dims))

    def loss_fused(x, w):
        return jnp.sum(sandwich_apply(x, w, spec.dims, spec.edims) * g)

    def loss_einsum(x, w):
        half = w[..., : spec.edims[-1] // 2 + 1]
        s2 = spec.replace(eigs=half)
        y = matmul_by_K(s2, x.reshape(B, -1)).reshape((B,) + spec.dims)
        return jnp.sum(y * g)

    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x3, w)
    gx_e, _ = jax.grad(loss_einsum, argnums=(0, 1))(x3, w)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_e),
                               rtol=1e-11, atol=1e-12)
    # w-cotangent against central finite differences
    eps = 1e-6
    for idx in [(0, 0), (1, 2), (3, 5)]:
        dw = jnp.zeros_like(w).at[idx].set(1.0)
        fd = (float(loss_fused(x3, w + eps * dw))
              - float(loss_fused(x3, w - eps * dw))) / (2 * eps)
        np.testing.assert_allclose(float(gw_f[idx]), fd, rtol=1e-5, atol=1e-9)


def test_expanded_input_pullback_roundtrip(rng):
    """RT (cropped in, expanded out) vjp needs the expanded-in variant."""
    spec = _spec((10, 8))
    w = jnp.sqrt(_full_weights(spec.eigs, spec.edims[-1]))
    B = 2
    x3 = jnp.asarray(rng.standard_normal((B,) + spec.dims))
    g = jnp.asarray(rng.standard_normal((B,) + spec.edims))

    def loss(x):
        return jnp.sum(sandwich_apply(x, w, spec.dims, spec.edims,
                                      out_expanded=True) * g)

    gx = jax.grad(loss)(x3)
    eps = 1e-6
    dv = jnp.zeros_like(x3).at[(0, 2, 3)].set(1.0)
    fd = (float(loss(x3 + eps * dv)) - float(loss(x3 - eps * dv))) / (2 * eps)
    np.testing.assert_allclose(float(gx[0, 2, 3]), fd, rtol=1e-6)


@pytest.mark.parametrize("fixed_iters", [True, False])
def test_mxu2d_pcg_matches_generic_pcg(fixed_iters, rng):
    """The fused-solver PCG loop is update-order identical to cg.pcg(_scan)
    given the same operator and iteration count."""
    spec = _spec((14, 11), ell=0.05)
    wK = _full_weights(spec.eigs, spec.edims[-1])
    wC = 1.0 / wK
    B, maxiter = 4, 25
    b = jnp.asarray(rng.standard_normal((B, spec.M)))
    got = _mxu2d_pcg(b.reshape((B,) + spec.dims), wK, wC, spec.dims,
                     spec.edims, maxiter, 1e-12, fixed_iters).reshape(B, -1)
    mv = lambda v: matmul_by_K(spec, v)
    pc = lambda v: matmul_by_Cinv(spec, v)
    if fixed_iters:
        want = pcg_scan(mv, b, precond=pc, num_iters=maxiter)
    else:
        want = pcg(mv, b, precond=pc, maxiter=maxiter, tol=1e-12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-9, atol=1e-10)
