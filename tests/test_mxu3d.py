"""Fused 3-D sandwich (outer einsum + weight-plane-batched 2-D kernel) vs
the einsum path (Pallas interpret mode on CPU; compiled on TPU via the
verify recipe and the run_domain protocol).

Parity target: the 3-D FFT applies / PCG of `ziggy/misc/toeplitz_tensor.py:
54-125`, rebuilt as ops/mxu3d.py + solve._mxu3d_solver.
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
from hipgp_tpu.ops.mxu3d import best_perm, sandwich_apply_3d, \
    sandwich_apply_3d_selfdot
from hipgp_tpu.ops.solve import _fused_sandwich_pcg, _inv_perm, _rt_mxu3d


def _spec(dims=(6, 7, 5), ell=0.09):
    grids = [jnp.linspace(0.0, 1.0, m) for m in dims]
    kf = lambda a, b: jnp.exp(
        -0.5 * jnp.sum(((a[:, None, :] - b[None, :, :]) / ell) ** 2, -1)
    )
    return make_spectrum(grids, kf, jitter=1e-3)


def test_best_perm_orders_embedded_ascending():
    assert best_perm((100, 100, 18)) == (2, 0, 1)
    assert best_perm((18, 100, 100)) == (0, 1, 2)
    assert best_perm((128, 64, 128)) == (1, 0, 2)


@pytest.mark.parametrize("dims", [(6, 7, 5), (8, 8, 4), (4, 9, 6)])
def test_sandwich3d_matches_einsum_applies(dims, rng):
    spec = _spec(dims)
    w = _full_weights(spec.eigs, spec.edims[-1])
    B = 3
    v = jnp.asarray(rng.standard_normal((B, spec.M)))
    x4 = v.reshape((B,) + spec.dims)
    got = sandwich_apply_3d(x4, w, spec.dims, spec.edims).reshape(B, -1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(matmul_by_K(spec, v)),
                               rtol=1e-12, atol=1e-12)
    got = sandwich_apply_3d(x4, 1.0 / w, spec.dims, spec.edims).reshape(B, -1)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(matmul_by_Cinv(spec, v)),
                               rtol=1e-12, atol=1e-12)
    got = sandwich_apply_3d(x4, jnp.sqrt(w), spec.dims, spec.edims,
                            out_expanded=True).reshape(B, -1)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(matmul_by_RT(spec, v)),
                               rtol=1e-12, atol=1e-12)


def test_selfdot3d_emits_inner_products(rng):
    spec = _spec((6, 8, 8))
    w = _full_weights(spec.eigs, spec.edims[-1])
    B = 7  # exercises block padding
    v = jnp.asarray(rng.standard_normal((B, spec.M)))
    y, dots = sandwich_apply_3d_selfdot(v.reshape((B,) + spec.dims), w,
                                        spec.dims, spec.edims)
    want = matmul_by_K(spec, v)
    np.testing.assert_allclose(np.asarray(y.reshape(B, -1)), np.asarray(want),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(dots),
                               np.asarray(jnp.sum(v * want, axis=-1)),
                               rtol=1e-10)


def test_sandwich3d_gradients_match_einsum_operator(rng):
    spec = _spec((5, 6, 4))
    w = _full_weights(spec.eigs, spec.edims[-1])
    B = 2
    x4 = jnp.asarray(rng.standard_normal((B,) + spec.dims))
    g = jnp.asarray(rng.standard_normal((B,) + spec.dims))

    def loss_fused(x, w):
        return jnp.sum(sandwich_apply_3d(x, w, spec.dims, spec.edims) * g)

    def loss_einsum(x, w):
        half = w[..., : spec.edims[-1] // 2 + 1]
        s2 = spec.replace(eigs=half)
        y = matmul_by_K(s2, x.reshape(B, -1)).reshape((B,) + spec.dims)
        return jnp.sum(y * g)

    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x4, w)
    gx_e, _ = jax.grad(loss_einsum, argnums=(0, 1))(x4, w)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_e),
                               rtol=1e-11, atol=1e-12)
    eps = 1e-6
    for idx in [(0, 0, 0), (1, 2, 3), (3, 5, 1)]:
        dw = jnp.zeros_like(w).at[idx].set(1.0)
        fd = (float(loss_fused(x4, w + eps * dw))
              - float(loss_fused(x4, w - eps * dw))) / (2 * eps)
        np.testing.assert_allclose(float(gw_f[idx]), fd, rtol=1e-5, atol=1e-9)


def test_rt_expanded_pullback_roundtrip(rng):
    """RT (cropped in, expanded out) vjp needs the expanded-in variant."""
    spec = _spec((5, 6, 4))
    w = jnp.sqrt(_full_weights(spec.eigs, spec.edims[-1]))
    B = 2
    x4 = jnp.asarray(rng.standard_normal((B,) + spec.dims))
    g = jnp.asarray(rng.standard_normal((B,) + spec.edims))

    def loss(x):
        return jnp.sum(sandwich_apply_3d(x, w, spec.dims, spec.edims,
                                         out_expanded=True) * g)

    gx = jax.grad(loss)(x4)
    eps = 1e-6
    dv = jnp.zeros_like(x4).at[(0, 2, 3, 1)].set(1.0)
    fd = (float(loss(x4 + eps * dv)) - float(loss(x4 - eps * dv))) / (2 * eps)
    np.testing.assert_allclose(float(gx[0, 2, 3, 1]), fd, rtol=1e-6)


def test_rt_mxu3d_matches_matmul_by_rt(rng):
    """The solver-facing R^T wrapper, including the kernel-order permutation
    and its inverse on the expanded layout."""
    spec = _spec((5, 7, 4))
    B = 3
    d = jnp.asarray(rng.standard_normal((B, spec.M)))
    got = _rt_mxu3d(spec, d)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(matmul_by_RT(spec, d)),
                               rtol=1e-11, atol=1e-12)


@pytest.mark.parametrize("fixed_iters", [True, False])
def test_mxu3d_pcg_matches_generic_pcg(fixed_iters, rng):
    """The fused-solver PCG loop (permuted kernel order) is update-order
    identical to cg.pcg(_scan) given the same operator and iterations."""
    spec = _spec((6, 7, 5), ell=0.06)
    perm = best_perm(spec.edims)
    inv = _inv_perm(perm)
    pdims = tuple(spec.dims[a] for a in perm)
    pedims = tuple(spec.edims[a] for a in perm)
    wK = jnp.transpose(_full_weights(spec.eigs, spec.edims[-1]), perm)
    wC = 1.0 / wK
    B, maxiter = 3, 25
    b = jnp.asarray(rng.standard_normal((B, spec.M)))
    s0 = b.reshape((B,) + spec.dims).transpose(
        (0,) + tuple(a + 1 for a in perm))
    apply_dot = lambda s, w: sandwich_apply_3d_selfdot(s, w, pdims, pedims)
    got = _fused_sandwich_pcg(apply_dot, s0, wK, wC, maxiter, 1e-12,
                              fixed_iters)
    got = got.transpose((0,) + tuple(a + 1 for a in inv)).reshape(B, -1)
    mv = lambda v: matmul_by_K(spec, v)
    pc = lambda v: matmul_by_Cinv(spec, v)
    if fixed_iters:
        want = pcg_scan(mv, b, precond=pc, num_iters=maxiter)
    else:
        want = pcg(mv, b, precond=pc, maxiter=maxiter, tol=1e-12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-9, atol=1e-10)


def test_wp3_whole_sample_kernel_matches_two_stage(rng):
    """The whole-sample fused kernel (wp3: outer analysis/synthesis inside
    the kernel, inner contractions merged across ALL outer planes) matches
    the outer-einsum + wp pipeline on both the apply and the fused dots."""
    from hipgp_tpu.ops import mxu3d

    dims, edims = (8, 64, 64), (16, 128, 128)
    x = jnp.asarray(rng.standard_normal((5,) + dims), jnp.float32)
    w = jnp.asarray(np.abs(rng.standard_normal(edims)) + 0.1, jnp.float32)

    assert mxu3d._wp3_ok(dims, edims, jnp.float32)
    old = mxu3d.USE_WP3
    try:
        mxu3d.USE_WP3 = False
        y0, d0 = sandwich_apply_3d_selfdot(x, w, dims, edims, interpret=True)
        mxu3d.USE_WP3 = True
        y1, d1 = sandwich_apply_3d_selfdot(x, w, dims, edims, interpret=True)
    finally:
        mxu3d.USE_WP3 = old
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), rtol=2e-5)


def test_wp3_gate_rejects_unfit_shapes():
    from hipgp_tpu.ops import mxu3d

    assert not mxu3d._wp3_ok((8, 64, 64), (16, 128, 128), jnp.float64)
    assert not mxu3d._wp3_ok((8, 64, 60), (16, 128, 120), jnp.float32)
    # embedded volume over the VMEM budget
    assert not mxu3d._wp3_ok((64, 256, 256), (128, 512, 512), jnp.float32)


def test_wp3_tables_survive_retrace(rng):
    """The memoized wp3 builder may first run INSIDE a jit trace; its
    cached tables must be host arrays, not that trace's tracers
    (regression: UnexpectedTracerError on the warmstart's ragged-chunk
    retrace at paper scale)."""
    from hipgp_tpu.ops import mxu3d

    mxu3d._get_wp3.cache_clear()
    dims, edims = (8, 64, 64), (16, 128, 128)
    w = jnp.asarray(np.abs(rng.standard_normal(edims)) + 0.1, jnp.float32)

    old = mxu3d.USE_WP3
    mxu3d.USE_WP3 = True
    try:
        f = jax.jit(lambda xx: sandwich_apply_3d_selfdot(
            xx, w, dims, edims, interpret=True)[0])
        f(jnp.asarray(rng.standard_normal((4,) + dims), jnp.float32))
        # second trace at a different batch shape
        f(jnp.asarray(rng.standard_normal((2,) + dims), jnp.float32))
    finally:
        mxu3d.USE_WP3 = old
