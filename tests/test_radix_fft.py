"""Fused radix circulant apply vs FFT oracle (Pallas interpret mode on CPU).

Parity target: the FFT applies of `ziggy/misc/toeplitz_tensor.py:70-125`,
rebuilt as the three-stage MXU kernel in ops/radix_fft.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hipgp_tpu.ops.radix_fft import (
    fused_circulant_apply,
    make_plan,
    permute_weights,
    radix_supported,
)


def _even_spectrum(L, rng):
    d = (0.5 + rng.random(L))
    return 0.5 * (d + np.concatenate([d[:1], d[1:][::-1]]))


@pytest.mark.parametrize("L", [8192, 32768])
def test_fused_apply_matches_fft_oracle(L):
    assert radix_supported(L)
    plan = make_plan(L, jnp.float64)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 2, L))
    d = _even_spectrum(L, rng)
    dperm = permute_weights(jnp.asarray(d), plan)
    yr, yi = fused_circulant_apply(
        jnp.asarray(x[:, 0]), jnp.asarray(x[:, 1]), dperm, plan
    )
    for got, plane in [(yr, 0), (yi, 1)]:
        want = np.fft.ifft(d * np.fft.fft(x[:, plane], axis=-1), axis=-1).real
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10, atol=1e-10)


def test_unsupported_lengths_rejected():
    for L in (6144, 1000, 4096):  # non-pow2 / too small
        assert not radix_supported(L)
    assert radix_supported(2**21)


def test_fused_apply_gradients():
    """custom_vjp: x-pullback (symmetric operator) and d_perm cotangent
    against finite differences in f64."""
    L = 8192
    plan = make_plan(L, jnp.float64)
    rng = np.random.default_rng(1)
    xr = jnp.asarray(rng.standard_normal((1, L)))
    xi = jnp.asarray(rng.standard_normal((1, L)))
    d = _even_spectrum(L, rng)
    dperm = permute_weights(jnp.asarray(d), plan)
    w = jnp.asarray(np.cos(np.arange(L) / 7.0))

    def loss(xr, xi, dperm):
        yr, yi = fused_circulant_apply(xr, xi, dperm, plan)
        return jnp.sum(yr * w + 0.3 * yi)

    g = jax.grad(loss, argnums=(0, 1, 2))(xr, xi, dperm)
    eps = 1e-4
    for argi in (0, 1, 2):
        args = [xr, xi, dperm]
        v = np.zeros(np.shape(args[argi]))
        v.flat[:: max(1, v.size // 5)] = 1.0
        vj = jnp.asarray(v)
        hi = list(args)
        hi[argi] = args[argi] + eps * vj
        lo = list(args)
        lo[argi] = args[argi] - eps * vj
        fd = (float(loss(*hi)) - float(loss(*lo))) / (2 * eps)
        an = float(jnp.sum(g[argi] * vj))
        np.testing.assert_allclose(an, fd, rtol=1e-6)


def test_spectrum_evenness_preserved_through_permute():
    """permute_weights is a pure relabeling: sum of weights preserved/L."""
    L = 8192
    plan = make_plan(L, jnp.float64)
    rng = np.random.default_rng(2)
    d = _even_spectrum(L, rng)
    dperm = permute_weights(jnp.asarray(d), plan)
    assert dperm.shape == (plan.A, plan.B, plan.C)
    np.testing.assert_allclose(float(jnp.sum(dperm)) * L, d.sum(), rtol=1e-12)

def test_cropped_apply_matches_padded_full():
    """Cropped-IO apply (rectangular stage-1 tables) == pad -> full apply ->
    crop, and the full-output RT variant == pad -> full apply."""
    from hipgp_tpu.ops.radix_fft import fused_circulant_apply_cropped, row_multiple

    L = 8192
    plan = make_plan(L, jnp.float64)
    BC = row_multiple(L)
    rows = plan.A // 2 + 1            # a non-trivial crop boundary
    Mp = rows * BC
    rng = np.random.default_rng(3)
    xr = jnp.asarray(rng.standard_normal((2, Mp)))
    xi = jnp.asarray(rng.standard_normal((2, Mp)))
    d = _even_spectrum(L, rng)
    dperm = permute_weights(jnp.asarray(d), plan)

    pad = ((0, 0), (0, L - Mp))
    fr, fi = fused_circulant_apply(jnp.pad(xr, pad), jnp.pad(xi, pad),
                                   dperm, plan)
    # in_rows == out_rows (the PCG-iteration shape)
    cr, ci = fused_circulant_apply_cropped(xr, xi, dperm, plan, rows, rows)
    np.testing.assert_allclose(np.asarray(cr), np.asarray(fr[:, :Mp]),
                               rtol=1e-11, atol=1e-11)
    np.testing.assert_allclose(np.asarray(ci), np.asarray(fi[:, :Mp]),
                               rtol=1e-11, atol=1e-11)
    # full expanded output (the R^T shape)
    cr, ci = fused_circulant_apply_cropped(xr, xi, dperm, plan, rows, plan.A)
    np.testing.assert_allclose(np.asarray(cr), np.asarray(fr),
                               rtol=1e-11, atol=1e-11)
    np.testing.assert_allclose(np.asarray(ci), np.asarray(fi),
                               rtol=1e-11, atol=1e-11)


def test_cropped_apply_gradients():
    """Asymmetric-crop pullback: vjp of y = P_out C P_in^T x is the apply
    with crops swapped; checked against finite differences."""
    from hipgp_tpu.ops.radix_fft import fused_circulant_apply_cropped, row_multiple

    L = 8192
    plan = make_plan(L, jnp.float64)
    BC = row_multiple(L)
    rows = plan.A // 2
    Mp = rows * BC
    rng = np.random.default_rng(4)
    xr = jnp.asarray(rng.standard_normal((1, Mp)))
    xi = jnp.asarray(rng.standard_normal((1, Mp)))
    d = _even_spectrum(L, rng)
    dperm = permute_weights(jnp.asarray(d), plan)
    w = jnp.asarray(np.cos(np.arange(L) / 11.0))

    def loss(xr, xi, dperm):
        yr, yi = fused_circulant_apply_cropped(xr, xi, dperm, plan,
                                               rows, plan.A)
        return jnp.sum(yr * w) + 0.2 * jnp.sum(yi * w)

    g = jax.grad(loss, argnums=(0, 1, 2))(xr, xi, dperm)
    eps = 1e-4
    for argi in (0, 1, 2):
        args = [xr, xi, dperm]
        v = np.zeros(np.shape(args[argi]))
        v.flat[:: max(1, v.size // 5)] = 1.0
        vj = jnp.asarray(v)
        hi = list(args); hi[argi] = args[argi] + eps * vj
        lo = list(args); lo[argi] = args[argi] - eps * vj
        fd = (float(loss(*hi)) - float(loss(*lo))) / (2 * eps)
        an = float(jnp.sum(g[argi] * vj))
        np.testing.assert_allclose(an, fd, rtol=1e-6)


def test_stage_order_weights_matches_permute():
    """Radix-forward stage-order spectrum == permute_weights(fft) * L, f64."""
    from hipgp_tpu.ops.radix_fft import stage_order_weights

    L = 8192
    plan = make_plan(L, jnp.float64)
    rng = np.random.default_rng(5)
    emb = _even_spectrum(L, rng)      # any real even vector works
    want = permute_weights(jnp.asarray(np.fft.fft(emb).real), plan) * L
    got = stage_order_weights(jnp.asarray(emb), plan)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-9, atol=1e-9)


def test_planes_solver_matches_standard_pcg():
    """The planes-state PCG solver (packed (2, V, Mp) state, cropped-IO
    applies, stage-order weights) == the standard (B, M) pad/crop PCG at
    machine precision in f64 — including an M that does NOT divide the
    plan's row multiple (tail-mask path) and an odd batch."""
    from hipgp_tpu.kernels import SqExp
    from hipgp_tpu.ops import make_spectrum
    from hipgp_tpu.ops.bttb import matmul_by_Cinv, matmul_by_K
    from hipgp_tpu.ops.cg import pcg_scan
    from hipgp_tpu.ops.radix_fft import row_multiple
    from hipgp_tpu.ops.solve import _planes_solver

    kern = SqExp()
    for M, nb in [(4100, 3), (4096, 4)]:
        grid = [jnp.linspace(0.0, 1.0, M)]
        kf = lambda a, b: kern(a, b, (1.0, 2.5 / M))
        spec = make_spectrum(grid, kf, jitter=1e-3)
        L = spec.edims[0]
        if not radix_supported(L):
            pytest.skip(f"L={L} not radix supported")
        rng = np.random.default_rng(6)
        b = jnp.asarray(rng.standard_normal((nb, M)))

        want = pcg_scan(lambda v: matmul_by_K(spec, v), b,
                        precond=lambda v: matmul_by_Cinv(spec, v),
                        num_iters=12)
        got = _planes_solver(spec, 12, 0.0, True)(None, b)
        # stage-order vs natural-fft weights differ by f64 summation order
        # (~1e-13 on the operator); 12 PCG iterations on the ~1e3-conditioned
        # system amplify that to ~1e-7 on the iterates
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-8, err_msg=f"M={M}")


def test_rt_planes_matches_matmul_by_rt():
    from hipgp_tpu.kernels import SqExp
    from hipgp_tpu.ops import make_spectrum
    from hipgp_tpu.ops.bttb import matmul_by_RT
    from hipgp_tpu.ops.solve import _rt_planes

    M = 4100
    kern = SqExp()
    grid = [jnp.linspace(0.0, 1.0, M)]
    spec = make_spectrum(grid, lambda a, b: kern(a, b, (1.0, 2.5 / M)),
                         jitter=1e-3)
    rng = np.random.default_rng(7)
    d = jnp.asarray(rng.standard_normal((3, M)))
    np.testing.assert_allclose(np.asarray(_rt_planes(spec, d)),
                               np.asarray(matmul_by_RT(spec, d)),
                               rtol=1e-9, atol=1e-10)


def test_selfdot_apply_matches_apply_plus_dot():
    """fused_circulant_apply_cropped_selfdot == (cropped apply, x . y) —
    f64 einsum fallback AND the f32 Pallas s1-dot kernel (interpret mode,
    called directly since the dispatch gate is TPU-only)."""
    from hipgp_tpu.ops.radix_fft import (_stage1_fwd, _stage1_inv_dot_pallas,
                                         _middle_pallas,
                                         fused_circulant_apply_cropped,
                                         fused_circulant_apply_cropped_selfdot,
                                         row_multiple, HIGH,
                                         STAGE1_PRECISION)

    L = 8192
    plan64 = make_plan(L, jnp.float64)
    rng = np.random.default_rng(3)
    rows = (L // 2) // row_multiple(L)
    M = rows * row_multiple(L)
    xr = jnp.asarray(rng.standard_normal((2, M)))
    xi = jnp.asarray(rng.standard_normal((2, M)))
    d = _even_spectrum(L, rng)
    dperm = permute_weights(jnp.asarray(d) / L, plan64)

    yr, yi = fused_circulant_apply_cropped(xr, xi, dperm, plan64, rows, rows)
    gr, gi, dr, di = fused_circulant_apply_cropped_selfdot(
        xr, xi, dperm, plan64, rows, rows)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(yr), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(gi), np.asarray(yi), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(dr),
                               np.sum(np.asarray(xr) * np.asarray(yr), -1),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(di),
                               np.sum(np.asarray(xi) * np.asarray(yi), -1),
                               rtol=1e-10)

    # f32 Pallas s1-dot kernel directly (interpret mode on CPU)
    plan32 = make_plan(L, jnp.float32)
    B, C = plan32.B, plan32.C
    xr32, xi32 = xr.astype(jnp.float32), xi.astype(jnp.float32)
    d32 = permute_weights(jnp.asarray(d, jnp.float32) / L, plan32)
    fr, fi = _stage1_fwd(xr32, xi32, plan32, STAGE1_PRECISION, rows)
    zr, zi = _middle_pallas(fr, fi, d32, plan32, HIGH)
    A = plan32.A
    wc = plan32.wac[:rows]
    ws = -plan32.was[:rows]
    pyr, pyi, pdr, pdi = _stage1_inv_dot_pallas(
        zr.reshape(2, A, B * C), zi.reshape(2, A, B * C),
        xr32.reshape(2, rows, B * C), xi32.reshape(2, rows, B * C),
        wc, ws, wc + ws, STAGE1_PRECISION)
    np.testing.assert_allclose(np.asarray(pyr).reshape(2, -1),
                               np.asarray(yr), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(pdr), np.sum(np.asarray(xr) * np.asarray(yr), -1),
        rtol=2e-3)
    np.testing.assert_allclose(
        np.asarray(pdi), np.sum(np.asarray(xi) * np.asarray(yi), -1),
        rtol=2e-3)


def test_dual_apply_matches_two_singles():
    """fused_circulant_apply_cropped_dual == two independent cropped
    applies (shared forward transform, two diagonals)."""
    from hipgp_tpu.ops.radix_fft import (fused_circulant_apply_cropped,
                                         fused_circulant_apply_cropped_dual,
                                         row_multiple)

    L = 8192
    plan = make_plan(L, jnp.float64)
    rng = np.random.default_rng(4)
    rows = (L // 2) // row_multiple(L)
    M = rows * row_multiple(L)
    xr = jnp.asarray(rng.standard_normal((2, M)))
    xi = jnp.asarray(rng.standard_normal((2, M)))
    dA = permute_weights(jnp.asarray(_even_spectrum(L, rng)) / L, plan)
    dB = permute_weights(jnp.asarray(_even_spectrum(L, rng)) / L, plan)

    wantA = fused_circulant_apply_cropped(xr, xi, dA, plan, rows, rows)
    wantB = fused_circulant_apply_cropped(xr, xi, dB, plan, rows, rows)
    (gAr, gAi), (gBr, gBi) = fused_circulant_apply_cropped_dual(
        xr, xi, dA, dB, plan, rows, rows)
    np.testing.assert_allclose(np.asarray(gAr), np.asarray(wantA[0]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(gAi), np.asarray(wantA[1]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(gBr), np.asarray(wantB[0]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(gBi), np.asarray(wantB[1]), rtol=1e-12)


def test_planes_solver_while_matches_scan():
    """The early-exit (fixed_iters=False) planes solver == the scan solver
    at huge tol-headroom (exit never fires) and respects the exit when it
    does (tol large -> fewer effective iterations, still a valid iterate)."""
    from hipgp_tpu.kernels import SqExp
    from hipgp_tpu.ops import make_spectrum
    from hipgp_tpu.ops.solve import _planes_solver

    M = 4096
    grid = [jnp.linspace(0.0, 1.0, M)]
    kern = SqExp()
    kf = lambda a, b: kern(a, b, (1.0, 2.5 / M))
    spec = make_spectrum(grid, kf, jitter=1e-3)
    rng = np.random.default_rng(9)
    b = jnp.asarray(rng.standard_normal((3, M)))

    want = _planes_solver(spec, 12, 0.0, True)(None, b)
    got = _planes_solver(spec, 12, 1e-30, False)(None, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-14)
