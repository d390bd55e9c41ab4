"""Direct numerical parity against the ACTUAL reference implementation.

Where the reference code still runs on modern torch (the kernel layer, the
CG solvers, the block-index machinery, the KL divergences), we execute it as
the oracle and require our JAX rebuild to match to float64 precision.  The
FFT/Toeplitz layer itself cannot run (it uses the removed torch<=1.7
`torch.fft(x, signal_ndim)` API), so its parity is established against dense
oracles in test_bttb.py / test_cg_solve.py instead.

Skipped entirely when the reference checkout is absent.
"""
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "ziggy")), reason="reference not present"
)


@pytest.fixture(scope="module")
def ref():
    if "pyprind" not in sys.modules:  # cosmetic progress-bar dep of the ref
        mod = types.ModuleType("pyprind")
        mod.prog_bar = lambda it, **k: it
        sys.modules["pyprind"] = mod
    sys.path.insert(0, REF)
    import torch  # noqa
    from ziggy import kernels as zkern
    from ziggy.misc import cg as zcg
    from ziggy.misc import stats as zstats
    from ziggy.misc import util as zutil

    return types.SimpleNamespace(
        torch=torch, kernels=zkern, cg=zcg, stats=zstats, util=zutil
    )


def _t(ref, a):
    return ref.torch.tensor(np.asarray(a), dtype=ref.torch.double)


@pytest.fixture
def pts(rng):
    import jax.numpy as jnp

    x = rng.uniform(-1, 1, (6, 2))
    y = rng.uniform(-1, 1, (7, 2)) + 1.2
    return jnp.asarray(x), jnp.asarray(y), x, y


PARAMS = (1.3, 0.4)


def test_sqexp_matches_reference(ref, pts):
    from hipgp_tpu.kernels import SqExp

    xj, yj, x, y = pts
    ours = np.asarray(SqExp()(xj, yj, PARAMS))
    theirs = ref.kernels.SqExp()(_t(ref, x), _t(ref, y), PARAMS).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-12)


@pytest.mark.parametrize("nu", [0.5, 1.5, 2.5])
def test_matern_matches_reference(ref, pts, nu):
    from hipgp_tpu.kernels import Matern

    xj, yj, x, y = pts
    ours = np.asarray(Matern(nu)(xj, yj, PARAMS))
    theirs = ref.kernels.Matern(nu)(_t(ref, x), _t(ref, y), PARAMS).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-9)


def test_gneiting_matches_reference(ref, pts):
    from hipgp_tpu.kernels import Gneiting

    xj, yj, x, y = pts
    p = (1.0, 1.5)
    ours = np.asarray(Gneiting()(xj, yj, p))
    theirs = ref.kernels.Gneiting()(_t(ref, x), _t(ref, y), p).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-9, atol=1e-12)


def test_semi_integrated_sqexp_matches_reference(ref, pts):
    """The analytic line-integral cross-covariance, both codes."""
    from hipgp_tpu.kernels import k_semi_sqexp

    xj, yj, x, y = pts
    ours = np.asarray(k_semi_sqexp(xj, yj, PARAMS))
    theirs = ref.kernels.SqExp().k_semi(_t(ref, x), _t(ref, y), PARAMS).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-9)


def test_doubly_integrated_diag_matches_reference(ref, pts):
    """Our Gauss-Legendre interpolator vs the reference's scipy.dblquad
    interpolator (both approximate; agree to interpolation error)."""
    from hipgp_tpu.kernels import DoublyDiagInterpolator, SqExp

    xj, yj, x, y = pts
    ours = np.asarray(DoublyDiagInterpolator(SqExp(), N=50, dmax=5.0)(yj, PARAMS))
    theirs = ref.kernels.SqExp().k_doubly_diag(_t(ref, y), PARAMS).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-2)


def test_conj_grad_matches_reference(ref, rng):
    """Batched CG: identical update order means (nearly) identical iterates
    even when truncated far from convergence."""
    import jax.numpy as jnp

    from hipgp_tpu.ops import pcg

    A = rng.standard_normal((20, 20))
    A = A @ A.T + 20 * np.eye(20)
    b = rng.standard_normal((20, 3))  # reference conj_grad: columns

    x_ref = ref.cg.conj_grad(
        lambda v: _t(ref, A) @ v, _t(ref, b), maxiter=7, tol=0.0
    ).numpy()
    Aj = jnp.asarray(A)
    x_ours = np.asarray(
        pcg(lambda v: v @ Aj.T, jnp.asarray(b.T), maxiter=7, tol=0.0)
    ).T
    np.testing.assert_allclose(x_ours, x_ref, rtol=1e-9, atol=1e-12)


def test_conj_grad2_with_precond_matches_reference(ref, rng):
    import jax.numpy as jnp

    from hipgp_tpu.ops import pcg

    A = rng.standard_normal((15, 15))
    A = A @ A.T + 15 * np.eye(15)
    Pm = np.diag(1.0 / np.diag(A))
    b = rng.standard_normal((4, 15))  # conj_grad2: rows

    x_ref = ref.cg.conj_grad2(
        lambda v: v @ _t(ref, A).T,
        _t(ref, b),
        precond=lambda v: v @ _t(ref, Pm).T,
        maxiter=6,
        tol=0.0,
    ).numpy()
    Aj, Pj = jnp.asarray(A), jnp.asarray(Pm)
    x_ours = np.asarray(
        pcg(lambda v: v @ Aj.T, jnp.asarray(b), precond=lambda v: v @ Pj.T,
            maxiter=6, tol=0.0)
    )
    np.testing.assert_allclose(x_ours, x_ref, rtol=1e-9, atol=1e-12)


def test_block_indices_match_reference(ref):
    """Our N-D block chunking reproduces the reference's 2-D and 3-D
    Toeplitz<->block orderings exactly."""
    from hipgp_tpu.utils.blocks import block_indices

    t = ref.torch
    for dims, chunks in [((8, 6), (4, 3)), ((4, 4, 4), (2, 2, 2))]:
        xgrids = [t.linspace(0, 1, d) for d in dims]
        blk_ref, to_b, from_b = ref.util.define_block_chunks(xgrids, list(chunks))
        blk_ours, inv = block_indices(dims, chunks)
        np.testing.assert_array_equal(np.asarray(blk_ours), blk_ref.numpy())
        # round-trip closure equivalence
        v = t.arange(int(np.prod(dims)), dtype=t.double)[None, :]
        np.testing.assert_array_equal(
            from_b(to_b(v)).numpy().ravel(), np.arange(int(np.prod(dims)))
        )


def test_kl_divergences_match_reference(ref, rng):
    import jax.numpy as jnp

    from hipgp_tpu.utils import stats

    t = ref.torch
    m = rng.standard_normal(10)
    S = rng.uniform(0.5, 2.0, 10)
    ours = float(stats.diag_kl_to_standard(jnp.asarray(m), jnp.asarray(S)))
    theirs = float(
        ref.stats.diag_kl_to_standard(_t(ref, m[:, None]), _t(ref, S[:, None]))
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-12)

    A = rng.standard_normal((6, 6))
    Sfull = A @ A.T + np.eye(6)
    ours = float(stats.kl_to_standard(jnp.asarray(m[:6]), jnp.asarray(Sfull)))
    theirs = float(ref.stats.kl_to_standard(_t(ref, m[:6, None]), _t(ref, Sfull)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-10)
