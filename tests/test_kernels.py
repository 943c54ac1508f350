"""Pallas kernel tests (interpret mode on CPU) against the XLA backend and
the dense oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

import sparsecholesky_tpu as sc
from sparsecholesky_tpu.api import chol
from sparsecholesky_tpu.models import generators
from sparsecholesky_tpu.numeric import _panel_factor_xla
from sparsecholesky_tpu.ops.panel_chol import panel_cholesky


def _random_panel(B, w_pad, mb_pad, w_real, mb_real, seed=0):
    """Identity-padded SPD panels like plan.py assembles them."""
    rng = np.random.default_rng(seed)
    m_pad = w_pad + mb_pad
    P = np.zeros((B, m_pad, w_pad))
    for b in range(B):
        m_real = w_real + mb_real
        X = rng.standard_normal((m_real, m_real))
        A = X @ X.T + m_real * np.eye(m_real)
        P[b, :w_real, :w_real] = np.tril(A[:w_real, :w_real])
        P[b, w_pad : w_pad + mb_real, :w_real] = A[w_real:, :w_real]
        for i in range(w_real, w_pad):
            P[b, i, i] = 1.0
    return jnp.asarray(P)


@pytest.mark.parametrize(
    "w_pad,mb_pad,w_real,mb_real",
    [(8, 0, 3, 0), (8, 8, 8, 8), (16, 8, 13, 5), (32, 48, 20, 33)],
)
def test_panel_matches_xla(w_pad, mb_pad, w_real, mb_real):
    P = _random_panel(3, w_pad, mb_pad, w_real, mb_real)
    L_pl, piv_pl = panel_cholesky(P, w_pad, interpret=True)
    L_x, piv_x = _panel_factor_xla(P, w_pad)
    # compare lower triangle of the diag block + below block
    mask = np.tril(np.ones((w_pad + mb_pad, w_pad)))
    np.testing.assert_allclose(
        np.asarray(L_pl) * mask, np.asarray(L_x) * mask, atol=1e-10
    )
    assert np.all(np.asarray(piv_pl) > 0)


def test_panel_detects_non_pd():
    P = _random_panel(1, 8, 0, 4, 0)
    P = P.at[0, 2, 2].set(-5.0)
    _, piv = panel_cholesky(P, 8, interpret=True)
    assert float(piv[0]) <= 0


def test_full_factorization_pallas_backend(bcsstk01):
    F = chol(bcsstk01, backend="pallas")
    Ld = np.tril(F.L().to_dense())
    Ad = bcsstk01.to_dense()
    rel = np.linalg.norm(Ad - Ld @ Ld.T) / np.linalg.norm(Ad)
    assert rel < 1e-12


@pytest.mark.parametrize("backend", ["pallas", "fused"])
def test_backends_match_xla(backend):
    # strict-upper diagonal-block slots are backend-private scratch (the
    # Pallas kernel stashes minpiv there), so compare the extracted factor,
    # not the raw block store
    A = generators.random_sparse(80, 0.2, seed=5)
    Fx = chol(A, backend="xla")
    Fp = chol(A, backend=backend)
    np.testing.assert_allclose(
        Fp.L().to_dense(), Fx.L().to_dense(), atol=1e-11
    )


def test_diag_chol_fused_matches_xla():
    """The batch-size-independent fused-diag chol (numeric._diag_chol_fused)
    must agree with jnp.linalg.cholesky on SPD batches — it replaces it on
    large-batch narrow tiers (round-4 hot-path change)."""
    import numpy as np
    import jax.numpy as jnp
    from sparsecholesky_tpu import numeric as N

    rng = np.random.default_rng(7)
    for (B, w) in ((4, 8), (9, 16), (3, 32)):
        M = rng.standard_normal((B, w, w))
        P = (M @ M.transpose(0, 2, 1) + w * np.eye(w)).astype(np.float64)
        L, mp = N._diag_chol_fused(jnp.asarray(P), w)
        ref = np.linalg.cholesky(P)
        np.testing.assert_allclose(np.asarray(L), ref, rtol=5e-12,
                                   atol=5e-12)
        assert float(jnp.min(mp)) > 0

    # non-PD: minpiv flags the failure, output stays finite
    bad = np.array([[[1.0, 9.0], [9.0, 1.0]]])
    L, mp = N._diag_chol_fused(jnp.asarray(bad), 2)
    assert float(mp[0]) <= 0
    assert np.isfinite(np.asarray(L)).all()


def test_use_fused_diag_rule():
    from sparsecholesky_tpu.numeric import _use_fused_diag
    assert _use_fused_diag(456, 8)
    assert _use_fused_diag(32, 64)
    assert not _use_fused_diag(1, 64)
    assert not _use_fused_diag(1, 1152)
