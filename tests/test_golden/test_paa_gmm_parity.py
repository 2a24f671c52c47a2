"""PAA GMM parity vs sklearn (VERDICT r3 ask #4).

The reference fits sklearn.mixture.GaussianMixture(2, 'diag') per gt on
the sorted candidate losses (paa_head.py:322-341); our
models/dense_heads/paa_head._gmm_em_1d re-implements that EM with the
same init (means=[min,max], weights=.5, precisions=1), the same m-step
(nk = sum resp + 10eps, cov = E[x^2]-mean^2+reg_covar, renormalized
weights), and the same stopping rule (|Δ mean log-lik| < tol=1e-3, max
100 iters, then a final e-step). This test pins assignment equality and
score_samples closeness against the real sklearn on loss-like samples,
including the masked/padded layout the jax path uses.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from swindet_tpu.models.dense_heads.paa_head import _gmm_em_1d

sklearn = pytest.importorskip('sklearn.mixture')


def _sklearn_fit(x):
    x = np.sort(x.astype(np.float32))
    means_init = np.array([x.min(), x.max()]).reshape(2, 1)
    gmm = sklearn.GaussianMixture(
        2, weights_init=np.array([0.5, 0.5]), means_init=means_init,
        precisions_init=np.array([1.0, 1.0]).reshape(2, 1),
        covariance_type='diag')
    X = x.reshape(-1, 1)
    gmm.fit(X)
    return x, gmm.predict(X), gmm.score_samples(X), gmm


@pytest.mark.parametrize('seed', [0, 1, 2, 3])
@pytest.mark.parametrize('n', [4, 9, 23])
def test_gmm_matches_sklearn(seed, n):
    rs = np.random.RandomState(seed)
    # two loss modes like real PAA candidates: confident + noisy
    lo = rs.gamma(2.0, 0.15, n // 2 + 1)
    hi = 1.5 + rs.gamma(2.0, 0.4, n - len(lo) + 1)
    x = np.concatenate([lo, hi])[:n].astype(np.float32)
    xs, ref_assign, ref_scores, _ = _sklearn_fit(x)

    resp0, loglik = _gmm_em_1d(jnp.asarray(xs), jnp.ones(n, bool))
    np.testing.assert_array_equal(np.asarray(resp0), ref_assign == 0)
    # fp32 EM can stop one iteration off sklearn's (|change| ~ tol
    # boundary) — assignments stay exact. Score closeness is asserted
    # on the component-0 (fg) samples the separation scheme actually
    # consumes (scores[fgs].topk(1), paa_head.py:389); a collapsed
    # near-singleton bg component sits at the reg_covar floor where the
    # density value is trajectory-chaotic in fp32.
    fg = ref_assign == 0
    np.testing.assert_allclose(np.asarray(loglik)[fg], ref_scores[fg],
                               rtol=2e-3, atol=1e-4)


def test_gmm_masked_padding_matches_dense():
    """Padded invalid slots must not perturb the fit of the valid
    prefix (the jax path always runs on a fixed-size buffer)."""
    rs = np.random.RandomState(7)
    x = np.sort(np.concatenate([rs.gamma(2.0, 0.15, 6),
                                2 + rs.gamma(2.0, 0.4, 6)])
                .astype(np.float32))
    xs, ref_assign, ref_scores, _ = _sklearn_fit(x)

    pad = 20
    xp = np.concatenate([xs, np.zeros(pad, np.float32)])
    vp = np.concatenate([np.ones(len(xs), bool), np.zeros(pad, bool)])
    resp0, loglik = _gmm_em_1d(jnp.asarray(xp), jnp.asarray(vp))
    np.testing.assert_array_equal(np.asarray(resp0)[:len(xs)],
                                  ref_assign == 0)
    np.testing.assert_allclose(np.asarray(loglik)[:len(xs)], ref_scores,
                               rtol=2e-3, atol=1e-4)
