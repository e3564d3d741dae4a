"""HMM core invariants (SURVEY.md §5): EM log-likelihood monotonicity,
posterior normalization, sequence alignment, determinism."""

from __future__ import annotations

import numpy as np
import pytest

from pipeline_mf_etl_spark.operators.hmm import DiagGaussianHMM


@pytest.fixture(scope="module")
def toy():
    rng = np.random.default_rng(42)
    seqs = []
    for _ in range(12):
        n = 80
        states = [0]
        for _ in range(n - 1):
            states.append(states[-1] if rng.random() < 0.9 else rng.integers(0, 3))
        mu = np.array([[-1.0, 0.5], [0.0, 1.0], [1.5, 2.0]])
        x = mu[states] + rng.normal(0, 0.3, (n, 2))
        seqs.append(x)
    return seqs


def test_loglik_monotone(toy):
    m = DiagGaussianHMM(n_states=3, n_iter=25).fit(toy)
    ll = m.loglik_path
    assert len(ll) > 3
    assert all(b >= a - 1e-6 for a, b in zip(ll, ll[1:])), ll


def test_posteriors_normalized_and_aligned(toy):
    m = DiagGaussianHMM(n_states=3, n_iter=15).fit(toy)
    for x in toy[:3]:
        post = m.posteriors(x)
        assert post.shape == (len(x), 3)
        np.testing.assert_allclose(post.sum(axis=1), 1.0, atol=1e-9)
        path = m.viterbi(x)
        assert path.shape == (len(x),)
        assert set(path) <= {0, 1, 2}


def test_deterministic(toy):
    a = DiagGaussianHMM(n_states=3, n_iter=15).fit(toy)
    b = DiagGaussianHMM(n_states=3, n_iter=15).fit(toy)
    np.testing.assert_array_equal(a.means, b.means)
    np.testing.assert_array_equal(a.loglik_path, b.loglik_path)


def test_recovers_separated_states(toy):
    m = DiagGaussianHMM(n_states=3, n_iter=25).fit(toy)
    # three well-separated means must be recovered in feature 0 ordering
    mu0 = sorted(m.means[:, 0])
    assert mu0[0] < -0.5 and abs(mu0[1]) < 0.5 and mu0[2] > 1.0
