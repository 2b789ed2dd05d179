"""Property + Bayes-rule tests for corruption and posterior math.

The reverse posteriors are verified against an exact Bayes inversion of
the forward Markov chain on a small vocabulary — an independent derivation
rather than a transcription of the reference code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddg_tpu.ops import forward_process as fp

KEY = jax.random.PRNGKey(0)
V = 7
MASK = V - 1


def _rand_simplex(key, shape):
    x = jax.random.uniform(key, shape) + 1e-3
    return x / x.sum(-1, keepdims=True)


class TestQxt:
    def test_absorbing_moves_to_mask(self):
        x0 = jax.random.randint(KEY, (4, 16), 0, V - 1)
        xt = fp.q_xt(KEY, x0, jnp.ones((4, 1)), diffusion='absorbing_state',
                     mask_index=MASK, vocab_size=V)
        assert bool((xt == MASK).all())
        xt = fp.q_xt(KEY, x0, jnp.zeros((4, 1)),
                     diffusion='absorbing_state',
                     mask_index=MASK, vocab_size=V)
        assert bool((xt == x0).all())

    def test_uniform_move_fraction(self):
        x0 = jnp.zeros((64, 256), dtype=jnp.int32)
        mc = jnp.full((64, 1), 0.5)
        xt = fp.q_xt(KEY, x0, mc, diffusion='uniform',
                     mask_index=MASK, vocab_size=V)
        # Moved tokens are uniform over V, so P(xt != x0) = 0.5 * (V-1)/V.
        frac = float((xt != x0).mean())
        assert abs(frac - 0.5 * (V - 1) / V) < 0.02

    def test_sample_prior(self):
        p = fp.sample_prior(KEY, (3, 5), diffusion='absorbing_state',
                            mask_index=MASK, vocab_size=V)
        assert bool((p == MASK).all())
        p = fp.sample_prior(KEY, (300, 50), diffusion='uniform',
                            mask_index=MASK, vocab_size=V)
        assert int(p.min()) >= 0 and int(p.max()) < V


class TestSubsParameterization:
    def test_normalized_and_copy_over(self):
        B, L = 3, 11
        logits = jax.random.normal(KEY, (B, L, V))
        xt = jax.random.randint(jax.random.PRNGKey(1), (B, L), 0, V)
        out = fp.subs_parameterization(logits, xt, mask_index=MASK)
        # Normalized log-probs (fp32 exp/log_softmax roundtrip tolerance).
        np.testing.assert_allclose(
            np.asarray(jnp.exp(out).sum(-1)), 1.0, atol=2e-4)
        # Mask token has ~zero probability everywhere.
        assert float(jnp.exp(out[..., MASK]).max()) < 1e-30
        # Copy-over: unmasked positions are a point mass on xt.
        unmasked = np.asarray(xt != MASK)
        probs = np.asarray(jnp.exp(out))
        at_xt = np.take_along_axis(probs, np.asarray(xt)[..., None],
                                   -1).squeeze(-1)
        assert np.all(at_xt[unmasked] > 1 - 1e-5)


def _bayes_uniform_posterior(x0, xt, alpha_s, alpha_t, vocab):
    """Exact Bayes inversion: q(x_s|x_t,x_0) ∝ q(x_t|x_s) q(x_s|x_0).

    Forward kernel from s to t: keep w.p. alpha_ts, else uniform over V.
    """
    alpha_ts = alpha_t / alpha_s
    q_xs_given_x0 = (alpha_s * np.eye(vocab)[x0]
                     + (1 - alpha_s) / vocab)
    q_xt_given_xs = (alpha_ts * np.eye(vocab)[xt]
                     + (1 - alpha_ts) / vocab)
    joint = q_xt_given_xs * q_xs_given_x0
    return joint / joint.sum(-1, keepdims=True)


class TestUniformPosterior:
    @pytest.mark.parametrize("alpha_s,alpha_t", [(0.9, 0.5), (0.31, 0.3),
                                                 (0.99, 0.011)])
    def test_matches_exact_bayes(self, alpha_s, alpha_t):
        B, L = 2, 9
        x0 = np.random.RandomState(0).randint(0, V, (B, L))
        xt = np.random.RandomState(1).randint(0, V, (B, L))
        expected = _bayes_uniform_posterior(x0, xt, alpha_s, alpha_t, V)
        got = fp.uniform_posterior(
            jax.nn.one_hot(jnp.asarray(x0), V), jnp.asarray(xt),
            jnp.full((B, 1, 1), alpha_s), jnp.full((B, 1, 1), alpha_t),
            vocab_size=V)
        np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)

    def test_rows_sum_to_one_soft_x(self):
        B, L = 4, 13
        x = _rand_simplex(KEY, (B, L, V))
        xt = jax.random.randint(KEY, (B, L), 0, V)
        q = fp.uniform_posterior(x, xt, jnp.full((B, 1, 1), 0.7),
                                 jnp.full((B, 1, 1), 0.2), vocab_size=V)
        np.testing.assert_allclose(np.asarray(q.sum(-1)), 1.0, atol=1e-5)
        assert float(q.min()) >= 0

    def test_s_equals_t_is_delta(self):
        # alpha_s == alpha_t => no denoising: posterior is delta at xt.
        B, L = 2, 5
        x = _rand_simplex(KEY, (B, L, V))
        xt = jax.random.randint(KEY, (B, L), 0, V)
        q = fp.uniform_posterior(x, xt, jnp.full((B, 1, 1), 0.4),
                                 jnp.full((B, 1, 1), 0.4), vocab_size=V)
        at_xt = jnp.take_along_axis(q, xt[..., None], -1).squeeze(-1)
        np.testing.assert_allclose(np.asarray(at_xt), 1.0, atol=1e-5)


class TestAbsorbingPosterior:
    def test_masked_rows_bayes(self):
        """For x_t = mask: stay-mask prob = mcs/mct; move to v w.p.
        x_theta[v] * (mct - mcs)/mct — exact absorbing-chain Bayes."""
        B, L = 3, 8
        x_theta = _rand_simplex(KEY, (B, L, V))
        x_theta = x_theta.at[..., MASK].set(0.0)
        x_theta = x_theta / x_theta.sum(-1, keepdims=True)
        mct, mcs = jnp.full((B, 1, 1), 0.6), jnp.full((B, 1, 1), 0.2)
        q = fp.absorbing_posterior(x_theta, mct, mcs, mask_index=MASK)
        np.testing.assert_allclose(np.asarray(q[..., MASK]), 0.2 / 0.6,
                                   atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(q[..., :MASK]),
            np.asarray(x_theta[..., :MASK] * (0.6 - 0.2) / 0.6), atol=1e-6)
        np.testing.assert_allclose(np.asarray(q.sum(-1)), 1.0, atol=1e-5)

    def test_log_matches_prob_space(self):
        B, L = 2, 6
        x_theta = _rand_simplex(KEY, (B, L, V))
        mct, mcs = jnp.full((B, 1, 1), 0.8), jnp.full((B, 1, 1), 0.5)
        q = fp.absorbing_posterior(x_theta, mct, mcs, mask_index=MASK)
        log_q = fp.absorbing_posterior_log(jnp.log(x_theta), mct, mcs,
                                           mask_index=MASK)
        np.testing.assert_allclose(np.asarray(jnp.exp(log_q)),
                                   np.asarray(q), atol=5e-5)


class TestCopyFlags:
    def test_probs_tokens_log_agree(self):
        B, L = 2, 10
        xt = jax.random.randint(KEY, (B, L), 0, V)
        q = _rand_simplex(KEY, (B, L, V))
        qp = fp.apply_copy_flag_probs(q, xt, mask_index=MASK)
        ql = fp.apply_copy_flag_log(jnp.log(q), xt, mask_index=MASK)
        decoded = np.asarray(xt != MASK)
        probs = np.asarray(qp)
        at_xt = np.take_along_axis(probs, np.asarray(xt)[..., None],
                                   -1).squeeze(-1)
        assert np.all(at_xt[decoded] == 1.0)
        # log version softmaxes to the same point mass
        soft = np.asarray(jax.nn.softmax(ql, -1))
        at_xt_l = np.take_along_axis(soft, np.asarray(xt)[..., None],
                                     -1).squeeze(-1)
        np.testing.assert_allclose(at_xt_l[decoded], 1.0, atol=1e-6)
        # untouched where masked
        np.testing.assert_allclose(probs[~decoded],
                                   np.asarray(q)[~decoded], atol=1e-7)
        xs = jax.random.randint(jax.random.PRNGKey(3), (B, L), 0, V)
        carried = fp.apply_copy_flag_tokens(xs, xt, mask_index=MASK)
        np.testing.assert_array_equal(
            np.asarray(carried)[decoded], np.asarray(xt)[decoded])
        np.testing.assert_array_equal(
            np.asarray(carried)[~decoded], np.asarray(xs)[~decoded])


class TestSampleT:
    def test_antithetic_stratifies(self):
        t = fp.sample_t(KEY, 1000, sampling_eps=1e-3, antithetic=True)
        t = np.sort(np.asarray(t))
        # Stratified: exactly one sample per 1/n bucket (scaled by 1-eps).
        gaps = np.diff(t)
        assert gaps.max() < 2.5 / 1000
        assert t.min() >= 1e-3 and t.max() <= 1.0

    def test_discretize(self):
        t = jnp.asarray([0.001, 0.5, 0.999])
        td = np.asarray(fp.discretize_t(t, 4))
        np.testing.assert_allclose(td, [0.25, 0.75, 1.0], atol=1e-6)
