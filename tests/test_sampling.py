"""Sampling primitive tests: Gumbel-max distribution, low-confidence mask."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from ddg_tpu.ops import sampling

KEY = jax.random.PRNGKey(0)


def test_gumbel_max_matches_categorical():
    probs = jnp.asarray([0.5, 0.3, 0.15, 0.05])
    n = 20000
    keys = jax.random.split(KEY, n)
    draws = jax.vmap(
        lambda k: sampling.sample_categorical(k, probs))(keys)
    counts = np.bincount(np.asarray(draws), minlength=4) / n
    np.testing.assert_allclose(counts, np.asarray(probs), atol=0.02)


def test_argmax_mode():
    probs = jnp.asarray([[0.1, 0.7, 0.2], [0.6, 0.3, 0.1]])
    out = sampling.sample_categorical(KEY, probs, argmax_sampling=True)
    np.testing.assert_array_equal(np.asarray(out), [1, 0])


def test_low_confidence_mask_keeps_bottom_mass():
    probs = jnp.asarray([[0.5, 0.25, 0.15, 0.1]])
    # cumulative (ascending): 0.1, 0.25, 0.5, 1.0 -> threshold 0.3 keeps
    # classes with cum <= 0.3: {3 (0.1), 2 (0.25)}.
    mask = np.asarray(sampling.low_confidence_mask(probs, 0.3))[0]
    np.testing.assert_array_equal(mask, [False, False, True, True])


def test_low_confidence_mask_with_ties():
    probs = jnp.asarray([[0.25, 0.25, 0.25, 0.25]])
    # Stable ascending sort: cum = .25, .5, .75, 1.0 at indices 0..3.
    mask = np.asarray(sampling.low_confidence_mask(probs, 0.5))[0]
    np.testing.assert_array_equal(mask, [True, True, False, False])


def test_low_confidence_sampling_excludes_top():
    probs = jnp.asarray([0.5, 0.25, 0.15, 0.1])
    keys = jax.random.split(KEY, 500)
    draws = jax.vmap(lambda k: sampling.sample_categorical(
        k, probs, low_confidence_sampling=True,
        low_confidence_threshold=0.3))(keys)
    assert set(np.unique(np.asarray(draws))) <= {2, 3}


def test_sample_token_gumbel():
    log_probs = jnp.log(jnp.asarray([[0.8, 0.15, 0.05]]))
    noise = sampling.gumbel_noise_like(KEY, (4000, 3))
    draws = jax.vmap(lambda g: sampling.sample_token(log_probs, g[None]))(
        noise).squeeze()
    counts = np.bincount(np.asarray(draws), minlength=3) / 4000
    np.testing.assert_allclose(counts, [0.8, 0.15, 0.05], atol=0.03)


@pytest.mark.slow
def test_first_hitting_nonloglinear_matches_ancestral():
    """First-hitting with a cosine schedule: decode-time quantile
    mapping through inverse_total_noise must reproduce the ancestral
    reverse process (empirical unigram distribution agreement with a
    fixed oracle denoiser)."""
    from ddg_tpu.diffusion import DiffusionSpec
    from ddg_tpu.ops.noise_schedules import CosineNoise
    from ddg_tpu.samplers import SamplerSpec, diffusion_sample

    V, L, B = 12, 16, 8
    MASK = V - 1
    spec = DiffusionSpec(diffusion='absorbing_state',
                         parameterization='subs', noise=CosineNoise(),
                         vocab_size=V, mask_index=MASK,
                         time_conditioning=False)
    logits_table = jax.random.normal(jax.random.PRNGKey(3), (V,)) * 2.0

    def oracle(params, xt, sigma, cond, x_emb, *, train, rng,
               **kw):
        del params, sigma, cond, x_emb, train, rng
        out = jnp.broadcast_to(logits_table,
                               (*xt.shape, V)).astype(jnp.float32)
        if kw.get('skip_head'):
            raise AssertionError('oracle has no trunk/head split')
        return out

    def dist(samp, seed0, n=6):
        acc = np.zeros(V, np.int64)
        for s in range(n):
            out = np.asarray(diffusion_sample(
                spec, samp, oracle, None, jax.random.PRNGKey(seed0 + s),
                batch_size=B, length=L))
            assert (out != MASK).all()
            acc += np.bincount(out.reshape(-1), minlength=V)
        return acc / acc.sum()

    d_fh = dist(SamplerSpec(steps=64, first_hitting=True), 100)
    d_anc = dist(SamplerSpec(steps=64, use_cache=False), 400)
    tv = 0.5 * np.abs(d_fh - d_anc).sum()
    assert tv < 0.06, tv
