"""DiT backbone shape/behavior tests (tiny configs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from ddg_tpu.models import (DIT, DITClassifier, DITConfig,
                            make_classifier_apply, make_model_apply)

KEY = jax.random.PRNGKey(0)
CFG = DITConfig(hidden_size=32, cond_dim=16, length=16, n_blocks=2,
                n_heads=2, dropout=0.0, vocab_size=11,
                compute_dtype=jnp.float32)


def _init(module, *args, **kwargs):
    return module.init(KEY, *args, **kwargs)['params']


def test_forward_shapes():
    model = DIT(CFG)
    x = jax.random.randint(KEY, (3, 16), 0, 11)
    sigma = jnp.ones((3,))
    params = _init(model, x, sigma)
    logits = model.apply({'params': params}, x, sigma)
    assert logits.shape == (3, 16, 11)
    assert logits.dtype == jnp.float32


def test_zero_init_head_gives_zero_logits():
    # adaLN-zero + zero-init output projection => logits exactly 0 at init
    # (reference zero-inits the final linear, dit.py:347-348).
    model = DIT(CFG)
    x = jax.random.randint(KEY, (2, 16), 0, 11)
    sigma = jnp.ones((2,))
    params = _init(model, x, sigma)
    logits = model.apply({'params': params}, x, sigma)
    np.testing.assert_allclose(np.asarray(logits), 0.0)


def test_conditioning_changes_output():
    cfg = DITConfig(hidden_size=32, cond_dim=16, length=16, n_blocks=2,
                    n_heads=2, dropout=0.0, vocab_size=11, num_classes=4,
                    compute_dtype=jnp.float32)
    model = DIT(cfg)
    x = jax.random.randint(KEY, (2, 16), 0, 11)
    sigma = jnp.ones((2,))
    cond = jnp.asarray([0, 3])
    params = _init(model, x, sigma, cond)
    # Perturb the head away from zero-init so cond can show up.
    params = jax.tree.map(
        lambda p: p + 0.02 * jax.random.normal(KEY, p.shape), params)
    out_a = model.apply({'params': params}, x, sigma, cond)
    out_b = model.apply({'params': params}, x, sigma, jnp.asarray([1, 2]))
    assert float(jnp.abs(out_a - out_b).max()) > 1e-6


def test_causal_masking():
    cfg = DITConfig(hidden_size=32, cond_dim=16, length=16, n_blocks=2,
                    n_heads=2, dropout=0.0, vocab_size=11, causal=True,
                    use_adaLN=False, compute_dtype=jnp.float32)
    model = DIT(cfg)
    x = jax.random.randint(KEY, (1, 16), 0, 11)
    params = _init(model, x, None)
    params = jax.tree.map(
        lambda p: p + 0.02 * jax.random.normal(KEY, p.shape), params)
    base = model.apply({'params': params}, x, None)
    # Changing a future token must not affect earlier positions.
    x2 = x.at[:, 10].set((x[:, 10] + 1) % 11)
    out2 = model.apply({'params': params}, x2, None)
    np.testing.assert_allclose(np.asarray(base[:, :10]),
                               np.asarray(out2[:, :10]), atol=1e-5)
    assert float(jnp.abs(base[:, 10:] - out2[:, 10:]).max()) > 1e-7


def test_hidden_states_and_x_emb_roundtrip():
    model = DIT(CFG)
    x = jax.random.randint(KEY, (2, 16), 0, 11)
    sigma = jnp.ones((2,))
    params = _init(model, x, sigma)
    logits, hidden = model.apply({'params': params}, x, sigma,
                                 return_hidden_states=True)
    assert hidden.shape == (2, 16, 32)
    # Re-applying through x_emb (NOS hook) reproduces the logits.
    logits2 = model.apply({'params': params}, x, sigma, None, hidden)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2),
                               atol=1e-5)


def test_classifier_poolings_and_one_hot_input():
    for pooling in ['mean', 'max', 'cls', 'last', 'no_pooling']:
        clf = DITClassifier(CFG, num_classes=3, pooling=pooling)
        x = jax.random.randint(KEY, (2, 16), 0, 11)
        sigma = jnp.ones((2,))
        params = _init(clf, x, sigma)
        out = clf.apply({'params': params}, x, sigma)
        if pooling == 'no_pooling':
            assert out.shape == (2, 16, 3)
        else:
            assert out.shape == (2, 3)
        # One-hot input path must agree with index input.
        oh = jax.nn.one_hot(x, 11)
        out_oh = clf.apply({'params': params}, oh, sigma)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_oh),
                                   atol=1e-3)


def test_adapters():
    model = DIT(CFG)
    x = jax.random.randint(KEY, (2, 16), 0, 11)
    sigma = jnp.ones((2,))
    params = _init(model, x, sigma)
    apply_fn = make_model_apply(model)
    out = apply_fn(params, x, sigma, None, None, train=False, rng=None)
    assert out.shape == (2, 16, 11)
    clf = DITClassifier(CFG, num_classes=3)
    cparams = _init(clf, x, sigma)
    capply = make_classifier_apply(clf)
    assert capply(cparams, x, sigma).shape == (2, 3)


def test_cfg_feature_mix_equals_logit_mix():
    """The output head is linear in its (normed + modulated) features,
    so gamma-mixing features before ONE vocab matmul must equal
    gamma-mixing the cond/uncond logits (the CFG fast path in
    samplers._cfg_step; reference logit-space interpolation,
    diffusion.py:1475-1480)."""
    from ddg_tpu.models.dit import dit_head_features, dit_head_matmul

    cfg = DITConfig(hidden_size=32, cond_dim=16, length=16, n_blocks=2,
                    n_heads=2, dropout=0.0, vocab_size=11,
                    num_classes=3, compute_dtype=jnp.float32)
    model = DIT(cfg)
    x = jax.random.randint(KEY, (2, 16), 0, 11)
    sigma = jnp.ones((2,))
    cond = jnp.asarray([0, 1])
    null = jnp.asarray([3, 3])
    params = _init(model, x, sigma, cond)
    # Head is zero-init: perturb so the check is non-trivial.
    params = jax.tree.map(
        lambda p: p + 0.05 * jax.random.normal(KEY, p.shape), params)
    gamma = 2.0

    lc = model.apply({'params': params}, x, sigma, cond)
    lu = model.apply({'params': params}, x, sigma, null)
    logits_mix = gamma * lc + (1 - gamma) * lu

    x2 = jnp.concatenate([x, x], axis=0)
    s2 = jnp.concatenate([sigma, sigma], axis=0)
    c2 = jnp.concatenate([cond, null], axis=0)
    hidden2, cvec2 = model.apply({'params': params}, x2, s2, c2,
                                 skip_head=True)
    feats2 = dit_head_features(cfg, params, hidden2, cvec2)
    fmix = gamma * feats2[:2] + (1 - gamma) * feats2[2:]
    logits_fmix = dit_head_matmul(cfg, params, fmix)

    np.testing.assert_allclose(np.asarray(logits_mix),
                               np.asarray(logits_fmix),
                               atol=2e-4, rtol=1e-4)
