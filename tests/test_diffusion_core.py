"""Diffusion core tests: loss dispatch across all parameterizations and
sampling loops (oracle + tiny-model), all on CPU with tiny shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddg_tpu.diffusion import DiffusionSpec, Loss, log_x_theta, loss_fn
from ddg_tpu.models import DIT, DITConfig, make_model_apply
from ddg_tpu.ops.noise_schedules import LogLinearNoise
from ddg_tpu.samplers import (GuidanceSpec, SamplerSpec, ar_sample,
                              diffusion_sample)

KEY = jax.random.PRNGKey(0)
V = 11  # includes mask at 10
MASK = 10
B, L = 2, 16

MODEL_CFG = DITConfig(hidden_size=32, cond_dim=16, length=L, n_blocks=2,
                      n_heads=2, dropout=0.0, vocab_size=V,
                      compute_dtype=jnp.float32)


def _make_model(causal=False, num_classes=None, use_adaLN=True):
    import dataclasses
    cfg = dataclasses.replace(MODEL_CFG, causal=causal,
                              num_classes=num_classes,
                              use_adaLN=use_adaLN)
    model = DIT(cfg)
    x = jax.random.randint(KEY, (B, L), 0, V)
    sigma = None if causal else jnp.ones((B,))
    cond = None if num_classes is None else jnp.zeros((B,), jnp.int32)
    params = model.init(KEY, x, sigma, cond)['params']
    # nudge away from zero-init so outputs are informative
    params = jax.tree.map(
        lambda p: p + 0.01 * jax.random.normal(KEY, p.shape), params)
    return make_model_apply(model), params


def _spec(**kw):
    defaults = dict(diffusion='absorbing_state', parameterization='subs',
                    noise=LogLinearNoise(), vocab_size=V, mask_index=MASK,
                    T=0, time_conditioning=False)
    defaults.update(kw)
    return DiffusionSpec(**defaults)


MDLM = _spec()
UDLM = _spec(diffusion='uniform', parameterization='d3pm',
             time_conditioning=True, zero_recon_loss=True)
D3PM_T = _spec(diffusion='uniform', parameterization='d3pm', T=8,
               time_conditioning=True)
SUBS_T = _spec(T=8)
AR = _spec(parameterization='ar')


class TestLogXTheta:
    def test_subs_is_normalized_with_copy_over(self):
        apply_fn, params = _make_model()
        xt = jax.random.randint(KEY, (B, L), 0, V)
        out = log_x_theta(MDLM, apply_fn, params, xt, jnp.ones((B,)))
        np.testing.assert_allclose(np.asarray(jnp.exp(out).sum(-1)), 1.0,
                                   atol=2e-4)

    def test_d3pm_log_softmax(self):
        apply_fn, params = _make_model()
        xt = jax.random.randint(KEY, (B, L), 0, V)
        out = log_x_theta(UDLM, apply_fn, params, xt, jnp.ones((B,)))
        np.testing.assert_allclose(np.asarray(jnp.exp(out).sum(-1)), 1.0,
                                   atol=2e-4)


class TestLossDispatch:
    @pytest.mark.parametrize("spec", [MDLM, UDLM, D3PM_T, SUBS_T],
                             ids=['mdlm', 'udlm', 'd3pm_T', 'subs_T'])
    def test_finite_loss_and_grads(self, spec):
        apply_fn, params = _make_model()
        x0 = jax.random.randint(KEY, (B, L), 0, V - 1)
        mask = jnp.ones((B, L), jnp.float32)

        def f(p):
            return loss_fn(spec, apply_fn, p, x0, mask, None, KEY,
                           train=True).loss

        loss, grads = jax.value_and_grad(f)(params)
        assert np.isfinite(float(loss))
        gnorm = jax.tree.reduce(
            lambda a, b: a + float(jnp.abs(b).sum()), grads, 0.0)
        assert np.isfinite(gnorm) and gnorm > 0

    def test_ar_loss(self):
        apply_fn, params = _make_model(causal=True, use_adaLN=False)
        tokens = jax.random.randint(KEY, (B, L + 1), 0, V - 1)
        inputs, targets = tokens[:, :-1], tokens[:, 1:]
        mask = jnp.ones((B, L), jnp.float32)
        out = loss_fn(AR, apply_fn, params, (inputs, targets), mask, None,
                      KEY, train=False)
        assert np.isfinite(float(out.loss))
        # AR CE at near-uniform logits ~ log V
        assert abs(float(out.loss) - np.log(V)) < 0.5

    def test_returns_loss_components_udlm(self):
        apply_fn, params = _make_model()
        x0 = jax.random.randint(KEY, (B, L), 0, V - 1)
        mask = jnp.ones((B, L), jnp.float32)
        out = loss_fn(UDLM, apply_fn, params, x0, mask, None, KEY,
                      train=False)
        assert out.recon_loss is not None
        assert out.diffusion_loss is not None

    def test_cond_dropout_runs(self):
        spec = _spec(cond_dropout=0.5, num_classes=4)
        apply_fn, params = _make_model(num_classes=4)
        x0 = jax.random.randint(KEY, (B, L), 0, V - 1)
        cond = jnp.zeros((B,), jnp.int32)
        mask = jnp.ones((B, L), jnp.float32)
        out = loss_fn(spec, apply_fn, params, x0, mask, cond, KEY,
                      train=True)
        assert np.isfinite(float(out.loss))

    def test_unrolling_aux_loss(self):
        spec = _spec(unrolling=True, unrolling_steps=2)
        apply_fn, params = _make_model()
        x0 = jax.random.randint(KEY, (B, L), 0, V - 1)
        mask = jnp.ones((B, L), jnp.float32)
        out = loss_fn(spec, apply_fn, params, x0, mask, None, KEY,
                      train=True)
        assert out.unroll_loss is not None
        assert np.isfinite(float(out.unroll_loss))

    def test_simple_ce_short_circuit(self):
        spec = _spec(use_simple_ce_loss=True)
        apply_fn, params = _make_model()
        x0 = jax.random.randint(KEY, (B, L), 0, V - 1)
        mask = jnp.ones((B, L), jnp.float32)
        out = loss_fn(spec, apply_fn, params, x0, mask, None, KEY,
                      train=True)
        assert np.isfinite(float(out.loss))


class TestSampling:
    @pytest.mark.parametrize("spec", [MDLM, UDLM], ids=['mdlm', 'udlm'])
    def test_unguided_sample(self, spec):
        apply_fn, params = _make_model()
        sampler = SamplerSpec(steps=8, use_cache=True)
        out = jax.jit(lambda k: diffusion_sample(
            spec, sampler, apply_fn, params, k, batch_size=B, length=L))(
            KEY)
        assert out.shape == (B, L)
        assert int(out.min()) >= 0 and int(out.max()) < V
        if spec.diffusion == 'absorbing_state':
            assert not bool((out == MASK).any()), 'undecoded mask tokens'

    @pytest.mark.parametrize("gamma", [0.0, 1.0, 2.0])
    def test_cfg_sample(self, gamma):
        spec = _spec(num_classes=4)
        apply_fn, params = _make_model(num_classes=4)
        sampler = SamplerSpec(steps=6)
        guidance = GuidanceSpec(method='cfg', gamma=gamma, condition=1)
        cond = jnp.ones((B,), jnp.int32)
        out = diffusion_sample(spec, sampler, apply_fn, params, KEY,
                               batch_size=B, length=L, guidance=guidance,
                               cond=cond)
        assert out.shape == (B, L)
        assert not bool((out == MASK).any())

    def test_ar_sample_and_guided(self):
        apply_fn, params = _make_model(causal=True, use_adaLN=False)
        sampler = SamplerSpec(steps=0)
        out = ar_sample(AR, sampler, apply_fn, params, KEY, batch_size=B,
                        length=L, bos_token_id=0)
        assert out.shape == (B, L)
        assert bool((out[:, 0] == 0).all())


class TestCacheEquivalence:
    @pytest.mark.slow
    def test_cache_on_off_same_distribution(self):
        """The MDLM cache must not change the sampling distribution: with
        identical keys the trajectories must be identical, because cached
        steps reuse the same x_theta the fresh computation would give."""
        apply_fn, params = _make_model()
        for use_cache in [False, True]:
            sampler = SamplerSpec(steps=16, use_cache=use_cache)
            out = diffusion_sample(MDLM, sampler, apply_fn, params, KEY,
                                   batch_size=B, length=L)
            if use_cache:
                np.testing.assert_array_equal(np.asarray(out),
                                              np.asarray(prev))
            prev = out


class TestARKVCache:
    def test_kv_path_matches_full_forward_path(self):
        """With identical keys, the KV-cache AR path must produce the
        same tokens as the full-forward path."""
        import dataclasses as dc
        cfg = dc.replace(MODEL_CFG, causal=True, use_adaLN=False)
        model = DIT(cfg)
        x = jax.random.randint(KEY, (B, L), 0, V)
        params = model.init(KEY, x, None)['params']
        params = jax.tree.map(
            lambda p: p + 0.02 * jax.random.normal(KEY, p.shape), params)
        apply_fn = make_model_apply(model)
        sampler = SamplerSpec(steps=0)
        slow = ar_sample(AR, sampler, apply_fn, params, KEY,
                         batch_size=B, length=L, bos_token_id=0)
        fast = ar_sample(AR, sampler, apply_fn, params, KEY,
                         batch_size=B, length=L, bos_token_id=0,
                         decode_cfg=cfg)
        np.testing.assert_array_equal(np.asarray(slow), np.asarray(fast))


def test_fused_flag_falls_back_on_cpu():
    """fused=True must silently use the jnp path off-TPU and match the
    unfused trajectory exactly (same keys)."""
    apply_fn, params = _make_model()
    a = diffusion_sample(MDLM, SamplerSpec(steps=6, fused=False),
                         apply_fn, params, KEY, batch_size=B, length=L)
    b = diffusion_sample(MDLM, SamplerSpec(steps=6, fused=True),
                         apply_fn, params, KEY, batch_size=B, length=L)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestFirstHittingSampler:
    def test_decodes_everything(self):
        apply_fn, params = _make_model()
        sampler = SamplerSpec(first_hitting=True)
        out = jax.jit(lambda k: diffusion_sample(
            MDLM, sampler, apply_fn, params, k, batch_size=B,
            length=L))(KEY)
        assert out.shape == (B, L)
        assert not bool((out == MASK).any())

    def test_cfg_variant(self):
        spec = _spec(num_classes=4)
        apply_fn, params = _make_model(num_classes=4)
        out = diffusion_sample(
            spec, SamplerSpec(first_hitting=True), apply_fn, params,
            KEY, batch_size=B, length=L,
            guidance=GuidanceSpec(method='cfg', gamma=2.0, condition=1),
            cond=jnp.ones((B,), jnp.int32))
        assert not bool((out == MASK).any())

    def test_matches_ancestral_distribution_oracle(self):
        """With a context-free oracle denoiser both samplers draw iid
        tokens from the same distribution; empirical marginals must
        agree."""
        probs = jnp.asarray([0.45, 0.3, 0.12, 0.05, 0.04, 0.02, 0.01,
                             0.005, 0.003, 0.002, 0.0])
        probs = probs / probs.sum()

        def oracle_apply(params, x, sigma, cond=None, x_emb=None, *,
                         train=False, rng=None,
                         return_hidden_states=False):
            logits = jnp.log(jnp.broadcast_to(
                probs, (*x.shape, V)) + 1e-12)
            return logits

        fh = diffusion_sample(MDLM, SamplerSpec(first_hitting=True),
                              oracle_apply, None, KEY, batch_size=64,
                              length=L)
        an = diffusion_sample(MDLM,
                              SamplerSpec(steps=64, use_cache=False),
                              oracle_apply, None, KEY, batch_size=64,
                              length=L)
        fh_counts = np.bincount(np.asarray(fh).ravel(), minlength=V)
        an_counts = np.bincount(np.asarray(an).ravel(), minlength=V)
        fh_p = fh_counts / fh_counts.sum()
        an_p = an_counts / an_counts.sum()
        np.testing.assert_allclose(fh_p, an_p, atol=0.04)
        np.testing.assert_allclose(fh_p[:3], np.asarray(probs)[:3],
                                   atol=0.04)


def test_first_hitting_per_position_head_matches():
    """The trunk-only + per-position-head fast path must reproduce the
    full-head first-hitting trajectory (same keys, fp32)."""
    import dataclasses as dc
    cfg = dc.replace(MODEL_CFG)
    apply_fn, params = _make_model()
    a = diffusion_sample(MDLM, SamplerSpec(first_hitting=True),
                         apply_fn, params, KEY, batch_size=B, length=L)
    b = diffusion_sample(MDLM, SamplerSpec(first_hitting=True),
                         apply_fn, params, KEY, batch_size=B, length=L,
                         dit_cfg=cfg)
    agree = float((np.asarray(a) == np.asarray(b)).mean())
    assert agree > 0.95, agree


def test_first_hitting_cfg_per_position_head_matches():
    import dataclasses as dc
    spec = _spec(num_classes=4)
    cfg = dc.replace(MODEL_CFG, num_classes=4)
    apply_fn, params = _make_model(num_classes=4)
    guidance = GuidanceSpec(method='cfg', gamma=2.0, condition=1)
    cond = jnp.ones((B,), jnp.int32)
    a = diffusion_sample(spec, SamplerSpec(first_hitting=True),
                         apply_fn, params, KEY, batch_size=B, length=L,
                         guidance=guidance, cond=cond)
    b = diffusion_sample(spec, SamplerSpec(first_hitting=True),
                         apply_fn, params, KEY, batch_size=B, length=L,
                         guidance=guidance, cond=cond, dit_cfg=cfg)
    agree = float((np.asarray(a) == np.asarray(b)).mean())
    assert agree > 0.95, agree


class TestFlagCoverage:
    def test_subs_masking_zeroes_mask_prob(self):
        spec = _spec(diffusion='uniform', parameterization='d3pm',
                     time_conditioning=True, subs_masking=True)
        apply_fn, params = _make_model()
        xt = jax.random.randint(KEY, (B, L), 0, V)
        out = log_x_theta(spec, apply_fn, params, xt, jnp.ones((B,)))
        assert float(jnp.exp(out[..., MASK]).max()) < 1e-30

    def test_change_of_variables_loss(self):
        spec = _spec(change_of_variables=True)
        apply_fn, params = _make_model()
        x0 = jax.random.randint(KEY, (B, L), 0, V - 1)
        mask = jnp.ones((B, L), jnp.float32)
        out = loss_fn(spec, apply_fn, params, x0, mask, None, KEY,
                      train=True)
        assert np.isfinite(float(out.loss))

    def test_importance_sampling_loss(self):
        spec = _spec(importance_sampling=True)
        apply_fn, params = _make_model()
        x0 = jax.random.randint(KEY, (B, L), 0, V - 1)
        mask = jnp.ones((B, L), jnp.float32)
        out = loss_fn(spec, apply_fn, params, x0, mask, None, KEY,
                      train=True)
        assert np.isfinite(float(out.loss))

    def test_noise_schedule_warmup_caps_move_chance(self):
        spec = _spec(noise_schedule_warmup=True,
                     noise_schedule_warmup_fraction=0.5, max_steps=100)
        apply_fn, params = _make_model()
        x0 = jax.random.randint(KEY, (B, L), 0, V - 1)
        mask = jnp.ones((B, L), jnp.float32)
        out = loss_fn(spec, apply_fn, params, x0, mask, None, KEY,
                      train=True, step=jnp.asarray(1))
        assert np.isfinite(float(out.loss))

    def test_unrolling_ignore_diffusion_loss(self):
        spec = _spec(unrolling=True, unrolling_steps=2,
                     unrolling_ignore_diffusion_loss=True)
        apply_fn, params = _make_model()
        x0 = jax.random.randint(KEY, (B, L), 0, V - 1)
        mask = jnp.ones((B, L), jnp.float32)
        out = loss_fn(spec, apply_fn, params, x0, mask, None, KEY,
                      train=True)
        assert np.isfinite(float(out.loss))
