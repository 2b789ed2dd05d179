"""Classifier runtime tests: training convergence, FUDGE mode,
log-probs, guided sampling integration (CBG exact + approx, NOS)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ddg_tpu.classifier import (ClassifierSpec, classifier_loss_fn,
                                get_log_probs,
                                make_classifier_train_step)
from ddg_tpu.diffusion import DiffusionSpec
from ddg_tpu.models import (DIT, DITClassifier, DITConfig,
                            make_classifier_apply, make_model_apply)
from ddg_tpu.ops.noise_schedules import LogLinearNoise
from ddg_tpu.runtime.averaging import AveragingSpec
from ddg_tpu.runtime.optim import OptimSpec
from ddg_tpu.runtime.train_state import init_train_state
from ddg_tpu.samplers import GuidanceSpec, SamplerSpec, diffusion_sample

KEY = jax.random.PRNGKey(0)
V, MASK, B, L, NC = 11, 10, 8, 16, 2

CLF_CFG = DITConfig(hidden_size=32, cond_dim=16, length=L, n_blocks=2,
                    n_heads=2, dropout=0.0, vocab_size=V,
                    compute_dtype=jnp.float32)
CLF_SPEC = ClassifierSpec(diffusion='absorbing_state',
                          parameterization='subs',
                          noise=LogLinearNoise(), vocab_size=V,
                          mask_index=MASK, num_classes=NC,
                          time_conditioning=True)


def _clf(pooling='mean'):
    clf = DITClassifier(CLF_CFG, num_classes=NC, pooling=pooling)
    x = jax.random.randint(KEY, (B, L), 0, V)
    params = clf.init(KEY, x, jnp.ones((B,)))['params']
    return make_classifier_apply(clf), params


def _labeled_batch():
    """Class 0: all-3 sequences; class 1: all-7 sequences. Learnable
    even under corruption."""
    half = B // 2
    x = jnp.concatenate([jnp.full((half, L), 3, jnp.int32),
                         jnp.full((half, L), 7, jnp.int32)])
    y = jnp.concatenate([jnp.zeros((half,), jnp.int32),
                         jnp.ones((half,), jnp.int32)])
    return {'input_ids': x,
            'attention_mask': jnp.ones((B, L), jnp.float32), 'label': y}


class TestClassifierTraining:
    def test_loss_and_grads_finite(self):
        apply_fn, params = _clf()
        loss, logits = classifier_loss_fn(CLF_SPEC, apply_fn, params,
                                          _labeled_batch(), KEY)
        assert np.isfinite(float(loss))
        assert logits.shape == (B, NC)

    def test_learns_separable_classes(self):
        apply_fn, params = _clf()
        optim = OptimSpec(lr=3e-3, num_warmup_steps=0)
        avg = AveragingSpec(kind='none')
        state = init_train_state(KEY, params, optim, avg)
        step = jax.jit(make_classifier_train_step(
            CLF_SPEC, apply_fn, optim, avg))
        batch = _labeled_batch()
        for _ in range(40):
            state, metrics = step(state, batch)
        assert float(metrics['accuracy']) > 0.9
        assert float(metrics['loss']) < 0.4

    def test_fudge_per_position_loss(self):
        spec = dataclasses.replace(CLF_SPEC, parameterization='ar',
                                   is_fudge_classifier=True)
        # FUDGE classifiers are causal AR models (reference dit.py:478).
        cfg = dataclasses.replace(CLF_CFG, causal=True)
        clf = DITClassifier(cfg, num_classes=NC, pooling='no_pooling')
        x = jax.random.randint(KEY, (B, L), 0, V)
        params = clf.init(KEY, x, None)['params']
        apply_fn = make_classifier_apply(clf)
        loss, logits = classifier_loss_fn(spec, apply_fn, params,
                                          _labeled_batch(), KEY)
        assert logits.shape == (B, L, NC)
        assert np.isfinite(float(loss))

    def test_time_dependent_label_smoothing(self):
        spec = dataclasses.replace(CLF_SPEC, use_label_smoothing=True)
        apply_fn, params = _clf()
        loss, _ = classifier_loss_fn(spec, apply_fn, params,
                                     _labeled_batch(), KEY)
        assert np.isfinite(float(loss))

    def test_get_log_probs_normalized(self):
        apply_fn, params = _clf()
        x = jax.random.randint(KEY, (B, L), 0, V)
        lp = get_log_probs(CLF_SPEC, apply_fn, params, x, jnp.ones((B,)))
        np.testing.assert_allclose(np.asarray(jnp.exp(lp).sum(-1)), 1.0,
                                   atol=1e-5)


class TestGuidedSamplingWithClassifier:
    def _diffusion(self):
        cfg = CLF_CFG
        model = DIT(cfg)
        x = jax.random.randint(KEY, (B, L), 0, V)
        params = model.init(KEY, x, jnp.ones((B,)))['params']
        params = jax.tree.map(
            lambda p: p + 0.01 * jax.random.normal(KEY, p.shape), params)
        spec = DiffusionSpec(diffusion='absorbing_state',
                             parameterization='subs',
                             noise=LogLinearNoise(), vocab_size=V,
                             mask_index=MASK, num_classes=NC)
        return spec, make_model_apply(model), params

    def test_cbg_exact_sampling(self):
        spec, apply_fn, params = self._diffusion()
        capply, cparams = _clf()

        def clf_for_sampler(p, x, sigma, x_emb=None):
            return capply(p, x, sigma, x_emb)

        sampler = SamplerSpec(steps=4, use_cache=False)
        guidance = GuidanceSpec(method='cbg', gamma=2.0, condition=1,
                                cbg_chunk=64)
        out = diffusion_sample(spec, sampler, apply_fn, params, KEY,
                               batch_size=2, length=L, guidance=guidance,
                               classifier_apply=clf_for_sampler,
                               classifier_params=cparams)
        assert out.shape == (2, L)
        assert not bool((out == MASK).any())

    def test_cbg_approx_sampling(self):
        spec, apply_fn, params = self._diffusion()
        capply, cparams = _clf()

        def clf_for_sampler(p, x, sigma, x_emb=None):
            return capply(p, x, sigma, x_emb)

        sampler = SamplerSpec(steps=4, use_cache=False)
        guidance = GuidanceSpec(method='cbg', gamma=2.0, condition=1,
                                use_approx=True)
        out = diffusion_sample(spec, sampler, apply_fn, params, KEY,
                               batch_size=2, length=L, guidance=guidance,
                               classifier_apply=clf_for_sampler,
                               classifier_params=cparams)
        assert out.shape == (2, L)
        assert not bool((out == MASK).any())

    def test_nos_sampling(self):
        spec, apply_fn, params = self._diffusion()
        capply, cparams = _clf()

        def clf_for_sampler(p, x, sigma, x_emb=None):
            return capply(p, x, sigma, x_emb)

        sampler = SamplerSpec(steps=4, use_cache=False)
        guidance = GuidanceSpec(method='nos', condition=1,
                                num_nos_steps=2, nos_step_size=0.1,
                                nos_stability_coef=0.01)
        out = diffusion_sample(spec, sampler, apply_fn, params, KEY,
                               batch_size=2, length=L, guidance=guidance,
                               classifier_apply=clf_for_sampler,
                               classifier_params=cparams)
        assert out.shape == (2, L)
        assert not bool((out == MASK).any())

    def test_cbg_guidance_steers_samples(self):
        """With an oracle classifier preferring token 7, gamma>0 must
        raise the frequency of 7s vs unguided sampling."""
        spec, apply_fn, params = self._diffusion()

        def oracle_clf(p, x, sigma, x_emb=None):
            # log p(class=1) increases with count of token 7.
            score = (x == 7).sum(-1).astype(jnp.float32)
            return jnp.stack([-score, score], axis=-1)

        sampler = SamplerSpec(steps=8, use_cache=False)
        base = diffusion_sample(spec, sampler, apply_fn, params, KEY,
                                batch_size=8, length=L)
        guided = diffusion_sample(
            spec, sampler, apply_fn, params, KEY, batch_size=8,
            length=L,
            guidance=GuidanceSpec(method='cbg', gamma=4.0, condition=1,
                                  cbg_chunk=64),
            classifier_apply=oracle_clf, classifier_params=None)
        assert float((guided == 7).mean()) > float((base == 7).mean())


class TestFudgeARSampling:
    def test_fudge_guided_ar(self):
        import dataclasses as dc
        cfg = dc.replace(CLF_CFG, causal=True)
        model_cfg = dc.replace(CLF_CFG, causal=True, use_adaLN=False)
        from ddg_tpu.models import DIT
        from ddg_tpu.samplers import ar_sample
        model = DIT(model_cfg)
        x = jax.random.randint(KEY, (B, L), 0, V)
        params = model.init(KEY, x, None)['params']
        params = jax.tree.map(
            lambda p: p + 0.02 * jax.random.normal(KEY, p.shape), params)
        apply_fn = make_model_apply(model)

        clf = DITClassifier(cfg, num_classes=NC, pooling='no_pooling')
        cparams = clf.init(KEY, x, None)['params']

        def clf_apply(p, xx, sigma, x_emb=None):
            return clf.apply({'params': p}, xx, None)

        from ddg_tpu.diffusion import DiffusionSpec
        from ddg_tpu.ops.noise_schedules import LogLinearNoise
        from ddg_tpu.samplers import GuidanceSpec, SamplerSpec
        spec = DiffusionSpec(diffusion='absorbing_state',
                             parameterization='ar',
                             noise=LogLinearNoise(), vocab_size=V,
                             mask_index=MASK)
        out = ar_sample(
            spec, SamplerSpec(), apply_fn, params, KEY, batch_size=B,
            length=L, bos_token_id=2,
            guidance=GuidanceSpec(method='fudge', gamma=2.0,
                                  condition=1, topk=5),
            classifier_apply=clf_apply, classifier_params=cparams)
        assert out.shape == (B, L)
        assert bool((out[:, 0] == 2).all())


def test_frozen_keys_zero_grads():
    """frozen_keys must keep the listed top-level trees unchanged."""
    from ddg_tpu.runtime.train_state import init_train_state
    apply_fn, params = _clf()
    optim = OptimSpec(lr=1e-2, num_warmup_steps=0)
    avg = AveragingSpec(kind='none')
    state = init_train_state(KEY, params, optim, avg)
    frozen = tuple(k for k in params if k.startswith('block_'))
    step = jax.jit(make_classifier_train_step(
        CLF_SPEC, apply_fn, optim, avg, frozen_keys=frozen))
    state2, _ = step(state, _labeled_batch())
    for k in params:
        same = all(
            bool(jnp.array_equal(a, b)) for a, b in zip(
                jax.tree.leaves(state.params[k]),
                jax.tree.leaves(state2.params[k])))
        if k in frozen:
            assert same, f'{k} should be frozen'
        elif k != 'sigma_map':  # zero grad at init (zero-init adaLN)
            assert not same, f'{k} should train'


class TestEvalClassifierNoSigma:
    """Clean-sequence (eval) classifiers call the DiT backbone with
    sigma=None; the backbone conditions on sigma=0, matching the
    reference's zeroed sigma under no time conditioning
    (classifier.py:484-489) and its sigma-free eval-classifier path
    (classifier.py:306-308)."""

    def test_sigma_none_equals_sigma_zero(self):
        clf = DITClassifier(CLF_CFG, num_classes=NC)
        x = jax.random.randint(KEY, (B, L), 0, V)
        params = clf.init(KEY, x, None)['params']
        out_none = clf.apply({'params': params}, x, None)
        out_zero = clf.apply({'params': params}, x,
                             jnp.zeros((B,), jnp.float32))
        assert out_none.shape == (B, NC)
        np.testing.assert_allclose(np.asarray(out_none),
                                   np.asarray(out_zero), rtol=1e-6)


class TestArPPLM:
    """AR PPLM guidance (samplers.py): the reference declares the
    config surface (configs/guidance/pplm.yaml) but stubs the sampler
    (diffusion.py:1269-1279); here it is implemented."""

    def _ar_setup(self):
        import dataclasses as dc
        model_cfg = dc.replace(CLF_CFG, causal=True, use_adaLN=False)
        model = DIT(model_cfg)
        x = jax.random.randint(KEY, (B, L), 0, V)
        params = model.init(KEY, x, None)['params']
        params = jax.tree.map(
            lambda p: p + 0.02 * jax.random.normal(KEY, p.shape),
            params)
        spec = DiffusionSpec(diffusion='absorbing_state',
                             parameterization='ar',
                             noise=LogLinearNoise(), vocab_size=V,
                             mask_index=MASK)
        return spec, model_cfg, make_model_apply(model), params

    def test_pplm_steers_towards_token(self):
        """A hidden-state attribute scorer aligned with one vocab
        column must pull decoding toward that token when PPLM ascent
        is on (vs the identical run with guidance off)."""
        from ddg_tpu.samplers import ar_sample
        spec, _, apply_fn, params = self._ar_setup()
        k_tok = 5
        v = params['output_linear']['kernel'][:, k_tok].astype(
            jnp.float32)

        def clf_apply(p, xx, sigma, x_emb=None, attention_mask=None):
            s = x_emb.astype(jnp.float32) @ v  # (B, L)
            s = (s * attention_mask).sum(1) / (
                attention_mask.sum(1) + 1e-9)
            return jnp.stack([jnp.zeros_like(s), s], axis=-1)

        base = ar_sample(spec, SamplerSpec(), apply_fn, params, KEY,
                         batch_size=B, length=L, bos_token_id=2)
        guided = ar_sample(
            spec, SamplerSpec(), apply_fn, params, KEY, batch_size=B,
            length=L, bos_token_id=2,
            guidance=GuidanceSpec(method='pplm', condition=1,
                                  num_pplm_steps=10,
                                  pplm_step_size=0.5,
                                  pplm_stability_coef=0.0),
            classifier_apply=clf_apply, classifier_params={})
        assert guided.shape == (B, L)
        assert bool((guided[:, 0] == 2).all())
        n_base = int((np.asarray(base)[:, 1:] == k_tok).sum())
        n_guided = int((np.asarray(guided)[:, 1:] == k_tok).sum())
        assert n_guided > n_base, (n_base, n_guided)

    def test_pplm_with_dit_classifier_module(self):
        """Wiring smoke test with the real DITClassifier
        (attention_mean pooling, x_emb hook, sigma=None)."""
        from ddg_tpu.samplers import ar_sample
        spec, model_cfg, apply_fn, params = self._ar_setup()
        clf = DITClassifier(CLF_CFG, num_classes=NC,
                            pooling='attention_mean')
        x = jax.random.randint(KEY, (B, L), 0, V)
        cparams = clf.init(KEY, x, None,
                           attention_mask=jnp.ones((B, L)))['params']
        out = ar_sample(
            spec, SamplerSpec(), apply_fn, params, KEY, batch_size=B,
            length=L, bos_token_id=2,
            guidance=GuidanceSpec(method='pplm', condition=1,
                                  num_pplm_steps=2,
                                  pplm_step_size=0.1,
                                  pplm_stability_coef=0.01),
            classifier_apply=make_classifier_apply(clf),
            classifier_params=cparams)
        assert out.shape == (B, L)
        assert bool((out[:, 0] == 2).all())
        assert int(out.min()) >= 0 and int(out.max()) < V
