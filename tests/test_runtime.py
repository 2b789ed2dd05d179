"""Training runtime tests: optimizer schedules, EMA/SWA, sharded train
step on the 8-device virtual mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ddg_tpu.diffusion import DiffusionSpec
from ddg_tpu.models import DIT, DITConfig, make_model_apply
from ddg_tpu.ops.noise_schedules import LogLinearNoise
from ddg_tpu.parallel import mesh as mesh_lib
from ddg_tpu.runtime import averaging
from ddg_tpu.runtime.averaging import AveragingSpec
from ddg_tpu.runtime.optim import OptimSpec, make_schedule
from ddg_tpu.runtime.train_state import (init_train_state, make_eval_step,
                                         make_train_step)

KEY = jax.random.PRNGKey(0)
V, MASK, B, L = 11, 10, 8, 16

MODEL_CFG = DITConfig(hidden_size=32, cond_dim=16, length=L, n_blocks=2,
                      n_heads=2, dropout=0.0, vocab_size=V,
                      compute_dtype=jnp.float32)
SPEC = DiffusionSpec(diffusion='absorbing_state', parameterization='subs',
                     noise=LogLinearNoise(), vocab_size=V,
                     mask_index=MASK)


def _setup():
    model = DIT(MODEL_CFG)
    x = jax.random.randint(KEY, (B, L), 0, V)
    params = model.init(KEY, x, jnp.ones((B,)))['params']
    return make_model_apply(model), params


class TestSchedules:
    def test_constant_warmup(self):
        s = make_schedule(OptimSpec(lr=1e-3, scheduler='constant_warmup',
                                    num_warmup_steps=100))
        assert float(s(0)) == 0.0
        np.testing.assert_allclose(float(s(50)), 5e-4, rtol=1e-6)
        np.testing.assert_allclose(float(s(100)), 1e-3, rtol=1e-6)
        np.testing.assert_allclose(float(s(10_000)), 1e-3, rtol=1e-6)

    def test_cosine_decay_warmup(self):
        spec = OptimSpec(lr=1e-3, scheduler='cosine_decay_warmup',
                         max_steps=1000, warmup_frac=0.1,
                         warmup_lr_init=1e-6, lr_min=1e-6)
        s = make_schedule(spec)
        np.testing.assert_allclose(float(s(0)), 1e-6, rtol=1e-5)
        np.testing.assert_allclose(float(s(100)), 1e-3, rtol=1e-2)
        # End of cosine: lr_min
        np.testing.assert_allclose(float(s(1000)), 1e-6, atol=1e-8)
        # Midpoint of cosine phase: (lr + lr_min)/2
        np.testing.assert_allclose(float(s(550)), (1e-3 + 1e-6) / 2,
                                   rtol=1e-3)


class TestAveraging:
    def test_ema_matches_reference_semantics(self):
        import sys
        sys.path.insert(0, '/root/reference/models')
        import torch
        from ema import ExponentialMovingAverage

        p_torch = [torch.nn.Parameter(torch.ones(3) * 2.0)]
        ref = ExponentialMovingAverage(p_torch, decay=0.9)
        spec = AveragingSpec.ema(0.9)
        params = {'w': jnp.ones(3) * 2.0}
        state = averaging.init(spec, params)
        for step in range(5):
            with torch.no_grad():
                p_torch[0].copy_(torch.ones(3) * float(step))
            ref.update(p_torch)
            params = {'w': jnp.ones(3) * step}
            state = averaging.update(spec, state, params)
        np.testing.assert_allclose(
            np.asarray(state.shadow_params['w']),
            ref.shadow_params[0].numpy(), rtol=1e-6)

    def test_swa_arithmetic_mean(self):
        spec = AveragingSpec(kind='swa', start_step=2, avg_frequency=1)
        params = {'w': jnp.zeros(2)}
        state = averaging.init(spec, params)
        vals = []
        for step in range(1, 6):
            params = {'w': jnp.full((2,), float(step))}
            state = averaging.update(spec, state, params)
            if step >= 2:
                vals.append(float(step))
        np.testing.assert_allclose(np.asarray(state.shadow_params['w']),
                                   np.mean(vals), rtol=1e-6)

    def test_averaged_params_selector(self):
        spec = AveragingSpec.ema(0.5)
        params = {'w': jnp.ones(2)}
        state = averaging.init(spec, params)
        live = {'w': jnp.zeros(2)}
        assert float(averaging.averaged_params(state, live)['w'][0]) == 1.0
        assert float(averaging.averaged_params(None, live)['w'][0]) == 0.0


class TestTrainStep:
    def _batch(self):
        return {
            'input_ids': jax.random.randint(KEY, (B, L), 0, V - 1),
            'attention_mask': jnp.ones((B, L), jnp.float32),
        }

    def test_loss_decreases(self):
        # Learnable data (constant token) + t-independent simple-CE
        # objective: loss must drive to ~0.
        spec = dataclasses.replace(SPEC, use_simple_ce_loss=True)
        apply_fn, params = _setup()
        optim = OptimSpec(lr=3e-3, num_warmup_steps=0)
        avg = AveragingSpec.ema(0.99)
        state = init_train_state(KEY, params, optim, avg)
        step = jax.jit(make_train_step(spec, apply_fn, optim, avg))
        batch = {'input_ids': jnp.full((B, L), 3, jnp.int32),
                 'attention_mask': jnp.ones((B, L), jnp.float32)}
        losses = []
        for _ in range(60):
            state, metrics = step(state, batch)
            losses.append(float(metrics['loss']))
        assert losses[-1] < 0.05 * losses[0]
        assert int(state.step) == 60
        assert np.isfinite(float(metrics['grad_norm']))

    def test_eval_step_uses_ema(self):
        apply_fn, params = _setup()
        optim = OptimSpec(lr=1e-2, num_warmup_steps=0)
        avg = AveragingSpec.ema(1.0, use_num_updates=False)  # frozen shadow
        state = init_train_state(KEY, params, optim, avg)
        step = jax.jit(make_train_step(SPEC, apply_fn, optim, avg))
        batch = self._batch()
        for _ in range(5):
            state, _ = step(state, batch)
        eval_ema = make_eval_step(SPEC, apply_fn, use_averaged=True)
        eval_live = make_eval_step(SPEC, apply_fn, use_averaged=False)
        m_ema = eval_ema(state, batch, KEY)
        m_live = eval_live(state, batch, KEY)
        # decay=1.0 shadow == init params != trained params
        assert (float(m_ema['nll_sum']) != float(m_live['nll_sum']))

    def test_sharded_train_step_8dev(self):
        assert len(jax.devices()) == 8
        mesh = mesh_lib.make_mesh(num_data=4, num_fsdp=2)
        apply_fn, params = _setup()
        optim = OptimSpec(lr=1e-2, num_warmup_steps=0)
        avg = AveragingSpec.ema(0.99)
        state = init_train_state(KEY, params, optim, avg)
        train_step = make_train_step(SPEC, apply_fn, optim, avg)
        batch = self._batch()
        jitted, place_state, place_batch = mesh_lib.shard_train_step(
            mesh, train_step, state, batch)
        state = place_state(state)
        batch = place_batch(batch)
        state, metrics = jitted(state, batch)
        assert np.isfinite(float(metrics['loss']))
        # Parity vs single-device execution of the same step.
        state1 = init_train_state(KEY, _setup()[1], optim, avg)
        _, metrics1 = jax.jit(train_step)(state1, self._batch())
        np.testing.assert_allclose(float(metrics['loss']),
                                   float(metrics1['loss']), rtol=1e-4)

    def test_tensor_parallel_train_step_8dev(self):
        # Megatron-style TP (data=2, fsdp=2, tensor=2): loss parity vs
        # single-device, and the TP param rules actually shard kernels.
        mesh = mesh_lib.make_mesh(num_data=2, num_fsdp=2, num_tensor=2)
        cfg = dataclasses.replace(MODEL_CFG, tensor_axis='tensor')
        model = DIT(cfg)
        x = jax.random.randint(KEY, (B, L), 0, V)
        params = model.init(KEY, x, jnp.ones((B,)))['params']
        apply_fn = make_model_apply(model)
        optim = OptimSpec(lr=1e-2, num_warmup_steps=0)
        avg = AveragingSpec.ema(0.99)
        state = init_train_state(KEY, params, optim, avg)
        train_step = make_train_step(SPEC, apply_fn, optim, avg)
        batch = self._batch()
        jitted, place_state, place_batch = mesh_lib.shard_train_step(
            mesh, train_step, state, batch)
        sh = mesh_lib.state_shardings(mesh, state, min_size=0)
        specs = [str(s.spec) for s in jax.tree.leaves(sh)]
        assert any('tensor' in s for s in specs)
        pstate, metrics = jitted(place_state(state), place_batch(batch))
        state1 = init_train_state(KEY, params, optim, avg)
        _, metrics1 = jax.jit(train_step)(state1, self._batch())
        np.testing.assert_allclose(float(metrics['loss']),
                                   float(metrics1['loss']), rtol=1e-4)
        # step applies: params moved identically (spot-check one leaf)
        l0 = jax.tree.leaves(pstate.params)[0]
        l1 = jax.tree.leaves(state1.params)[0]
        np.testing.assert_allclose(np.asarray(l0), np.asarray(l1),
                                   atol=1e-4)

    def test_sequence_parallel_train_step_8dev(self):
        # Context parallelism: activations sharded over L on the
        # tensor axis (params replicated/fsdp). Loss parity vs
        # single-device.
        mesh = mesh_lib.make_mesh(num_data=2, num_fsdp=1, num_tensor=4)
        cfg = dataclasses.replace(MODEL_CFG, tensor_axis='tensor',
                                  tp_mode='sequence')
        model = DIT(cfg)
        x = jax.random.randint(KEY, (B, L), 0, V)
        params = model.init(KEY, x, jnp.ones((B,)))['params']
        apply_fn = make_model_apply(model)
        optim = OptimSpec(lr=1e-2, num_warmup_steps=0)
        avg = AveragingSpec.ema(0.99)
        state = init_train_state(KEY, params, optim, avg)
        train_step = make_train_step(SPEC, apply_fn, optim, avg)
        batch = self._batch()
        jitted, place_state, place_batch = mesh_lib.shard_train_step(
            mesh, train_step, state, batch, tensor_rules=False)
        _, metrics = jitted(place_state(state), place_batch(batch))
        state1 = init_train_state(KEY, params, optim, avg)
        _, metrics1 = jax.jit(train_step)(state1, self._batch())
        np.testing.assert_allclose(float(metrics['loss']),
                                   float(metrics1['loss']), rtol=1e-4)

    def test_fsdp_actually_shards(self):
        mesh = mesh_lib.make_mesh(num_data=2, num_fsdp=4)
        apply_fn, params = _setup()
        optim = OptimSpec(lr=1e-2, num_warmup_steps=0)
        state = init_train_state(KEY, params, optim,
                                 AveragingSpec(kind='none'))
        sh = mesh_lib.state_shardings(mesh, state, min_size=0)
        # At least one large param must be sharded over fsdp.
        specs = [s.spec for s in jax.tree.leaves(sh)]
        assert any('fsdp' in str(s) for s in specs)


class TestShardedSampling:
    def test_sample_sharded_over_data_axis(self):
        from ddg_tpu.diffusion import DiffusionSpec
        from ddg_tpu.models import DIT, DITConfig, make_model_apply
        from ddg_tpu.ops.noise_schedules import LogLinearNoise
        from ddg_tpu.samplers import GuidanceSpec, SamplerSpec, \
            diffusion_sample

        mesh = mesh_lib.make_mesh(num_data=8, num_fsdp=1)
        cfg = dataclasses.replace(MODEL_CFG, num_classes=2)
        model = DIT(cfg)
        x = jax.random.randint(KEY, (B, L), 0, V)
        params = model.init(KEY, x, jnp.ones((B,)),
                            jnp.zeros((B,), jnp.int32))['params']
        spec = dataclasses.replace(SPEC, num_classes=2)
        apply_fn = make_model_apply(model)
        sampler = SamplerSpec(steps=4, use_cache=False)
        guidance = GuidanceSpec(method='cfg', gamma=2.0, condition=1)

        def sample_fn(p, key):
            # local semantics: each device runs batch 2 -> global 16
            cond = jnp.ones((2,), jnp.int32)
            return diffusion_sample(spec, sampler, apply_fn, p, key,
                                    batch_size=2, length=L,
                                    guidance=guidance, cond=cond)

        jitted, p = mesh_lib.shard_sample_fn(mesh, sample_fn, params)
        out = jitted(p, KEY)
        assert out.shape == (16, L)
        # output actually sharded over the data axis
        assert len(out.sharding.device_set) == 8
        assert not bool((out == MASK).any())


class TestGradAccumulation:
    def test_accum_step_runs_and_counts_once(self):
        apply_fn, params = _setup()
        optim = OptimSpec(lr=1e-3, num_warmup_steps=0)
        avg = AveragingSpec.ema(0.99)
        state = init_train_state(KEY, params, optim, avg)
        step = jax.jit(make_train_step(SPEC, apply_fn, optim, avg,
                                       accum_steps=4))
        batch = {
            'input_ids': jax.random.randint(KEY, (4, B, L), 0, V - 1),
            'attention_mask': jnp.ones((4, B, L), jnp.float32),
        }
        state, metrics = step(state, batch)
        # one optimizer step despite 4 micro-batches
        assert int(state.step) == 1
        assert int(state.averaging.num_updates) == 1
        assert np.isfinite(float(metrics['loss']))
        assert float(metrics['token_count']) == 4 * B * L

    def test_accum_matches_manual_grad_average(self):
        """The accumulated step applies exactly the micro-grad average.

        This is what licenses running the reference global batch as
        micro-batches by default (the on-chip accum sweep's 159.6K ->
        236.7K tok/s was a pure memory-layout change, not a semantics
        change). Reference: per-micro grads with the step's own
        fold_in RNG stream, averaged, pushed through the same
        optimizer — the resulting params must match the jitted accum
        step's."""
        import optax

        from ddg_tpu.diffusion import loss_fn
        from ddg_tpu.runtime.optim import make_optimizer

        cfg = dataclasses.replace(MODEL_CFG, dropout=0.0)
        model = DIT(cfg)
        x = jax.random.randint(KEY, (B, L), 0, V - 1)
        params = model.init(KEY, x, jnp.ones((B,)))['params']
        apply_fn = make_model_apply(model)
        optim = OptimSpec(lr=1e-3, num_warmup_steps=0)
        avg = AveragingSpec.ema(0.99)

        ids = jax.random.randint(KEY, (4 * B, L), 0, V - 1)
        mask = jnp.ones((4 * B, L), jnp.float32)
        split = jax.tree.map(
            lambda a: a.reshape(4, B, *a.shape[1:]),
            {'input_ids': ids, 'attention_mask': mask})

        state = init_train_state(KEY, params, optim, avg)
        step4 = jax.jit(make_train_step(SPEC, apply_fn, optim, avg,
                                        accum_steps=4))
        new4, m4 = step4(state, split)

        _, step_rng = jax.random.split(state.rng)

        def one(i):
            def f(p):
                out = loss_fn(SPEC, apply_fn, p,
                              split['input_ids'][i],
                              split['attention_mask'][i], None,
                              jax.random.fold_in(step_rng, i),
                              train=True, step=state.step)
                return out.loss
            return jax.value_and_grad(f)(state.params)

        losses, grads = [], None
        for i in range(4):
            l, g = one(i)
            losses.append(float(l))
            grads = g if grads is None else jax.tree.map(
                jnp.add, grads, g)
        grads = jax.tree.map(lambda g: g / 4, grads)
        np.testing.assert_allclose(float(m4['loss']),
                                   float(np.mean(losses)), rtol=1e-5)
        tx = make_optimizer(optim)
        updates, _ = tx.update(grads, state.opt_state, state.params)
        want = optax.apply_updates(state.params, updates)
        for a, b in zip(jax.tree.leaves(new4.params),
                        jax.tree.leaves(want)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-6)


def test_sharded_first_hitting_sampling():
    """North-star layout: first-hitting guided generation data-parallel
    over the mesh."""
    import dataclasses as dc
    from ddg_tpu.samplers import GuidanceSpec, SamplerSpec, \
        diffusion_sample

    mesh = mesh_lib.make_mesh(num_data=8, num_fsdp=1)
    cfg = dataclasses.replace(MODEL_CFG, num_classes=2)
    model = DIT(cfg)
    x = jax.random.randint(KEY, (B, L), 0, V)
    params = model.init(KEY, x, jnp.ones((B,)),
                        jnp.zeros((B,), jnp.int32))['params']
    spec = dataclasses.replace(SPEC, num_classes=2)
    apply_fn = make_model_apply(model)

    def sample_fn(p, key):
        # local semantics: each device runs batch 2 -> global 16
        cond = jnp.ones((2,), jnp.int32)
        return diffusion_sample(
            spec, SamplerSpec(first_hitting=True), apply_fn, p, key,
            batch_size=2, length=L,
            guidance=GuidanceSpec(method='cfg', gamma=2.0, condition=1),
            cond=cond, dit_cfg=cfg)

    jitted, p = mesh_lib.shard_sample_fn(mesh, sample_fn, params)
    out = jitted(p, KEY)
    assert out.shape == (16, L)
    assert len(out.sharding.device_set) == 8
    assert not bool((out == MASK).any())
