"""Pipeline parallelism (parallel/pipeline.py): GPipe schedule over a
'pipe' mesh axis — logits parity vs the unpipelined DIT, params layout
roundtrip, and sharded train-step loss parity on the 8-device mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ddg_tpu.diffusion import DiffusionSpec
from ddg_tpu.models import DIT, DITConfig, make_model_apply
from ddg_tpu.ops.noise_schedules import LogLinearNoise
from ddg_tpu.parallel import mesh as mesh_lib
from ddg_tpu.parallel.pipeline import (from_pipeline_params,
                                       make_pipeline_apply,
                                       to_pipeline_params)
from ddg_tpu.runtime.averaging import AveragingSpec
from ddg_tpu.runtime.optim import OptimSpec
from ddg_tpu.runtime.train_state import init_train_state, make_train_step

KEY = jax.random.PRNGKey(0)
V, MASK, B, L = 11, 10, 8, 16

CFG = DITConfig(hidden_size=32, cond_dim=16, length=L, n_blocks=4,
                n_heads=2, dropout=0.0, vocab_size=V,
                compute_dtype=jnp.float32)
SPEC = DiffusionSpec(diffusion='absorbing_state', parameterization='subs',
                     noise=LogLinearNoise(), vocab_size=V,
                     mask_index=MASK)


def _init():
    model = DIT(CFG)
    x = jax.random.randint(KEY, (B, L), 0, V)
    sigma = jnp.linspace(0.1, 0.9, B)
    params = model.init(KEY, x[:1], sigma[:1])['params']
    return model, params, x, sigma


def test_params_roundtrip():
    _, params, _, _ = _init()
    pp = to_pipeline_params(params, CFG.n_blocks)
    assert 'pipeline_blocks' in pp and 'block_0' not in pp
    back = from_pipeline_params(pp, CFG.n_blocks)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipeline_logits_parity():
    mesh = mesh_lib.make_mesh(num_data=2, num_fsdp=1, num_tensor=1,
                              num_pipe=4)
    model, params, x, sigma = _init()
    ref = model.apply({'params': params}, x, sigma)
    pp_apply = make_pipeline_apply(CFG, mesh, n_micro=2)
    pp = to_pipeline_params(params, CFG.n_blocks)
    got = jax.jit(pp_apply)(pp, x, sigma)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_pipeline_cond_logits_parity():
    cfg = dataclasses.replace(CFG, num_classes=2)
    mesh = mesh_lib.make_mesh(num_data=1, num_fsdp=2, num_tensor=1,
                              num_pipe=4)
    model = DIT(cfg)
    x = jax.random.randint(KEY, (B, L), 0, V)
    sigma = jnp.linspace(0.1, 0.9, B)
    cond = jnp.array([0, 1] * (B // 2), jnp.int32)
    params = model.init(KEY, x[:1], sigma[:1], cond[:1])['params']
    ref = model.apply({'params': params}, x, sigma, cond)
    pp_apply = make_pipeline_apply(cfg, mesh, n_micro=4)
    pp = to_pipeline_params(params, cfg.n_blocks)
    got = jax.jit(pp_apply)(pp, x, sigma, cond)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_pipeline_train_step_parity_8dev():
    mesh = mesh_lib.make_mesh(num_data=2, num_fsdp=1, num_tensor=1,
                              num_pipe=4)
    model, params, x, _ = _init()
    batch = {'input_ids': x,
             'attention_mask': jnp.ones((B, L), jnp.float32)}
    optim = OptimSpec(lr=1e-2, num_warmup_steps=0)
    avg = AveragingSpec.ema(0.99)

    # Unpipelined single-device step.
    step1 = make_train_step(SPEC, make_model_apply(model), optim, avg)
    state1 = init_train_state(KEY, params, optim, avg)
    _, m1 = jax.jit(step1)(state1, batch)

    # Pipelined sharded step; pipeline_blocks sharded over 'pipe'.
    pp_apply = make_pipeline_apply(CFG, mesh, n_micro=2)
    pp_params = to_pipeline_params(params, CFG.n_blocks)
    state = init_train_state(KEY, pp_params, optim, avg)
    step = make_train_step(SPEC, pp_apply, optim, avg)
    jitted, place_state, place_batch = mesh_lib.shard_train_step(
        mesh, step, state, batch)
    sh = mesh_lib.state_shardings(mesh, state, min_size=0)
    specs = [str(s.spec) for s in jax.tree.leaves(sh)]
    assert any('pipe' in s for s in specs)
    pstate, m = jitted(place_state(state), place_batch(batch))
    np.testing.assert_allclose(float(m['loss']), float(m1['loss']),
                               rtol=1e-4)
    # One optimizer step matches too: compare a trunk leaf through the
    # layout converters.
    back = from_pipeline_params(
        jax.device_get(pstate.params), CFG.n_blocks)
    stepped1, _ = jax.jit(step1)(init_train_state(KEY, params, optim,
                                                  avg), batch)
    a = np.asarray(jax.tree.leaves(back['block_1'])[0])
    b = np.asarray(jax.tree.leaves(
        jax.device_get(stepped1.params)['block_1'])[0])
    np.testing.assert_allclose(a, b, atol=1e-4)
