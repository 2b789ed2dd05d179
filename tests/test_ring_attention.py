"""Ring attention (ops/ring_attention.py): value + gradient parity
with jax.nn.dot_product_attention on the 8-device CPU mesh, and the
tp_mode='ring' train-step path end-to-end."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ddg_tpu.ops.ring_attention import ring_attention
from ddg_tpu.parallel import mesh as mesh_lib

KEY = jax.random.PRNGKey(0)


def _qkv(B=4, L=16, H=2, Dh=8):
    ks = jax.random.split(KEY, 3)
    q = jax.random.normal(ks[0], (B, L, H, Dh), jnp.float32)
    k = jax.random.normal(ks[1], (B, L, H, Dh), jnp.float32)
    v = jax.random.normal(ks[2], (B, L, H, Dh), jnp.float32)
    return q, k, v


def test_ring_matches_dot_product_attention():
    mesh = mesh_lib.make_mesh(num_data=2, num_fsdp=1, num_tensor=4)
    q, k, v = _qkv()
    ref = jax.nn.dot_product_attention(q, k, v)
    with jax.set_mesh(mesh):
        out = jax.jit(lambda q, k, v: ring_attention(
            q, k, v, axis='tensor'))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=2e-6)


def test_ring_gradients_match():
    mesh = mesh_lib.make_mesh(num_data=1, num_fsdp=1, num_tensor=8)
    q, k, v = _qkv(B=2, L=32)
    cot = jax.random.normal(jax.random.PRNGKey(7), q.shape)

    def loss_ref(q, k, v):
        return (jax.nn.dot_product_attention(q, k, v) * cot).sum()

    def loss_ring(q, k, v):
        return (ring_attention(q, k, v, axis='tensor') * cot).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    with jax.set_mesh(mesh):
        g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(
            q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6, rtol=5e-6)


def test_ring_train_step_parity_8dev():
    from ddg_tpu.diffusion import DiffusionSpec
    from ddg_tpu.models import DIT, DITConfig, make_model_apply
    from ddg_tpu.ops.noise_schedules import LogLinearNoise
    from ddg_tpu.runtime.averaging import AveragingSpec
    from ddg_tpu.runtime.optim import OptimSpec
    from ddg_tpu.runtime.train_state import (init_train_state,
                                             make_train_step)

    V, MASK, B, L = 11, 10, 8, 16
    cfg = DITConfig(hidden_size=32, cond_dim=16, length=L, n_blocks=2,
                    n_heads=2, dropout=0.0, vocab_size=V,
                    compute_dtype=jnp.float32, tensor_axis='tensor',
                    tp_mode='ring')
    spec = DiffusionSpec(diffusion='absorbing_state',
                         parameterization='subs',
                         noise=LogLinearNoise(), vocab_size=V,
                         mask_index=MASK)
    mesh = mesh_lib.make_mesh(num_data=2, num_fsdp=1, num_tensor=4)
    model = DIT(cfg)
    x = jax.random.randint(KEY, (B, L), 0, V)
    params = model.init(KEY, x, jnp.ones((B,)))['params']
    apply_fn = make_model_apply(model)
    optim = OptimSpec(lr=1e-2, num_warmup_steps=0)
    avg = AveragingSpec.ema(0.99)
    state = init_train_state(KEY, params, optim, avg)
    step = make_train_step(spec, apply_fn, optim, avg)
    batch = {'input_ids': x,
             'attention_mask': jnp.ones((B, L), jnp.float32)}
    jitted, place_state, place_batch = mesh_lib.shard_train_step(
        mesh, step, state, batch, tensor_rules=False)
    _, m = jitted(place_state(state), place_batch(batch))
    # Single-device reference: same model config falls back to XLA
    # attention outside a mesh context (ring needs the ambient mesh).
    state1 = init_train_state(KEY, params, optim, avg)
    _, m1 = jax.jit(step)(state1, batch)
    np.testing.assert_allclose(float(m['loss']), float(m1['loss']),
                               rtol=1e-4)
