"""UNet sampling-step attribution on chip: how much of the CIFAR10
D-CFG step is the (2B-batched) UNet forward vs the posterior/sampling
math? K-amortized (K jitted calls per dispatch, ~19 ms fixed axon
overhead otherwise — see DESIGN.md round-4 correction)."""
import time

import jax
import jax.numpy as jnp

from ddg_tpu.diffusion import DiffusionSpec
from ddg_tpu.models import make_model_apply
from ddg_tpu.models.unet import UNet, UNetConfig
from ddg_tpu.ops.noise_schedules import LogLinearNoise
from ddg_tpu.samplers import GuidanceSpec, SamplerSpec, diffusion_sample

B = 32
K = 8
cfg = UNetConfig(ch=128, num_res_blocks=2, num_scales=4,
                 ch_mult=(1, 2, 2, 2), image_size=32, num_classes=10,
                 dropout=0.0, compute_dtype=jnp.bfloat16)
L = cfg.image_size * cfg.image_size * cfg.input_channels
spec = DiffusionSpec(diffusion='uniform', parameterization='d3pm',
                     noise=LogLinearNoise(), vocab_size=cfg.vocab_size,
                     mask_index=-1, num_classes=cfg.num_classes)
model = UNet(cfg)
apply_fn = make_model_apply(model)
rng = jax.random.PRNGKey(0)
params = model.init(rng, jnp.zeros((1, L), jnp.int32), jnp.ones((1,)),
                    jnp.zeros((1,), jnp.int32))['params']
guidance = GuidanceSpec(method='cfg', gamma=2.0, condition=0)
cond = jnp.zeros((B,), jnp.int32)


def _sync(x):
    float(jax.device_get(jnp.sum(jax.tree.leaves(x)[0]
                                 .astype(jnp.float32))))


def timeit(fn, *a, iters=3, warmup=1):
    for _ in range(warmup):
        out = fn(*a)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        _sync(fn(*a))
    return (time.perf_counter() - t0) / iters


@jax.jit
def fwdK(params, x, sigma, c):
    acc = 0.0
    for _ in range(K):
        out = apply_fn(params, x + (acc == 1.0), sigma, c, None,
                       train=False, rng=None)
        acc = jnp.sum(out[0, 0]).astype(jnp.float32)
    return acc


x2 = jnp.zeros((2 * B, L), jnp.int32)
s2 = jnp.ones((2 * B,))
c2 = jnp.zeros((2 * B,), jnp.int32)
t_fwd = timeit(fwdK, params, x2, s2, c2) / K
print(f'2B-batched UNet fwd: {t_fwd*1e3:7.2f} ms', flush=True)

for steps in (32, 128):
    for fused in (True, False):
        sampler = SamplerSpec(steps=steps, use_cache=False, fused=fused)

        @jax.jit
        def run(params, key, sampler=sampler):
            return diffusion_sample(spec, sampler, apply_fn, params,
                                    key, batch_size=B, length=L,
                                    guidance=guidance, cond=cond)

        dt = timeit(run, params, jax.random.PRNGKey(2))
        per = dt / steps
        print(f'T={steps:>3} fused={fused}: {dt*1e3:8.1f} ms total, '
              f'{per*1e3:6.2f} ms/step '
              f'(non-fwd {max(per-t_fwd, 0)*1e3:5.2f} ms = '
              f'{100*max(per-t_fwd, 0)/per:4.1f}%)', flush=True)
