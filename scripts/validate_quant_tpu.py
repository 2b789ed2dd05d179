"""On-chip validation of the int8 dynamic-quant inference path.

int8 quantization perturbs the logits BY DESIGN (unlike the fused
kernels, which are bit-exact transforms of the same math), so the
check here is that the induced sampling-distribution shift is smaller
than the statistical noise of a realistic eval:

  TV(analytic posterior from bf16 logits,
     analytic posterior from int8 logits)  <  binomial noise floor at
                                              N=4000 draws/position

i.e. an eval that draws 4000 samples per position could not tell the
int8 sampler from the bf16 one. Also reports the raw logit
perturbation (rel L2, max |delta log-softmax|) and runs one real
Gumbel sampling pass on chip (the interpreter fakes the PRNG).

Usage: python scripts/validate_quant_tpu.py   (exits non-zero on FAIL)
"""

import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ddg_tpu.models.dit import DIT, DITConfig

B, L, V = 4, 32, 203
MASK = V - 1
N_EVAL = 4000


def _floor(q, n):
    return 0.5 * np.sqrt(2.0 * q * (1.0 - q) / (np.pi * n)).sum(-1)


def _posterior(logits, mct=0.8, mcs=0.3):
    lg = jnp.where(jnp.arange(V)[None, None] == MASK, -1e30,
                   logits.astype(jnp.float32))
    p = jax.nn.softmax(lg, axis=-1)
    q = p * (mct - mcs)
    q = q.at[..., MASK].set(mcs)
    return q / q.sum(-1, keepdims=True)


def main():
    cfg = DITConfig(hidden_size=256, cond_dim=64, length=L, n_blocks=4,
                    n_heads=4, dropout=0.0, vocab_size=V,
                    num_classes=2, compute_dtype=jnp.bfloat16,
                    logits_dtype=jnp.bfloat16)
    cfg_q = dataclasses.replace(cfg, quant_int8=True)
    rng = jax.random.PRNGKey(0)
    x = jax.random.randint(rng, (B, L), 0, V)
    sig = jnp.full((B,), 0.5)
    cond = jnp.zeros((B,), jnp.int32)
    params = DIT(cfg).init(rng, x, sig, cond)['params']
    k1, k2 = jax.random.split(rng)
    params['output_linear']['kernel'] = 0.02 * jax.random.normal(
        k1, params['output_linear']['kernel'].shape)
    params['output_linear']['bias'] = 0.05 * jax.random.normal(
        k2, params['output_linear']['bias'].shape)

    ref = jax.jit(lambda p: DIT(cfg).apply({'params': p}, x, sig,
                                           cond))(params)
    quant = jax.jit(lambda p: DIT(cfg_q).apply({'params': p}, x, sig,
                                               cond))(params)
    ref32 = np.asarray(ref, np.float32)
    q32 = np.asarray(quant, np.float32)
    rel = float(np.linalg.norm(q32 - ref32) / np.linalg.norm(ref32))
    dls = np.abs(np.asarray(jax.nn.log_softmax(ref32))
                 - np.asarray(jax.nn.log_softmax(q32))).max()
    print(f'logit rel-L2 {rel:.4f}  max |dlog-softmax| {dls:.4f}',
          flush=True)

    q_ref = np.asarray(_posterior(ref))
    q_int8 = np.asarray(_posterior(quant))
    tv = 0.5 * np.abs(q_ref - q_int8).sum(-1)
    floor = _floor(q_ref, N_EVAL)
    worst = float((tv / floor).max())
    print(f'systematic TV max {tv.max():.4f}  (eval noise floor '
          f'{floor.min():.4f}-{floor.max():.4f}, worst ratio '
          f'{worst:.2f})', flush=True)

    # One real on-chip Gumbel draw through the int8 log-probs: the
    # empirical TV vs the bf16 analytic posterior must sit at the
    # noise floor (a broken int8 path would blow past it).
    logq = jnp.log(jnp.asarray(q_int8) + 1e-20)

    @jax.jit
    def draw(key):
        g = jax.random.gumbel(key, (N_EVAL,) + logq.shape)
        return jnp.argmax(logq[None] + g, axis=-1)

    samp = np.asarray(draw(jax.random.PRNGKey(7)))     # (N, B, L)
    emp = np.zeros_like(q_ref)
    for v in range(V):
        emp[..., v] = (samp == v).mean(0)
    tv_emp = 0.5 * np.abs(emp - q_ref).sum(-1)
    ratio_emp = float((tv_emp / floor).max())
    print(f'empirical TV max {tv_emp.max():.4f} (ratio to floor '
          f'{ratio_emp:.2f}; exact multinomial draws land at '
          f'1.4-1.7x)', flush=True)

    ok = worst < 1.0 and ratio_emp < 2.0
    print('QUANT VALIDATION ' + ('PASSED' if ok else 'FAILED'),
          flush=True)
    sys.exit(0 if ok else 1)


if __name__ == '__main__':
    main()
