"""On-chip validation of the fused Pallas denoise-step kernels.

Run on the real TPU (NOT under the CPU test env): the interpreter fakes
the PRNG, so the Gumbel-noise path is only exercised here. Checks that
the empirical decode distribution of fused_absorbing_sample /
fused_absorbing_cfg_sample matches the analytic guided posterior
(the unfused chain the reference computes at diffusion.py:1378-1420,
1475-1480) in total-variation distance.

Usage:  python scripts/validate_fused_tpu.py
Prints PASS/FAIL per check and exits non-zero on failure.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from ddg_tpu.ops.fused_sampling import (fused_absorbing_cfg_sample,
                                        fused_absorbing_sample)

B, L, V = 2, 16, 203          # not 128-aligned on purpose
MASK = V - 1
N_DRAWS = 4000


def _expected_tv(q, n):
    """E[TV(empirical_n, q)] per row: 0.5 * sum_v E|p_hat_v - q_v|
    with E|p_hat_v - q_v| ~= sqrt(2 q_v (1-q_v) / (pi n)) (normal
    approximation of the binomial). A wrong sampling distribution
    shows up as TV >> this floor; a correct one sits at ~1x."""
    return 0.5 * np.sqrt(2.0 * q * (1.0 - q) / (np.pi * n)).sum(-1)


def _analytic_q(logits, mct, mcs):
    lg = jnp.where(jnp.arange(V)[None, None] == MASK, -1e30,
                   logits.astype(jnp.float32))
    p = jax.nn.softmax(lg, axis=-1)
    move = (mct - mcs)[:, None, None]
    stay = mcs[:, None, None]
    q = p * move
    q = q.at[..., MASK].set(jnp.broadcast_to(stay[..., 0],
                                             q[..., MASK].shape))
    return q / q.sum(-1, keepdims=True)


def _tv(emp, q):
    return 0.5 * np.abs(emp - q).sum(-1)


def main():
    key = jax.random.PRNGKey(0)
    # Peaky logits so the distribution is non-trivial but concentrated
    logits = jax.random.normal(key, (B, L, V), jnp.float32) * 2.0
    xt = jnp.full((B, L), MASK, jnp.int32)  # all masked: every row decodes
    mct = jnp.full((B,), 0.8)
    mcs = jnp.full((B,), 0.3)

    ok = True

    def check(name, sample_fn, q):
        nonlocal ok
        counts = np.zeros((B, L, V), np.int64)
        flat = counts.reshape(-1, V)
        draw = jax.jit(sample_fn)
        for s in range(N_DRAWS):
            out = np.asarray(draw(jnp.asarray(s, jnp.int32)))
            flat[np.arange(B * L), out.reshape(-1)] += 1
        emp = counts / N_DRAWS
        qn = np.asarray(q, np.float64)
        tv = _tv(emp, qn)
        etv = _expected_tv(qn, N_DRAWS)
        ratio = tv / etv
        # 1.35x the sampling-noise floor (+small absolute slack):
        # comfortably above chance fluctuation across B*L rows, far
        # below any real distribution bug (which lands at 2-30x).
        passed = (ratio < 1.35 + 0.01 / etv).all()
        ok &= bool(passed)
        print(f'{name}: max TV {tv.max():.4f} (floor '
              f'{etv.mean():.4f}, max ratio {ratio.max():.2f}) '
              f'-> {"PASS" if passed else "FAIL"}')

    q_none = _analytic_q(logits, mct, mcs)
    check('absorbing none (fp32)',
          lambda s: fused_absorbing_sample(s, xt, logits, mct, mcs,
                                           mask_index=MASK), q_none)
    check('absorbing none (bf16)',
          lambda s: fused_absorbing_sample(
              s, xt, logits.astype(jnp.bfloat16), mct, mcs,
              mask_index=MASK),
          _analytic_q(logits.astype(jnp.bfloat16), mct, mcs))

    gamma = 2.0
    logits_u = jax.random.normal(jax.random.PRNGKey(1), (B, L, V)) * 2.0
    mixed = gamma * logits + (1 - gamma) * logits_u
    q_cfg = _analytic_q(mixed, mct, mcs)
    check('absorbing cfg gamma=2',
          lambda s: fused_absorbing_cfg_sample(
              s, xt, logits, logits_u, gamma, mct, mcs,
              mask_index=MASK), q_cfg)

    # Copy-over on a half-masked xt
    xt2 = xt.at[:, ::2].set(7)
    out = np.asarray(fused_absorbing_sample(3, xt2, logits, mct, mcs,
                                            mask_index=MASK))
    co = (out[:, ::2] == 7).all()
    ok &= bool(co)
    print(f'copy-over: {"PASS" if co else "FAIL"}')

    # Uniform-state (UDLM) kernels vs the analytic posterior
    from ddg_tpu.ops import forward_process as fp
    from ddg_tpu.ops.fused_sampling import (fused_uniform_cfg_sample,
                                            fused_uniform_sample)
    xt_u = jax.random.randint(jax.random.PRNGKey(5), (B, L), 0, V)
    a_t = jnp.full((B,), 0.3)
    a_s = jnp.full((B,), 0.6)

    def uq(lg):
        p = jax.nn.softmax(lg.astype(jnp.float32), axis=-1)
        q = fp.uniform_posterior(p, xt_u, a_s[:, None, None],
                                 a_t[:, None, None], vocab_size=V)
        return q / q.sum(-1, keepdims=True)

    check('uniform none (fp32)',
          lambda s: fused_uniform_sample(s, xt_u, logits, a_t, a_s,
                                         vocab_size=V), uq(logits))
    log_mix = (gamma * jnp.log(uq(logits))
               + (1 - gamma) * jnp.log(uq(logits_u)))
    q_ucfg = jax.nn.softmax(log_mix, axis=-1)
    check('uniform cfg gamma=2',
          lambda s: fused_uniform_cfg_sample(
              s, xt_u, logits, logits_u, gamma, a_t, a_s,
              vocab_size=V), q_ucfg)

    # Head-fused kernel (vocab matmul in-kernel): same analytic target
    # as 'absorbing none', with logits produced by feats @ W + bias.
    from ddg_tpu.ops.fused_sampling import (fused_absorbing_head_sample,
                                            pad_head_weights)
    D = 32
    feats = jax.random.normal(jax.random.PRNGKey(11), (B, L, D),
                              jnp.float32)
    Wk = jax.random.normal(jax.random.PRNGKey(12), (D, V)) * 0.4
    bias = jax.random.normal(jax.random.PRNGKey(13), (V,)) * 0.2
    w_t, bias_col = pad_head_weights(Wk, bias, tile_v=128)
    feats_t = jnp.swapaxes(feats, 1, 2)
    q_head = _analytic_q(feats @ Wk + bias, mct, mcs)
    check('absorbing head-fused (fp32)',
          lambda s: fused_absorbing_head_sample(
              s, xt, feats_t, w_t, bias_col, mct, mcs, vocab_size=V,
              mask_index=MASK, tile_v=128), q_head)

    # int8 head-fused kernel (round 5): s8 matmul in-kernel; the
    # analytic target uses the SAME quantized logits (int8_dense), so
    # a pass isolates the kernel's sampling path — the int8-vs-fp32
    # distribution shift itself is validated by validate_quant_tpu.py.
    from ddg_tpu.ops.fused_sampling import (
        fused_absorbing_head_sample_int8, quantize_head_inputs,
        quantize_head_weights)
    from ddg_tpu.ops.quant import int8_dense
    w_q, w_scale, bias_q = quantize_head_weights(Wk, bias, tile_v=128)
    feats_q_t, x_scale = quantize_head_inputs(feats)
    q_head_q = _analytic_q(int8_dense(feats, Wk, bias), mct, mcs)
    check('absorbing head-fused (int8)',
          lambda s: fused_absorbing_head_sample_int8(
              s, xt, feats_q_t, x_scale, w_q, w_scale, bias_q, mct,
              mcs, vocab_size=V, mask_index=MASK, tile_v=128),
          q_head_q)

    print('ALL PASS' if ok else 'FAILURES')
    sys.exit(0 if ok else 1)


if __name__ == '__main__':
    main()
