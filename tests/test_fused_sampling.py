"""CPU tests for the fused Pallas denoise-step kernels
(ddg_tpu/ops/fused_sampling.py).

The kernels accept an optional pre-drawn Gumbel tensor (the production
path generates noise on-chip with the TPU PRNG, which has no CPU
lowering — and the TPU-interpreter alternative deadlocks intermittently
in its device-barrier emulation). With external noise the kernel is a
deterministic function, so the plain Pallas interpreter can check it
EXACTLY against the unfused jnp chain (the math the reference computes
at diffusion.py:1378-1420, 1475-1480). On-chip-PRNG distribution
validation lives in scripts/validate_fused_tpu.py (real chip).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddg_tpu.ops.fused_sampling import (fused_absorbing_cfg_sample,
                                        fused_absorbing_sample)

B, L, V = 4, 32, 133          # V deliberately not 128-aligned
MASK = V - 1


def _setup(seed=0):
    k1, k2, k3, k4, k5 = jax.random.split(jax.random.PRNGKey(seed), 5)
    logits = jax.random.normal(k1, (B, L, V), jnp.float32) * 4.0
    x0 = jax.random.randint(k2, (B, L), 0, V - 1)
    masked = jax.random.uniform(k3, (B, L)) < 0.6
    xt = jnp.where(masked, MASK, x0)
    mct = jax.random.uniform(k4, (B,), minval=0.4, maxval=0.9)
    mcs = mct * 0.6
    gumbel = jax.random.gumbel(k5, (B, L, V), jnp.float32)
    return logits, xt, mct, mcs, gumbel


def _expected(log_q, gumbel, xt):
    """Gumbel-max + copy-over, the unfused chain's sampling step."""
    xs = jnp.argmax(log_q + gumbel, axis=-1).astype(jnp.int32)
    return jnp.where(xt != MASK, xt, xs)


def _subs_log_q(logits, mct, mcs):
    """Unfused reference chain: SUBS log-probs -> absorbing posterior
    (log space), without the copy-over (applied separately)."""
    lg = jnp.where(jnp.arange(V)[None, None] == MASK, -1e30, logits)
    log_p = jax.nn.log_softmax(lg, axis=-1)
    move = jnp.log(mct - mcs)[:, None, None]
    stay = jnp.log(mcs)[:, None, None]
    return jnp.where(jnp.arange(V)[None, None] == MASK,
                     stay, log_p + move)


def test_fused_absorbing_matches_unfused_chain():
    logits, xt, mct, mcs, gumbel = _setup()
    out = fused_absorbing_sample(123, xt, logits, mct, mcs,
                                 mask_index=MASK, interpret=True,
                                 gumbel=gumbel)
    expect = _expected(_subs_log_q(logits, mct, mcs), gumbel, xt)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(expect))


def test_fused_absorbing_bf16_logits():
    logits, xt, mct, mcs, gumbel = _setup(seed=1)
    lg16 = logits.astype(jnp.bfloat16)
    out = fused_absorbing_sample(5, xt, lg16, mct, mcs,
                                 mask_index=MASK, interpret=True,
                                 gumbel=gumbel)
    expect = _expected(
        _subs_log_q(lg16.astype(jnp.float32), mct, mcs), gumbel, xt)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(expect))


@pytest.mark.parametrize('gamma', [2.0, 0.5, -1.0])
def test_fused_cfg_matches_unfused_chain(gamma):
    logits, xt, mct, mcs, gumbel = _setup(seed=2)
    logits_u = jax.random.normal(jax.random.PRNGKey(9), (B, L, V)) * 4.0
    out = fused_absorbing_cfg_sample(
        77, xt, logits, logits_u, gamma, mct, mcs, mask_index=MASK,
        interpret=True, gumbel=gumbel)
    # Reference math (diffusion.py:1475-1480): interpolate log_softmax
    # probs, renormalize, then posterior. The kernel's single-LSE raw
    # mixture is mathematically identical; check against the two-pass
    # formulation to prove the identity holds.
    def logp(lg):
        lg = jnp.where(jnp.arange(V)[None, None] == MASK, -1e30, lg)
        return jax.nn.log_softmax(lg, axis=-1)

    mixed = gamma * logp(logits) + (1 - gamma) * logp(logits_u)
    log_mix = jax.nn.log_softmax(
        jnp.where(jnp.arange(V)[None, None] == MASK, -1e30, mixed),
        axis=-1)
    move = jnp.log(mct - mcs)[:, None, None]
    stay = jnp.log(mcs)[:, None, None]
    log_q = jnp.where(jnp.arange(V)[None, None] == MASK,
                      stay, log_mix + move)
    expect = _expected(log_q, gumbel, xt)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(expect))


def test_fused_copy_over_and_range():
    logits, xt, mct, mcs, gumbel = _setup(seed=3)
    out = np.asarray(fused_absorbing_sample(
        1, xt, logits, mct, mcs, mask_index=MASK, interpret=True,
        gumbel=gumbel))
    keep = np.asarray(xt) != MASK
    np.testing.assert_array_equal(out[keep], np.asarray(xt)[keep])
    assert out.min() >= 0 and out.max() < V


# ---------------------------------------------------------------------------
# Uniform-state (UDLM) kernels
# ---------------------------------------------------------------------------

def _setup_uniform(seed=0):
    k1, k2, k3, k4, k5 = jax.random.split(jax.random.PRNGKey(seed), 5)
    logits = jax.random.normal(k1, (B, L, V), jnp.float32) * 3.0
    xt = jax.random.randint(k2, (B, L), 0, V)
    a_t = jax.random.uniform(k3, (B,), minval=0.1, maxval=0.5)
    a_s = a_t + jax.random.uniform(k4, (B,), minval=0.1, maxval=0.4)
    gumbel = jax.random.gumbel(k5, (B, L, V), jnp.float32)
    return logits, xt, a_t, a_s, gumbel


def _uniform_q(logits, xt, a_t, a_s):
    from ddg_tpu.ops import forward_process as fp
    p = jax.nn.softmax(logits, axis=-1)
    return fp.uniform_posterior(p, xt, a_s[:, None, None],
                                a_t[:, None, None], vocab_size=V)


def test_fused_uniform_matches_unfused_chain():
    from ddg_tpu.ops.fused_sampling import fused_uniform_sample
    logits, xt, a_t, a_s, gumbel = _setup_uniform()
    q = _uniform_q(logits, xt, a_t, a_s)
    expected = jnp.argmax(jnp.log(q) + gumbel, axis=-1)
    got = fused_uniform_sample(0, xt, logits, a_t, a_s, vocab_size=V,
                               tile_l=8, interpret=True, gumbel=gumbel)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))


def test_fused_uniform_cfg_matches_log_posterior_interpolation():
    from ddg_tpu.ops.fused_sampling import fused_uniform_cfg_sample
    logits, xt, a_t, a_s, gumbel = _setup_uniform(1)
    logits_u = jax.random.normal(jax.random.PRNGKey(9),
                                 (B, L, V)) * 3.0
    gamma = 2.0
    # Reference: interpolate log-posteriors then renormalize
    # (diffusion.py:1481-1495); Gumbel-argmax is invariant to the
    # per-row renormalization constant.
    log_mix = (gamma * jnp.log(_uniform_q(logits, xt, a_t, a_s))
               + (1 - gamma) * jnp.log(_uniform_q(logits_u, xt, a_t,
                                                  a_s)))
    expected = jnp.argmax(log_mix + gumbel, axis=-1)
    got = fused_uniform_cfg_sample(
        0, xt, logits, logits_u, gamma, a_t, a_s, vocab_size=V,
        tile_l=8, interpret=True, gumbel=gumbel)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))


class TestHeadFused:
    """fused_absorbing_head_sample: the vocab matmul runs in-kernel
    (vocab-on-sublanes layout, online-LSE over vocab tiles, running
    Gumbel-argmax with the mask channel resolved in the final tile)."""

    def _head_setup(self, seed=0, D=24, tile_v=128):
        from ddg_tpu.ops.fused_sampling import pad_head_weights
        ks = jax.random.split(jax.random.PRNGKey(seed), 6)
        feats = jax.random.normal(ks[0], (B, L, D), jnp.float32)
        kernel = jax.random.normal(ks[1], (D, V), jnp.float32) * 0.5
        bias = jax.random.normal(ks[2], (V,), jnp.float32)
        x0 = jax.random.randint(ks[3], (B, L), 0, V - 1)
        masked = jax.random.uniform(ks[4], (B, L)) < 0.6
        xt = jnp.where(masked, MASK, x0)
        mct = jax.random.uniform(ks[5], (B,), minval=0.4, maxval=0.9)
        mcs = mct * 0.6
        w_t, bias_col = pad_head_weights(kernel, bias, tile_v=tile_v)
        return feats, kernel, bias, xt, mct, mcs, w_t, bias_col

    def test_matches_matmul_plus_unfused_chain(self):
        from ddg_tpu.ops.fused_sampling import \
            fused_absorbing_head_sample
        (feats, kernel, bias, xt, mct, mcs,
         w_t, bias_col) = self._head_setup(tile_v=128)
        Vp = w_t.shape[0]
        g_full = jax.random.gumbel(jax.random.PRNGKey(42), (B, L, V),
                                   jnp.float32)
        # kernel layout: (B, Vp, L), pad rows never win (masked NEG)
        g_t = jnp.pad(jnp.swapaxes(g_full, 1, 2),
                      ((0, 0), (0, Vp - V), (0, 0)))
        out = fused_absorbing_head_sample(
            11, xt, jnp.swapaxes(feats, 1, 2), w_t, bias_col, mct, mcs,
            vocab_size=V, mask_index=MASK, tile_v=128, tile_l=8,
            interpret=True, gumbel_t=g_t)
        logits = feats @ kernel + bias
        expect = _expected(_subs_log_q(logits, mct, mcs), g_full, xt)
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(expect))

    def test_single_vocab_tile(self):
        # Vp == tile_v: init/merge/final all in one grid step per row.
        from ddg_tpu.ops.fused_sampling import \
            fused_absorbing_head_sample
        (feats, kernel, bias, xt, mct, mcs,
         w_t, bias_col) = self._head_setup(seed=3, tile_v=256)
        Vp = w_t.shape[0]
        assert Vp == 256
        g_full = jax.random.gumbel(jax.random.PRNGKey(7), (B, L, V))
        g_t = jnp.pad(jnp.swapaxes(g_full, 1, 2),
                      ((0, 0), (0, Vp - V), (0, 0)))
        out = fused_absorbing_head_sample(
            3, xt, jnp.swapaxes(feats, 1, 2), w_t, bias_col, mct, mcs,
            vocab_size=V, mask_index=MASK, tile_v=256, tile_l=16,
            interpret=True, gumbel_t=g_t)
        logits = feats @ kernel + bias
        expect = _expected(_subs_log_q(logits, mct, mcs), g_full, xt)
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(expect))

    def test_int8_variant_matches_int8_dense_chain(self):
        """fused_absorbing_head_sample_int8 must be the exact fused
        form of int8_dense (same quantization scheme + multiply
        order) + the unfused sampling chain: token-identical under a
        shared external Gumbel field."""
        from ddg_tpu.ops.fused_sampling import (
            fused_absorbing_head_sample_int8, quantize_head_inputs,
            quantize_head_weights)
        from ddg_tpu.ops.quant import int8_dense
        (feats, kernel, bias, xt, mct, mcs,
         _, _) = self._head_setup(seed=9, tile_v=128)
        w_q, w_scale, bias_col = quantize_head_weights(kernel, bias,
                                                       tile_v=128)
        feats_q_t, x_scale = quantize_head_inputs(feats)
        assert w_q.dtype == jnp.int8 and feats_q_t.dtype == jnp.int8
        Vp = w_q.shape[0]
        g_full = jax.random.gumbel(jax.random.PRNGKey(21), (B, L, V),
                                   jnp.float32)
        g_t = jnp.pad(jnp.swapaxes(g_full, 1, 2),
                      ((0, 0), (0, Vp - V), (0, 0)))
        out = fused_absorbing_head_sample_int8(
            5, xt, feats_q_t, x_scale, w_q, w_scale, bias_col, mct,
            mcs, vocab_size=V, mask_index=MASK, tile_v=128, tile_l=8,
            interpret=True, gumbel_t=g_t)
        logits = int8_dense(feats, kernel, bias)
        expect = _expected(_subs_log_q(logits, mct, mcs), g_full, xt)
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(expect))
        # And it must stay CLOSE to the exact fp32 head (quantization
        # noise only): token agreement well above chance.
        logits_fp = feats @ kernel + bias
        exact = _expected(_subs_log_q(logits_fp, mct, mcs), g_full, xt)
        agree = float((np.asarray(out) == np.asarray(exact)).mean())
        assert agree > 0.9, f'int8 head token agreement {agree}'

    def test_sampler_head_fused_path_cpu_fallback(self):
        # On CPU _fused_ok is False: sampling.fused_head must not
        # change behavior (falls back to the jnp chain) — the flag is
        # safe to enable in configs that also run on the test mesh.
        import dataclasses
        from ddg_tpu.diffusion import DiffusionSpec
        from ddg_tpu.models import DIT, DITConfig, make_model_apply
        from ddg_tpu.ops.noise_schedules import LogLinearNoise
        from ddg_tpu.samplers import (GuidanceSpec, SamplerSpec,
                                      diffusion_sample)
        cfg = DITConfig(hidden_size=32, cond_dim=16, length=16,
                        n_blocks=1, n_heads=2, dropout=0.0,
                        vocab_size=33, num_classes=2,
                        compute_dtype=jnp.float32)
        spec = DiffusionSpec(diffusion='absorbing_state',
                             parameterization='subs',
                             noise=LogLinearNoise(), vocab_size=33,
                             mask_index=32, num_classes=2)
        model = DIT(cfg)
        key = jax.random.PRNGKey(0)
        x = jax.random.randint(key, (2, 16), 0, 33)
        params = model.init(key, x, jnp.ones((2,)),
                            jnp.zeros((2,), jnp.int32))['params']
        apply_fn = make_model_apply(model)
        g = GuidanceSpec(method='cfg', gamma=1.5, condition=0)
        outs = {}
        for fh in (False, True):
            s = SamplerSpec(steps=4, fused=True, fused_head=fh,
                            use_cache=False)
            outs[fh] = diffusion_sample(
                spec, s, apply_fn, params, key, batch_size=2,
                length=16, guidance=g,
                cond=jnp.zeros((2,), jnp.int32), dit_cfg=cfg)
        np.testing.assert_array_equal(np.asarray(outs[False]),
                                      np.asarray(outs[True]))
