"""int8 dynamic-quant inference path (ddg_tpu/ops/quant.py).

The reference has no quantized path (sampling runs the autocast trunk,
/root/reference/models/dit.py:454-464); this is a TPU-native perf
feature — these tests pin (a) quant math accuracy, (b) checkpoint
compatibility (param tree identical to nn.Dense), (c) end-to-end DiT
forward fidelity with quant flipped on over bf16-trained params, and
(d) the inference-only guard.
"""

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddg_tpu.models.dit import (DIT, DITConfig, dit_head_features,
                                dit_head_matmul)
from ddg_tpu.ops.quant import (QDense, int8_dense, quantize_colwise,
                               quantize_rowwise)


def _tiny_cfg(**kw):
    base = dict(hidden_size=64, cond_dim=32, length=32, n_blocks=2,
                n_heads=4, dropout=0.1, vocab_size=29, num_classes=2,
                compute_dtype=jnp.bfloat16)
    base.update(kw)
    return DITConfig(**base)


class TestQuantMath:
    def test_roundtrip_error_rowwise(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 96))
        q, s = quantize_rowwise(x)
        err = jnp.abs(q.astype(jnp.float32) * s - x)
        # absmax symmetric: per-row error <= scale/2 = absmax/254
        bound = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 254.0
        assert bool(jnp.all(err <= bound + 1e-7))

    def test_roundtrip_error_colwise(self):
        w = jax.random.normal(jax.random.PRNGKey(1), (96, 48))
        q, s = quantize_colwise(w)
        err = jnp.abs(q.astype(jnp.float32) * s[None] - w)
        bound = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 254.0
        assert bool(jnp.all(err <= bound + 1e-7))

    def test_zero_rows_do_not_nan(self):
        x = jnp.zeros((4, 16))
        q, s = quantize_rowwise(x)
        assert bool(jnp.all(q == 0)) and bool(jnp.all(jnp.isfinite(s)))

    def test_int8_dense_close_to_exact(self):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
        x = jax.random.normal(k1, (4, 24, 128))
        w = jax.random.normal(k2, (128, 64)) * 0.05
        b = jax.random.normal(k3, (64,))
        exact = x @ w + b
        quant = int8_dense(x, w, b, out_dtype=jnp.float32)
        rel = float(jnp.linalg.norm(quant - exact)
                    / jnp.linalg.norm(exact))
        assert rel < 0.02, rel


class TestCheckpointCompat:
    def test_param_tree_identical_to_dense(self):
        """Same names, shapes AND values for the same rng — bf16
        checkpoints load into the quant model unchanged."""
        x = jnp.ones((2, 16))
        rng = jax.random.PRNGKey(3)
        for use_bias in (True, False):
            p_ref = nn.Dense(24, use_bias=use_bias).init(rng, x)
            p_q = QDense(24, use_bias=use_bias).init(rng, x)
            jax.tree.map(np.testing.assert_array_equal, p_ref, p_q)

    def test_dit_param_tree_unchanged_by_flag(self):
        cfg = _tiny_cfg()
        cfg_q = dataclasses.replace(cfg, quant_int8=True)
        rng = jax.random.PRNGKey(0)
        x = jnp.zeros((1, cfg.length), jnp.int32)
        sig = jnp.ones((1,))
        p = DIT(cfg).init(rng, x, sig)['params']
        p_q = DIT(cfg_q).init(rng, x, sig)['params']
        jax.tree.map(np.testing.assert_array_equal, p, p_q)


class TestDITQuantForward:
    def _setup(self):
        cfg = _tiny_cfg()
        rng = jax.random.PRNGKey(7)
        x = jax.random.randint(rng, (3, cfg.length), 0, cfg.vocab_size)
        sig = jnp.full((3,), 0.5)
        params = DIT(cfg).init(rng, x, sig)['params']
        # Zero-init head/adaLN would make the comparison vacuous:
        # perturb them so logits are non-trivial.
        k = jax.random.split(rng, 4)
        params['output_linear']['kernel'] = 0.02 * jax.random.normal(
            k[0], params['output_linear']['kernel'].shape)
        params['output_linear']['bias'] = 0.1 * jax.random.normal(
            k[1], params['output_linear']['bias'].shape)
        return cfg, params, x, sig

    def test_logits_close_to_bf16_path(self):
        cfg, params, x, sig = self._setup()
        ref = DIT(cfg).apply({'params': params}, x, sig)
        q = DIT(dataclasses.replace(cfg, quant_int8=True)).apply(
            {'params': params}, x, sig)
        ref32 = ref.astype(jnp.float32)
        q32 = q.astype(jnp.float32)
        rel = float(jnp.linalg.norm(q32 - ref32)
                    / (jnp.linalg.norm(ref32) + 1e-9))
        assert rel < 0.15, rel
        c = np.corrcoef(np.asarray(ref32).ravel(),
                        np.asarray(q32).ravel())[0, 1]
        assert c > 0.99, c

    def test_head_matmul_quant(self):
        cfg, params, x, sig = self._setup()
        cfg_q = dataclasses.replace(cfg, quant_int8=True)
        hidden, c = DIT(cfg).apply({'params': params}, x, sig,
                                   skip_head=True)
        feats = dit_head_features(cfg, params, hidden, c)
        exact = dit_head_matmul(cfg, params, feats)
        quant = dit_head_matmul(cfg_q, params, feats)
        rel = float(jnp.linalg.norm(
            quant.astype(jnp.float32) - exact.astype(jnp.float32))
            / (jnp.linalg.norm(exact.astype(jnp.float32)) + 1e-9))
        assert rel < 0.05, rel

    def test_train_mode_raises(self):
        cfg, params, x, sig = self._setup()
        cfg_q = dataclasses.replace(cfg, quant_int8=True)
        with pytest.raises(ValueError, match='inference-only'):
            DIT(cfg_q).apply({'params': params}, x, sig, train=True,
                             rngs={'dropout': jax.random.PRNGKey(0)})


class TestQuantSampling:
    def test_first_hitting_sampler_runs_int8(self):
        """End-to-end: the driver-headline sampler path with quant on
        produces valid tokens (no mask leftovers, finite)."""
        from ddg_tpu.diffusion import DiffusionSpec
        from ddg_tpu.models import make_model_apply
        from ddg_tpu.ops.noise_schedules import LogLinearNoise
        from ddg_tpu.samplers import (GuidanceSpec, SamplerSpec,
                                      diffusion_sample)

        cfg = dataclasses.replace(_tiny_cfg(), quant_int8=True)
        spec = DiffusionSpec(diffusion='absorbing_state',
                             parameterization='subs',
                             noise=LogLinearNoise(),
                             vocab_size=cfg.vocab_size,
                             mask_index=cfg.vocab_size - 1,
                             num_classes=2)
        model = DIT(cfg)
        rng = jax.random.PRNGKey(0)
        x = jnp.zeros((1, cfg.length), jnp.int32)
        params = model.init(rng, x, jnp.ones((1,)),
                            jnp.zeros((1,), jnp.int32))['params']
        out = diffusion_sample(
            spec, SamplerSpec(steps=8, first_hitting=True),
            make_model_apply(model), params, jax.random.PRNGKey(1),
            batch_size=2, length=cfg.length,
            guidance=GuidanceSpec(method='cfg', gamma=2.0, condition=0),
            cond=jnp.zeros((2,), jnp.int32), dit_cfg=cfg)
        assert out.shape == (2, cfg.length)
        assert bool(jnp.all(out != spec.mask_index))
        assert bool(jnp.all((out >= 0) & (out < cfg.vocab_size)))
