"""DiMamba tests: selective-scan correctness vs a naive sequential
reference, chunking invariance, bidirectionality, tying, training."""

import pytest
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ddg_tpu.models.dimamba import (DiMamba, DiMambaClassifier,
                                    DiMambaConfig, selective_scan)

KEY = jax.random.PRNGKey(0)
CFG = DiMambaConfig(hidden_size=16, cond_dim=16, length=32, n_blocks=2,
                    vocab_size=12, d_state=4, scan_chunk=8,
                    dropout=0.0, compute_dtype=jnp.float32)


def _naive_scan(u, delta, A, B, C, D, z):
    """Sequential reference of the SSM recurrence."""
    Bsz, L, d = u.shape
    N = A.shape[-1]
    h = np.zeros((Bsz, d, N))
    ys = []
    for t in range(L):
        a = np.exp(delta[:, t, :, None] * A[None])
        b = delta[:, t, :, None] * B[:, t, None, :] * u[:, t, :, None]
        h = a * h + b
        ys.append((h * C[:, t, None, :]).sum(-1) + D * u[:, t])
    y = np.stack(ys, 1)
    return y * (z / (1 + np.exp(-z)))


class TestSelectiveScan:
    def test_matches_naive(self):
        Bsz, L, d, N = 2, 19, 6, 4  # L deliberately not chunk-aligned
        rs = np.random.RandomState(0)
        u = rs.randn(Bsz, L, d).astype(np.float32)
        delta = np.abs(rs.randn(Bsz, L, d)).astype(np.float32) * 0.1
        A = -np.abs(rs.randn(d, N)).astype(np.float32)
        B = rs.randn(Bsz, L, N).astype(np.float32)
        C = rs.randn(Bsz, L, N).astype(np.float32)
        D = rs.randn(d).astype(np.float32)
        z = rs.randn(Bsz, L, d).astype(np.float32)
        got = selective_scan(jnp.asarray(u), jnp.asarray(delta),
                             jnp.asarray(A), jnp.asarray(B),
                             jnp.asarray(C), jnp.asarray(D),
                             jnp.asarray(z), chunk=8)
        want = _naive_scan(u, delta, A, B, C, D, z)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4,
                                   rtol=1e-3)

    def test_chunk_invariance(self):
        Bsz, L, d, N = 1, 24, 4, 3
        rs = np.random.RandomState(1)
        args = [rs.randn(Bsz, L, d), np.abs(rs.randn(Bsz, L, d)) * 0.1,
                -np.abs(rs.randn(d, N)), rs.randn(Bsz, L, N),
                rs.randn(Bsz, L, N), rs.randn(d), rs.randn(Bsz, L, d)]
        args = [jnp.asarray(a.astype(np.float32)) for a in args]
        outs = [selective_scan(*args, chunk=c) for c in (4, 8, 24)]
        for o in outs[1:]:
            np.testing.assert_allclose(np.asarray(outs[0]),
                                       np.asarray(o), atol=1e-4)


class TestDiMambaModel:
    def _init(self, cfg=CFG, cond=None):
        model = DiMamba(cfg)
        x = jax.random.randint(KEY, (2, cfg.length), 0, cfg.vocab_size)
        sigma = jnp.ones((2,))
        params = model.init(KEY, x, sigma, cond)['params']
        return model, params, x, sigma

    @pytest.mark.slow
    def test_forward_shapes(self):
        model, params, x, sigma = self._init()
        logits = model.apply({'params': params}, x, sigma)
        assert logits.shape == (2, CFG.length, CFG.vocab_size)
        logits2, hidden = model.apply({'params': params}, x, sigma,
                                      return_hidden_states=True)
        assert hidden.shape == (2, CFG.length, CFG.hidden_size)
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(logits2), atol=1e-5)

    @pytest.mark.slow
    def test_bidirectional_sees_future(self):
        model, params, x, sigma = self._init()
        # zero-init adaLN gates the mixer out at init; perturb params
        params = jax.tree.map(
            lambda p: p + 0.01 * jax.random.normal(KEY, p.shape), params)
        base = model.apply({'params': params}, x, sigma)
        x2 = x.at[:, -1].set((x[:, -1] + 1) % CFG.vocab_size)
        out2 = model.apply({'params': params}, x2, sigma)
        # last-token change must affect position 0 (bidirectional)
        assert float(jnp.abs(base[:, 0] - out2[:, 0]).max()) > 1e-7

    def test_unidirectional_is_causal(self):
        cfg = dataclasses.replace(CFG, bidirectional=False)
        model, params, x, sigma = self._init(cfg)
        params = jax.tree.map(
            lambda p: p + 0.01 * jax.random.normal(KEY, p.shape), params)
        base = model.apply({'params': params}, x, sigma)
        x2 = x.at[:, 20].set((x[:, 20] + 1) % cfg.vocab_size)
        out2 = model.apply({'params': params}, x2, sigma)
        np.testing.assert_allclose(np.asarray(base[:, :20]),
                                   np.asarray(out2[:, :20]), atol=1e-5)

    def test_weight_tying_param_count(self):
        tied = DiMamba(CFG)
        untied = DiMamba(dataclasses.replace(
            CFG, bidirectional_weight_tie=False))
        x = jax.random.randint(KEY, (1, CFG.length), 0, CFG.vocab_size)
        s = jnp.ones((1,))
        n = lambda m: sum(int(np.prod(p.shape)) for p in jax.tree.leaves(
            m.init(KEY, x, s)['params']))
        assert n(untied) > n(tied)

    def test_ew_multiply_strategy(self):
        cfg = dataclasses.replace(CFG,
                                  bidirectional_strategy='ew_multiply')
        model, params, x, sigma = self._init(cfg)
        out = model.apply({'params': params}, x, sigma)
        assert np.isfinite(np.asarray(out)).all()

    @pytest.mark.slow
    def test_conditioning(self):
        cfg = dataclasses.replace(CFG, num_classes=4)
        model, params, x, sigma = self._init(
            cfg, cond=jnp.zeros((2,), jnp.int32))
        out0 = model.apply({'params': params}, x, sigma,
                           jnp.zeros((2,), jnp.int32))
        out1 = model.apply({'params': params}, x, sigma,
                           jnp.ones((2,), jnp.int32))
        # zero-init adaLN means cond is invisible at init; perturb
        params = jax.tree.map(
            lambda p: p + 0.01 * jax.random.normal(KEY, p.shape), params)
        out0 = model.apply({'params': params}, x, sigma,
                           jnp.zeros((2,), jnp.int32))
        out1 = model.apply({'params': params}, x, sigma,
                           jnp.ones((2,), jnp.int32))
        assert float(jnp.abs(out0 - out1).max()) > 1e-7

    @pytest.mark.slow
    def test_trains_with_diffusion_loss(self):
        from ddg_tpu.diffusion import DiffusionSpec, loss_fn
        from ddg_tpu.models import make_model_apply
        from ddg_tpu.ops.noise_schedules import LogLinearNoise
        model, params, x, sigma = self._init()
        spec = DiffusionSpec(
            diffusion='uniform', parameterization='d3pm',
            noise=LogLinearNoise(), vocab_size=CFG.vocab_size,
            mask_index=CFG.vocab_size - 1, time_conditioning=True,
            zero_recon_loss=True)
        apply_fn = make_model_apply(model)
        mask = jnp.ones(x.shape, jnp.float32)

        def f(p):
            return loss_fn(spec, apply_fn, p, x, mask, None, KEY,
                           train=True).loss

        loss, grads = jax.value_and_grad(f)(params)
        assert np.isfinite(float(loss))
        gnorm = jax.tree.reduce(lambda a, b: a + float(jnp.abs(b).sum()),
                                grads, 0.0)
        assert np.isfinite(gnorm) and gnorm > 0


@pytest.mark.slow
def test_classifier_poolings():
    clf = DiMambaClassifier(CFG, num_classes=3, pooling='mean')
    x = jax.random.randint(KEY, (2, CFG.length), 0, CFG.vocab_size)
    sigma = jnp.ones((2,))
    params = clf.init(KEY, x, sigma)['params']
    out = clf.apply({'params': params}, x, sigma)
    assert out.shape == (2, 3)
    oh = jax.nn.one_hot(x, CFG.vocab_size)
    out_oh = clf.apply({'params': params}, oh, sigma)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_oh),
                               atol=1e-3)
