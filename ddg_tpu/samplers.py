"""Sampling loops: diffusion (DDPM-style ancestral) and AR, with guided
decoding — D-CFG, D-CBG (exact + first-order), FUDGE, NOS.

TPU-first re-design of the reference sampling stack
(/root/reference/diffusion.py:1040-1755):
  * the T-step reverse loop is a single `lax.scan` — tokens stay
    HBM-resident across all steps, one compiled program, no host sync;
  * guidance dispatch is *static* (Python branch at trace time), so each
    guidance method compiles to its own fused program;
  * D-CFG runs cond + uncond in ONE batched forward (concat on the batch
    axis) instead of the reference's two sequential calls —
    doubles MXU occupancy at small batch;
  * the MDLM NFE cache (reference diffusion.py:1371-1374) becomes a
    `lax.cond` carrying the cached denoiser output: only valid for
    absorbing-state diffusion where decoded tokens are frozen;
  * CBG-exact enumerates all B*L*V single-token edits in fixed-size
    chunks under `lax.map` (static shapes, bounded memory);
  * NOS runs its Adagrad inner loop as `lax.fori_loop` with `jax.grad`
    through the classifier and the denoiser head.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Mapping
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ddg_tpu.diffusion import DiffusionSpec, log_x_theta, process_sigma
from ddg_tpu.ops import forward_process as fp
from ddg_tpu.ops import sampling as S
from ddg_tpu.ops.fused_sampling import (fused_absorbing_cfg_sample,
                                        fused_absorbing_sample,
                                        fused_uniform_cfg_sample,
                                        fused_uniform_sample)


def _raw_logits(spec, model_apply, params, xt, sigma, cond=None):
    """Denoiser forward WITHOUT the parameterization transform — the
    fused kernel consumes raw logits directly, in bf16: the (B, L, V)
    tensor is the dominant HBM term of a sampling step (~0.5 GB at the
    LM1B scale), so it is stored/carried at half width and upcast
    inside the kernel's VMEM (fp32 math on-chip)."""
    return model_apply(params, xt, process_sigma(spec, sigma), cond,
                       None, train=False, rng=None).astype(jnp.bfloat16)


def _fused_ok(spec, sampler, guidance):
    # The fused kernels are Mosaic/TPU programs; fall back to the jnp
    # chain on other backends (e.g. the CPU test mesh).
    return (sampler.fused
            and jax.default_backend() == 'tpu'
            and ((spec.diffusion == 'absorbing_state'
                  and spec.parameterization == 'subs')
                 or (spec.diffusion == 'uniform'
                     and spec.parameterization == 'd3pm'
                     # subs_masking adds -inf at mask_index in the
                     # unfused log_x_theta; the fused uniform kernel
                     # softmaxes over the full vocab and would leak
                     # probability mass onto the mask token.
                     and not spec.subs_masking))
            and not sampler.low_confidence_sampling
            and not sampler.argmax_sampling
            and not sampler.use_float64)


@dataclasses.dataclass(frozen=True)
class SamplerSpec:
    """Static sampling settings (configs/config.yaml `sampling` +
    `eval` groups)."""
    steps: int = 128
    eps: float = 1e-5
    use_cache: bool = True
    use_float64: bool = False
    low_confidence_sampling: bool = False
    low_confidence_threshold: float = 0.3
    argmax_sampling: bool = False
    # Fuse SUBS + posterior + Gumbel-argmax + copy-over into one Pallas
    # kernel (absorbing-state none/cfg paths only; see
    # ops/fused_sampling.py). Distribution-equivalent to the unfused
    # chain; ~1 HBM pass over (B, L, V) instead of ~6.
    fused: bool = False
    # First-hitting sampler (absorbing state only): the exact T->infty
    # limit of the reverse process — iid U(0,1) decode times, one
    # denoiser forward per decode event => L forwards total instead of
    # ~T NFEs. The reference's NFE cache (diffusion.py:1371-1374)
    # approximates this; here it is exact and static-shaped.
    first_hitting: bool = False
    # Fold the vocab projection INTO the fused sampling kernel
    # (ops/fused_sampling.fused_absorbing_head_sample): the (B, L, V)
    # logits tensor never exists in HBM. Absorbing-state none/CFG
    # ancestral paths with a DiT backbone (needs dit_cfg). Requires
    # fused=True.
    fused_head: bool = False
    # AR KV-cache decode: split the position scan into this many
    # contiguous buckets; bucket j's attention reads only the first
    # ~j/n of the cache (static slice). Token-identical to 1 (masked
    # rows carry exactly zero softmax weight) but cuts average
    # cache-read traffic from L to ~0.6L rows/step at 4 buckets —
    # the reference's full-prefix recompute has no analogue
    # (diffusion.py:1132-1133). DiT decode only; >1 compiles one scan
    # body per bucket.
    ar_buckets: int = 4
    # Opt-in int8 KV cache for AR decode (DiT only): k/v rows stored
    # int8 with per-(block,b,pos,head) scales; the scales multiply
    # outside the MXU contractions so the dots read int8 (half the
    # HBM bytes of bf16 — cache reads dominate the batched decode
    # step). Changes sampling numerics at the quantization level
    # (~0.4% logit noise); NOT token-identical to the bf16 cache.
    ar_kv_int8: bool = False


@dataclasses.dataclass(frozen=True)
class GuidanceSpec:
    """Static guidance settings (configs/guidance/*.yaml)."""
    method: str                      # cfg | cbg | nos | fudge | pplm
    gamma: float = 1.0
    condition: int = 0
    use_approx: bool = False         # cbg first-order approximation
    topk: int = 50                   # fudge
    num_nos_steps: int = 1
    nos_step_size: float = 0.1
    nos_stability_coef: float = 0.01
    cbg_chunk: int = 256             # edits per classifier chunk (exact cbg)
    # AR PPLM (configs/guidance/pplm.yaml). The reference declares the
    # config surface but stubs the sampler (diffusion.py:1269-1279);
    # here it is implemented (beyond reference): Adagrad ascent on a
    # trunk hidden-state delta at each decode step — the NOS recipe
    # (diffusion.py:1626-1736) applied to AR decoding, with the
    # stability term as a KL leash on the next-token distribution.
    num_pplm_steps: int = 1
    pplm_step_size: float = 0.1
    pplm_stability_coef: float = 0.01


def _sample_dtype(sampler: SamplerSpec):
    return jnp.float64 if sampler.use_float64 else jnp.float32


def _posterior_probs(spec: DiffusionSpec, x_theta, xt, mct, mcs):
    """Unguided reverse posterior as probabilities
    (diffusion.py:1398-1407)."""
    if spec.diffusion == 'absorbing_state':
        return fp.absorbing_posterior(x_theta, mct, mcs,
                                      mask_index=spec.mask_index)
    if spec.diffusion == 'uniform':
        return fp.uniform_posterior(x_theta, xt, 1 - mcs, 1 - mct,
                                    vocab_size=spec.vocab_size)
    raise NotImplementedError(
        f'Diffusion type {spec.diffusion} not implemented.')


def _sample_and_copy(spec: DiffusionSpec, sampler: SamplerSpec, key,
                     q_xs, xt):
    xs = S.sample_categorical(
        key, q_xs,
        low_confidence_sampling=sampler.low_confidence_sampling,
        low_confidence_threshold=sampler.low_confidence_threshold,
        argmax_sampling=sampler.argmax_sampling)
    if spec.diffusion == 'absorbing_state':
        xs = fp.apply_copy_flag_tokens(xs, xt, mask_index=spec.mask_index)
    return xs


def _cached(compute, cache, cache_valid):
    """NFE-cache combinator: reuse `cache` while the last step changed
    nothing (reference diffusion.py:1371-1374), else recompute.
    Returns (value, new_cache). cache_valid=None disables caching at
    trace time: no lax.cond is emitted and the zero-size dummy cache
    passes through — otherwise a full (B, L, V) logits tensor rides
    the scan carry for nothing (the cache ~never fires at batch
    sizes >= 32: P(no decode event in a step) ~ exp(-B*L/T))."""
    if cache_valid is None:
        return compute(None), cache
    val = jax.lax.cond(cache_valid, lambda c: c, compute, cache)
    return val, val


# ---------------------------------------------------------------------------
# Denoise-step variants. Each returns (xs, cache_pytree).
# ---------------------------------------------------------------------------

def _head_fused_sample(spec, dit_cfg, params, seed, xt, feats, mct,
                       mcs):
    """Head-fused denoise step: the vocab projection runs INSIDE the
    sampling kernel (ops/fused_sampling.fused_absorbing_head_sample),
    so the (B, L, V) logits never exist in HBM. The transpose/pad prep
    of the head weights is loop-invariant and hoisted out of the
    sampling lax.scan by XLA."""
    from ddg_tpu.ops.fused_sampling import (
        fused_absorbing_head_sample, fused_absorbing_head_sample_int8,
        pad_head_weights, quantize_head_inputs, quantize_head_weights)
    if getattr(dit_cfg, 'quant_int8', False):
        # int8-aware fused head (round-5): the s8 head matmul runs
        # INSIDE the sampling kernel — same quantization scheme as the
        # unfused int8 head (ops/quant.int8_dense), so this composes
        # with the int8 trunk instead of displacing it (the bf16 fused
        # head measured -24% under int8, DESIGN.md round-4 sweep).
        w_q, w_scale, bias_col = quantize_head_weights(
            params['output_linear']['kernel'],
            params['output_linear']['bias'])
        feats_q_t, x_scale = quantize_head_inputs(feats)
        return fused_absorbing_head_sample_int8(
            seed, xt, feats_q_t, x_scale, w_q, w_scale, bias_col,
            mct[:, 0, 0], mcs[:, 0, 0], vocab_size=spec.vocab_size,
            mask_index=spec.mask_index)
    dt = dit_cfg.logits_dtype
    w_t, bias_col = pad_head_weights(
        params['output_linear']['kernel'].astype(dt),
        params['output_linear']['bias'])
    feats_t = jnp.swapaxes(feats, 1, 2).astype(dt)  # (B, D, L)
    return fused_absorbing_head_sample(
        seed, xt, feats_t, w_t, bias_col, mct[:, 0, 0], mcs[:, 0, 0],
        vocab_size=spec.vocab_size, mask_index=spec.mask_index)


def _ddpm_step(spec, sampler, model_apply, params, key, xt, sigma_t,
               mct, mcs, cache, cache_valid, dit_cfg=None):
    if (_fused_ok(spec, sampler, None) and sampler.fused_head
            and spec.diffusion == 'absorbing_state'
            and dit_cfg is not None and cache_valid is None):
        from ddg_tpu.models.dit import dit_head_features
        hidden, cvec = model_apply(
            params, xt, process_sigma(spec, sigma_t), None, None,
            train=False, rng=None, skip_head=True)
        feats = dit_head_features(dit_cfg, params, hidden, cvec)
        seed = jax.random.randint(key, (), 0, jnp.iinfo(jnp.int32).max)
        xs = _head_fused_sample(spec, dit_cfg, params, seed, xt, feats,
                                mct, mcs)
        return xs, cache
    if _fused_ok(spec, sampler, None):
        def compute(_):
            return _raw_logits(spec, model_apply, params, xt, sigma_t)

        logits, new_cache = _cached(compute, cache, cache_valid)
        seed = jax.random.randint(key, (), 0, jnp.iinfo(jnp.int32).max)
        if spec.diffusion == 'uniform':
            xs = fused_uniform_sample(
                seed, xt, logits, 1.0 - mct[:, 0, 0],
                1.0 - mcs[:, 0, 0], vocab_size=spec.vocab_size)
        else:
            xs = fused_absorbing_sample(
                seed, xt, logits, mct[:, 0, 0], mcs[:, 0, 0],
                mask_index=spec.mask_index)
        return xs, new_cache

    def compute(_):
        out = log_x_theta(spec, model_apply, params, xt, sigma_t)
        return out.astype(_sample_dtype(sampler))

    log_xt, new_cache = _cached(compute, cache, cache_valid)
    x_theta = jnp.exp(log_xt)
    q_xs = _posterior_probs(spec, x_theta, xt, mct, mcs)
    xs = _sample_and_copy(spec, sampler, key, q_xs, xt)
    return xs, new_cache


def _cfg_step(spec, sampler, guidance, model_apply, params, key, xt,
              sigma_t, mct, mcs, cond, cache, cache_valid,
              dit_cfg=None):
    """D-CFG (diffusion.py:1422-1509). gamma in {0,1} fast-paths to a
    single forward; otherwise one batched cond+uncond forward."""
    gamma = guidance.gamma
    dt = _sample_dtype(sampler)
    null_cond = jnp.full_like(cond, spec.num_classes)

    if (_fused_ok(spec, sampler, guidance) and gamma not in (0.0, 1.0)
            and spec.diffusion == 'absorbing_state'
            and dit_cfg is not None and cache_valid is None):
        # Feature-mix fast path: the output head is linear in its
        # (normed + modulated) features, so
        #   gamma*logits_c + (1-gamma)*logits_u
        #     == (gamma*feat_c + (1-gamma)*feat_u) @ W + bias.
        # Mixing the (2B, L, D) features instead of the (2B, L, V)
        # logits halves the vocab matmul AND halves the logits HBM
        # round-trip (V/D ~ 40x at the LM1B scale). Same distribution
        # as the logit-mix path (reference diffusion.py:1475-1480).
        from ddg_tpu.models.dit import (dit_head_features,
                                        dit_head_matmul)

        x2 = jnp.concatenate([xt, xt], axis=0)
        s2 = jnp.concatenate([sigma_t, sigma_t], axis=0)
        c2 = jnp.concatenate([cond, null_cond], axis=0)
        hidden2, cvec2 = model_apply(
            params, x2, process_sigma(spec, s2), c2, None,
            train=False, rng=None, skip_head=True)
        feats2 = dit_head_features(dit_cfg, params, hidden2, cvec2)
        B = xt.shape[0]
        fmix = (gamma * feats2[:B].astype(jnp.float32)
                + (1 - gamma) * feats2[B:].astype(jnp.float32))
        seed = jax.random.randint(key, (), 0, jnp.iinfo(jnp.int32).max)
        if sampler.fused_head:
            xs = _head_fused_sample(spec, dit_cfg, params, seed, xt,
                                    fmix.astype(feats2.dtype), mct,
                                    mcs)
            return xs, cache
        logits_mix = dit_head_matmul(
            dit_cfg, params, fmix.astype(feats2.dtype)
        ).astype(jnp.bfloat16)
        xs = fused_absorbing_sample(
            seed, xt, logits_mix, mct[:, 0, 0], mcs[:, 0, 0],
            mask_index=spec.mask_index)
        return xs, cache

    if _fused_ok(spec, sampler, guidance) and gamma not in (0.0, 1.0):
        def compute(_):
            x2 = jnp.concatenate([xt, xt], axis=0)
            s2 = jnp.concatenate([sigma_t, sigma_t], axis=0)
            c2 = jnp.concatenate([cond, null_cond], axis=0)
            return _raw_logits(spec, model_apply, params, x2, s2, c2)

        logits2, new_cache = _cached(compute, cache, cache_valid)
        B = xt.shape[0]
        seed = jax.random.randint(key, (), 0, jnp.iinfo(jnp.int32).max)
        if spec.diffusion == 'uniform':
            # log-posterior interpolation in-kernel
            # (diffusion.py:1481-1495)
            xs = fused_uniform_cfg_sample(
                seed, xt, logits2[:B], logits2[B:], gamma,
                1.0 - mct[:, 0, 0], 1.0 - mcs[:, 0, 0],
                vocab_size=spec.vocab_size)
        else:
            xs = fused_absorbing_cfg_sample(
                seed, xt, logits2[:B], logits2[B:], gamma,
                mct[:, 0, 0], mcs[:, 0, 0], mask_index=spec.mask_index)
        return xs, new_cache

    if gamma == 0.0 or gamma == 1.0:
        use_cond = cond if gamma == 1.0 else null_cond

        def compute(_):
            out = log_x_theta(spec, model_apply, params, xt, sigma_t,
                              cond=use_cond)
            return out.astype(dt)

        log_xt, new_cache = _cached(compute, cache, cache_valid)
        x_theta = jnp.exp(log_xt)
        q_xs = _posterior_probs(spec, x_theta, xt, mct, mcs)
        xs = _sample_and_copy(spec, sampler, key, q_xs, xt)
        return xs, new_cache

    def compute(_):
        # Single forward at 2B: [cond; uncond] on the batch axis.
        x2 = jnp.concatenate([xt, xt], axis=0)
        s2 = jnp.concatenate([sigma_t, sigma_t], axis=0)
        c2 = jnp.concatenate([cond, null_cond], axis=0)
        out = log_x_theta(spec, model_apply, params, x2, s2, cond=c2)
        return out.astype(dt)

    log_both, new_cache = _cached(compute, cache, cache_valid)
    B = xt.shape[0]
    log_cond, log_uncond = log_both[:B], log_both[B:]

    if spec.diffusion == 'absorbing_state':
        # Interpolate in x_theta logit space then posterior
        # (diffusion.py:1475-1480).
        log_mix = gamma * log_cond + (1 - gamma) * log_uncond
        x_theta = jax.nn.softmax(log_mix, axis=-1)
        q_xs = _posterior_probs(spec, x_theta, xt, mct, mcs)
    else:
        # Uniform: interpolate log-posteriors then softmax
        # (diffusion.py:1481-1495).
        log_q_c = jnp.log(_posterior_probs(
            spec, jnp.exp(log_cond), xt, mct, mcs))
        log_q_u = jnp.log(_posterior_probs(
            spec, jnp.exp(log_uncond), xt, mct, mcs))
        q_xs = jax.nn.softmax(gamma * log_q_c + (1 - gamma) * log_q_u,
                              axis=-1)
    xs = _sample_and_copy(spec, sampler, key, q_xs, xt)
    return xs, new_cache


def _posterior_log(spec, log_xt, xt, mct, mcs):
    """Unguided posterior in log space (diffusion.py:1588-1599)."""
    if spec.diffusion == 'absorbing_state':
        return fp.absorbing_posterior_log(log_xt, mct, mcs,
                                          mask_index=spec.mask_index)
    return jnp.log(fp.uniform_posterior(
        jnp.exp(log_xt), xt, 1 - mcs, 1 - mct,
        vocab_size=spec.vocab_size))


def classifier_log_probs_edits(classifier_apply, classifier_params, xt,
                               sigma, conditioning_class, *, vocab_size,
                               chunk: int = 256):
    """log p(class | edit) for every single-token edit of xt.

    CBG-exact (diffusion.py:1550-1585): for each (position l, token v)
    build xt with xt[l] := v and score it. Runs in fixed-size chunks of
    edits via `lax.map` so memory is bounded and shapes are static.
    Returns (B, L, V).
    """
    B, L = xt.shape
    total = L * vocab_size
    pad = (-total) % chunk
    edit_ids = jnp.arange(total + pad)  # padded to a multiple of chunk
    edit_chunks = edit_ids.reshape(-1, chunk)

    def score_chunk(ids):
        pos = jnp.clip(ids // vocab_size, 0, L - 1)        # (C,)
        tok = ids % vocab_size                              # (C,)
        pos_oh = jax.nn.one_hot(pos, L, dtype=xt.dtype)     # (C, L)
        edited = (xt[:, None, :] * (1 - pos_oh)[None]
                  + tok[None, :, None] * pos_oh[None])      # (B, C, L)
        flat = edited.reshape(B * chunk, L)
        sig = jnp.repeat(sigma, chunk, total_repeat_length=B * chunk)
        logits = classifier_apply(classifier_params, flat, sig)
        log_p = jax.nn.log_softmax(logits, axis=-1)[..., conditioning_class]
        return log_p.reshape(B, chunk)

    scores = jax.lax.map(score_chunk, edit_chunks)          # (N, B, C)
    scores = jnp.moveaxis(scores, 0, 1).reshape(B, total + pad)
    return scores[:, :total].reshape(B, L, vocab_size)


def _cbg_step(spec, sampler, guidance, model_apply, params,
              classifier_apply, classifier_params, key, xt, sigma_t,
              mct, mcs, cache, cache_valid):
    """D-CBG (diffusion.py:1511-1624): guided posterior
    softmax(gamma * classifier_log_prob + log q_xs)."""
    dt = _sample_dtype(sampler)

    def compute(_):
        log_xt = log_x_theta(spec, model_apply, params, xt,
                             sigma_t).astype(dt)
        if guidance.use_approx:
            # First-order Taylor around the one-hot of xt
            # (diffusion.py:1532-1548).
            xt_oh = jax.nn.one_hot(xt, spec.vocab_size, dtype=jnp.float32)

            def clf_sum(one_hots):
                logits = classifier_apply(classifier_params, one_hots,
                                          sigma_t)
                return (jax.nn.log_softmax(logits, axis=-1)
                        [..., guidance.condition].sum(),
                        jax.nn.log_softmax(logits, axis=-1))

            grad, log_probs_xt = jax.grad(clf_sum, has_aux=True)(xt_oh)
            ratio = grad - (xt_oh * grad).sum(-1, keepdims=True)
            clf = (ratio + log_probs_xt[..., guidance.condition]
                   [..., None, None]).astype(dt)
        else:
            clf = classifier_log_probs_edits(
                classifier_apply, classifier_params, xt, sigma_t,
                guidance.condition, vocab_size=spec.vocab_size,
                chunk=guidance.cbg_chunk).astype(dt)
        return log_xt, clf

    (log_xt, clf), new_cache = _cached(compute, cache, cache_valid)
    diffusion_log_probs = _posterior_log(spec, log_xt, xt, mct, mcs)
    guided = guidance.gamma * clf + diffusion_log_probs
    if spec.diffusion == 'absorbing_state':
        guided = fp.apply_copy_flag_log(guided, xt,
                                        mask_index=spec.mask_index)
    guided_probs = jax.nn.softmax(guided, axis=-1)
    xs = _sample_and_copy(spec, sampler, key, guided_probs, xt)
    return xs, new_cache


def _nos_step(spec, sampler, guidance, model_apply, params,
              classifier_apply, classifier_params, key, xt, sigma_t,
              mct, mcs):
    """NOS (diffusion.py:1626-1736): optimize a hidden-state delta with
    Adagrad to raise the classifier logit while staying KL-close to the
    original reverse posterior."""
    sigma_in = process_sigma(spec, sigma_t)
    logits, hidden = model_apply(params, xt, sigma_in, None, None,
                                 train=False, rng=None,
                                 return_hidden_states=True)

    def to_log_probs(raw_logits):
        raw_logits = raw_logits.astype(jnp.float32)
        if spec.parameterization == 'subs':
            return fp.subs_parameterization(raw_logits, xt,
                                            mask_index=spec.mask_index)
        if spec.subs_masking:
            mask_oh = jax.nn.one_hot(jnp.asarray(spec.mask_index),
                                     spec.vocab_size)
            raw_logits = raw_logits + mask_oh * fp.NEG_INFINITY
        return jax.nn.log_softmax(raw_logits, axis=-1)

    def guided_log_posterior(raw_logits):
        log_probs = to_log_probs(raw_logits)
        out = _posterior_log(spec, log_probs, xt, mct, mcs)
        if spec.diffusion == 'absorbing_state':
            out = fp.apply_copy_flag_log(out, xt,
                                         mask_index=spec.mask_index)
        return out

    diffusion_log_probs = guided_log_posterior(logits)

    def nos_loss(delta):
        h = hidden + delta
        clf_logits = classifier_apply(classifier_params, xt, sigma_in,
                                      x_emb=h)
        target = jax.nn.log_softmax(clf_logits, axis=-1)[
            ..., guidance.condition].sum()
        new_logits = model_apply(params, xt, sigma_in, None, h,
                                 train=False, rng=None)
        adjusted = guided_log_posterior(new_logits)
        # KLDivLoss(log_target=True, reduction='batchmean')
        kl = (jnp.exp(diffusion_log_probs)
              * (diffusion_log_probs - adjusted)).sum() / xt.shape[0]
        return -target + guidance.nos_stability_coef * kl

    grad_fn = jax.grad(nos_loss)

    def adagrad_body(_, state):
        delta, acc = state
        g = grad_fn(delta)
        acc = acc + g * g
        delta = delta - guidance.nos_step_size * g / (
            jnp.sqrt(acc) + 1e-10)
        return delta, acc

    delta0 = jnp.zeros_like(hidden)
    delta, _ = jax.lax.fori_loop(0, guidance.num_nos_steps, adagrad_body,
                                 (delta0, jnp.zeros_like(hidden)))

    guided_logits = model_apply(params, xt, sigma_in, None,
                                hidden + delta, train=False, rng=None)
    if spec.diffusion == 'absorbing_state':
        guided_probs = jnp.exp(guided_log_posterior(guided_logits))
    else:
        guided_probs = fp.uniform_posterior(
            jnp.exp(to_log_probs(guided_logits)), xt, 1 - mcs, 1 - mct,
            vocab_size=spec.vocab_size)
    xs = _sample_and_copy(spec, sampler, key, guided_probs, xt)
    return xs, None


# ---------------------------------------------------------------------------
# Main loops
# ---------------------------------------------------------------------------

def _init_cache(spec, sampler, guidance, batch_size, length, *,
                classifier=False, fused=False, enabled=True):
    # The fused path caches *raw* bf16 logits (see _raw_logits); the
    # unfused path caches fp32/fp64 log-probs. Caching disabled =>
    # zero-size dummy so nothing rides the scan carry (see _cached).
    if not enabled:
        return jnp.zeros((0,), jnp.float32)
    dt = jnp.bfloat16 if fused else _sample_dtype(sampler)
    shape = (batch_size, length, spec.vocab_size)
    if guidance is not None and guidance.method == 'cfg' \
            and guidance.gamma not in (0.0, 1.0):
        shape = (2 * batch_size, length, spec.vocab_size)
    log_xt = jnp.zeros(shape, dtype=dt)
    if classifier:
        return (log_xt, jnp.zeros((batch_size, length, spec.vocab_size),
                                  dtype=dt))
    return log_xt


def diffusion_sample(spec: DiffusionSpec, sampler: SamplerSpec,
                     model_apply, params, key, *, batch_size: int,
                     length: int,
                     guidance: Optional[GuidanceSpec] = None,
                     cond: Optional[jax.Array] = None,
                     classifier_apply=None, classifier_params=None,
                     dit_cfg=None) -> jax.Array:
    """Ancestral reverse-diffusion sampling, one `lax.scan` over steps
    (reference `_diffusion_sample`, diffusion.py:1281-1376)."""
    if (sampler.first_hitting and spec.diffusion == 'absorbing_state'
            and (guidance is None or guidance.method == 'cfg')):
        return first_hitting_sample(
            spec, sampler, model_apply, params, key,
            batch_size=batch_size, length=length, guidance=guidance,
            cond=cond, dit_cfg=dit_cfg)
    prior_key, scan_key = jax.random.split(key)
    x_init = fp.sample_prior(prior_key, (batch_size, length),
                             diffusion=spec.diffusion,
                             mask_index=spec.mask_index,
                             vocab_size=spec.vocab_size)
    timesteps = jnp.linspace(1.0, sampler.eps, sampler.steps + 1)
    dt_step = (1 - sampler.eps) / sampler.steps
    method = guidance.method if guidance is not None else None
    use_cache = sampler.use_cache and spec.diffusion == 'absorbing_state' \
        and method in (None, 'cfg', 'cbg')

    fused_active = _fused_ok(spec, sampler, guidance) and (
        method is None
        or (method == 'cfg' and guidance.gamma not in (0.0, 1.0)))
    cache0 = _init_cache(spec, sampler, guidance, batch_size, length,
                         classifier=(method == 'cbg'),
                         fused=fused_active, enabled=use_cache)

    def step_fn(carry, i):
        xt, cache, valid_flag, k = carry
        # None disables the cache at trace time (see _cached): no
        # lax.cond, no (B, L, V) tensor in the carry.
        cache_valid = valid_flag if use_cache else None
        k, step_key = jax.random.split(k)
        t = timesteps[i]
        if spec.T > 0:
            t = fp.discretize_t(t, spec.T)
        t_vec = jnp.full((batch_size,), t)
        sigma_t = spec.noise.total_noise(t_vec)
        sigma_s = spec.noise.total_noise(t_vec - dt_step)
        mct = (1 - jnp.exp(-sigma_t))[:, None, None]
        mcs = (1 - jnp.exp(-sigma_s))[:, None, None]

        if method is None:
            xs, new_cache = _ddpm_step(
                spec, sampler, model_apply, params, step_key, xt,
                sigma_t, mct, mcs, cache, cache_valid,
                dit_cfg=dit_cfg)
        elif method == 'cfg':
            xs, new_cache = _cfg_step(
                spec, sampler, guidance, model_apply, params, step_key,
                xt, sigma_t, mct, mcs, cond, cache, cache_valid,
                dit_cfg=dit_cfg)
        elif method == 'cbg':
            xs, new_cache = _cbg_step(
                spec, sampler, guidance, model_apply, params,
                classifier_apply, classifier_params, step_key, xt,
                sigma_t, mct, mcs, cache, cache_valid)
        elif method == 'nos':
            xs, _ = _nos_step(
                spec, sampler, guidance, model_apply, params,
                classifier_apply, classifier_params, step_key, xt,
                sigma_t, mct, mcs)
            new_cache = cache
        else:
            raise NotImplementedError(
                f'Guidance method {method} not implemented.')

        if use_cache:
            valid = jnp.all(xs == xt)
        else:
            valid = jnp.asarray(False)
        return (xs, new_cache, valid, k), None

    init = (x_init, cache0, jnp.asarray(False), scan_key)
    (x_final, _, _, _), _ = jax.lax.scan(
        step_fn, init, jnp.arange(sampler.steps))
    return x_final


def first_hitting_sample(spec: DiffusionSpec, sampler: SamplerSpec,
                         model_apply, params, key, *, batch_size: int,
                         length: int,
                         guidance: Optional[GuidanceSpec] = None,
                         cond: Optional[jax.Array] = None,
                         dit_cfg=None) -> jax.Array:
    """Event-driven MDLM sampling (T->infty exact).

    For absorbing-state diffusion with any schedule, each token's decode
    time tau has survival P(masked at t) = move_chance(t)/move_chance(1);
    for log-linear, tau ~ U(0, 1) i.i.d. Processing events in decreasing
    tau order and sampling the decoded token from x_theta at sigma(tau)
    reproduces the reverse process exactly in the continuous-time limit
    (the 'any-order autoregressive' view of MDLM; cf. the reference's
    cache which skips no-event steps, diffusion.py:1371-1374).

    One forward per event => exactly L NFEs (2L logits rows under CFG via
    the batched cond/uncond forward).
    """
    assert spec.diffusion == 'absorbing_state', (
        'first-hitting sampling is defined for absorbing-state '
        'diffusion')
    from ddg_tpu.ops.noise_schedules import LogLinearNoise
    tau_key, scan_key = jax.random.split(key)
    B, L = batch_size, length
    u = jax.random.uniform(tau_key, (B, L), minval=sampler.eps,
                           maxval=1.0)
    if isinstance(spec.noise, LogLinearNoise):
        # Move chance is linear in t, so decode times are the uniform
        # quantiles directly (kept branch-exact for the golden pins).
        tau = u
    else:
        # General schedule: a token's survival is
        # P(masked at t) = move_chance(t) / move_chance(1), so the
        # decode time is the move-chance quantile
        # tau = mc^{-1}(u * mc(1)) = sigma^{-1}(-log1p(-u * mc(1))).
        mc1 = 1.0 - jnp.exp(-spec.noise.total_noise(
            jnp.asarray(1.0)))
        sigma_tau = -jnp.log1p(-u * mc1)
        tau = jnp.clip(spec.noise.inverse_total_noise(sigma_tau),
                       sampler.eps, 1.0)
    # Descending decode order per sample.
    order = jnp.argsort(-tau, axis=-1)                  # (B, L)
    times = jnp.take_along_axis(tau, order, axis=-1)    # (B, L) desc
    xt0 = jnp.full((B, L), spec.mask_index, jnp.int32)
    method = guidance.method if guidance is not None else None
    gamma = guidance.gamma if guidance is not None else None

    # Trunk-only + per-position head: the head's (L, V) projection is
    # skipped; only the decoded row is projected (saves the entire
    # vocab matmul for L-1 of L positions per event).
    use_head_fn = dit_cfg is not None

    def row_log_probs(xt, sigma_t, pos):
        from ddg_tpu.models.dit import dit_head_fn
        mask_neg = fp.NEG_INFINITY

        def one(xt_in, sig_in, cond_in, pos_in):
            hidden, c = model_apply(
                params, xt_in, process_sigma(spec, sig_in), cond_in,
                None, train=False, rng=None, skip_head=True)
            rows = jnp.take_along_axis(
                hidden, pos_in[:, None, None], axis=1).squeeze(1)
            logits = dit_head_fn(dit_cfg, params, rows, c)
            v_ids = jnp.arange(logits.shape[-1])
            logits = jnp.where(v_ids[None] == spec.mask_index,
                               logits + mask_neg, logits)
            return jax.nn.log_softmax(logits, axis=-1)

        if method == 'cfg' and gamma not in (None, 0.0, 1.0):
            x2 = jnp.concatenate([xt, xt], axis=0)
            s2 = jnp.concatenate([sigma_t, sigma_t], axis=0)
            c2 = jnp.concatenate(
                [cond, jnp.full_like(cond, spec.num_classes)], axis=0)
            lp2 = one(x2, s2, c2, jnp.concatenate([pos, pos], axis=0))
            mixed = gamma * lp2[:B] + (1 - gamma) * lp2[B:]
            return jax.nn.log_softmax(mixed, axis=-1)
        use_cond = None
        if method == 'cfg':
            use_cond = (cond if gamma == 1.0
                        else jnp.full_like(cond, spec.num_classes))
        return one(xt, sigma_t, use_cond, pos)

    def logits_at(xt, sigma_t):
        if method == 'cfg' and gamma not in (None, 0.0, 1.0):
            x2 = jnp.concatenate([xt, xt], axis=0)
            s2 = jnp.concatenate([sigma_t, sigma_t], axis=0)
            c2 = jnp.concatenate(
                [cond, jnp.full_like(cond, spec.num_classes)], axis=0)
            lp2 = log_x_theta(spec, model_apply, params, x2, s2,
                              cond=c2)
            mixed = gamma * lp2[:B] + (1 - gamma) * lp2[B:]
            return jax.nn.log_softmax(mixed, axis=-1)
        use_cond = None
        if method == 'cfg':
            use_cond = (cond if gamma == 1.0
                        else jnp.full_like(cond, spec.num_classes))
        return log_x_theta(spec, model_apply, params, xt, sigma_t,
                           cond=use_cond)

    def step_fn(carry, k):
        xt, key_c = carry
        key_c, skey = jax.random.split(key_c)
        t_k = times[:, k]                                # (B,)
        sigma_t = spec.noise.total_noise(t_k)
        pos = order[:, k]                                # (B,)
        if use_head_fn:
            row = row_log_probs(xt, sigma_t, pos)        # (B, V)
        else:
            log_probs = logits_at(xt, sigma_t)           # (B, L, V)
            row = jnp.take_along_axis(
                log_probs, pos[:, None, None], axis=1).squeeze(1)
        g = jax.random.gumbel(skey, row.shape, dtype=row.dtype)
        tok = S.sample_token(
            row, g,
            low_confidence_sampling=sampler.low_confidence_sampling,
            low_confidence_threshold=sampler.low_confidence_threshold)
        onehot = jax.nn.one_hot(pos, L, dtype=jnp.bool_)
        xt = jnp.where(onehot, tok[:, None], xt)
        return (xt, key_c), None

    (x_final, _), _ = jax.lax.scan(step_fn, (xt0, scan_key),
                                   jnp.arange(L))
    return x_final


def ar_sample(spec: DiffusionSpec, sampler: SamplerSpec, model_apply,
              params, key, *, batch_size: int, length: int,
              bos_token_id: int,
              guidance: Optional[GuidanceSpec] = None,
              cond: Optional[jax.Array] = None,
              classifier_apply=None, classifier_params=None,
              decode_cfg=None) -> jax.Array:
    """AR decoding (reference `_ar_sample`, diffusion.py:1085-1186).

    Two paths:
      * `decode_cfg` (a DITConfig) -> O(L^2) KV-cache incremental
        decoding (models/dit_decode.py) for none/CFG guidance — the
        TPU-native replacement for the reference's full-prefix
        recomputation (diffusion.py:1132-1133);
      * fallback: full-length causal forward each step inside
        `lax.scan` with position masking (static shapes) — used for
        FUDGE (classifier needs full-prefix scoring anyway) and
        non-DiT backbones.
    """
    method0 = guidance.method if guidance is not None else None
    if decode_cfg is not None and method0 in (None, 'cfg'):
        return _ar_sample_kv(spec, sampler, params, key,
                             batch_size=batch_size, length=length,
                             bos_token_id=bos_token_id,
                             guidance=guidance, cond=cond,
                             decode_cfg=decode_cfg)
    if sampler.ar_kv_int8:
        import warnings
        warnings.warn('ar_kv_int8=True ignored: the full-forward AR '
                      'fallback path has no KV cache (round-4 ADVICE)')
    num_pred = length - 1
    noise_key, scan_key = jax.random.split(key)
    noise_shape = (batch_size, num_pred,
                   guidance.topk if (guidance is not None
                                     and guidance.method == 'fudge')
                   else spec.vocab_size)
    gumbel = S.gumbel_noise_like(noise_key, noise_shape,
                                 dtype=_sample_dtype(sampler))
    x0 = jnp.zeros((batch_size, length), dtype=jnp.int32)
    x0 = x0.at[:, 0].set(bos_token_id)
    method = guidance.method if guidance is not None else None

    def fwd(x, use_cond):
        return log_x_theta(spec, model_apply, params, x, None,
                           cond=use_cond).astype(_sample_dtype(sampler))

    def step_fn(x, i):
        if method is None:
            log_probs = fwd(x, None)
            next_lp = jax.lax.dynamic_index_in_dim(
                log_probs, i, axis=1, keepdims=False)
            y = S.sample_token(
                next_lp, gumbel[:, i],
                low_confidence_sampling=sampler.low_confidence_sampling,
                low_confidence_threshold=sampler.low_confidence_threshold)
        elif method == 'cfg':
            gamma = guidance.gamma
            null_cond = jnp.full_like(cond, spec.num_classes)
            if gamma == 0.0:
                lp = fwd(x, null_cond)
            elif gamma == 1.0:
                lp = fwd(x, cond)
            else:
                x2 = jnp.concatenate([x, x], axis=0)
                c2 = jnp.concatenate([cond, null_cond], axis=0)
                lp2 = fwd(x2, c2)
                lp = gamma * lp2[:batch_size] \
                    + (1 - gamma) * lp2[batch_size:]
                lp = jax.nn.log_softmax(lp, axis=-1)
            next_lp = jax.lax.dynamic_index_in_dim(
                lp, i, axis=1, keepdims=False)
            y = S.sample_token(
                next_lp, gumbel[:, i],
                low_confidence_sampling=sampler.low_confidence_sampling,
                low_confidence_threshold=sampler.low_confidence_threshold)
        elif method == 'fudge':
            lp = fwd(x, None)
            next_lp = jax.lax.dynamic_index_in_dim(
                lp, i, axis=1, keepdims=False)
            top_logits, top_idx = jax.lax.top_k(next_lp, guidance.topk)
            # Classifier scores each candidate continuation
            # (diffusion.py:1238-1267): append candidate at position i+1.
            K = guidance.topk
            cand = jnp.repeat(x[:, None, :], K, axis=1)  # (B, K, L)
            pos_oh = jax.nn.one_hot(i + 1, x.shape[1],
                                    dtype=x.dtype)  # (L,)
            cand = (cand * (1 - pos_oh)[None, None, :]
                    + top_idx[..., None] * pos_oh[None, None, :])
            flat = cand.reshape(batch_size * K, x.shape[1])
            sig = spec.noise.total_noise(
                jnp.zeros((batch_size * K,), jnp.float32))
            clf_logits = classifier_apply(classifier_params, flat, sig)
            # FUDGE classifier is per-position ('no_pooling'):
            # (B*K, L, C) -> position i+1, guidance class.
            clf_lp = jax.nn.log_softmax(clf_logits, axis=-1)
            clf_at = jax.lax.dynamic_index_in_dim(
                clf_lp, i + 1, axis=1, keepdims=False)
            clf_score = clf_at[..., guidance.condition].reshape(
                batch_size, K)
            guided = jax.nn.log_softmax(
                top_logits + guidance.gamma * clf_score, axis=-1)
            choice = S.sample_token(
                guided, gumbel[:, i],
                low_confidence_sampling=sampler.low_confidence_sampling,
                low_confidence_threshold=sampler.low_confidence_threshold)
            y = jnp.take_along_axis(top_idx, choice[:, None],
                                    axis=1).squeeze(1)
        elif method == 'pplm':
            # PPLM-style plug-and-play guidance (beyond reference: the
            # reference stubs _ar_pplm_denoise, diffusion.py:1269-1279).
            # Adagrad-ascend a delta on the trunk hidden states so the
            # attribute classifier (attention_mean over the prefix)
            # favors guidance.condition, with a KL leash on the
            # next-token distribution; then decode from the perturbed
            # hidden via the x_emb head hook.
            logits, hidden = model_apply(
                params, x, None, None, None, train=False, rng=None,
                return_hidden_states=True)
            base_lp = jax.nn.log_softmax(
                jax.lax.dynamic_index_in_dim(
                    logits.astype(jnp.float32), i, axis=1,
                    keepdims=False), axis=-1)
            # Prefix mask: positions 0..i are real context.
            prefix = (jnp.arange(x.shape[1]) <= i).astype(jnp.float32)
            prefix = jnp.broadcast_to(prefix[None, :],
                                      (batch_size, x.shape[1]))

            def pplm_loss(delta):
                h = hidden + delta
                clf_logits = classifier_apply(
                    classifier_params, x, None, x_emb=h,
                    attention_mask=prefix)
                target = jax.nn.log_softmax(clf_logits, axis=-1)[
                    ..., guidance.condition].sum()
                new_logits = model_apply(params, x, None, None, h,
                                         train=False, rng=None)
                new_lp = jax.nn.log_softmax(
                    jax.lax.dynamic_index_in_dim(
                        new_logits.astype(jnp.float32), i, axis=1,
                        keepdims=False), axis=-1)
                kl = (jnp.exp(base_lp)
                      * (base_lp - new_lp)).sum() / batch_size
                return -target + guidance.pplm_stability_coef * kl

            grad_fn = jax.grad(pplm_loss)

            def adagrad_body(_, state):
                delta, acc = state
                g = grad_fn(delta)
                acc = acc + g * g
                delta = delta - guidance.pplm_step_size * g / (
                    jnp.sqrt(acc) + 1e-10)
                return delta, acc

            zeros = jnp.zeros_like(hidden)
            delta, _ = jax.lax.fori_loop(
                0, guidance.num_pplm_steps, adagrad_body,
                (zeros, zeros))
            guided_logits = model_apply(params, x, None, None,
                                        hidden + delta, train=False,
                                        rng=None)
            next_lp = jax.nn.log_softmax(
                jax.lax.dynamic_index_in_dim(
                    guided_logits.astype(jnp.float32), i, axis=1,
                    keepdims=False), axis=-1).astype(
                _sample_dtype(sampler))
            y = S.sample_token(
                next_lp, gumbel[:, i],
                low_confidence_sampling=sampler.low_confidence_sampling,
                low_confidence_threshold=sampler.low_confidence_threshold)
        else:
            raise NotImplementedError(
                f'Guidance method {method} not implemented.')
        x = x.at[:, i + 1].set(y)
        return x, None

    x_final, _ = jax.lax.scan(step_fn, x0, jnp.arange(num_pred))
    return x_final


def _ar_sample_kv(spec, sampler, params, key, *, batch_size, length,
                  bos_token_id, guidance, cond, decode_cfg):
    """Stateful AR decoding; CFG runs cond+uncond as one 2B batch.

    decode_cfg selects the backbone decode kernel: DITConfig -> KV-cache
    attention decode; DiMambaConfig -> conv+SSM state decode (the
    reference's InferenceParams path, diffusion.py:1114-1124)."""
    from ddg_tpu.models.dimamba import DiMambaConfig
    if isinstance(decode_cfg, DiMambaConfig):
        from ddg_tpu.models.dimamba_decode import decode_step as _ds, \
            init_cache
        # DiMamba decode has no positional argument (and no
        # length-windowed cache — its state is O(1) in L).
        def decode_step(cfg, prm, cache, tok, pos, cond=None, *,
                        window=None):
            return _ds(cfg, prm, cache, tok, cond=cond)
        supports_window = False
    else:
        from ddg_tpu.models.dit_decode import decode_step, init_cache
        supports_window = True

    num_pred = length - 1
    # Same key split as the fallback path so both paths draw identical
    # Gumbel noise (token-for-token agreement).
    noise_key, _ = jax.random.split(key)
    gumbel = S.gumbel_noise_like(
        noise_key, (batch_size, num_pred, spec.vocab_size),
        dtype=_sample_dtype(sampler))
    method = guidance.method if guidance is not None else None
    gamma = guidance.gamma if guidance is not None else None

    if method == 'cfg' and gamma not in (0.0, 1.0):
        dec_B = 2 * batch_size
        dec_cond = jnp.concatenate(
            [cond, jnp.full_like(cond, spec.num_classes)], axis=0)
    else:
        dec_B = batch_size
        if method is None:
            dec_cond = None
        elif gamma == 0.0:
            dec_cond = jnp.full_like(cond, spec.num_classes)
        else:
            dec_cond = cond

    # Pre-cast the dense kernels/biases ONCE, outside the position
    # scan. decode_step casts fp32 params to the activation dtype
    # in-loop (`_dense`); whether XLA hoists that convert out of the
    # scan body is at the mercy of LICM, and when it doesn't, every
    # decode step re-reads the fp32 weights from HBM (2x the bytes of
    # the bf16 copy it actually multiplies with). Casting here is
    # numerically identical — the same fp32->bf16 rounding happens
    # either way — so the token-identity tests against the
    # full-recompute path are unaffected. Norm weights, embeddings,
    # and the cond map are left fp32 (decode_step consumes those in
    # fp32 before casting activations).
    def _precast(tree, dt, ld):
        def go(d, under_out):
            out = {}
            for k, v in d.items():
                if isinstance(v, Mapping):
                    out[k] = go(v, under_out or k == 'output_linear')
                elif (k in ('kernel', 'bias')
                      and v.dtype == jnp.float32):
                    out[k] = v.astype(ld if under_out else dt)
                else:
                    out[k] = v
            return out
        return go(tree, False)

    cdt = getattr(decode_cfg, 'compute_dtype', jnp.float32)
    ldt = getattr(decode_cfg, 'logits_dtype', cdt)
    # Mapping (not dict) so flax FrozenDict param trees — common when
    # the caller loaded an orbax/flax checkpoint — get the same HBM
    # traffic optimization as plain dicts (round-4 ADVICE).
    if (supports_window and cdt != jnp.float32
            and isinstance(params, Mapping)):
        # DiT decode only: DiMamba decode runs its recurrence in fp32
        # and its layer norms key on 'bias', so precasting there would
        # change numerics (and its weights are a tiny fraction of the
        # O(1)-state step anyway).
        params = _precast(params, cdt, ldt)

    if supports_window and sampler.ar_kv_int8:
        cache0 = init_cache(decode_cfg, dec_B, kv_int8=True)
    else:
        if sampler.ar_kv_int8:
            # DiMamba decode carries O(1) conv/SSM state, not a KV
            # cache — an int8 A/B here would silently benchmark the
            # bf16 path (round-4 ADVICE).
            import warnings
            warnings.warn('ar_kv_int8=True has no effect: this decode '
                          'backbone has no KV cache (DiT only)')
        cache0 = init_cache(decode_cfg, dec_B)
    x0 = jnp.zeros((batch_size, length), dtype=jnp.int32)
    x0 = x0.at[:, 0].set(bos_token_id)

    def make_step(window):
        def step_fn(carry, i):
            x, cache = carry
            tok = x[:, i]
            dec_tok = (jnp.concatenate([tok, tok], axis=0)
                       if dec_B == 2 * batch_size else tok)
            logits, cache = decode_step(decode_cfg, params, cache,
                                        dec_tok, i, cond=dec_cond,
                                        window=window)
            lp = jax.nn.log_softmax(
                logits.astype(_sample_dtype(sampler)), axis=-1)
            if dec_B == 2 * batch_size:
                lp = gamma * lp[:batch_size] \
                    + (1 - gamma) * lp[batch_size:]
                lp = jax.nn.log_softmax(lp, axis=-1)
            y = S.sample_token(
                lp, gumbel[:, i],
                low_confidence_sampling=sampler.low_confidence_sampling,
                low_confidence_threshold=sampler
                .low_confidence_threshold)
            x = x.at[:, i + 1].set(y)
            return (x, cache), None
        return step_fn

    # Length-bucketed decode: bucket j's positions [s, e) read only a
    # ceil-to-128 prefix of the cache (lane-aligned static slice).
    buckets = max(1, sampler.ar_buckets) if supports_window else 1
    bounds = [round(num_pred * j / buckets)
              for j in range(buckets + 1)]
    carry = (x0, cache0)
    for j in range(buckets):
        s, e = bounds[j], bounds[j + 1]
        if s == e:
            continue
        window = min(length, -(-e // 128) * 128) if buckets > 1 \
            else None
        carry, _ = jax.lax.scan(make_step(window), carry,
                                jnp.arange(s, e))
    x_final, _ = carry
    return x_final
