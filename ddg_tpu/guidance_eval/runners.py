"""Guidance evaluation runners: sample -> domain metrics -> CSV/JSON.

Parity with the reference's standalone eval scripts:
  * QM9 (guidance_eval/qm9_eval.py): per-gamma sampling sweep, RDKit
    validity/uniqueness/novelty, QED/ring stats on the novel subset;
  * Amazon-Polarity (guidance_eval/amazon_polarity_eval.py): n-gram
    diversity + sentiment-classifier accuracy + gen-PPL;
  * Species10 (guidance_eval/ten_species_eval.py): per-class sampling,
    eval-classifier accuracy/F1/MCC, 3/6-mer JS divergence,
    discriminator AUROC.

Deterministic: seeded PRNG keys throughout (the reference additionally
pins torch deterministic algorithms, qm9_eval.py:82-85 — JAX sampling
is deterministic given the key by construction).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ddg_tpu.guidance_eval import metrics as gm
from ddg_tpu.samplers import GuidanceSpec, SamplerSpec, diffusion_sample
from ddg_tpu.utils.logging import get_logger

log = get_logger(__name__)


def qm9_guidance_eval(spec, sampler: SamplerSpec, model_apply, params,
                      tokenizer, *, gammas: Sequence[float] = (1, 2, 3, 4, 5),
                      guidance_method: str = 'cfg', condition: int = 1,
                      num_sample_batches: int = 64, batch_size: int = 16,
                      length: int = 32, seed: int = 0,
                      train_smiles: Optional[Sequence[str]] = None,
                      classifier_apply=None, classifier_params=None,
                      dit_cfg=None,
                      output_path: Optional[str] = None) -> List[Dict]:
    """Gamma sweep -> molecule metrics (reference qm9_eval.py:88-204:
    64 batches x 16 samples, T=32, gamma 1..5)."""
    results = []
    for gamma in gammas:
        guidance = GuidanceSpec(method=guidance_method, gamma=float(gamma),
                                condition=condition)
        cond = (jnp.full((batch_size,), condition, jnp.int32)
                if guidance_method == 'cfg' else None)
        texts = []
        key = jax.random.PRNGKey(seed)
        for b in range(num_sample_batches):
            key, k = jax.random.split(key)
            out = diffusion_sample(
                spec, sampler, model_apply, params, k,
                batch_size=batch_size, length=length, guidance=guidance,
                cond=cond, classifier_apply=classifier_apply,
                classifier_params=classifier_params, dit_cfg=dit_cfg)
            texts.extend(tokenizer.batch_decode(np.asarray(out)))
        res = {'gamma': float(gamma),
               **gm.molecule_metrics(texts, train_set=train_smiles)}
        if res.get('novel'):
            # ring stats are native (cycle rank); QED is null w/o RDKit
            res.update(gm.qed_stats(res['novel']))
        res.pop('novel', None)
        res['samples_preview'] = texts[:8]
        results.append(res)
    if output_path:
        _write_results(output_path, results)
    return results


def amazon_polarity_eval(spec, sampler: SamplerSpec, model_apply, params,
                         tokenizer, *, gammas: Sequence[float] = (1, 2, 3),
                         condition: int = 1, num_sample_batches: int = 4,
                         batch_size: int = 16, length: int = 128,
                         seed: int = 0,
                         sentiment_classifier: Optional[Callable] = None,
                         judge_model_name: Optional[str] = None,
                         dit_cfg=None,
                         output_path: Optional[str] = None) -> List[Dict]:
    """CFG sweep -> diversity + sentiment accuracy (+ gen-PPL when a
    judge is available) (reference amazon_polarity_eval.py:66-215)."""
    results = []
    for gamma in gammas:
        guidance = GuidanceSpec(method='cfg', gamma=float(gamma),
                                condition=condition)
        cond = jnp.full((batch_size,), condition, jnp.int32)
        texts = []
        key = jax.random.PRNGKey(seed)
        for b in range(num_sample_batches):
            key, k = jax.random.split(key)
            out = diffusion_sample(spec, sampler, model_apply, params, k,
                                   batch_size=batch_size, length=length,
                                   guidance=guidance, cond=cond,
                                   dit_cfg=dit_cfg)
            texts.extend(tokenizer.batch_decode(np.asarray(out)))
        res = {'gamma': float(gamma), **gm.ngram_diversity(texts)}
        if sentiment_classifier is not None:
            preds = sentiment_classifier(texts)
            res['sentiment_accuracy'] = float(
                (np.asarray(preds) == condition).mean())
        if judge_model_name:
            from ddg_tpu.eval_utils import compute_generative_ppl
            res['generative_ppl'] = compute_generative_ppl(
                texts, judge_model_name=judge_model_name,
                max_length=length)
        res['samples_preview'] = texts[:4]
        results.append(res)
    if output_path:
        _write_results(output_path, results)
    return results


def ten_species_eval(spec, sampler: SamplerSpec, model_apply, params,
                     tokenizer, *, num_classes: int = 10,
                     guidance_method: str = 'cfg', gamma: float = 1.0,
                     samples_per_class: int = 16, batch_size: int = 8,
                     length: int = 32768, seed: int = 0,
                     eval_classifier: Optional[Callable] = None,
                     reference_sequences: Optional[List[str]] = None,
                     discriminator_scores: Optional[Callable] = None,
                     classifier_apply=None, classifier_params=None,
                     dit_cfg=None,
                     output_path: Optional[str] = None) -> Dict:
    """Per-class sampling -> classifier metrics + k-mer JS + AUROC
    (reference ten_species_eval.py:298-523).

    eval_classifier(texts) -> predicted class labels (the reference
    uses a pretrained HyenaDNA classifier; any callable works).
    discriminator_scores(real_texts, fake_texts) -> (scores_real,
    scores_fake), e.g. from a freshly trained discriminator.
    """
    all_texts, y_true = [], []
    key = jax.random.PRNGKey(seed)
    for c in range(num_classes):
        log.info('ten_species_eval: sampling class %d/%d '
                 '(%d samples)', c + 1, num_classes, samples_per_class)
        guidance = GuidanceSpec(method=guidance_method, gamma=gamma,
                                condition=c)
        cond = (jnp.full((batch_size,), c, jnp.int32)
                if guidance_method == 'cfg' else None)
        need = samples_per_class
        while need > 0:
            key, k = jax.random.split(key)
            out = diffusion_sample(
                spec, sampler, model_apply, params, k,
                batch_size=batch_size, length=length, guidance=guidance,
                cond=cond, classifier_apply=classifier_apply,
                classifier_params=classifier_params, dit_cfg=dit_cfg)
            texts = tokenizer.batch_decode(np.asarray(out))
            take = texts[:need]
            all_texts.extend(take)
            y_true.extend([c] * len(take))
            need -= len(take)

    result: Dict = {'num_samples': len(all_texts)}
    if eval_classifier is not None:
        log.info('ten_species_eval: scoring %d samples with the eval '
                 'classifier', len(all_texts))
        y_pred = eval_classifier(all_texts)
        result.update(gm.classification_metrics(
            y_true, y_pred, num_classes))
    if reference_sequences is not None:
        log.info('ten_species_eval: 3/6-mer JS vs %d reference '
                 'sequences', len(reference_sequences))
        for k_size in (3, 6):
            result[f'js_{k_size}mer'] = gm.kmer_js_divergence(
                all_texts, reference_sequences, k_size)
    if discriminator_scores is not None:
        log.info('ten_species_eval: training the AUROC discriminator')
        real_s, fake_s = discriminator_scores(
            reference_sequences or [], all_texts)
        result['discriminator_auroc'] = gm.discriminator_auroc(
            real_s, fake_s)
    if output_path:
        _write_results(output_path, [result])
    return result


def make_eval_classifier(clf_apply, params, tokenizer, *, length: int,
                         batch_size: int = 8) -> Callable:
    """texts -> predicted class labels using a trained eval classifier
    (the pinned Species10 judge; the reference's HyenaDNA classifier,
    guidance_eval/ten_species_eval.py:468-478). Inputs are CLEAN
    sequences — no sigma conditioning (classifier.py:166-178)."""

    @jax.jit
    def _logits(x):
        return clf_apply(params, x, None)

    pad = getattr(tokenizer, 'pad_token_id', 0)

    def encode(text):
        ids = tokenizer.encode(text, add_special_tokens=False)[:length]
        return np.pad(np.asarray(ids, np.int32), (0, length - len(ids)),
                      constant_values=pad)

    def fn(texts):
        ids = np.stack([encode(t) for t in texts])
        out = []
        for i in range(0, len(ids), batch_size):
            chunk = ids[i:i + batch_size]
            n = len(chunk)
            if n < batch_size:  # static shapes: pad the last batch
                chunk = np.pad(chunk, ((0, batch_size - n), (0, 0)))
            logits = np.asarray(_logits(jnp.asarray(chunk)))
            out.extend(logits[:n].argmax(-1).tolist())
        return out

    return fn


def _write_results(path: str, results: List[Dict]) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if path.endswith('.json'):
        with open(path, 'w') as f:
            json.dump(results, f, indent=2)
        return
    # CSV (the reference writes CSV, qm9_eval.py:194-204)
    import csv
    keys = sorted({k for r in results for k in r
                   if not isinstance(r[k], (list, dict))})
    with open(path, 'w', newline='') as f:
        w = csv.DictWriter(f, fieldnames=keys, extrasaction='ignore')
        w.writeheader()
        for r in results:
            w.writerow({k: r.get(k) for k in keys})


def train_eval_discriminator(real_texts, fake_texts, tokenizer, *,
                             length: int, vocab_size: int,
                             steps: int = 200, seed: int = 0,
                             hidden: int = 64, n_blocks: int = 2,
                             backbone: str = 'hyenadna'):
    """Train a fresh real-vs-generated discriminator and return a
    scoring callable (reference ten_species_eval.py:408-523 trains a
    new discriminator per eval and reports AUROC).

    backbone='hyenadna' (default) matches the reference protocol — it
    builds the HyenaDNA architecture `from_config(pretrained=False)`
    (ten_species_eval.py:468-478), which our native
    models/hyenadna.py reproduces with no HF assets; 'dit' keeps the
    round-2 substitute.

    Returns score_fn(texts) -> real-logit scores (higher = more real).
    """
    import jax
    import jax.numpy as jnp

    from ddg_tpu.models import DITClassifier, DITConfig, jit_init, \
        make_classifier_apply
    from ddg_tpu.runtime.averaging import AveragingSpec
    from ddg_tpu.runtime.optim import OptimSpec
    from ddg_tpu.runtime.train_state import init_train_state
    from ddg_tpu.classifier import (ClassifierSpec,
                                    make_classifier_train_step)
    from ddg_tpu.ops.noise_schedules import LogLinearNoise

    def encode(texts):
        out = np.zeros((len(texts), length), np.int32)
        for i, t in enumerate(texts):
            ids = tokenizer.encode(t, add_special_tokens=False)[:length]
            out[i, :len(ids)] = ids
        return out

    x = np.concatenate([encode(real_texts), encode(fake_texts)])
    y = np.concatenate([np.ones(len(real_texts), np.int32),
                        np.zeros(len(fake_texts), np.int32)])
    if backbone == 'hyenadna':
        from ddg_tpu.models.hyenadna import (HyenaDNAClassifier,
                                             HyenaDNAConfig)
        hcfg = HyenaDNAConfig(
            d_model=hidden, n_layer=n_blocks, d_inner=4 * hidden,
            vocab_size=vocab_size, max_seq_len=2 * length + 2,
            filter_order=min(64, 4 * hidden), embed_dropout=0.0,
            compute_dtype=jnp.float32)
        clf = HyenaDNAClassifier(hcfg, num_classes=2, pooling='last')
    else:
        cfg = DITConfig(hidden_size=hidden, cond_dim=32, length=length,
                        n_blocks=n_blocks, n_heads=4, dropout=0.0,
                        vocab_size=vocab_size,
                        compute_dtype=jnp.float32)
        clf = DITClassifier(cfg, num_classes=2)
    key = jax.random.PRNGKey(seed)
    params = jit_init(clf, key, jnp.asarray(x[:1]),
                      jnp.ones((1,)))['params']
    apply_fn = make_classifier_apply(clf)
    spec = ClassifierSpec(diffusion='absorbing_state',
                          parameterization='subs',
                          noise=LogLinearNoise(), vocab_size=vocab_size,
                          mask_index=vocab_size - 1, num_classes=2,
                          sampling_eps=0.999)  # near-clean inputs
    optim = OptimSpec(lr=1e-3, num_warmup_steps=0)
    avg = AveragingSpec(kind='none')
    state = init_train_state(key, params, optim, avg)
    step = jax.jit(make_classifier_train_step(spec, apply_fn, optim,
                                              avg))
    rs = np.random.RandomState(seed)
    bs = min(32, len(x))
    ones = jnp.ones((bs, length), jnp.float32)
    for i in range(steps):
        idx = rs.choice(len(x), bs, replace=False)
        batch = {'input_ids': jnp.asarray(x[idx]),
                 'attention_mask': ones,
                 'label': jnp.asarray(y[idx])}
        state, m = step(state, batch)
        if (i + 1) % 50 == 0 or i + 1 == steps:
            log.info('discriminator step %d/%d: loss=%.4f', i + 1,
                     steps, float(m['loss']))

    def score_fn(texts):
        enc = jnp.asarray(encode(texts))
        logits = apply_fn(state.params, enc,
                          jnp.zeros((len(texts),)))
        return np.asarray(logits[:, 1] - logits[:, 0])

    return score_fn
