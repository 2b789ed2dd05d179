"""Evaluation utilities: perplexity, generative perplexity, entropy.

Parity with the reference's `eval_utils.py` (/root/reference/eval_utils.py)
and the metric definitions in diffusion.py:46-67: NLL/BPD/PPL are
mask-weighted token means aggregated in float64 on host (the reference
uses torchmetrics MeanMetric with f64 dtype).
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Iterable, List, Optional

import numpy as np

LOG2 = math.log(2)


class MeanMetric:
    """Weighted mean with float64 host accumulation (torchmetrics
    MeanMetric parity, reference diffusion.py:46-67)."""

    def __init__(self):
        self.total = np.float64(0.0)
        self.weight = np.float64(0.0)

    def update(self, value_sum, weight) -> None:
        self.total += np.float64(value_sum)
        self.weight += np.float64(weight)

    def compute(self) -> float:
        return float(self.total / self.weight)

    @property
    def nll(self) -> float:
        return self.compute()

    @property
    def bpd(self) -> float:
        return self.compute() / LOG2

    @property
    def ppl(self) -> float:
        return float(np.exp(self.compute()))


def compute_ppl(eval_step, state, loader_iter, *, rng,
                max_batches: Optional[int] = None) -> MeanMetric:
    """Loop the valid split through the eval step (reference
    eval_utils.py:10-25). eval_step returns {'nll_sum','token_count'}."""
    import jax
    metric = MeanMetric()
    for i, batch in enumerate(loader_iter):
        if max_batches is not None and i >= max_batches:
            break
        rng, step_rng = jax.random.split(rng)
        out = eval_step(state, batch, step_rng)
        metric.update(np.asarray(out['nll_sum']),
                      np.asarray(out['token_count']))
    return metric


def unigram_entropy(samples_tokens: Iterable[Iterable[int]]) -> float:
    """Mean per-sequence unigram entropy of generated token ids
    (reference main.py:293-296)."""
    entropies = []
    for seq in samples_tokens:
        counts = np.asarray(list(Counter(list(seq)).values()),
                            dtype=np.float64)
        p = counts / counts.sum()
        entropies.append(float(-(p * np.log(p)).sum()))
    return float(np.mean(entropies))


def strip_special_and_decode(tokenizer, samples: np.ndarray) -> List[str]:
    """Decode samples dropping PAD/MASK (reference main.py:263-276)."""
    return tokenizer.batch_decode(samples, skip_special_tokens=True)


def save_synthetic_judge(path: str, words: List[str], *,
                         n_embd: int = 32, n_layer: int = 2,
                         n_head: int = 2, n_positions: int = 64) -> str:
    """Write a tiny random-weight causal-LM judge (GPT-2 architecture +
    WordLevel tokenizer) to `path` in the HF folder layout, loadable by
    `compute_generative_ppl(judge_model_name=path)`.

    Purpose: lets the EXACT gen-PPL protocol code path (reference
    eval_utils.py:28-90 — AutoTokenizer re-tokenization, mask-weighted
    CE, token-mean exp) execute end-to-end in this zero-egress image.
    Scores from a random judge are obviously not the published metric;
    pass `judge_model_name='gpt2-large'` (cached) or a local snapshot
    dir for the real one — no other change needed.
    """
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import (GPT2Config, GPT2LMHeadModel,
                              PreTrainedTokenizerFast)
    vocab = {w: i for i, w in enumerate(dict.fromkeys(words))}
    vocab['<unk>'] = len(vocab)
    vocab['<eos>'] = len(vocab)
    tok = Tokenizer(models.WordLevel(vocab, unk_token='<unk>'))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    PreTrainedTokenizerFast(tokenizer_object=tok, unk_token='<unk>',
                            eos_token='<eos>').save_pretrained(path)
    cfg = GPT2Config(vocab_size=len(vocab), n_embd=n_embd,
                     n_layer=n_layer, n_head=n_head,
                     n_positions=n_positions)
    GPT2LMHeadModel(cfg).save_pretrained(path)
    return path


def compute_generative_ppl(
        texts: List[str], *,
        judge_model_name: str = 'gpt2-large',
        max_length: int = 1024,
        batch_size: int = 8) -> float:
    """Generative PPL under a pretrained causal-LM judge (reference
    eval_utils.py:28-90): re-tokenize with the judge's tokenizer,
    mask-weighted CE, exp of the token mean.

    Requires the judge weights in the local HF cache (torch CPU path);
    raises a clear error offline.
    """
    try:
        import torch
        from transformers import AutoModelForCausalLM, AutoTokenizer
        tok = AutoTokenizer.from_pretrained(judge_model_name)
        model = AutoModelForCausalLM.from_pretrained(judge_model_name)
    except Exception as e:
        raise RuntimeError(
            f'Generative-PPL judge {judge_model_name!r} unavailable '
            f'(offline environment?): {e}') from e
    model.eval()
    if tok.pad_token is None:
        tok.pad_token = tok.eos_token
    metric = MeanMetric()
    with torch.no_grad():
        for i in range(0, len(texts), batch_size):
            chunk = texts[i:i + batch_size]
            enc = tok(chunk, return_tensors='pt', padding=True,
                      truncation=True, max_length=max_length)
            ids = enc['input_ids']
            mask = enc['attention_mask']
            logits = model(ids, attention_mask=mask).logits
            logp = torch.log_softmax(logits[:, :-1].float(), dim=-1)
            tgt = ids[:, 1:]
            nll = -logp.gather(-1, tgt[..., None]).squeeze(-1)
            m = mask[:, 1:].float()
            metric.update(float((nll * m).sum()), float(m.sum()))
    return metric.ppl


def compute_generative_ppl_with_ar_model(samples_tokens, *, ar_spec,
                                         model_apply, params,
                                         bos_token_id: int,
                                         pad_token_id=None,
                                         batch_size: int = 8) -> float:
    """Generative PPL under one of OUR trained AR models — the offline
    counterpart of the gpt2-large judge (reference eval_utils.py:28-90
    re-tokenizes with the judge tokenizer; here samples are already in
    the shared vocabulary, BOS-prefixed like main.py:263-276).

    samples_tokens: (N, L) int array of generated token ids.
    """
    import jax
    import jax.numpy as jnp

    from ddg_tpu.diffusion import log_x_theta

    samples = np.asarray(samples_tokens)
    n, L = samples.shape
    # BOS prefix; targets are the sample tokens.
    bos = np.full((n, 1), bos_token_id, samples.dtype)
    inputs = np.concatenate([bos, samples[:, :-1]], axis=1)
    mask = np.ones_like(samples, np.float32)
    if pad_token_id is not None:
        mask = (samples != pad_token_id).astype(np.float32)

    @jax.jit
    def nll_fn(inp, tgt, m):
        lp = log_x_theta(ar_spec, model_apply, params, inp, None)
        tok_lp = jnp.take_along_axis(lp, tgt[..., None],
                                     axis=-1).squeeze(-1)
        return (-tok_lp * m).sum(), m.sum()

    metric = MeanMetric()
    for i in range(0, n, batch_size):
        sl = slice(i, min(i + batch_size, n))
        s_, c_ = nll_fn(jnp.asarray(inputs[sl]),
                        jnp.asarray(samples[sl]),
                        jnp.asarray(mask[sl]))
        metric.update(np.asarray(s_), np.asarray(c_))
    return metric.ppl
