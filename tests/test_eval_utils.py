"""eval_utils tests: f64 metric aggregation, unigram entropy, AR-judge
generative PPL."""

import jax
import jax.numpy as jnp
import numpy as np

from ddg_tpu.eval_utils import (MeanMetric, LOG2,
                                compute_generative_ppl_with_ar_model,
                                unigram_entropy)


def test_mean_metric_f64():
    m = MeanMetric()
    m.update(10.0, 4.0)
    m.update(2.0, 2.0)
    assert abs(m.nll - 2.0) < 1e-12
    assert abs(m.ppl - np.exp(2.0)) < 1e-9
    assert abs(m.bpd - 2.0 / LOG2) < 1e-12


def test_unigram_entropy():
    # deterministic sequence -> 0 entropy; uniform over 4 -> log 4
    assert unigram_entropy([[1, 1, 1, 1]]) == 0.0
    e = unigram_entropy([[0, 1, 2, 3]])
    assert abs(e - np.log(4)) < 1e-9


def test_ar_judge_gen_ppl():
    from ddg_tpu.diffusion import DiffusionSpec
    from ddg_tpu.models import DIT, DITConfig, make_model_apply
    from ddg_tpu.ops.noise_schedules import LogLinearNoise

    V, L = 11, 12
    cfg = DITConfig(hidden_size=32, cond_dim=16, length=L, n_blocks=2,
                    n_heads=2, dropout=0.0, vocab_size=V, causal=True,
                    use_adaLN=False, compute_dtype=jnp.float32)
    model = DIT(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (2, L), 0, V)
    params = model.init(key, x, None)['params']
    spec = DiffusionSpec(diffusion='absorbing_state',
                         parameterization='ar',
                         noise=LogLinearNoise(), vocab_size=V,
                         mask_index=V - 1)
    samples = np.random.RandomState(0).randint(0, V - 1, (6, L))
    ppl = compute_generative_ppl_with_ar_model(
        samples, ar_spec=spec, model_apply=make_model_apply(model),
        params=params, bos_token_id=2, pad_token_id=5)
    # zero-init head => uniform predictions => ppl ~ V
    assert abs(ppl - V) < 1.0


def test_generative_ppl_protocol_executes_offline(tmp_path):
    """The EXACT gpt2-large gen-PPL code path (reference
    eval_utils.py:28-90: AutoTokenizer re-tokenization, mask-weighted
    CE, exp of token mean) executes end-to-end against a local
    random-weight judge written by save_synthetic_judge; flipping to
    the real judge is just judge_model_name='gpt2-large'."""
    from ddg_tpu.eval_utils import (compute_generative_ppl,
                                    save_synthetic_judge)
    d = save_synthetic_judge(
        str(tmp_path / 'judge'),
        ['the', 'cat', 'sat', 'on', 'mat', 'dog', 'ran'])
    ppl = compute_generative_ppl(
        ['the cat sat on mat', 'dog ran', 'the dog sat'],
        judge_model_name=d, batch_size=2)
    assert np.isfinite(ppl) and ppl > 1.0
    # Degenerate judge => ppl near uniform over its 9-token vocab.
    assert ppl < 100.0
