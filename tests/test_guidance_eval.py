"""Guidance-eval metric tests (host-side numpy, no sampling)."""

import numpy as np

from ddg_tpu.guidance_eval import metrics as gm


class TestMoleculeMetrics:
    def test_native_validity(self):
        from ddg_tpu.guidance_eval.chem import is_valid_smiles
        assert is_valid_smiles('CC(=O)N')
        assert is_valid_smiles('c1ccccc1')
        assert not is_valid_smiles('CC(=O')     # unbalanced (
        assert not is_valid_smiles('c1ccccc')   # unpaired ring
        assert not is_valid_smiles('C[NH2')     # unclosed [
        assert not is_valid_smiles('')

    def test_valid_unique_novel(self):
        samples = ['CC', 'CC', 'CCO', 'C(=O', 'N']
        out = gm.molecule_metrics(samples, train_set=['CC'])
        assert out['valid_frac'] == 4 / 5
        assert abs(out['unique_frac'] - 3 / 4) < 1e-9
        # novel: {CCO, N} of unique {CC, CCO, N}
        assert abs(out['novel_frac'] - 2 / 3) < 1e-9


class TestTextMetrics:
    def test_ngram_diversity(self):
        texts = ['a b a b', 'a b a b']
        d = gm.ngram_diversity(texts, max_n=2)
        assert d['distinct_1'] == 2 / 8
        assert d['distinct_2'] == 2 / 6

    def test_diverse_text(self):
        d = gm.ngram_diversity(['a b c d e f'], max_n=2)
        assert d['distinct_1'] == 1.0 and d['distinct_2'] == 1.0


class TestClassificationMetrics:
    def test_perfect(self):
        m = gm.classification_metrics([0, 1, 2], [0, 1, 2], 3)
        assert m['accuracy'] == 1.0
        assert m['macro_f1'] == 1.0
        assert abs(m['mcc'] - 1.0) < 1e-9

    def test_random_has_low_mcc(self):
        rs = np.random.RandomState(0)
        y = rs.randint(0, 4, 2000)
        p = rs.randint(0, 4, 2000)
        m = gm.classification_metrics(y, p, 4)
        assert abs(m['mcc']) < 0.1
        assert abs(m['accuracy'] - 0.25) < 0.05

    def test_matches_sklearn(self):
        from sklearn.metrics import (accuracy_score, f1_score,
                                     matthews_corrcoef)
        rs = np.random.RandomState(1)
        y = rs.randint(0, 5, 300)
        p = np.where(rs.rand(300) < 0.6, y, rs.randint(0, 5, 300))
        m = gm.classification_metrics(y, p, 5)
        np.testing.assert_allclose(m['accuracy'], accuracy_score(y, p))
        np.testing.assert_allclose(m['macro_f1'],
                                   f1_score(y, p, average='macro'),
                                   atol=1e-9)
        np.testing.assert_allclose(m['mcc'], matthews_corrcoef(y, p),
                                   atol=1e-9)


class TestGenomicsMetrics:
    def test_kmer_js_zero_for_identical(self):
        seqs = ['ACGTACGTAA', 'TTGGCCAACG']
        assert gm.kmer_js_divergence(seqs, seqs, 3) < 1e-9

    def test_kmer_js_positive_for_different(self):
        a = ['AAAAAAAAAA'] * 4
        b = ['GGGGGGGGGG'] * 4
        js = gm.kmer_js_divergence(a, b, 3)
        assert js > 0.5  # max = log 2 ~ 0.693

    def test_auroc_matches_sklearn(self):
        from sklearn.metrics import roc_auc_score
        rs = np.random.RandomState(0)
        real = rs.randn(200) + 1.0
        fake = rs.randn(200)
        ours = gm.discriminator_auroc(real, fake)
        labels = np.r_[np.ones(200), np.zeros(200)]
        scores = np.r_[real, fake]
        np.testing.assert_allclose(ours, roc_auc_score(labels, scores),
                                   atol=1e-9)

    def test_auroc_chance(self):
        rs = np.random.RandomState(0)
        assert abs(gm.discriminator_auroc(rs.randn(500),
                                          rs.randn(500)) - 0.5) < 0.05


def test_runner_smoke_qm9(tmp_path):
    """qm9 runner end-to-end with a tiny model (1 gamma, 1 batch)."""
    import jax
    import jax.numpy as jnp
    from ddg_tpu.data.tokenizers import QM9Tokenizer
    from ddg_tpu.diffusion import DiffusionSpec
    from ddg_tpu.guidance_eval.runners import qm9_guidance_eval
    from ddg_tpu.models import DIT, DITConfig, make_model_apply
    from ddg_tpu.ops.noise_schedules import LogLinearNoise
    from ddg_tpu.samplers import SamplerSpec

    tok = QM9Tokenizer()
    cfg = DITConfig(hidden_size=32, cond_dim=16, length=16, n_blocks=2,
                    n_heads=2, dropout=0.0, vocab_size=tok.vocab_size,
                    num_classes=2, compute_dtype=jnp.float32)
    spec = DiffusionSpec(diffusion='uniform', parameterization='d3pm',
                         noise=LogLinearNoise(),
                         vocab_size=tok.vocab_size,
                         mask_index=tok.mask_token_id,
                         time_conditioning=True, zero_recon_loss=True,
                         num_classes=2)
    model = DIT(cfg)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 16), jnp.int32)
    params = model.init(key, x, jnp.ones((1,)),
                        jnp.zeros((1,), jnp.int32))['params']
    out = qm9_guidance_eval(
        spec, SamplerSpec(steps=4, use_cache=False),
        make_model_apply(model), params, tok, gammas=[2.0],
        num_sample_batches=1, batch_size=4, length=16,
        train_smiles=['CC'], output_path=str(tmp_path / 'qm9.csv'))
    assert len(out) == 1
    assert 0 <= out[0]['valid_frac'] <= 1
    assert (tmp_path / 'qm9.csv').exists()


def test_runner_smoke_amazon(tmp_path):
    import jax
    import jax.numpy as jnp
    from ddg_tpu.data.tokenizers import FallbackWordTokenizer
    from ddg_tpu.diffusion import DiffusionSpec
    from ddg_tpu.guidance_eval.runners import amazon_polarity_eval
    from ddg_tpu.models import DIT, DITConfig, make_model_apply
    from ddg_tpu.ops.noise_schedules import LogLinearNoise
    from ddg_tpu.samplers import SamplerSpec

    tok = FallbackWordTokenizer(vocab_size=64)
    V = tok.vocab_size + 1  # + mask
    cfg = DITConfig(hidden_size=32, cond_dim=16, length=12, n_blocks=2,
                    n_heads=2, dropout=0.0, vocab_size=V, num_classes=2,
                    compute_dtype=jnp.float32)
    spec = DiffusionSpec(diffusion='absorbing_state',
                         parameterization='subs',
                         noise=LogLinearNoise(), vocab_size=V,
                         mask_index=V - 1, num_classes=2)
    model = DIT(cfg)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 12), jnp.int32)
    params = model.init(key, x, jnp.ones((1,)),
                        jnp.zeros((1,), jnp.int32))['params']

    def sentiment(texts):
        return [len(t) % 2 for t in texts]

    out = amazon_polarity_eval(
        spec, SamplerSpec(steps=3, use_cache=False),
        make_model_apply(model), params, tok, gammas=[2.0],
        num_sample_batches=1, batch_size=4, length=12,
        sentiment_classifier=sentiment,
        output_path=str(tmp_path / 'amazon.csv'))
    assert len(out) == 1
    assert 'distinct_1' in out[0] and 'sentiment_accuracy' in out[0]
    assert (tmp_path / 'amazon.csv').exists()
