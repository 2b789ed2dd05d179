"""Species10 guidance-eval pipeline smoke: tiny DiMamba -> per-class
sampling -> classifier metrics + k-mer JS + discriminator AUROC."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from ddg_tpu.data.tokenizers import DNATokenizer
from ddg_tpu.diffusion import DiffusionSpec
from ddg_tpu.guidance_eval.runners import (ten_species_eval,
                                           train_eval_discriminator)
from ddg_tpu.models import make_model_apply
from ddg_tpu.models.dimamba import DiMamba, DiMambaConfig
from ddg_tpu.ops.noise_schedules import LogLinearNoise
from ddg_tpu.samplers import SamplerSpec

pytestmark = pytest.mark.slow

KEY = jax.random.PRNGKey(0)


def test_ten_species_eval_end_to_end(tmp_path):
    tok = DNATokenizer()
    L, NC = 32, 3
    cfg = DiMambaConfig(hidden_size=16, cond_dim=16, length=L,
                        n_blocks=2, vocab_size=tok.vocab_size,
                        d_state=4, scan_chunk=8, dropout=0.0,
                        num_classes=NC, compute_dtype=jnp.float32)
    spec = DiffusionSpec(diffusion='uniform', parameterization='d3pm',
                         noise=LogLinearNoise(),
                         vocab_size=tok.vocab_size,
                         mask_index=tok.mask_token_id,
                         time_conditioning=True, zero_recon_loss=True,
                         num_classes=NC)
    model = DiMamba(cfg)
    x = jnp.zeros((1, L), jnp.int32)
    params = model.init(KEY, x, jnp.ones((1,)),
                        jnp.zeros((1,), jnp.int32))['params']
    apply_fn = make_model_apply(model)

    ref_seqs = ['ACGT' * (L // 4), 'GGCC' * (L // 4), 'ATAT' * (L // 4)]

    def fake_classifier(texts):
        return [hash(t) % NC for t in texts]

    def disc_scores(real, fake):
        fn = train_eval_discriminator(
            real, fake, tok, length=L, vocab_size=tok.vocab_size,
            steps=5, hidden=16, n_blocks=1)
        return fn(real), fn(fake)

    out = ten_species_eval(
        spec, SamplerSpec(steps=3, use_cache=False), apply_fn, params,
        tok, num_classes=NC, samples_per_class=2, batch_size=2,
        length=L, eval_classifier=fake_classifier,
        reference_sequences=ref_seqs, discriminator_scores=disc_scores,
        output_path=str(tmp_path / 'species.json'))
    assert out['num_samples'] == NC * 2
    assert 'accuracy' in out and 'macro_f1' in out and 'mcc' in out
    assert 'js_3mer' in out and 'js_6mer' in out
    assert 0.0 <= out['discriminator_auroc'] <= 1.0
    assert (tmp_path / 'species.json').exists()
