"""End-to-end test of the pinned Species10 eval classifier
(the reference's HyenaDNA judge, classifier.py:166-178 +
scripts/train_ten_species_eval_classifier.sh): train a tiny
clean-sequence classifier from the config surface
(+is_eval_classifier=True), restore it, wrap it with
make_eval_classifier, and drive ten_species_eval with it.
"""

import os

import numpy as np
import pytest

from ddg_tpu import main as M
from ddg_tpu.config import load_config
from ddg_tpu.guidance_eval.runners import (make_eval_classifier,
                                           ten_species_eval)

pytestmark = pytest.mark.slow

CONFIG_DIR = os.path.join(os.path.dirname(__file__), '..', 'configs')

BASE = [
    'data=ten_species', 'backbone=dimamba', 'model=dimamba',
    'diffusion=uniform', 'parameterization=d3pm',
    'time_conditioning=True', 'zero_recon_loss=True',
    'model.hidden_size=32', 'model.cond_dim=16', 'model.n_blocks=2',
    'model.length=32', '+model.d_state=4', '+model.scan_chunk=8',
    'model.dropout=0.0',
    'classifier_backbone=dimamba',
    'classifier_model=species-eval-classifier',
    'classifier_model.hidden_size=32', 'classifier_model.cond_dim=16',
    'classifier_model.n_blocks=2', 'classifier_model.length=32',
    '+classifier_model.d_state=4', '+classifier_model.scan_chunk=8',
    'classifier_model.dropout=0.0',
    'trainer.precision=fp32', 'trainer.max_steps=4',
    'trainer.log_every_n_steps=2', 'loader.global_batch_size=8',
    'loader.batch_size=8', 'trainer.devices=1',
    '+data.synthetic=true',
]


@pytest.fixture(scope='module')
def judge_ckpt(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp('species_judge')
    config = load_config(CONFIG_DIR, overrides=[
        'mode=train_classifier', '+is_eval_classifier=True', *BASE,
        f'data.cache_dir={tmp_path}/data',
        f'checkpointing.save_dir={tmp_path}/judge'])
    state = M.train_classifier(config)
    assert int(state.step) == 4
    path = f'{tmp_path}/judge/classifier_checkpoints/last'
    assert os.path.isdir(path)
    return str(tmp_path), path


def test_restore_and_predict(judge_ckpt):
    tmp_path, path = judge_ckpt
    config = load_config(CONFIG_DIR, overrides=[
        'mode=train_classifier', '+is_eval_classifier=True', *BASE,
        f'data.cache_dir={tmp_path}/data'])
    clf_apply, clf_params = M.restore_eval_classifier(config, path)
    tokenizer = M.build_tokenizer(config)
    judge = make_eval_classifier(clf_apply, clf_params, tokenizer,
                                 length=32, batch_size=4)
    # 6 texts with batch_size 4 exercises the ragged last batch.
    texts = ['ACGT' * 8, 'GGCC' * 8, 'ATAT' * 8,
             'AAAA' * 8, 'CCCC' * 8, 'TTTT' * 8]
    preds = judge(texts)
    assert len(preds) == len(texts)
    n_classes = int(config.data.num_classes)
    assert all(0 <= p < n_classes for p in preds)
    # Deterministic: same inputs -> same predictions.
    assert preds == judge(texts)


def test_judge_drives_species_eval(judge_ckpt):
    tmp_path, path = judge_ckpt
    config = load_config(CONFIG_DIR, overrides=[
        'mode=train', 'guidance=cfg', *BASE,
        f'data.cache_dir={tmp_path}/data',
        f'checkpointing.save_dir={tmp_path}/diff',
        'trainer.val_check_interval=4',
        'loader.eval_global_batch_size=8',
        'eval.generate_samples=False', 'sampling.steps=2',
        'sampling.use_cache=False'])
    M.train(config)
    tokenizer, spec, apply_fn, state, model_cfg = M._restore_for_eval(
        load_config(CONFIG_DIR, overrides=[
            'mode=ppl_eval', 'guidance=cfg', *BASE,
            f'data.cache_dir={tmp_path}/data',
            f'eval.checkpoint_path={tmp_path}/diff/checkpoints/last']))
    clf_apply, clf_params = M.restore_eval_classifier(config, path)
    judge = make_eval_classifier(clf_apply, clf_params, tokenizer,
                                 length=32, batch_size=4)
    from ddg_tpu.samplers import SamplerSpec
    out = ten_species_eval(
        spec, SamplerSpec(steps=2, use_cache=False), apply_fn,
        state.params, tokenizer, num_classes=int(
            config.data.num_classes),
        samples_per_class=2, batch_size=2, length=32,
        eval_classifier=judge)
    assert out['num_samples'] == int(config.data.num_classes) * 2
    assert 'accuracy' in out and 'macro_f1' in out and 'mcc' in out
    assert np.isfinite(out['accuracy'])
