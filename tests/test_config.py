"""Config engine tests: composition, interpolation, resolvers,
overrides — exercising the same public API shapes as the reference's
Hydra configs."""

import os

import pytest

from ddg_tpu.config import Config, load_config

CONFIG_DIR = os.path.join(os.path.dirname(__file__), '..', 'configs')


def test_root_composition():
    cfg = load_config(CONFIG_DIR)
    assert cfg.mode == 'train'
    assert cfg.diffusion == 'absorbing_state'
    assert cfg.parameterization == 'subs'
    assert cfg.noise.type == 'loglinear'
    assert cfg.data.train == 'lm1b'
    assert cfg.model.hidden_size == 768
    assert cfg.weights_averaging.type == 'ema'
    assert cfg.guidance is None
    assert cfg.classifier_model is None


def test_derived_batch_math():
    cfg = load_config(CONFIG_DIR, overrides=[
        'trainer.devices=4', 'loader.global_batch_size=512',
        'loader.batch_size=64'])
    # accumulate = div_up(512, 4 * 64 * 1) = 2
    assert cfg.trainer.accumulate_grad_batches == 2


def test_group_override():
    cfg = load_config(CONFIG_DIR, overrides=[
        'data=text8', 'model=tiny', 'noise=linear',
        'weights_averaging=none'])
    assert cfg.data.train == 'text8'
    assert cfg.model.hidden_size == 512
    assert cfg.noise.type == 'linear'
    assert cfg.weights_averaging.type == 'none'


def test_guidance_group_and_add_override():
    cfg = load_config(CONFIG_DIR, overrides=[
        'guidance=cfg', 'guidance.gamma=3.0', '+guidance.extra=7'])
    assert cfg.guidance.method == 'cfg'
    assert cfg.guidance.gamma == 3.0
    assert cfg.guidance.extra == 7


def test_udlm_recipe_overrides():
    # The README's UDLM recipe as CLI overrides.
    cfg = load_config(CONFIG_DIR, overrides=[
        'diffusion=uniform', 'parameterization=d3pm',
        'time_conditioning=True', 'zero_recon_loss=True', 'T=0'])
    assert cfg.diffusion == 'uniform'
    assert cfg.zero_recon_loss is True


def test_unknown_override_raises():
    with pytest.raises(KeyError):
        load_config(CONFIG_DIR, overrides=['nonexistent.key=1'])
    # but +key adds it
    cfg = load_config(CONFIG_DIR, overrides=['+brand_new.key=1'])
    assert cfg.brand_new.key == 1


def test_relative_interpolation():
    cfg = load_config(CONFIG_DIR)
    assert (cfg.loader.eval_global_batch_size
            == cfg.loader.global_batch_size)


def test_resolvers():
    cfg = Config({'a': '${eval:2 * 3}', 'b': '${div_up:7, 2}',
                  'c': '${if_then_else:${.a}, 1, 2}',
                  'd': 'prefix-${.b}'})
    assert cfg.a == 6
    assert cfg.b == 4
    assert cfg.c == 1
    assert cfg.d == 'prefix-4'


def test_classifier_model_group():
    cfg = load_config(CONFIG_DIR, overrides=[
        'classifier_model=tiny-classifier', 'data=qm9'])
    assert cfg.classifier_model.hidden_size == 512
    assert cfg.classifier_model.num_classes == cfg.data.num_classes == 2
    # length interpolates from the diffusion model config
    assert cfg.classifier_model.length == cfg.model.length


def test_strategy_groups():
    ddp = load_config(CONFIG_DIR)
    assert ddp.strategy.name == 'data_parallel'
    fsdp = load_config(CONFIG_DIR, overrides=['strategy=fsdp'])
    assert fsdp.strategy.name == 'fsdp'


def test_pretty_dump_roundtrip():
    cfg = load_config(CONFIG_DIR, overrides=['data=text8'])
    import yaml
    d = yaml.safe_load(cfg.pretty())
    assert d['data']['train'] == 'text8'
