"""End-to-end orchestration tests: tiny text8 MDLM train -> checkpoint
-> resume -> ppl_eval -> sample; classifier training; LCSC merge —
the minimum end-to-end slice of SURVEY §7 step 3, on CPU."""

import os

import jax
import numpy as np
import pytest

from ddg_tpu import main as M
from ddg_tpu.config import load_config

CONFIG_DIR = os.path.join(os.path.dirname(__file__), '..', 'configs')


def _tiny_config(tmp_path, extra=()):
    return load_config(CONFIG_DIR, overrides=[
        'data=text8',
        'parameterization=subs', 'diffusion=absorbing_state',
        'model=tiny',
        'model.hidden_size=32', 'model.cond_dim=16',
        'model.n_blocks=2', 'model.n_heads=2', 'model.length=32',
        'model.dropout=0.0',
        'trainer.precision=fp32',
        'trainer.max_steps=8', 'trainer.val_check_interval=8',
        'trainer.log_every_n_steps=4',
        'loader.global_batch_size=8', 'loader.batch_size=8',
        'loader.eval_global_batch_size=8',
        'trainer.devices=1',
        'sampling.steps=6', 'sampling.num_sample_batches=1',
        'eval.generate_samples=False',
        'optim.lr=1e-3',
        f'data.cache_dir={tmp_path}/data',
        '+data.synthetic=true',
        f'checkpointing.save_dir={tmp_path}/run',
        'trainer.limit_val_batches=0.02',
        *extra,
    ])


@pytest.fixture(scope='module')
def trained(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp('e2e')
    config = _tiny_config(tmp_path)
    state = M.train(config)
    return tmp_path, config, state


class TestParallelStrategies:
    def test_train_pp_from_config(self, tmp_path):
        # strategy=pp: GPipe over the DiT blocks from the config
        # surface alone; checkpoints store the stacked layout.
        cfg = _tiny_config(tmp_path, extra=[
            'strategy=pp', 'strategy.pipe_devices=2',
            'strategy.pipe_microbatches=2'])
        state = M.train(cfg)
        assert int(state.step) == 8
        assert 'pipeline_blocks' in state.params
        # ppl_eval restores the stacked checkpoint and unstacks it for
        # the ordinary eval path.
        ecfg = _tiny_config(tmp_path, extra=[
            'strategy=pp', 'strategy.pipe_devices=2',
            'strategy.pipe_microbatches=2', 'mode=ppl_eval',
            f'eval.checkpoint_path={tmp_path}/run/checkpoints/last'])
        ppl = M.ppl_eval(ecfg)
        assert np.isfinite(ppl) and ppl > 1

    def test_train_tp_from_config(self, tmp_path):
        cfg = _tiny_config(tmp_path, extra=[
            'strategy=tp', 'strategy.tensor_devices=2'])
        state = M.train(cfg)
        assert int(state.step) == 8

    def test_train_sp_from_config(self, tmp_path):
        cfg = _tiny_config(tmp_path, extra=[
            'strategy=sp', 'strategy.tensor_devices=2'])
        state = M.train(cfg)
        assert int(state.step) == 8

    def test_train_ring_from_config(self, tmp_path):
        cfg = _tiny_config(tmp_path, extra=[
            'strategy=sp', 'strategy.tensor_devices=2',
            'strategy.tp_mode=ring'])
        state = M.train(cfg)
        assert int(state.step) == 8

    def test_pp_eval_batch_indivisible(self, tmp_path):
        # Regression: eval_batch_size=6 does not divide the pipeline
        # constraint (data axis x pipe_microbatches = 4*2 = 8); the
        # in-train validation at step 8 must round it to the multiple
        # instead of tripping the shard_map trace-time assert and
        # killing the run. dropout>0 also exercises the pipelined
        # dropout RNG path (per-data-shard key folding).
        cfg = _tiny_config(tmp_path, extra=[
            'strategy=pp', 'strategy.pipe_devices=2',
            'strategy.pipe_microbatches=2',
            'loader.eval_global_batch_size=6',
            'model.dropout=0.1'])
        state = M.train(cfg)
        assert int(state.step) == 8

    def test_tp_rejects_unsharded_backbone(self, tmp_path):
        # strategy=tp (tp_mode=heads) shards only DiT names; with any
        # other backbone the tensor axis would replicate work silently
        # — train() must refuse it loudly.
        cfg = load_config(CONFIG_DIR, overrides=[
            'data=text8', 'parameterization=subs',
            'diffusion=absorbing_state',
            'backbone=dimamba', 'model=dimamba',
            'model.length=32', 'model.hidden_size=16',
            'model.n_blocks=1', 'model.dropout=0.0',
            'trainer.precision=fp32', 'trainer.max_steps=2',
            'loader.global_batch_size=8', 'loader.batch_size=8',
            'trainer.devices=1',
            f'data.cache_dir={tmp_path}/data', '+data.synthetic=true',
            f'checkpointing.save_dir={tmp_path}/run',
            'strategy=tp', 'strategy.tensor_devices=2'])
        with pytest.raises(AssertionError, match='shards nothing'):
            M.train(cfg)


class TestTrainE2E:
    def test_train_runs_and_checkpoints(self, trained):
        tmp_path, config, state = trained
        assert int(state.step) == 8
        assert os.path.isdir(f'{tmp_path}/run/checkpoints/last')
        assert os.path.exists(f'{tmp_path}/run/metrics.jsonl')
        import json
        lines = [json.loads(l) for l in
                 open(f'{tmp_path}/run/metrics.jsonl')]
        assert any('trainer/loss' in l for l in lines)
        assert any('val/ppl' in l for l in lines)

    def test_train_loader_feeds_global_batch(self, tmp_path,
                                             monkeypatch):
        """Multi-device parity: the train loader must yield
        loader.global_batch_size rows per optimizer step. The config
        resolvers compute PER-RANK batch_size/accumulate (Lightning
        DDP math, reference configs/config.yaml:30-33,107); sizing
        the single-process loader batch_size*accum would shrink the
        effective global batch by the data-parallel world size."""
        captured = {}
        real = M.FaultTolerantLoader

        class Rec(real):
            def __init__(self, data, batch_size, **kw):
                # First construction only: train() builds the train
                # loader before the validation loader, and the val
                # loader's (tiny) batch must not overwrite the capture.
                captured.setdefault('rows', batch_size)
                super().__init__(data, batch_size, **kw)

        monkeypatch.setattr(M, 'FaultTolerantLoader', Rec)
        # Simulate the 8-device resolver default: per-rank batch 2,
        # accum 1 — the global step batch must still be 16.
        cfg = _tiny_config(tmp_path, extra=[
            'trainer.devices=8', 'loader.global_batch_size=16',
            'loader.batch_size=2', 'trainer.max_steps=1',
            'trainer.val_check_interval=10'])
        M.train(cfg)
        assert captured['rows'] == 16

    def test_train_rejects_unshardable_micro_batch(self, tmp_path):
        """micro rows must divide the mesh data axis (8 CPU devices
        here): global 16 with accum 8 leaves micro 2 — refused loudly
        instead of failing inside GSPMD."""
        cfg = _tiny_config(tmp_path, extra=[
            'loader.global_batch_size=16', 'loader.batch_size=2',
            'trainer.accumulate_grad_batches=8',
            'trainer.max_steps=1'])
        with pytest.raises(ValueError, match='data axis'):
            M.train(cfg)

    def test_resume_from_checkpoint(self, trained):
        tmp_path, config, _ = trained
        # Raise max_steps: training resumes from step 8 and continues.
        cfg = _tiny_config(tmp_path, extra=['trainer.max_steps=12'])
        state = M.train(cfg)
        assert int(state.step) == 12

    def test_ppl_eval_mode(self, trained):
        tmp_path, config, _ = trained
        cfg = _tiny_config(tmp_path, extra=[
            'mode=ppl_eval',
            f'eval.checkpoint_path={tmp_path}/run/checkpoints/last'])
        ppl = M.ppl_eval(cfg)
        assert np.isfinite(ppl) and ppl > 1

    def test_lengths_eval_mode(self, trained):
        """lengths_eval restores once and evaluates every length; the
        L=32 entry must match a standalone ppl_eval at the train
        length (same checkpoint, same data seed)."""
        tmp_path, config, _ = trained
        cfg = _tiny_config(tmp_path, extra=[
            'mode=lengths_eval',
            f'eval.checkpoint_path={tmp_path}/run/checkpoints/last',
            '+eval.lengths=[16,32]'])
        res = M.lengths_eval(cfg)
        assert set(res) == {16, 32}
        assert all(np.isfinite(v) and v > 1 for v in res.values())
        ref = M.ppl_eval(_tiny_config(tmp_path, extra=[
            'mode=ppl_eval',
            f'eval.checkpoint_path={tmp_path}/run/checkpoints/last']))
        np.testing.assert_allclose(res[32], ref, rtol=1e-5)

    def test_sampling_from_trained(self, trained):
        tmp_path, config, state = trained
        tokenizer = M.build_tokenizer(config)
        spec = M.build_diffusion_spec(config, tokenizer)
        _, _, apply_fn = M.build_model(config, spec)
        out = M.sample(config, spec, apply_fn, state.params,
                       tokenizer=tokenizer)
        assert out.shape == (8, 32)
        texts = tokenizer.batch_decode(np.asarray(out))
        assert len(texts) == 8
        # decoded text8 chars only
        assert all(set(t) <= set('abcdefghijklmnopqrstuvwxyz ')
                   for t in texts)

    def test_sampling_shards_over_mesh(self, trained):
        """main.sample() data-parallels over the device mesh from the
        config surface alone (sampling.shard, default on): output is
        sharded over the 'data' axis and each shard draws independent
        samples."""
        tmp_path, config, state = trained
        tokenizer = M.build_tokenizer(config)
        spec = M.build_diffusion_spec(config, tokenizer)
        _, _, apply_fn = M.build_model(config, spec)
        out = M.sample(config, spec, apply_fn, state.params,
                       tokenizer=tokenizer)
        assert out.shape == (8, 32)
        assert len(out.sharding.device_set) == jax.device_count()
        assert not out.sharding.is_fully_replicated  # P('data')
        rows = {tuple(r) for r in np.asarray(out)}
        assert len(rows) > 1, 'shards produced identical samples'
        # opting out restores the unsharded path (output replicated or
        # single-device, not partitioned over 'data')
        cfg = _tiny_config(tmp_path, extra=['+sampling.shard=False'])
        out2 = M.sample(cfg, spec, apply_fn, state.params,
                        tokenizer=tokenizer)
        assert (out2.sharding.is_fully_replicated
                or len(out2.sharding.device_set) == 1)

    def test_sample_mode_first_hitting(self, trained):
        """mode=sample with sampling.first_hitting=True reaches the
        event-driven sampler (+ per-position head) from the config
        surface alone."""
        tmp_path, config, _ = trained
        cfg = _tiny_config(tmp_path, extra=[
            'mode=sample', 'sampling.first_hitting=True',
            'sampling.num_sample_batches=1',
            f'eval.checkpoint_path={tmp_path}/run/checkpoints/last',
            f'+eval.generated_samples_path={tmp_path}/samples.json'])
        result = M.sample_eval(cfg)
        assert len(result['samples']) == 8
        assert os.path.exists(f'{tmp_path}/samples.json')
        # fully decoded: text8 chars only, no mask/special residue
        assert all(set(t) <= set('abcdefghijklmnopqrstuvwxyz ')
                   for t in result['samples'])

    def test_sampler_spec_fast_paths_from_config(self, tmp_path):
        cfg = _tiny_config(tmp_path, extra=[
            'sampling.first_hitting=True', 'sampling.fused=True'])
        spec = M.build_sampler_spec(cfg)
        assert spec.first_hitting and spec.fused
        spec = M.build_sampler_spec(_tiny_config(tmp_path))
        # fused defaults ON (validated + auto-fallback off-TPU);
        # first_hitting stays opt-in (changes the NFE schedule).
        assert not spec.first_hitting and spec.fused


class TestSpecBuilders:
    def test_vocab_mask_added_for_text8(self, tmp_path):
        config = _tiny_config(tmp_path)
        tokenizer = M.build_tokenizer(config)
        spec = M.build_diffusion_spec(config, tokenizer)
        # text8 tokenizer HAS a mask token at id 4 -> reused, not added.
        assert spec.mask_index == 4
        assert spec.vocab_size == 35

    def test_vocab_mask_added_for_qm9(self, tmp_path):
        config = load_config(CONFIG_DIR, overrides=[
            'data=qm9', 'diffusion=uniform', 'parameterization=d3pm',
            'time_conditioning=True', 'zero_recon_loss=True'])
        tokenizer = M.build_tokenizer(config)
        spec = M.build_diffusion_spec(config, tokenizer)
        assert spec.mask_index == 2  # <mask> at 2
        assert spec.vocab_size == 35
        assert spec.num_classes == 2

    def test_udlm_spec(self, tmp_path):
        config = _tiny_config(tmp_path, extra=[
            'diffusion=uniform', 'parameterization=d3pm',
            'time_conditioning=True', 'zero_recon_loss=True'])
        tokenizer = M.build_tokenizer(config)
        spec = M.build_diffusion_spec(config, tokenizer)
        assert spec.zero_recon_loss and spec.time_conditioning


class TestClassifierE2E:
    def test_train_classifier_qm9_synthetic(self, tmp_path):
        config = load_config(CONFIG_DIR, overrides=[
            'mode=train_classifier', 'data=qm9',
            'classifier_model=tiny-classifier',
            'classifier_model.hidden_size=32',
            'classifier_model.cond_dim=16',
            'classifier_model.n_blocks=2',
            'classifier_model.n_heads=2',
            'classifier_model.dropout=0.0',
            'diffusion=uniform', 'parameterization=d3pm',
            'time_conditioning=True',
            'model.length=16', 'classifier_model.length=16',
            'trainer.precision=fp32',
            'trainer.max_steps=4', 'trainer.log_every_n_steps=2',
            'loader.global_batch_size=8', 'loader.batch_size=8',
            'trainer.devices=1',
            f'data.cache_dir={tmp_path}/data', '+data.synthetic=true',
            f'checkpointing.save_dir={tmp_path}/clf',
        ])
        state = M.train_classifier(config)
        assert int(state.step) == 4
        assert os.path.isdir(f'{tmp_path}/clf/classifier_checkpoints/last')

    def test_train_eval_classifier_hyenadna(self, tmp_path):
        """Species10 eval-classifier protocol backbone (reference
        classifier.py:166-178 builds HyenaDNA from_config with
        pretrained=False; ours is the native flax implementation)."""
        config = load_config(CONFIG_DIR, overrides=[
            'mode=train_classifier', '+is_eval_classifier=True',
            'data=ten_species', 'backbone=dimamba', 'model=dimamba',
            'model.length=32',
            'classifier_backbone=hyenadna',
            'classifier_model=hyenadna-classifier',
            'classifier_model.d_model=16',
            'classifier_model.n_layer=2',
            'classifier_model.d_inner=64',
            'classifier_model.filter_order=8',
            'classifier_model.length=32',
            'classifier_model.max_seq_len=66',
            'trainer.precision=fp32',
            'trainer.max_steps=3', 'trainer.log_every_n_steps=2',
            'loader.global_batch_size=4', 'loader.batch_size=4',
            'trainer.devices=1',
            f'data.cache_dir={tmp_path}/data', '+data.synthetic=true',
            f'checkpointing.save_dir={tmp_path}/judge',
        ])
        state = M.train_classifier(config)
        assert int(state.step) == 3
        assert os.path.isdir(
            f'{tmp_path}/judge/classifier_checkpoints/last')


class TestGuidedSamplingCLI:
    """Classifier-guided sampling reachable from the config surface
    (reference diffusion.py:1056-1068 loads
    guidance.classifier_checkpoint_path)."""

    QM9 = [
        'data=qm9', 'diffusion=uniform', 'parameterization=d3pm',
        'time_conditioning=True', 'zero_recon_loss=True',
        'model=tiny', 'model.hidden_size=32', 'model.cond_dim=16',
        'model.n_blocks=2', 'model.n_heads=2', 'model.length=16',
        'model.dropout=0.0',
        'classifier_model=tiny-classifier',
        'classifier_model.hidden_size=32',
        'classifier_model.cond_dim=16', 'classifier_model.n_blocks=2',
        'classifier_model.n_heads=2', 'classifier_model.dropout=0.0',
        'classifier_model.length=16',
        'trainer.precision=fp32', 'trainer.max_steps=4',
        'trainer.val_check_interval=4', 'trainer.log_every_n_steps=2',
        'loader.global_batch_size=8', 'loader.batch_size=8',
        'loader.eval_global_batch_size=8', 'trainer.devices=1',
        'sampling.steps=4', 'sampling.num_sample_batches=1',
        'eval.generate_samples=False', '+data.synthetic=true',
    ]

    @pytest.fixture(scope='class')
    def qm9_trained(self, tmp_path_factory):
        tmp_path = tmp_path_factory.mktemp('guided')
        base = self.QM9 + [f'data.cache_dir={tmp_path}/data',
                           f'checkpointing.save_dir={tmp_path}/run']
        M.train(load_config(CONFIG_DIR, overrides=['mode=train'] + base))
        M.train_classifier(load_config(
            CONFIG_DIR, overrides=['mode=train_classifier'] + base))
        return tmp_path, base

    def _sample_cfg(self, tmp_path, base, extra):
        clf = f'{tmp_path}/run/classifier_checkpoints/last'
        return load_config(CONFIG_DIR, overrides=[
            'mode=sample', *base,
            f'eval.checkpoint_path={tmp_path}/run/checkpoints/last',
            f'guidance.classifier_checkpoint_path={clf}', *extra])

    def test_cbg_exact_from_config(self, qm9_trained):
        tmp_path, base = qm9_trained
        cfg = self._sample_cfg(tmp_path, base,
                               ['guidance=cbg', 'guidance.gamma=2.0',
                                'guidance.condition=1'])
        result = M.sample_eval(cfg)
        assert len(result['samples']) == 8

    def test_nos_from_config(self, qm9_trained):
        tmp_path, base = qm9_trained
        cfg = self._sample_cfg(tmp_path, base,
                               ['guidance=nos',
                                'guidance.condition=1'])
        result = M.sample_eval(cfg)
        assert len(result['samples']) == 8


class TestPplEvalAll:
    """mode=ppl_eval_all: per-family config surgery + variant sweep
    (reference main.py:327-396) over three tiny trained checkpoints."""

    FAMILIES = {
        'qm9-ar': ['parameterization=ar', 'diffusion=absorbing_state',
                   'time_conditioning=False', 'zero_recon_loss=False'],
        'qm9-mdlm': ['parameterization=subs',
                     'diffusion=absorbing_state',
                     'time_conditioning=False',
                     'zero_recon_loss=False'],
        'qm9-udlm': ['parameterization=d3pm', 'diffusion=uniform',
                     'time_conditioning=True', 'zero_recon_loss=True'],
    }

    @pytest.mark.slow
    def test_three_family_sweep(self, tmp_path):
        base = [
            'data=qm9', 'model=tiny',
            'model.hidden_size=32', 'model.cond_dim=16',
            'model.n_blocks=2', 'model.n_heads=2', 'model.length=16',
            'model.dropout=0.0', 'trainer.precision=fp32',
            'trainer.max_steps=2', 'trainer.val_check_interval=2',
            'trainer.log_every_n_steps=2', 'training.guidance=null',
            'loader.global_batch_size=8', 'loader.batch_size=8',
            'loader.eval_global_batch_size=8', 'trainer.devices=1',
            'eval.generate_samples=False', '+data.synthetic=true',
            f'data.cache_dir={tmp_path}/data',
            'trainer.limit_val_batches=0.02',
        ]
        for name, fam in self.FAMILIES.items():
            cfg = load_config(CONFIG_DIR, overrides=[
                'mode=train', *base, *fam,
                f'checkpointing.save_dir={tmp_path}/models/{name}'])
            M.train(cfg)
        cfg = load_config(CONFIG_DIR, overrides=[
            'mode=ppl_eval_all', *base,
            'eval.low_confidence_sampling=True',
            'eval.argmax_sampling=True',
            f'+eval.models_root={tmp_path}/models',
            'loader.eval_batch_size=8'])
        results = M.ppl_eval_all(cfg)
        assert set(results) == set(self.FAMILIES)
        for name, per in results.items():
            assert set(per) == {'standard', 'low_confidence', 'argmax'}
            for v, ppl in per.items():
                assert isinstance(ppl, float) and np.isfinite(ppl), \
                    f'{name}/{v}: {ppl}'


class TestLCSC:
    @pytest.mark.slow
    def test_lcsc_mode_from_config(self, tmp_path):
        """mode=lcsc end-to-end: the train loop writes the step-N
        snapshot trail (checkpointing.snapshot_every_n_steps; the
        reference's every-n-steps callback with save_top_k=-1), and
        the search runs PPL fitness over it and saves lcsc-merged
        (reference main.py:110-183). The initial population contains
        the zero vector, so best_score <= PPL(theta_0)."""
        cfg = _tiny_config(tmp_path, extra=(
            'checkpointing.snapshot_every_n_steps=2',))
        M.train(cfg)
        from ddg_tpu.runtime.checkpoint import CheckpointManager
        mgr = CheckpointManager(f'{tmp_path}/run/checkpoints')
        snaps = mgr.list_snapshots()
        assert len(snaps) >= 3, snaps
        lcfg = _tiny_config(tmp_path, extra=(
            'mode=lcsc',
            f'eval.checkpoint_path={tmp_path}/run/checkpoints/last',
            '+lcsc.metric=ppl', '+lcsc.fitness_batches=2',
            '+lcsc.population_size=4', '+lcsc.iterations=2',
            '+lcsc.offspring_per_iter=4'))
        res = M.lcsc_search(lcfg)
        assert len(res['alphas']) == len(snaps) - 1
        assert np.isfinite(res['score'])
        assert os.path.isdir(f'{tmp_path}/run/checkpoints/lcsc-merged')
        # Searching cannot do worse than theta_0 alone (zero vector is
        # candidate #0): re-evaluate theta_0's fitness and compare.
        tokenizer = M.build_tokenizer(lcfg)
        spec = M.build_diffusion_spec(lcfg, tokenizer)
        _, _, apply_fn, state, _ = M._restore_for_eval(lcfg)
        st0, _ = mgr.restore(f'step-{snaps[0]}', state)
        import dataclasses as _dc
        from ddg_tpu.runtime.averaging import averaged_params
        base_st = _dc.replace(
            state, params=averaged_params(st0.averaging, st0.params),
            averaging=None)
        data = M.build_data(lcfg)
        m0 = M.validate(lcfg, spec, apply_fn, base_st, data['valid'],
                        rng=jax.random.PRNGKey(int(lcfg.seed)),
                        max_batches=2)
        assert res['score'] <= m0.ppl * 1.0001

    @pytest.mark.slow
    def test_lcsc_beats_best_single_checkpoint(self, tmp_path):
        """Fidelity: on a snapshot trail with KNOWN quality ordering
        (training on synthetic text8 steadily improves val PPL), the
        evolutionary search over full-validation PPL returns a merge at
        least as good as the best single checkpoint — i.e. the search
        optimizes what it claims (reference lcsc.py:94-195 runs full
        validation per candidate; fitness_batches=0 = full here)."""
        cfg = _tiny_config(tmp_path, extra=(
            'trainer.max_steps=24', 'trainer.val_check_interval=24',
            'checkpointing.snapshot_every_n_steps=4',))
        M.train(cfg)
        from ddg_tpu.runtime.checkpoint import CheckpointManager
        mgr = CheckpointManager(f'{tmp_path}/run/checkpoints')
        snaps = mgr.list_snapshots()
        assert len(snaps) >= 5, snaps

        lcfg = _tiny_config(tmp_path, extra=(
            'mode=lcsc', 'trainer.max_steps=24',
            f'eval.checkpoint_path={tmp_path}/run/checkpoints/last',
            '+lcsc.metric=ppl', '+lcsc.fitness_batches=0',  # full val
            '+lcsc.population_size=6', '+lcsc.iterations=4',
            '+lcsc.offspring_per_iter=6'))

        # Individual full-validation PPL per snapshot: establishes the
        # known ordering (later checkpoints better) and the bar.
        import dataclasses as _dc

        from ddg_tpu.runtime.averaging import averaged_params
        tokenizer = M.build_tokenizer(lcfg)
        spec = M.build_diffusion_spec(lcfg, tokenizer)
        _, _, apply_fn, state, _ = M._restore_for_eval(lcfg)
        data = M.build_data(lcfg)
        singles = []
        for s in snaps:
            st, _ = mgr.restore(f'step-{s}', state)
            stp = _dc.replace(
                state, params=averaged_params(st.averaging, st.params),
                averaging=None)
            m = M.validate(lcfg, spec, apply_fn, stp, data['valid'],
                           rng=jax.random.PRNGKey(int(lcfg.seed)))
            singles.append(m.ppl)
        # training made progress: last snapshot beats the first
        assert singles[-1] < singles[0], singles

        res = M.lcsc_search(lcfg)
        best_single = min(singles)
        assert res['score'] <= best_single * 1.0005, (
            f'LCSC merge {res["score"]} worse than best single '
            f'checkpoint {best_single} (singles: {singles})')

    def test_combine_and_search(self):
        from ddg_tpu.lcsc import combine_checkpoints_diff, run_lcsc
        import jax.numpy as jnp
        trees = [{'w': jnp.full((3,), float(i))} for i in range(4)]
        merged = combine_checkpoints_diff(trees, [1.0, 0.0, 0.0])
        np.testing.assert_allclose(np.asarray(merged['w']), 1.0)
        merged = combine_checkpoints_diff(trees, [0.5, 0.25, 0.25])
        # 0 + .5*1 + .25*2 + .25*3 = 1.75
        np.testing.assert_allclose(np.asarray(merged['w']), 1.75)

        # Search recovers weights minimizing distance to target 2.0.
        def fitness(alphas):
            m = combine_checkpoints_diff(trees, alphas)
            return float(abs(float(m['w'][0]) - 2.0))

        best, score = run_lcsc(num_checkpoints=4, fitness=fitness,
                               population_size=6, iterations=5,
                               offspring_per_iter=6, seed=0,
                               log=lambda *_: None)
        assert score < 0.2


class TestARFudgeAndGenPPL:
    """AR-family config surface: FUDGE-guided AR sampling from
    checkpoints (reference diffusion.py:1056-1068 + _ar_fudge_denoise)
    and mode=gen_ppl_eval with the offline AR judge
    (eval.ar_judge_checkpoint_path; the reference's gpt2-large
    protocol, main.py:253-305, needs hub assets)."""

    BASE = [
        'data=qm9', 'model=tiny',
        'model.hidden_size=32', 'model.cond_dim=16',
        'model.n_blocks=2', 'model.n_heads=2', 'model.length=16',
        'model.dropout=0.0',
        'classifier_model=tiny-classifier',
        'classifier_model.hidden_size=32',
        'classifier_model.cond_dim=16', 'classifier_model.n_blocks=2',
        'classifier_model.n_heads=2', 'classifier_model.dropout=0.0',
        'classifier_model.length=16',
        'trainer.precision=fp32', 'trainer.max_steps=4',
        'trainer.val_check_interval=4', 'trainer.log_every_n_steps=2',
        'loader.global_batch_size=8', 'loader.batch_size=8',
        'loader.eval_global_batch_size=8', 'trainer.devices=1',
        'sampling.steps=4', 'sampling.num_sample_batches=1',
        'sampling.batch_size=4',
        'eval.generate_samples=False', '+data.synthetic=true',
    ]
    AR = ['diffusion=absorbing_state', 'parameterization=ar', 'T=0',
          'time_conditioning=False']
    MDLM = ['diffusion=absorbing_state', 'parameterization=subs',
            'T=0', 'time_conditioning=False']

    @pytest.fixture(scope='class')
    def trained(self, tmp_path_factory):
        tmp_path = tmp_path_factory.mktemp('ar_fudge')
        common = [f'data.cache_dir={tmp_path}/data']
        M.train(load_config(CONFIG_DIR, overrides=[
            'mode=train', *self.BASE, *self.AR, *common,
            f'checkpointing.save_dir={tmp_path}/ar']))
        M.train(load_config(CONFIG_DIR, overrides=[
            'mode=train', *self.BASE, *self.MDLM, *common,
            f'checkpointing.save_dir={tmp_path}/mdlm']))
        M.train_classifier(load_config(CONFIG_DIR, overrides=[
            'mode=train_classifier', *self.BASE, *self.AR, *common,
            '+is_fudge_classifier=True',
            'classifier_model.pooling=no_pooling',
            f'checkpointing.save_dir={tmp_path}/ar']))
        return tmp_path, common

    def test_fudge_from_config(self, trained):
        tmp_path, common = trained
        cfg = load_config(CONFIG_DIR, overrides=[
            'mode=sample', *self.BASE, *self.AR, *common,
            'guidance=fudge', 'guidance.condition=1',
            'classifier_model.pooling=no_pooling',
            f'eval.checkpoint_path={tmp_path}/ar/checkpoints/last',
            f'guidance.classifier_checkpoint_path='
            f'{tmp_path}/ar/classifier_checkpoints/last'])
        result = M.sample_eval(cfg)
        assert len(result['samples']) == 4

    def test_gen_ppl_with_ar_judge(self, trained):
        tmp_path, common = trained
        cfg = load_config(CONFIG_DIR, overrides=[
            'mode=gen_ppl_eval', *self.BASE, *self.MDLM, *common,
            f'eval.checkpoint_path={tmp_path}/mdlm/checkpoints/last',
            f'+eval.ar_judge_checkpoint_path='
            f'{tmp_path}/ar/checkpoints/last'])
        result = M.gen_ppl_eval(cfg)
        assert np.isfinite(result['unigram_entropy'])
        assert np.isfinite(result['generative_ppl_ar_judge'])
        assert result['generative_ppl_ar_judge'] > 0


class TestAttentionKnobSurface:
    """model.{pallas_attention,fused_rope_attn,tpu_flash_attn} reach
    DITConfig from YAML/CLI (the in-tree TPU flash kernel has no
    interpret mode, so only the plumbing is testable on CPU; on-chip
    numerics + A/B: scripts/bench_attention_flash.py --check)."""

    def test_knobs_reach_dit_config(self, tmp_path):
        config = _tiny_config(tmp_path, extra=(
            '+model.tpu_flash_attn=True', '+model.pallas_attention=False'))
        from ddg_tpu.data.tokenizers import get_tokenizer
        tok = get_tokenizer('text8')
        spec = M.build_diffusion_spec(config, tok)
        _, mcfg, _ = M.build_model(config, spec)
        assert mcfg.tpu_flash_attn is True
        assert mcfg.pallas_attention is False
        assert mcfg.fused_rope_attn == 'auto'

    def test_default_is_auto(self, tmp_path):
        config = _tiny_config(tmp_path)
        from ddg_tpu.data.tokenizers import get_tokenizer
        tok = get_tokenizer('text8')
        spec = M.build_diffusion_spec(config, tok)
        _, mcfg, _ = M.build_model(config, spec)
        assert mcfg.tpu_flash_attn == 'auto'
        assert mcfg.attn_probs_bf16 == 'auto'
        assert mcfg.attn_remat == 'auto'

    def test_attn_bf16_knobs_reach_config_and_match(self, tmp_path):
        """attn_probs_bf16/attn_remat reach DITConfig from CLI, and the
        einsum attention path produces logits matching the XLA path
        (bf16 probs cost ~1e-3 relative; remat is bit-exact fwd)."""
        import dataclasses

        import jax
        import jax.numpy as jnp

        config = _tiny_config(tmp_path, extra=(
            '+model.attn_probs_bf16=True', '+model.attn_remat=True'))
        from ddg_tpu.data.tokenizers import get_tokenizer
        tok = get_tokenizer('text8')
        spec = M.build_diffusion_spec(config, tok)
        model, mcfg, apply_fn = M.build_model(config, spec)
        assert mcfg.attn_probs_bf16 is True
        assert mcfg.attn_remat is True

        rng = jax.random.PRNGKey(0)
        x = jax.random.randint(rng, (2, mcfg.length), 0,
                               mcfg.vocab_size - 1)
        sigma = jnp.full((2,), 0.5)
        params = model.init(rng, x, sigma)['params']
        out_einsum = apply_fn(params, x, sigma, train=False)

        from ddg_tpu.models import DIT
        base = DIT(dataclasses.replace(mcfg, attn_probs_bf16=False,
                                       attn_remat=False))
        out_xla = base.apply({'params': params}, x, sigma, train=False)
        err = float(jnp.max(jnp.abs(out_einsum - out_xla)))
        scale = float(jnp.max(jnp.abs(out_xla))) + 1e-9
        assert err / scale < 2e-2, f'einsum vs xla logits: {err / scale}'
