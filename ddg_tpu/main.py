"""Entry-point orchestration: config -> specs -> train / eval / sample.

Mode dispatch parity with the reference's `main.py`
(/root/reference/main.py:399-435): train, train_classifier, ppl_eval,
gen_ppl_eval, lengths_eval, ppl_eval_all, lcsc, plus `sample` (the
reference reaches sampling through eval modes).

Run as:  python -m ddg_tpu.main mode=train data=text8 model=tiny ...
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ddg_tpu.classifier import ClassifierSpec, make_classifier_train_step
from ddg_tpu.config import Config, load_config
from ddg_tpu.data import datasets as D
from ddg_tpu.data.loader import FaultTolerantLoader, prefetch_to_device
from ddg_tpu.data.tokenizers import get_tokenizer
from ddg_tpu.diffusion import DiffusionSpec
from ddg_tpu.eval_utils import (MeanMetric, compute_ppl,
                                unigram_entropy)
from ddg_tpu.models import (DIT, DITClassifier, DITConfig, jit_init,
                            make_classifier_apply, make_model_apply)
from ddg_tpu.ops.noise_schedules import get_noise
from ddg_tpu.parallel import mesh as mesh_lib
from ddg_tpu.runtime.averaging import AveragingSpec, averaged_params
from ddg_tpu.runtime.checkpoint import CheckpointManager
from ddg_tpu.runtime.optim import OptimSpec
from ddg_tpu.runtime.train_state import (init_train_state, make_eval_step,
                                         make_train_step)
from ddg_tpu.samplers import (GuidanceSpec, SamplerSpec, ar_sample,
                              diffusion_sample)
from ddg_tpu.utils import MetricsLogger, get_logger

LOGGER = get_logger(__name__)


# ---------------------------------------------------------------------------
# Builders: Config -> specs / modules / data
# ---------------------------------------------------------------------------

def _dataset_name(config: Config) -> str:
    """cifar10's data.train/valid are local *paths* in the reference
    (configs/data/cifar10.yaml `???`); detect it via the raw_pixels
    tokenizer instead of the name."""
    if config.data.get('tokenizer_name_or_path') == 'raw_pixels':
        return 'cifar10'
    return config.data.train


def build_tokenizer(config: Config):
    return get_tokenizer(_dataset_name(config),
                         config.data.get('tokenizer_name_or_path'))


def effective_vocab(config: Config, tokenizer) -> Tuple[int, int]:
    """(vocab_size, mask_index) with the reference's mask-token rules
    (diffusion.py:87-95)."""
    vocab_size = tokenizer.vocab_size
    if config.get('is_vision', False):
        mask_index = tokenizer.mask_token_id
        if mask_index is None:
            mask_index = -1
    elif tokenizer.mask_token_id is None:
        mask_index = vocab_size
        vocab_size += 1
    else:
        mask_index = tokenizer.mask_token_id
    return vocab_size, mask_index


def build_noise(config: Config):
    return get_noise(config.noise.type,
                     sigma_min=float(config.noise.get('sigma_min', 1e-4)),
                     sigma_max=float(config.noise.get('sigma_max', 20)))


def build_diffusion_spec(config: Config, tokenizer) -> DiffusionSpec:
    vocab_size, mask_index = effective_vocab(config, tokenizer)
    tg = config.training.get('guidance')
    num_classes = config.data.get('num_classes')
    return DiffusionSpec(
        diffusion=config.diffusion,
        parameterization=config.parameterization,
        noise=build_noise(config),
        vocab_size=vocab_size,
        mask_index=mask_index,
        T=int(config.T),
        time_conditioning=bool(config.time_conditioning),
        subs_masking=bool(config.subs_masking),
        sampling_eps=float(config.training.sampling_eps),
        antithetic_sampling=bool(config.training.antithetic_sampling),
        importance_sampling=bool(config.training.importance_sampling),
        change_of_variables=bool(config.training.change_of_variables),
        label_smoothing=float(config.training.label_smoothing),
        zero_recon_loss=bool(config.get('zero_recon_loss', False)),
        use_simple_ce_loss=bool(config.training.use_simple_ce_loss),
        compute_loss_on_pad_tokens=bool(
            config.training.compute_loss_on_pad_tokens),
        cond_dropout=(float(tg.cond_dropout) if tg is not None else 0.0),
        num_classes=num_classes,
        unrolling=bool(config.training.unrolling),
        unrolling_steps=int(config.training.unrolling_steps),
        unrolling_weight=float(config.training.unrolling_weight),
        unrolling_ignore_diffusion_loss=bool(
            config.training.unrolling_ignore_diffusion_loss),
        noise_schedule_warmup=bool(
            config.training.noise_schedule_warmup),
        noise_schedule_warmup_fraction=float(
            config.training.noise_schedule_warmup_fraction),
        noise_schedule_uniform_warmup=bool(
            config.training.get('noise_schedule_uniform', False)),
        max_steps=int(config.trainer.max_steps),
    )


def _wants_cond(config: Config) -> bool:
    """Conditioning is active when guidance is configured AND the
    dataset carries labels (the reference requires
    `training.guidance=null` on unconditional datasets,
    diffusion.py:846-857)."""
    if config.data.get('label_col') is None \
            and config.data.get('num_classes') is None:
        return False
    tg = config.training.get('guidance')
    g = config.get('guidance')
    return ((tg is not None)
            or (g is not None and g.get('method') == 'cfg'))


def build_model(config: Config, spec: DiffusionSpec, *,
                model_cfg_key: str = 'model'):
    mc = config[model_cfg_key]
    backbone = config.backbone
    num_classes = (config.data.get('num_classes')
                   if _wants_cond(config) else None)
    if backbone in ('dit', 'hf_dit'):
        cfg = DITConfig(
            hidden_size=int(mc.hidden_size),
            cond_dim=int(mc.cond_dim),
            length=int(mc.length),
            n_blocks=int(mc.n_blocks),
            n_heads=int(mc.n_heads),
            dropout=float(mc.dropout),
            vocab_size=spec.vocab_size,
            causal=spec.parameterization == 'ar',
            use_adaLN=(spec.parameterization != 'ar'
                       or num_classes is not None),
            num_classes=num_classes,
            compute_dtype=(jnp.bfloat16
                           if str(config.trainer.precision) == 'bf16'
                           else jnp.float32),
            pallas_attention=mc.get('pallas_attention', 'auto'),
            fused_rope_attn=mc.get('fused_rope_attn', 'auto'),
            tpu_flash_attn=mc.get('tpu_flash_attn', 'auto'),
            attn_probs_bf16=mc.get('attn_probs_bf16', 'auto'),
            attn_remat=mc.get('attn_remat', 'auto'),
            quant_int8=bool(mc.get('quant_int8', False)),
            tensor_axis=('tensor' if _tensor_devices(config) > 1
                         else None),
            tp_mode=_tp_mode(config))
        model = DIT(cfg)
        return model, cfg, make_model_apply(model)
    if backbone == 'dimamba':
        from ddg_tpu.models.dimamba import DiMamba, DiMambaConfig
        cfg = DiMambaConfig(
            hidden_size=int(mc.hidden_size),
            cond_dim=int(mc.cond_dim),
            length=int(mc.length),
            n_blocks=int(mc.n_blocks),
            vocab_size=spec.vocab_size,
            num_classes=num_classes,
            bidirectional=bool(mc.get('bidirectional', True)),
            bidirectional_strategy=mc.get('bidirectional_strategy',
                                          'add'),
            bidirectional_weight_tie=bool(
                mc.get('bidirectional_weight_tie', True)),
            tie_word_embeddings=bool(
                mc.get('tie_word_embeddings', False)),
            d_state=int(mc.get('d_state', 16)),
            d_conv=int(mc.get('d_conv', 4)),
            expand=int(mc.get('expand', 2)),
            scan_chunk=int(mc.get('scan_chunk', 128)),
            pallas_scan=mc.get('pallas_scan', 'auto'),
            dt_inkernel=bool(mc.get('dt_inkernel', False)),
            remat=bool(mc.get('remat', False)),
            scan_seg=int(mc.get('scan_seg', 64)),
            scan_seg_bwd=int(mc.get('scan_seg_bwd', 64)),
            scan_impl=str(mc.get('scan_impl', 'pps3')),
            dropout=float(mc.get('dropout', 0.1)),
            compute_dtype=(jnp.bfloat16
                           if str(config.trainer.precision) == 'bf16'
                           else jnp.float32),
            sequence_axis=('tensor'
                           if (_tensor_devices(config) > 1
                               and _tp_mode(config) in ('sequence',
                                                        'ring'))
                           else None))
        model = DiMamba(cfg)
        return model, cfg, make_model_apply(model)
    if backbone == 'unet':
        from ddg_tpu.models.unet import UNet, UNetConfig
        cfg = UNetConfig(
            ch=int(mc.ch),
            num_res_blocks=int(mc.num_res_blocks),
            num_scales=int(mc.num_scales),
            ch_mult=tuple(mc.ch_mult),
            input_channels=int(mc.input_channels),
            scale_count_to_put_attn=int(mc.scale_count_to_put_attn),
            dropout=float(mc.dropout),
            skip_rescale=bool(mc.skip_rescale),
            time_scale_factor=int(mc.time_scale_factor),
            time_conditioning=bool(mc.get('time_conditioning', True)),
            fix_logistic=bool(mc.get('fix_logistic', False)),
            vocab_size=spec.vocab_size,
            num_classes=num_classes,
            compute_dtype=(jnp.bfloat16
                           if str(config.trainer.precision) == 'bf16'
                           else jnp.float32))
        model = UNet(cfg)
        return model, cfg, make_model_apply(model)
    raise NotImplementedError(f'Backbone {backbone} not implemented.')


def build_classifier_model(config: Config, spec):
    mc = config.classifier_model
    num_classes = int(mc.num_classes)
    backbone = config.get('classifier_backbone') or mc.get('type', 'ddit')
    is_fudge = bool(config.get('is_fudge_classifier', False))
    pooling = 'no_pooling' if is_fudge else mc.get('pooling', 'mean')
    if backbone in ('dit', 'ddit'):
        cfg = DITConfig(
            hidden_size=int(mc.hidden_size),
            cond_dim=int(mc.cond_dim),
            length=int(mc.length),
            n_blocks=int(mc.n_blocks),
            n_heads=int(mc.n_heads),
            dropout=float(mc.dropout),
            vocab_size=spec.vocab_size,
            causal=spec.parameterization == 'ar',
            use_adaLN=spec.parameterization != 'ar',
            compute_dtype=(jnp.bfloat16
                           if str(config.trainer.precision) == 'bf16'
                           else jnp.float32),
            pallas_attention=mc.get('pallas_attention', 'auto'),
            fused_rope_attn=mc.get('fused_rope_attn', 'auto'),
            tpu_flash_attn=mc.get('tpu_flash_attn', 'auto'),
            attn_probs_bf16=mc.get('attn_probs_bf16', 'auto'),
            attn_remat=mc.get('attn_remat', 'auto'),
            quant_int8=bool(mc.get('quant_int8', False)))
        model = DITClassifier(cfg, num_classes=num_classes,
                              pooling=pooling)
        return model, cfg, make_classifier_apply(model)
    if backbone == 'dimamba':
        from ddg_tpu.models.dimamba import (DiMambaClassifier,
                                            DiMambaConfig)
        cfg = DiMambaConfig(
            hidden_size=int(mc.hidden_size),
            cond_dim=int(mc.cond_dim),
            length=int(mc.length),
            n_blocks=int(mc.n_blocks),
            vocab_size=spec.vocab_size,
            bidirectional=bool(mc.get('bidirectional', True)),
            bidirectional_strategy=mc.get('bidirectional_strategy',
                                          'add'),
            bidirectional_weight_tie=bool(
                mc.get('bidirectional_weight_tie', True)),
            d_state=int(mc.get('d_state', 16)),
            d_conv=int(mc.get('d_conv', 4)),
            expand=int(mc.get('expand', 2)),
            scan_chunk=int(mc.get('scan_chunk', 128)),
            pallas_scan=mc.get('pallas_scan', 'auto'),
            dt_inkernel=bool(mc.get('dt_inkernel', False)),
            remat=bool(mc.get('remat', False)),
            scan_seg=int(mc.get('scan_seg', 64)),
            scan_seg_bwd=int(mc.get('scan_seg_bwd', 64)),
            scan_impl=str(mc.get('scan_impl', 'pps3')),
            dropout=float(mc.get('dropout', 0.1)),
            compute_dtype=(jnp.bfloat16
                           if str(config.trainer.precision) == 'bf16'
                           else jnp.float32))
        model = DiMambaClassifier(cfg, num_classes=num_classes,
                                  pooling=pooling)
        return model, cfg, make_classifier_apply(model)
    if backbone == 'hyenadna':
        # reference classifier.py:166-178: HF remote-code HyenaDNA as
        # the (clean-data) Species10 eval classifier — ours is the
        # native flax implementation, models/hyenadna.py.
        from ddg_tpu.models.hyenadna import (HyenaDNAClassifier,
                                             HyenaDNAConfig)
        cfg = HyenaDNAConfig(
            d_model=int(mc.get('d_model', mc.get('hidden_size', 256))),
            n_layer=int(mc.get('n_layer', 4)),
            d_inner=int(mc.get('d_inner',
                               4 * int(mc.get('d_model',
                                              mc.get('hidden_size',
                                                     256))))),
            vocab_size=spec.vocab_size,
            max_seq_len=int(mc.get('max_seq_len',
                                   2 * int(mc.length) + 2)),
            emb_dim=int(mc.get('emb_dim', 5)),
            filter_order=int(mc.get('filter_order', 64)),
            num_inner_mlps=int(mc.get('num_inner_mlps', 2)),
            embed_dropout=float(mc.get('embed_dropout', 0.1)),
            hyena_dropout=float(mc.get('hyena_dropout', 0.0)),
            compute_dtype=(jnp.bfloat16
                           if str(config.trainer.precision) == 'bf16'
                           else jnp.float32))
        model = HyenaDNAClassifier(
            cfg, num_classes=num_classes,
            pooling=mc.get('pooling', 'last') if not is_fudge
            else 'no_pooling')
        return model, cfg, make_classifier_apply(model)
    raise NotImplementedError(
        f'Classifier backbone {backbone} not implemented.')


def build_data(config: Config, *, synthetic: Optional[bool] = None):
    """Dataset dispatch (reference dataloader.get_dataset,
    dataloader.py:233-343). `synthetic` falls back to
    config.data.synthetic (offline test data)."""
    name = _dataset_name(config)
    cache = os.path.expanduser(str(config.data.get(
        'cache_dir', './data')))
    if synthetic is None:
        synthetic = bool(config.data.get('synthetic', False))
    if name == 'text8':
        msl = int(config.model.length)
        splits = D.load_text8(cache, max_seq_length=msl,
                              synthetic=synthetic)
        return {'train': splits['train'], 'valid': splits['test']}
    if name == 'qm9':
        splits = D.load_qm9(cache, block_size=int(config.model.length),
                            num_classes=int(config.data.num_classes),
                            synthetic=synthetic,
                            label_col=config.data.get('label_col',
                                                      'qed'))
        return {'train': splits['train'], 'valid': splits['test']}
    if name == 'ten_species':
        splits = D.load_ten_species(
            cache, max_length=int(config.model.length),
            synthetic=synthetic)
        return {'train': splits['train'], 'valid': splits['test']}
    if name == 'cifar10':
        splits = D.load_cifar10(cache, synthetic=synthetic)
        return {'train': splits['train'], 'valid': splits['test']}
    if name == 'lm1b':
        tok = build_tokenizer(config)
        splits = D.load_lm1b(cache, tok,
                             block_size=int(config.model.length),
                             synthetic=synthetic)
        # validation split is the held-out carve-out (force_val
        # behavior of the fork, dataloader.py:526-533).
        return {'train': splits['train'],
                'valid': splits['validation']}
    if name == 'amazon_polarity':
        tok = build_tokenizer(config)
        splits = D.load_amazon_polarity(
            cache, tok, block_size=int(config.model.length),
            synthetic=synthetic)
        return {'train': splits['train'], 'valid': splits['test']}
    raise NotImplementedError(f'Dataset {name} not implemented.')


def _tensor_devices(config: Config) -> int:
    """Effective tensor-axis size: the configured tensor_devices capped
    by the visible device count, mirroring build_mesh. Keying model
    sharding annotations off the RAW config value would, on a single
    device, set tensor_axis for a mesh whose tensor axis is 1 — no
    sharding happens, but dit.py would still disable its Pallas/flash
    attention kernels (GSPMD-opaque custom calls) for nothing."""
    st = config.get('strategy')
    if st is None:
        return 1
    n = max(1, int(st.get('tensor_devices', 1) or 1))
    return min(n, jax.device_count())


def _tp_mode(config: Config) -> str:
    st = config.get('strategy')
    if st is None:
        return 'heads'
    mode = str(st.get('tp_mode', 'heads') or 'heads')
    assert mode in ('heads', 'sequence', 'ring'), \
        f'unknown tp_mode {mode!r}'
    return mode


def _pipe_devices(config: Config) -> int:
    st = config.get('strategy')
    if st is None:
        return 1
    return max(1, int(st.get('pipe_devices', 1) or 1))


def build_mesh(config: Config):
    n = jax.device_count()
    fsdp = 1
    if config.get('strategy') is not None \
            and config.strategy.get('name') == 'fsdp':
        fsdp = min(int(config.strategy.get('fsdp_devices', n)), n)
    tensor = min(_tensor_devices(config), n)
    pipe = min(_pipe_devices(config), n)
    return mesh_lib.make_mesh(num_data=n // (fsdp * tensor * pipe),
                              num_fsdp=fsdp, num_tensor=tensor,
                              num_pipe=pipe)


def build_guidance_spec(config: Config) -> Optional[GuidanceSpec]:
    g = config.get('guidance')
    if g is None:
        return None
    return GuidanceSpec(
        method=g.method,
        gamma=float(g.get('gamma', 1.0)),
        condition=int(g.get('condition', 0)),
        use_approx=bool(g.get('use_approx', False)),
        topk=int(g.get('topk', 50)),
        num_nos_steps=int(g.get('num_nos_steps', 1)),
        nos_step_size=float(g.get('nos_step_size', 0.1)),
        nos_stability_coef=float(g.get('nos_stability_coef', 0.01)),
        num_pplm_steps=int(g.get('num_pplm_steps', 1)),
        pplm_step_size=float(g.get('pplm_step_size', 0.1)),
        pplm_stability_coef=float(g.get('pplm_stability_coef', 0.01)))


def build_sampler_spec(config: Config) -> SamplerSpec:
    return SamplerSpec(
        steps=int(config.sampling.steps),
        use_cache=bool(config.sampling.use_cache),
        use_float64=bool(config.sampling.use_float64),
        low_confidence_sampling=bool(
            config.eval.low_confidence_sampling),
        low_confidence_threshold=float(
            config.eval.low_confidence_threshold),
        argmax_sampling=bool(config.eval.argmax_sampling),
        # TPU fast paths (subsume the reference's sampling.use_cache
        # NFE trick, configs/config.yaml sampling group): event-driven
        # first-hitting sampling (exact T->infty limit, L NFEs) and the
        # fused Pallas denoise-step kernel.
        first_hitting=bool(config.sampling.get('first_hitting', False)),
        fused=bool(config.sampling.get('fused', False)),
        fused_head=bool(config.sampling.get('fused_head', False)))


def build_optim_spec(config: Config) -> OptimSpec:
    sched = config.lr_scheduler.get('name', 'constant_warmup')
    return OptimSpec(
        lr=float(config.optim.lr),
        beta1=float(config.optim.beta1),
        beta2=float(config.optim.beta2),
        eps=float(config.optim.eps),
        weight_decay=float(config.optim.weight_decay),
        grad_clip=float(config.trainer.gradient_clip_val),
        scheduler=sched,
        num_warmup_steps=int(config.lr_scheduler.get(
            'num_warmup_steps', 2500)),
        max_steps=int(config.trainer.max_steps))


def build_averaging_spec(config: Config) -> AveragingSpec:
    wa = config.weights_averaging
    if wa.type == 'ema':
        if float(wa.decay) > 0:
            return AveragingSpec.ema(float(wa.decay))
        return AveragingSpec(kind='none')
    if wa.type == 'swa':
        return AveragingSpec.swa(int(config.trainer.max_steps),
                                 float(wa.start_pct),
                                 int(wa.num_snapshots))
    if wa.type == 'none':
        return AveragingSpec(kind='none')
    raise NotImplementedError(
        f'Averaging type {wa.type} not implemented.')


def _ar_shift(batch, bos_id, eos_id):
    """AR input/target shift (reference `_maybe_sub_sample`,
    diffusion.py:698-701) as a host-side transform."""
    x = batch['input_ids']
    return {'input_ids': x[:, :-1], 'output_ids': x[:, 1:],
            'attention_mask': batch['attention_mask'][:, 1:],
            **{k: v for k, v in batch.items()
               if k not in ('input_ids', 'attention_mask')}}


def _prep_batch(config, spec, batch, *, accum: int = 1):
    """Host-side batch prep: label -> cond, AR shift, text8 crop,
    accumulate reshape."""
    out = {'input_ids': batch['input_ids'].astype(np.int32),
           'attention_mask':
               batch['attention_mask'].astype(np.float32)}
    if _wants_cond(config):
        label_col = config.data.get('label_col', 'label')
        if label_col in batch:
            out['cond'] = batch[label_col].astype(np.int32)
        elif 'label' in batch:
            out['cond'] = batch['label'].astype(np.int32)
        else:
            raise RuntimeError(
                f'Conditioning {label_col} not found in batch.')
    if spec.parameterization == 'ar':
        out = _ar_shift(out, None, None)
    if accum > 1:
        out = {k: v.reshape(accum, v.shape[0] // accum, *v.shape[1:])
               for k, v in out.items()}
    return out


def _maybe_crop_text8(config, batch, tokenizer, rng):
    """text8-crop: random 2L -> L crop with BOS/EOS patch (reference
    diffusion.py:682-697)."""
    x = batch['input_ids']
    L = int(config.model.length)
    if x.shape[1] <= L:
        return batch
    start = rng.randint(L)
    inp = x[:, start:start + L].copy()
    inp[:, 0] = tokenizer.bos_token_id
    inp[:, -1] = tokenizer.eos_token_id
    return {**batch, 'input_ids': inp,
            'attention_mask': batch['attention_mask'][:, start:start + L]}


# ---------------------------------------------------------------------------
# Modes
# ---------------------------------------------------------------------------

def train(config: Config, *, max_steps_override: Optional[int] = None):
    tokenizer = build_tokenizer(config)
    spec = build_diffusion_spec(config, tokenizer)
    model, model_cfg, apply_fn = build_model(config, spec)
    data = build_data(config)
    optim_spec = build_optim_spec(config)
    avg_spec = build_averaging_spec(config)
    mesh = build_mesh(config)
    if dict(mesh.shape).get('tensor', 1) > 1:
        # A tensor axis only splits compute where the model shards over
        # it: DiT (all tp_modes) or DiMamba with a sequence axis. Any
        # other combination would silently run `tensor`-fold duplicate
        # work (the axis replicates), so refuse it loudly.
        bb, mode = str(config.backbone), _tp_mode(config)
        assert bb in ('dit', 'hf_dit') or (
            bb == 'dimamba' and mode in ('sequence', 'ring')), (
            f'strategy tensor_devices>1 with backbone={bb} '
            f'tp_mode={mode} shards nothing over the tensor axis '
            '(devices would compute duplicate work); use strategy=dp/'
            'fsdp, or backbone=dit, or backbone=dimamba with '
            'tp_mode=sequence')

    accum = int(config.trainer.accumulate_grad_batches)
    # Rows per optimizer update = loader.global_batch_size, the
    # protocol's source of truth (reference configs/config.yaml:30).
    # The resolver chain batch_size=global/devices,
    # accum=global/(devices*batch_size) is PER-RANK Lightning math
    # (each DDP rank's loader yields batch_size rows,
    # dataloader.py:488-505); this single-process loader feeds the
    # whole mesh, so it must yield the global rows itself — sizing it
    # batch_size*accum would shrink the effective global batch by the
    # data-parallel world size. Multi-host: each process loads its
    # 1/process_count shard.
    global_rows = int(config.loader.global_batch_size)
    n_proc = jax.process_count()
    if global_rows % (n_proc * accum) != 0:
        raise ValueError(
            f'loader.global_batch_size={global_rows} must divide by '
            f'process_count({n_proc}) * accumulate_grad_batches'
            f'({accum})')
    rows = global_rows // n_proc
    micro_rows = rows // accum
    data_world = dict(mesh.shape).get('data', 1)
    if micro_rows % data_world != 0:
        raise ValueError(
            f'per-step micro-batch rows ({micro_rows} = global '
            f'{global_rows} / processes {n_proc} / accum {accum}) '
            f'must divide by the mesh data axis ({data_world}); '
            'raise loader.batch_size or lower '
            'trainer.accumulate_grad_batches')
    loader = FaultTolerantLoader(data['train'], rows,
                                 seed=int(config.seed))
    rng = jax.random.PRNGKey(int(config.seed))
    init_rng, state_rng = jax.random.split(rng)

    example = _prep_batch(config, spec,
                          loader.take_first(), accum=accum)
    ex_ids = example['input_ids'].reshape(-1,
                                          example['input_ids'].shape[-1])
    sigma0 = (None if spec.parameterization == 'ar'
              else np.ones((1,), np.float32))
    cond0 = (np.zeros((1,), np.int32)
             if _wants_cond(config) else None)
    params = jit_init(model, init_rng,
                      np.asarray(ex_ids[:1], np.int32), sigma0,
                      cond0)['params']
    params = _maybe_load_pretrained(config, params)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(params))
    LOGGER.info(f'Model parameters: {n_params / 1e6:.2f}M')

    eval_batch_multiple = 1
    if dict(mesh.shape).get('pipe', 1) > 1:
        # GPipe over stacked DDiT blocks (strategy=pp,
        # parallel/pipeline.py); checkpoints store the stacked layout
        # (from_pipeline_params converts back for single-device use).
        from ddg_tpu.parallel.pipeline import (make_pipeline_apply,
                                               to_pipeline_params)
        assert str(config.backbone) == 'dit', (
            'pipeline parallelism supports the DiT backbone')
        n_micro = int(config.strategy.get('pipe_microbatches', 4))
        apply_fn = make_pipeline_apply(model_cfg, mesh, n_micro=n_micro)
        params = to_pipeline_params(params, model_cfg.n_blocks)
        # The pipelined apply shard_maps the batch over the data axis
        # and splits each local shard into n_micro microbatches — any
        # batch through it (train AND eval) must divide by this.
        eval_batch_multiple = dict(mesh.shape).get('data', 1) * n_micro

    state = init_train_state(state_rng, params, optim_spec, avg_spec)
    train_step = make_train_step(spec, apply_fn, optim_spec, avg_spec,
                                 accum_steps=accum)
    jitted, place_state, place_batch = mesh_lib.shard_train_step(
        mesh, train_step, state, example,
        tensor_rules=_tp_mode(config) == 'heads', accum=accum > 1)
    state = place_state(state)

    save_dir = os.path.join(str(config.checkpointing.save_dir),
                            'checkpoints')
    cbs = config.get('callbacks') or Config({})
    every_n = int(cbs.get('checkpoint_every_n_steps', Config({})).get(
        'every_n_train_steps', 500) if cbs.get(
        'checkpoint_every_n_steps') else 500)
    snap_every = int(config.checkpointing.get(
        'snapshot_every_n_steps', 0))
    ckpt = CheckpointManager(
        save_dir, every_n_steps=every_n,
        max_to_keep=int(config.checkpointing.get(
            'snapshot_max_to_keep', 0)) or None)

    # Resume (reference main.py:195-201 + fault-tolerant samplers).
    if (bool(config.checkpointing.resume_from_ckpt)
            and ckpt.exists('last')):
        state, meta = ckpt.restore('last', state)
        if meta.get('loader_state'):
            loader.load_state_dict(meta['loader_state'])
        LOGGER.info(f'Resumed from step {int(state.step)}')

    # Config snapshot (reference `_print_config` saves config_tree.txt,
    # main.py:78-82).
    os.makedirs(str(config.checkpointing.save_dir), exist_ok=True)
    with open(os.path.join(str(config.checkpointing.save_dir),
                           'config_tree.txt'), 'w') as f:
        f.write(config.pretty())
    metrics_log = MetricsLogger(os.path.join(
        str(config.checkpointing.save_dir), 'metrics.jsonl'))
    max_steps = max_steps_override or int(config.trainer.max_steps)
    log_every = int(config.trainer.log_every_n_steps)
    val_every = int(config.trainer.val_check_interval)
    crop_rng = np.random.RandomState(int(config.seed))
    flex = bool(config.training.get('flexible_length', False))
    flex_frac = float(config.training.get('change_length_batches_frac',
                                          0.01))

    # Profiling hook (SURVEY §5: the reference has none; we expose
    # jax.profiler traces via DDG_PROFILE_DIR for perf work).
    profile_dir = os.environ.get('DDG_PROFILE_DIR')
    profile_at = int(os.environ.get('DDG_PROFILE_STEP', 10))
    profile_n = int(os.environ.get('DDG_PROFILE_STEPS', 5))
    profiling = False

    import time as _time
    eval_rng = jax.random.PRNGKey(int(config.seed) + 1)
    # The eval step is jitted ONCE here and reused by every validation
    # (a fresh closure per call would force an XLA retrace each
    # val_check_interval).
    eval_step = jax.jit(make_eval_step(
        spec, apply_fn,
        use_averaged=not bool(config.eval.disable_ema)))

    def host_batches():
        """Host-side prep (crop / flip / flexible-length / label->cond)
        off the dispatch path; consumed through the double-buffered
        device pipeline below."""
        for b in loader:
            if config.data.train == 'text8':
                b = _maybe_crop_text8(config, b, tokenizer, crop_rng)
            if config.data.train == 'cifar10':
                b = _flip_cifar(b, crop_rng)
            if flex and crop_rng.rand() < flex_frac:
                b = _flexible_truncate(config, b, tokenizer, crop_rng)
            yield _prep_batch(config, spec, b, accum=accum)

    batch_sharding = mesh_lib.batch_shardings(mesh, example,
                                              accum=accum > 1)
    batches = prefetch_to_device(host_batches(), size=2,
                                 sharding=batch_sharding)

    # `step` is tracked host-side (state.step increments by exactly 1
    # per call): reading int(state.step) every iteration would block on
    # the async dispatch queue and serialize host and device.
    step = int(state.step)
    tokens_since_log, t_last = 0, _time.perf_counter()
    for batch in batches:
        if step >= max_steps:
            break
        tokens_since_log += int(batch['attention_mask'].size)
        if profile_dir and not profiling and step == profile_at:
            jax.profiler.start_trace(profile_dir)
            profiling = True
        state, metrics = jitted(state, batch)
        step += 1
        if profiling and step >= profile_at + profile_n:
            jax.tree.map(
                lambda x: x.block_until_ready(), metrics)
            jax.profiler.stop_trace()
            profiling = False
        if step % log_every == 0:
            now = _time.perf_counter()
            tok_s = tokens_since_log / max(now - t_last, 1e-9)
            tokens_since_log, t_last = 0, now
            metrics_log.log(step, {'trainer/loss': metrics['loss'],
                                   'lr': metrics['lr'],
                                   'grad_norm': metrics['grad_norm'],
                                   'tokens_per_sec': tok_s})
            LOGGER.info(
                f'step {step}: loss={float(metrics["loss"]):.4f} '
                f'({tok_s / 1e3:.1f}K tok/s)')
        if step % val_every == 0 or step >= max_steps:
            val = validate(config, spec, apply_fn, state, data['valid'],
                           rng=eval_rng, eval_step=eval_step,
                           batch_multiple=eval_batch_multiple)
            metrics_log.log(step, {'val/nll': val.nll,
                                   'val/bpd': val.bpd,
                                   'val/ppl': val.ppl})
            LOGGER.info(f'step {step}: val/ppl={val.ppl:.3f}')
            ckpt.maybe_save_best(val.nll, state,
                                 loader_state=loader.state_dict())
            if bool(config.eval.generate_samples):
                _log_validation_samples(config, spec, apply_fn, state,
                                        tokenizer, metrics_log, step,
                                        model_cfg=model_cfg,
                                        batch_multiple=eval_batch_multiple)
        ckpt.maybe_save_last(step, state,
                             loader_state=loader.state_dict())
        if snap_every and step % snap_every == 0:
            ckpt.save_step_snapshot(
                step, state, loader_state=loader.state_dict())
    ckpt.save('last', state, loader_state=loader.state_dict())
    metrics_log.close()
    return state


def _flip_cifar(batch, rng):
    """Random horizontal flip of flat (C*H*W) pixel tokens (reference
    DiscreteCIFAR10 transform, discretized_cifar10.py:46-53)."""
    x = batch['input_ids']
    imgs = x.reshape(-1, 3, 32, 32)
    flip = rng.rand(x.shape[0]) < 0.5
    imgs = imgs.copy()
    imgs[flip] = imgs[flip][:, :, :, ::-1]
    return {**batch, 'input_ids': imgs.reshape(x.shape)}


def _flexible_truncate(config, batch, tokenizer, rng):
    """Flexible-length training: random truncation with EOS patch
    (reference diffusion.py:706-717). Lengths are bucketed to powers of
    two to bound XLA recompiles (TPU adaptation; the reference pays no
    compile cost on GPU eager)."""
    L = batch['input_ids'].shape[1]
    new_len = rng.randint(2, max(3, min(int(config.model.length), L)))
    bucket = 1 << (new_len - 1).bit_length()
    new_len = min(bucket, L)
    ids = batch['input_ids'][:, :new_len].copy()
    if tokenizer.eos_token_id is not None:
        ids[:, -1] = tokenizer.eos_token_id
    return {**batch, 'input_ids': ids,
            'attention_mask': batch['attention_mask'][:, :new_len]}


def _log_validation_samples(config, spec, apply_fn, state, tokenizer,
                            metrics_log, step, model_cfg=None,
                            batch_multiple: int = 1):
    """Sample generation during validation (reference
    on_validation_epoch_end, diffusion.py:945-1004): a couple of
    sequences (per class when guidance is configured) logged to the
    metrics stream. batch_multiple: same divisibility constraint as
    validate() — under strategy=pp the pipelined apply shards over
    data x microbatches, so the sampling batch must be a multiple."""
    from ddg_tpu.runtime.averaging import averaged_params as _avg
    params = _avg(state.averaging, state.params)
    cfg = Config(config.to_dict())
    cfg.sampling['batch_size'] = -(-2 // batch_multiple) * batch_multiple
    try:
        if (config.training.get('guidance') is not None
                and config.data.get('num_classes')):
            cfg['guidance'] = {'method': 'cfg', 'condition': 0,
                               'gamma': 1.0}
            for c in range(int(config.data.num_classes)):
                cfg.guidance['condition'] = c
                out = sample(cfg, spec, apply_fn, params,
                             tokenizer=tokenizer,
                             rng=jax.random.PRNGKey(step + c),
                             model_cfg=model_cfg)
                texts = tokenizer.batch_decode(np.asarray(out))
                metrics_log.log(step, {
                    f'samples/class_{c}': texts[0]
                    if isinstance(texts[0], str) else '<image>'})
        else:
            out = sample(cfg, spec, apply_fn, params,
                         tokenizer=tokenizer,
                         rng=jax.random.PRNGKey(step),
                         model_cfg=model_cfg)
            texts = tokenizer.batch_decode(np.asarray(out))
            metrics_log.log(step, {
                'samples/text': texts[0]
                if isinstance(texts[0], str) else '<image>'})
    except Exception as e:  # sampling must never kill training
        LOGGER.warning(f'validation sampling failed: {e}')


def validate(config, spec, apply_fn, state, valid_data, *, rng,
             max_batches: Optional[int] = None, eval_step=None,
             batch_multiple: int = 1):
    """batch_multiple: hard divisibility constraint on the eval batch
    (pipeline apply: data axis x pipe_microbatches — an indivisible
    batch trips a trace-time assert inside shard_map, which under
    strategy=pp would kill the whole training run at the first
    val_check_interval)."""
    if eval_step is None:
        eval_step = jax.jit(make_eval_step(
            spec, apply_fn,
            use_averaged=not bool(config.eval.disable_ema)))
    n_valid = len(next(iter(valid_data.values())))
    eval_bs = min(int(config.loader.eval_batch_size), n_valid)
    if batch_multiple > 1:
        assert n_valid >= batch_multiple, (
            f'validation split ({n_valid} examples) smaller than the '
            f'pipeline batch multiple {batch_multiple} (data axis x '
            'pipe_microbatches); enlarge the split or shrink the mesh')
        eval_bs = max(batch_multiple,
                      eval_bs - eval_bs % batch_multiple)
    loader = FaultTolerantLoader(
        valid_data, eval_bs, shuffle=False, seed=int(config.seed))
    limit = config.trainer.get('limit_val_batches', 1.0)
    n = loader.epoch_batches()
    if isinstance(limit, float) and limit < 1.0:
        n = max(1, int(n * limit))
    if max_batches is not None:
        n = min(n, max_batches)

    def gen():
        for i, b in enumerate(iter(loader)):
            if i >= n:
                break
            yield _prep_batch(config, spec, b)

    return compute_ppl(eval_step, state, gen(), rng=rng)


def train_classifier(config: Config):
    """mode=train_classifier (reference main.py:214-239)."""
    tokenizer = build_tokenizer(config)
    dspec = build_diffusion_spec(config, tokenizer)
    clf_spec = ClassifierSpec(
        diffusion=config.diffusion,
        parameterization=config.parameterization,
        noise=dspec.noise,
        vocab_size=dspec.vocab_size,
        mask_index=dspec.mask_index,
        num_classes=int(config.classifier_model.num_classes),
        T=dspec.T,
        time_conditioning=bool(config.time_conditioning),
        sampling_eps=dspec.sampling_eps,
        use_label_smoothing=bool(config.training.get(
            'use_label_smoothing', False)),
        is_fudge_classifier=bool(config.get('is_fudge_classifier',
                                            False)),
        is_eval_classifier=bool(config.get('is_eval_classifier',
                                           False)))
    model, model_cfg, apply_fn = build_classifier_model(config, dspec)
    data = build_data(config)
    optim_spec = build_optim_spec(config)
    avg_spec = build_averaging_spec(config)

    # Global rows per step (see train(): loader.batch_size is
    # per-rank Lightning math; this loader feeds every device).
    batch_size = (int(config.loader.global_batch_size)
                  // jax.process_count())
    loader = FaultTolerantLoader(data['train'], batch_size,
                                 seed=int(config.seed))
    rng = jax.random.PRNGKey(int(config.seed))
    ex = loader.take_first()
    sigma0 = (None if (clf_spec.parameterization == 'ar'
                       or clf_spec.is_eval_classifier)
              else np.ones((1,), np.float32))
    params = jit_init(model, rng, np.asarray(
        ex['input_ids'][:1].astype(np.int32)), sigma0)['params']

    # PPLM/NOS classifiers reuse the frozen pretrained diffusion
    # encoder (reference main.py:218-234): copy matching trunk params
    # (vocab_embed / sigma_map / block_*) from the diffusion checkpoint
    # and freeze them.
    frozen_keys = ()
    if bool(config.get('is_pplm_classifier', False)):
        d_tok, d_spec, d_apply, d_state, _ = _restore_for_eval(config)
        use_ema = bool(config.classifier_model.get('use_encoder_ema',
                                                   True))
        enc = (averaged_params(d_state.averaging, d_state.params)
               if use_ema else d_state.params)
        shared = [k for k in params
                  if k in enc and (k.startswith('block_')
                                   or k in ('vocab_embed',
                                            'sigma_map'))]
        for k in shared:
            params[k] = enc[k]
        if bool(config.classifier_model.get('freeze_encoder', True)):
            frozen_keys = tuple(shared)
        LOGGER.info(f'PPLM/NOS classifier: shared encoder keys '
                    f'{sorted(shared)}, frozen={bool(frozen_keys)}')

    state = init_train_state(rng, params, optim_spec, avg_spec)
    # donate: in-place params/opt/EMA update (no full-state copy/step).
    step_fn = jax.jit(make_classifier_train_step(
        clf_spec, apply_fn, optim_spec, avg_spec,
        frozen_keys=frozen_keys), donate_argnums=(0,))

    save_dir = os.path.join(str(config.checkpointing.save_dir),
                            'classifier_checkpoints')
    ckpt = CheckpointManager(save_dir)
    metrics_log = MetricsLogger(os.path.join(
        str(config.checkpointing.save_dir),
        'classifier_metrics.jsonl'))
    max_steps = int(config.trainer.max_steps)
    label_col = config.data.get('label_col', 'label')
    it = iter(loader)
    # Host-side step counter: int(state.step) every iteration would
    # block on the async dispatch queue and serialize host and device
    # (same pattern as train()).
    step = int(state.step)
    while step < max_steps:
        raw = next(it)
        batch = {'input_ids': raw['input_ids'].astype(np.int32),
                 'attention_mask':
                     raw['attention_mask'].astype(np.float32),
                 'label': raw.get(label_col, raw.get('label')).astype(
                     np.int32)}
        state, metrics = step_fn(state, batch)
        step += 1
        if step % int(config.trainer.log_every_n_steps) == 0:
            metrics_log.log(step, metrics)
        ckpt.maybe_save_last(step, state)
    ckpt.save('last', state)
    metrics_log.close()
    return state


def restore_eval_classifier(config: Config, path: str):
    """Load a clean-sequence eval classifier (the pinned Species10
    judge trained by scripts/train_ten_species_eval_classifier.sh;
    reference ten_species_eval.py:468-478 loads its HyenaDNA judge
    checkpoint). Returns (clf_apply, params)."""
    tokenizer = build_tokenizer(config)
    dspec = build_diffusion_spec(config, tokenizer)
    model, _, clf_apply = build_classifier_model(config, dspec)
    rng = jax.random.PRNGKey(0)
    x0 = np.zeros((1, int(config.classifier_model.length)), np.int32)
    params = jit_init(model, rng, x0, None)['params']
    state = init_train_state(rng, params, build_optim_spec(config),
                             build_averaging_spec(config))
    name = os.path.basename(path.rstrip('/'))
    ckpt = CheckpointManager(os.path.dirname(path.rstrip('/')))
    state, _ = ckpt.restore(name, state)
    return clf_apply, state.params


def _restore_classifier_for_sampling(config: Config):
    """Load the guidance classifier from
    guidance.classifier_checkpoint_path (reference Diffusion.sample
    loads Classifier.load_from_checkpoint for fudge/pplm (AR) and
    cbg/nos (diffusion), diffusion.py:1056-1068)."""
    path = str(config.guidance.get('classifier_checkpoint_path') or '')
    assert path, (f'guidance.method={config.guidance.method} requires '
                  'guidance.classifier_checkpoint_path')
    tokenizer = build_tokenizer(config)
    dspec = build_diffusion_spec(config, tokenizer)
    model, _, clf_apply = build_classifier_model(config, dspec)
    rng = jax.random.PRNGKey(0)
    x0 = np.zeros((1, int(config.classifier_model.length)), np.int32)
    sigma0 = (None if dspec.parameterization == 'ar'
              else np.ones((1,), np.float32))
    params = jit_init(model, rng, x0, sigma0)['params']
    state = init_train_state(rng, params, build_optim_spec(config),
                             build_averaging_spec(config))
    name = os.path.basename(path.rstrip('/'))
    ckpt = CheckpointManager(os.path.dirname(path.rstrip('/')))
    state, _ = ckpt.restore(name, state)
    # The reference loads the raw module weights (Lightning
    # load_from_checkpoint), not the classifier's own EMA.
    return clf_apply, state.params


_CLASSIFIER_GUIDED = ('cbg', 'nos', 'fudge', 'pplm')


_SHARDED_SAMPLE_CACHE: dict = {}


def sample(config: Config, spec, apply_fn, params, *, tokenizer,
           rng=None, classifier_apply=None, classifier_params=None,
           model_cfg=None):
    """Generate one batch of samples (reference Diffusion.sample,
    diffusion.py:1040-1083). `params` should already be EMA params when
    desired."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    guidance = build_guidance_spec(config)
    sampler = build_sampler_spec(config)
    if (guidance is not None and guidance.method in _CLASSIFIER_GUIDED
            and classifier_apply is None):
        classifier_apply, classifier_params = \
            _restore_classifier_for_sampling(config)
    batch_size = int(config.sampling.batch_size)
    length = int(config.model.length)
    cond = None
    if guidance is not None and guidance.method == 'cfg':
        cond = jnp.full((batch_size,), guidance.condition, jnp.int32)
    dit_cfg = model_cfg if isinstance(model_cfg, DITConfig) else None
    if guidance is not None and (
            guidance.method == 'nos'
            or (guidance.method == 'cbg' and guidance.use_approx)
            or guidance.method == 'pplm'):
        # These methods differentiate through the model head/trunk
        # (NOS/PPLM) or the classifier trunk (CBG-approx); int8's
        # round() would silently zero those gradients — refuse loudly.
        # CBG-exact only does forwards, so it stays quant-compatible.
        if dit_cfg is not None and dit_cfg.quant_int8:
            raise ValueError(
                f'guidance.method={guidance.method} backpropagates '
                'through the denoiser head; model.quant_int8 must be '
                'off (jnp.round kills the gradient)')
        if bool(config.get('classifier_model', {})
                .get('quant_int8', False)):
            raise ValueError(
                f'guidance.method={guidance.method} backpropagates '
                'through the classifier; classifier_model.quant_int8 '
                'must be off (jnp.round kills the gradient)')
    if spec.parameterization == 'ar':
        # Stateful decode fast path (DiT KV cache / DiMamba conv+SSM
        # state; the reference's InferenceParams path,
        # diffusion.py:1114-1124).
        from ddg_tpu.models.dimamba import DiMambaConfig
        decode_cfg = (model_cfg if isinstance(
            model_cfg, (DITConfig, DiMambaConfig)) else None)
        return ar_sample(spec, sampler, apply_fn, params, rng,
                         batch_size=batch_size, length=length,
                         bos_token_id=tokenizer.bos_token_id,
                         guidance=guidance, cond=cond,
                         classifier_apply=classifier_apply,
                         classifier_params=classifier_params,
                         decode_cfg=decode_cfg)
    mesh = None
    if (jax.device_count() > 1
            and bool(config.sampling.get('shard', True))
            # A mesh-coupled apply (pipeline shard_map, ring
            # attention, TP/SP constraints) distributes itself; an
            # outer shard_map would nest it in a fully-Manual mesh
            # context and trip a mesh-mismatch error.
            and not getattr(apply_fn, '_mesh_coupled', False)):
        m = build_mesh(config)
        if batch_size % m.shape['data'] == 0:
            mesh = m
    if mesh is not None:
        # Data-parallel guided generation over the mesh (the
        # BASELINE.json north-star layout): each device runs the full
        # reverse process on batch_size/ndata samples via shard_map
        # (parallel/mesh.py:shard_sample_fn). Params replicated,
        # classifier params ride the same pytree so nothing is baked
        # into the HLO. The jitted runner is cached across calls (eval
        # loops call sample() per batch).
        local_b = batch_size // mesh.shape['data']
        local_cond = (jnp.full((local_b,), guidance.condition, jnp.int32)
                      if cond is not None else None)
        cache_key = (id(apply_fn), id(classifier_apply), sampler,
                     guidance, spec, batch_size, length, dit_cfg,
                     tuple(d.id for d in mesh.devices.flat))
        run = _SHARDED_SAMPLE_CACHE.get(cache_key)
        if run is None:
            def local_fn(p, key):
                return diffusion_sample(
                    spec, sampler, apply_fn, p['model'], key,
                    batch_size=local_b, length=length,
                    guidance=guidance, cond=local_cond,
                    classifier_apply=classifier_apply,
                    classifier_params=p['classifier'], dit_cfg=dit_cfg)

            run, _ = mesh_lib.shard_sample_fn(
                mesh, local_fn,
                {'model': params, 'classifier': classifier_params})
            _SHARDED_SAMPLE_CACHE[cache_key] = run
        placed = jax.device_put(
            {'model': params, 'classifier': classifier_params},
            mesh_lib.replicated(mesh))
        return run(placed, rng)
    return diffusion_sample(spec, sampler, apply_fn, params, rng,
                            batch_size=batch_size, length=length,
                            guidance=guidance, cond=cond,
                            classifier_apply=classifier_apply,
                            classifier_params=classifier_params,
                            dit_cfg=dit_cfg)


def _maybe_load_pretrained(config: Config, params):
    """backbone=hf_dit with a pretrained path loads converted reference
    weights (reference diffusion.py:130-132 AutoModelForMaskedLM)."""
    if config.backbone != 'hf_dit':
        return params
    path = config.model.get('pretrained_model_name_or_path')
    if not path or not os.path.isdir(str(path)):
        LOGGER.warning(
            'backbone=hf_dit without a local pretrained dir; '
            'training from scratch')
        return params
    from ddg_tpu.convert import (convert_dit_params,
                                 load_hf_udlm_state_dict)
    state = load_hf_udlm_state_dict(str(path))
    converted = convert_dit_params(state,
                                   n_blocks=int(config.model.n_blocks))
    for k in list(params.keys()):
        if k in converted:
            params[k] = jax.tree.map(jnp.asarray, converted[k])
    LOGGER.info(f'Loaded pretrained HF UDLM weights from {path}')
    return params


def _restore_for_eval(config: Config):
    tokenizer = build_tokenizer(config)
    spec = build_diffusion_spec(config, tokenizer)
    model, model_cfg, apply_fn = build_model(config, spec)
    rng = jax.random.PRNGKey(int(config.seed))
    length = int(config.model.length)
    sigma0 = (None if spec.parameterization == 'ar'
              else np.ones((1,), np.float32))
    cond0 = (np.zeros((1,), np.int32)
             if _wants_cond(config) else None)
    x0 = np.zeros((1, length), np.int32)
    params = jit_init(model, rng, x0, sigma0, cond0)['params']
    params = _maybe_load_pretrained(config, params)
    optim_spec = build_optim_spec(config)
    avg_spec = build_averaging_spec(config)
    state = init_train_state(rng, params, optim_spec, avg_spec)
    path = str(config.eval.checkpoint_path or '')
    if path:
        name = os.path.basename(path.rstrip('/'))
        ckpt = CheckpointManager(os.path.dirname(path.rstrip('/')))
        if _pipe_devices(config) > 1 and str(config.backbone) == 'dit':
            # strategy=pp checkpoints store the stacked-block layout
            # (parallel/pipeline.py): restore against a pp-shaped
            # template, then unstack params + EMA shadow so every
            # eval/sampling path runs the ordinary unpipelined model.
            import dataclasses as _dc

            from ddg_tpu.parallel.pipeline import (from_pipeline_params,
                                                   to_pipeline_params)
            nb = model_cfg.n_blocks
            template = init_train_state(
                rng, to_pipeline_params(params, nb), optim_spec,
                avg_spec)
            pp_state, _ = ckpt.restore(name, template)
            avg_state = pp_state.averaging
            if avg_state is not None:
                avg_state = _dc.replace(
                    avg_state, shadow_params=from_pipeline_params(
                        avg_state.shadow_params, nb))
            # opt_state stays stacked — eval paths never touch it.
            state = _dc.replace(
                pp_state,
                params=from_pipeline_params(pp_state.params, nb),
                averaging=avg_state)
        else:
            state, _ = ckpt.restore(name, state)
    return tokenizer, spec, apply_fn, state, model_cfg


def ppl_eval(config: Config) -> float:
    """mode=ppl_eval (reference main.py:308-319)."""
    tokenizer, spec, apply_fn, state, _ = _restore_for_eval(config)
    data = build_data(config)
    metric = validate(config, spec, apply_fn, state, data['valid'],
                      rng=jax.random.PRNGKey(int(config.seed)))
    LOGGER.info(f'val ppl: {metric.ppl:.4f}  bpd: {metric.bpd:.4f}')
    return metric.ppl


def gen_ppl_eval(config: Config) -> dict:
    """mode=gen_ppl_eval (reference main.py:253-305): sample batches,
    decode, judge-model gen-PPL + unigram entropy."""
    tokenizer, spec, apply_fn, state, model_cfg = _restore_for_eval(
        config)
    params = (averaged_params(state.averaging, state.params)
              if not bool(config.eval.disable_ema) else state.params)
    rng = jax.random.PRNGKey(int(config.seed))
    all_samples, texts = [], []
    for i in range(int(config.sampling.num_sample_batches)):
        rng, srng = jax.random.split(rng)
        out = sample(config, spec, apply_fn, params,
                     tokenizer=tokenizer, rng=srng,
                     model_cfg=model_cfg)
        all_samples.append(np.asarray(out))
        texts.extend(tokenizer.batch_decode(out))
    entropy = unigram_entropy([s for b in all_samples for s in b])
    result = {'unigram_entropy': entropy, 'samples': texts}
    judge = config.eval.get('generative_ppl_model_name_or_path')
    if judge:
        from ddg_tpu.eval_utils import compute_generative_ppl
        result['generative_ppl'] = compute_generative_ppl(
            texts, judge_model_name=judge,
            max_length=int(config.model.length))
    ar_judge = str(config.eval.get('ar_judge_checkpoint_path', '')
                   or '')
    if ar_judge:
        # Offline counterpart of the gpt2-large judge: one of OUR
        # trained AR models in the same vocabulary (the HF judge needs
        # hub assets; reference protocol eval_utils.py:28-90).
        from ddg_tpu.eval_utils import \
            compute_generative_ppl_with_ar_model
        jcfg = Config(config.to_dict())
        _setup_model_eval_config_ppl(jcfg, 'ar')
        jcfg.eval['checkpoint_path'] = ar_judge
        _, jspec, japply, jstate, _ = _restore_for_eval(jcfg)
        jparams = (averaged_params(jstate.averaging, jstate.params)
                   if not bool(config.eval.disable_ema)
                   else jstate.params)
        result['generative_ppl_ar_judge'] = \
            compute_generative_ppl_with_ar_model(
                np.concatenate(all_samples, axis=0), ar_spec=jspec,
                model_apply=japply, params=jparams,
                bos_token_id=tokenizer.bos_token_id,
                pad_token_id=getattr(tokenizer, 'pad_token_id', None))
    out_path = config.eval.get('generated_samples_path') or ''
    if out_path:
        with open(out_path, 'w') as f:
            json.dump(result, f)
    LOGGER.info('gen-ppl eval: ' + '  '.join(
        f'{k}={v:.4f}' for k, v in result.items()
        if isinstance(v, (int, float))))
    return result


def sample_eval(config: Config) -> dict:
    """mode=sample: restore a checkpoint and generate guided/unguided
    samples from the config surface alone. This is the CLI entry to
    every guidance mechanism — CFG, CBG(exact/approx), NOS (diffusion)
    and FUDGE (AR) load the classifier from
    guidance.classifier_checkpoint_path (reference
    diffusion.py:1056-1068; the reference reaches this through the
    guidance_eval scripts)."""
    tokenizer, spec, apply_fn, state, model_cfg = _restore_for_eval(
        config)
    params = (averaged_params(state.averaging, state.params)
              if not bool(config.eval.disable_ema) else state.params)
    rng = jax.random.PRNGKey(int(config.seed))
    tokens, texts = [], []
    for i in range(int(config.sampling.num_sample_batches)):
        rng, srng = jax.random.split(rng)
        out = sample(config, spec, apply_fn, params,
                     tokenizer=tokenizer, rng=srng,
                     model_cfg=model_cfg)
        tokens.append(np.asarray(out))
        texts.extend(tokenizer.batch_decode(np.asarray(out)))
    result = {'samples': texts,
              'unigram_entropy': unigram_entropy(
                  [s for b in tokens for s in b])}
    out_path = config.eval.get('generated_samples_path') or ''
    if out_path:
        with open(out_path, 'w') as f:
            json.dump(result, f)
    LOGGER.info(f'sampled {len(texts)} sequences, unigram_entropy='
                f'{result["unigram_entropy"]:.4f}; first: '
                f'{texts[0][:120] if texts else ""!r}')
    return result


def lengths_eval(config: Config) -> dict:
    """mode=lengths_eval: PPL at several sequence lengths (fork
    feature, reference main.py:321-325).

    The checkpoint is restored ONCE and shared across lengths — every
    backbone here is length-agnostic in its parameters (DiT uses RoPE,
    DiMamba a conv+scan, neither holds a positional table), so only
    the eval step itself re-jits per distinct length. The reference
    re-instantiates the whole model per length; on TPU each avoided
    restore+init also avoids a trip through the remote-compile tunnel."""
    lengths = sorted({int(L) for L in
                      config.eval.get('lengths', [8, 16, 32, 64, 128])})
    base = Config(config.to_dict())
    base.model['length'] = max(lengths)
    tokenizer, spec, apply_fn, state, _ = _restore_for_eval(base)
    del tokenizer
    results = {}
    for length in lengths:
        cfg = Config(config.to_dict())
        cfg.model['length'] = length
        data = build_data(cfg)
        metric = validate(cfg, spec, apply_fn, state, data['valid'],
                          rng=jax.random.PRNGKey(int(config.seed)))
        LOGGER.info(f'lengths_eval L={length}: ppl {metric.ppl:.4f} '
                    f'bpd {metric.bpd:.4f}')
        results[length] = metric.ppl
    LOGGER.info(f'lengths_eval: {results}')
    return results


def _setup_model_eval_config_ppl(cfg: Config, model_name: str) -> None:
    """Per-family config surgery keyed on the run-dir name (reference
    `_setup_model_eval_config_ppl`, main.py:327-345; substring match
    order ar -> mdlm -> udlm preserved)."""
    if 'ar' in model_name:
        cfg['parameterization'] = 'ar'
        cfg['diffusion'] = 'absorbing_state'
        cfg['time_conditioning'] = False
        cfg['zero_recon_loss'] = False
        cfg.loader['eval_batch_size'] = 128
    elif 'mdlm' in model_name:
        cfg['parameterization'] = 'subs'
        cfg['diffusion'] = 'absorbing_state'
        cfg['time_conditioning'] = False
        cfg['zero_recon_loss'] = False
        cfg.loader['eval_batch_size'] = 128
    elif 'udlm' in model_name:
        cfg['parameterization'] = 'd3pm'
        cfg['diffusion'] = 'uniform'
        cfg['time_conditioning'] = True
        cfg['zero_recon_loss'] = True
        cfg.loader['eval_batch_size'] = 64


def ppl_eval_all(config: Config) -> dict:
    """mode=ppl_eval_all: sweep run dirs under a models root with
    per-family config surgery and the low-confidence / argmax PPL
    variants (reference `_ppl_eval_all`, main.py:346-396). The root is
    eval.models_root, falling back to the parent of
    eval.checkpoint_path (the reference's convention)."""
    root = str(config.eval.get('models_root', '') or '')
    if not root:
        root = os.path.dirname(str(config.eval.checkpoint_path or '')
                               .rstrip('/'))
    assert root, 'set +eval.models_root=<dir> or eval.checkpoint_path'
    want_lc = bool(config.eval.low_confidence_sampling)
    want_am = bool(config.eval.argmax_sampling)
    results = {}
    for name in sorted(os.listdir(root)):
        ckpt_path = os.path.join(root, name, 'checkpoints', 'last')
        if not os.path.isdir(ckpt_path):
            continue
        cfg = Config(config.to_dict())
        _setup_model_eval_config_ppl(cfg, name)
        cfg.eval['checkpoint_path'] = ckpt_path
        # Variant sweep (reference main.py:363-390): standard PPL
        # always; low-confidence and argmax variants when requested.
        variants = [('standard', False, False)]
        if want_lc:
            variants.append(('low_confidence', True, False))
        if want_am:
            variants.append(('argmax', False, True))
        per = {}
        for vname, lc, am in variants:
            vcfg = Config(cfg.to_dict())
            vcfg.eval['low_confidence_sampling'] = lc
            vcfg.eval['argmax_sampling'] = am
            try:
                per[vname] = ppl_eval(vcfg)
            except Exception as e:
                per[vname] = f'error: {e}'
        results[name] = (per if len(per) > 1 else per['standard'])
    LOGGER.info(f'ppl_eval_all: {results}')
    return results


def lcsc_search(config: Config) -> dict:
    """mode=lcsc (reference main.py:110-183 + lcsc.py)."""
    from ddg_tpu.lcsc import combine_checkpoints_diff, run_lcsc
    tokenizer, spec, apply_fn, state, _ = _restore_for_eval(config)
    data = build_data(config)
    ckpt_dir = os.path.join(str(config.checkpointing.save_dir),
                            'checkpoints')
    mgr = CheckpointManager(ckpt_dir)
    snaps = mgr.list_snapshots()
    lc = config.get('lcsc') or Config({})
    max_ckpts = int(lc.get('max_checkpoints', 20))
    snaps = snaps[-max_ckpts:]
    assert len(snaps) >= 3, (
        f'LCSC requires >= 3 checkpoints, found {len(snaps)}')
    trees = []
    for s in snaps:
        st, _ = mgr.restore(f'step-{s}', state)
        trees.append(averaged_params(st.averaging, st.params))

    metric_name = lc.get('metric', 'ppl')
    # One jitted eval step reused across all candidates (a fresh
    # jax.jit closure per fitness call would retrace every candidate).
    fit_eval_step = jax.jit(make_eval_step(
        spec, apply_fn,
        use_averaged=not bool(config.eval.disable_ema)))

    def fitness(alphas):
        merged = combine_checkpoints_diff(trees, alphas)
        st = dataclasses.replace(state, params=merged, averaging=None)
        if metric_name == 'ppl':
            # Reference default: full validation pass per candidate
            # (lcsc.py:94-115); lcsc.fitness_batches caps it for smoke
            # runs (0 = full).
            fb = int(lc.get('fitness_batches', 0))
            m = validate(config, spec, apply_fn, st, data['valid'],
                         rng=jax.random.PRNGKey(int(config.seed)),
                         max_batches=fb if fb > 0 else None,
                         eval_step=fit_eval_step)
            return m.ppl
        # sample-based fitness (gen_ppl / entropy,
        # reference lcsc.py:94-115)
        texts, toks = [], []
        rng2 = jax.random.PRNGKey(int(config.seed))
        for _ in range(int(lc.get('num_sample_batches', 1))):
            rng2, srng = jax.random.split(rng2)
            out = sample(config, spec, apply_fn, merged,
                         tokenizer=tokenizer, rng=srng)
            toks.extend(np.asarray(out))
            texts.extend(tokenizer.batch_decode(np.asarray(out)))
        if metric_name == 'entropy':
            # negative entropy: lower-is-better search objective
            return -unigram_entropy(toks)
        if metric_name == 'gen_ppl':
            from ddg_tpu.eval_utils import compute_generative_ppl
            return compute_generative_ppl(
                texts, judge_model_name=config.eval.get(
                    'generative_ppl_model_name_or_path', 'gpt2-large'),
                max_length=int(config.model.length))
        raise ValueError(f'Unknown LCSC metric {metric_name}')

    best_alpha, best_score = run_lcsc(
        num_checkpoints=len(trees), fitness=fitness,
        population_size=int(lc.get('population_size', 8)),
        top_k=int(lc.get('top_k', 0)),
        iterations=int(lc.get('iterations', 10)),
        mutation_sigma=float(lc.get('mutation_sigma', 0.05)),
        offspring_per_iter=int(lc.get('offspring_per_iter', 8)),
        seed=int(config.seed), log=LOGGER.info)
    merged = combine_checkpoints_diff(trees, best_alpha)
    final = dataclasses.replace(state, params=merged)
    mgr.save('lcsc-merged', final,
             extra={'alphas': best_alpha, 'score': best_score})
    return {'alphas': best_alpha, 'score': best_score}


def main(argv=None):
    from ddg_tpu.parallel.distributed import maybe_initialize
    maybe_initialize()
    argv = argv if argv is not None else sys.argv[1:]
    config_dir = os.environ.get(
        'DDG_CONFIG_DIR',
        os.path.join(os.path.dirname(__file__), '..', 'configs'))
    config = load_config(config_dir, overrides=argv)
    mode = config.mode
    LOGGER.info(f'mode={mode} data={config.data.train} '
                f'backbone={config.backbone} '
                f'parameterization={config.parameterization}')
    if mode == 'train':
        return train(config)
    if mode == 'train_classifier':
        return train_classifier(config)
    if mode == 'ppl_eval':
        return ppl_eval(config)
    if mode == 'gen_ppl_eval':
        return gen_ppl_eval(config)
    if mode == 'sample':
        return sample_eval(config)
    if mode == 'lengths_eval':
        return lengths_eval(config)
    if mode == 'ppl_eval_all':
        return ppl_eval_all(config)
    if mode == 'lcsc':
        return lcsc_search(config)
    raise NotImplementedError(f'mode {mode} not implemented.')


if __name__ == '__main__':
    main()
