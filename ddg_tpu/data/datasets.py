"""Dataset construction: text8, LM1B, QM9, Amazon Polarity, Species10,
discretized CIFAR10 — as numpy token arrays with disk caching.

Capability parity with the reference data layer
(/root/reference/dataloader.py:104-343, custom_datasets/). Differences
by design:
  * fixed-shape numpy arrays (tokens + attention masks), ready for
    device sharding — no torch DataLoader / collate;
  * text8 tokenization is a vectorized byte-LUT (numpy) instead of a
    per-example HF map — the whole 90M-char split tokenizes in ~1s;
  * zero-egress environments are first-class: every remote dataset
    accepts a local path, and `synthetic=True` generates deterministic
    stand-in data with the same schema (used by tests).
"""

from __future__ import annotations

import hashlib
import os
import re
import zipfile
from typing import Dict, Optional

import numpy as np

from ddg_tpu.data.tokenizers import (DNATokenizer, QM9Tokenizer,
                                     Text8Tokenizer, Tokenizer)


# ---------------------------------------------------------------------------
# Detokenizers (reference dataloader.py:26-46 and siblings)
# ---------------------------------------------------------------------------

def lm1b_detokenizer(x: str) -> str:
    x = x.replace('http : / / ', 'http://')
    x = x.replace('https : / / ', 'https://')
    x = re.sub(r" '(\w+)", r"'\1", x)
    x = re.sub(r' (\w+) \. ', r' \1. ', x)
    x = re.sub(r' (\w+) \.$', r' \1.', x)
    x = x.replace(' ? ', '? ')
    x = re.sub(r' \?$', '?', x)
    x = x.replace(' ! ', '! ')
    x = re.sub(r' \!$', '!', x)
    x = x.replace(' , ', ', ')
    x = x.replace(' : ', ': ')
    x = x.replace(' ; ', '; ')
    x = x.replace(' / ', '/')
    x = re.sub(r'\" ([^\"]+) \"', r'"\1"', x)
    x = re.sub(r"\' ([^\']+) \'", r"'\1'", x)
    x = re.sub(r'\( ([^\(\)]+) \)', r'(\1)', x)
    x = re.sub(r'\[ ([^\[\]]+) \]', r'[\1]', x)
    x = x.replace('$ ', '$')
    x = x.replace('£ ', '£')
    return x


# ---------------------------------------------------------------------------
# text8
# ---------------------------------------------------------------------------

def _synthetic_text8(n_chars: int, seed: int = 0) -> str:
    """Deterministic pseudo-text over the text8 alphabet with word-like
    statistics, for offline tests."""
    rs = np.random.RandomState(seed)
    words = [''.join(rs.choice(list('abcdefghijklmnopqrstuvwxyz'),
                               size=rs.randint(2, 9)))
             for _ in range(512)]
    out = []
    total = 0
    probs = rs.dirichlet(np.ones(len(words)) * 0.2)
    while total < n_chars:
        w = words[rs.choice(len(words), p=probs)]
        out.append(w)
        total += len(w) + 1
    return ' '.join(out)[:n_chars]


def _text8_char_lut() -> np.ndarray:
    tok = Text8Tokenizer()
    lut = np.full(256, tok.unk_token_id, dtype=np.int32)
    for ch, idx in tok.vocab.items():
        if len(ch) == 1:
            lut[ord(ch)] = idx
    return lut


def load_text8(cache_dir: str, max_seq_length: int = 256, *,
               crop_train: bool = False, synthetic: bool = False,
               synthetic_chars: int = 1_000_000
               ) -> Dict[str, Dict[str, np.ndarray]]:
    """text8 -> {'train','validation','test'} of {'input_ids',
    'attention_mask'} arrays.

    Split protocol parity: 90M/5M/5M character split, non-overlapping
    chunks of max_seq_length (2x for crop-train), drop last partial
    chunk (reference dataloader.py:104-198). Chars map straight to ids
    (no BOS/EOS; wrap=False path) — the crop/BOS/EOS patching happens
    at batch time like the reference's `_maybe_sub_sample`.
    """
    suffix = 'text8-crop-train' if crop_train else 'text8'
    if synthetic:
        suffix += f'-synthetic{synthetic_chars}'
    cache = os.path.join(cache_dir, suffix,
                         f'msl{max_seq_length}.npz')
    if os.path.exists(cache):
        loaded = np.load(cache)
        return {s: {'input_ids': loaded[f'{s}_ids'],
                    'attention_mask': loaded[f'{s}_mask']}
                for s in ['train', 'validation', 'test']}

    if synthetic:
        raw = _synthetic_text8(synthetic_chars)
        n = len(raw)
        splits = {'train': raw[:int(0.9 * n)],
                  'validation': raw[int(0.9 * n):int(0.95 * n)],
                  'test': raw[int(0.95 * n):]}
    else:
        raw_zip = os.path.join(cache_dir, 'text8.zip')
        raw_txt = os.path.join(cache_dir, 'text8')
        if os.path.exists(raw_txt):
            raw = open(raw_txt).read()
        elif os.path.exists(raw_zip):
            raw = zipfile.ZipFile(raw_zip).read('text8').decode('utf-8')
        else:
            raise FileNotFoundError(
                f'text8 corpus not found at {raw_txt} or {raw_zip}; '
                'place mattmahoney.net/dc/text8.zip there (this '
                'environment has no network egress), or pass '
                'synthetic=True.')
        splits = {'train': raw[:90_000_000],
                  'validation': raw[90_000_000:95_000_000],
                  'test': raw[95_000_000:]}

    lut = _text8_char_lut()
    out, save = {}, {}
    for split, text in splits.items():
        chunk = (2 * max_seq_length
                 if (split == 'train' and crop_train) else max_seq_length)
        ids = lut[np.frombuffer(text.encode('latin-1'), dtype=np.uint8)]
        n_chunks = len(ids) // chunk  # drop_last
        ids = ids[:n_chunks * chunk].reshape(n_chunks, chunk)
        mask = np.ones_like(ids, dtype=np.float32)
        out[split] = {'input_ids': ids, 'attention_mask': mask}
        save[f'{split}_ids'] = ids
        save[f'{split}_mask'] = mask
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    np.savez(cache, **save)
    return out


# ---------------------------------------------------------------------------
# Generic tokenized text datasets (wrap / pad modes)
# ---------------------------------------------------------------------------

def group_texts(token_lists, block_size: int, bos: int, eos: int, *,
                add_special_tokens: bool = True) -> Dict[str, np.ndarray]:
    """Concat-and-chunk wrapping with BOS/EOS per block
    (reference `_group_texts`, dataloader.py:201-230)."""
    concatenated = np.concatenate(
        [np.asarray(t, dtype=np.int32) for t in token_lists])
    inner = block_size - (2 if add_special_tokens else 0)
    total = (len(concatenated) // inner) * inner
    blocks = concatenated[:total].reshape(-1, inner)
    if add_special_tokens:
        n = blocks.shape[0]
        blocks = np.concatenate(
            [np.full((n, 1), bos, np.int32), blocks,
             np.full((n, 1), eos, np.int32)], axis=1)
    mask = np.ones_like(blocks, dtype=np.float32)
    return {'input_ids': blocks, 'attention_mask': mask}


def pad_texts(token_lists, block_size: int, pad: int,
              labels: Optional[np.ndarray] = None
              ) -> Dict[str, np.ndarray]:
    """Per-example truncate/pad to block_size (wrap=False path)."""
    n = len(token_lists)
    ids = np.full((n, block_size), pad, dtype=np.int32)
    mask = np.zeros((n, block_size), dtype=np.float32)
    for i, t in enumerate(token_lists):
        t = np.asarray(t, dtype=np.int32)[:block_size]
        ids[i, :len(t)] = t
        mask[i, :len(t)] = 1.0
    out = {'input_ids': ids, 'attention_mask': mask}
    if labels is not None:
        out['label'] = np.asarray(labels)
    return out


def percentile_threshold_labels(values: np.ndarray,
                                num_classes: int) -> np.ndarray:
    """Discretize a continuous label column into percentile classes
    (reference qm9 thresholding, dataloader.py:282-292)."""
    qs = np.quantile(values, np.linspace(0, 1, num_classes + 1)[1:-1])
    return np.digitize(values, qs).astype(np.int32)


# ---------------------------------------------------------------------------
# QM9 (SMILES)
# ---------------------------------------------------------------------------

def synthetic_qm9(n: int = 512, seed: int = 0):
    """Deterministic SMILES-like strings + fake property labels, with
    the real QM9 tokenizer schema, for offline tests."""
    rs = np.random.RandomState(seed)
    frags = ['C', 'CC', 'C(=O)', 'c1ccccc1', 'N', 'O', 'CO', 'C#N',
             'CN', 'C1CC1', 'OC', 'NC(=O)']
    smiles = [''.join(rs.choice(frags, size=rs.randint(1, 5)))
              for _ in range(n)]
    values = rs.rand(n)
    return smiles, values


def load_qm9(cache_dir: str, block_size: int = 32, *,
             num_classes: int = 2, synthetic: bool = False,
             label_col: str = 'qed') -> Dict[str, Dict[str, np.ndarray]]:
    """QM9 SMILES with percentile-threshold labels; 95/5 split seed 42
    (reference dataloader.py:267-307)."""
    tok = QM9Tokenizer()
    key = hashlib.md5(
        f'qm9-{block_size}-{num_classes}-{label_col}-{synthetic}'.encode()
    ).hexdigest()[:10]
    cache = os.path.join(cache_dir, f'qm9_{key}.npz')
    if os.path.exists(cache):
        z = np.load(cache)
        return {s: {'input_ids': z[f'{s}_ids'],
                    'attention_mask': z[f'{s}_mask'],
                    'label': z[f'{s}_label']}
                for s in ['train', 'test']}
    if synthetic:
        smiles, values = synthetic_qm9()
    else:
        try:
            import datasets as hf_datasets
            ds = hf_datasets.load_dataset(
                'yairschiff/qm9', split='train')
            smiles = ds['canonical_smiles']
            values = np.asarray(ds[label_col])
        except Exception as e:
            raise FileNotFoundError(
                'QM9 dataset unavailable offline; pass synthetic=True '
                f'({e})') from e
    # Tokenize through the native SMILES lexer when available
    # (native/fast_tokenize.cpp; regex-parity), ~10x faster than
    # per-string Python regex on the full corpus.
    from ddg_tpu.data.native import NativeTrieTokenizer
    from ddg_tpu.data.tokenizers import QM9_TOKENS
    nat = NativeTrieTokenizer(QM9_TOKENS, unk_id=tok.unk_token_id,
                              id_offset=5, mode='smiles')
    ids, mask = nat.tokenize_batch(
        smiles, block_size=block_size, bos_id=tok.bos_token_id,
        eos_id=tok.eos_token_id, pad_id=tok.pad_token_id)
    labels = percentile_threshold_labels(np.asarray(values), num_classes)
    data = {'input_ids': ids, 'attention_mask': mask,
            'label': np.asarray(labels)}
    # 95/5 split, seed 42 (dataloader.py:293-295).
    rs = np.random.RandomState(42)
    perm = rs.permutation(len(smiles))
    n_test = max(1, int(0.05 * len(perm)))
    test_idx, train_idx = perm[:n_test], perm[n_test:]
    out, save = {}, {}
    for split, idx in [('train', train_idx), ('test', test_idx)]:
        out[split] = {'input_ids': data['input_ids'][idx],
                      'attention_mask': data['attention_mask'][idx],
                      'label': data['label'][idx]}
        save[f'{split}_ids'] = out[split]['input_ids']
        save[f'{split}_mask'] = out[split]['attention_mask']
        save[f'{split}_label'] = out[split]['label']
    os.makedirs(cache_dir, exist_ok=True)
    np.savez(cache, **save)
    return out


# ---------------------------------------------------------------------------
# LM1B / Amazon Polarity (HF-backed with synthetic offline fallback)
# ---------------------------------------------------------------------------

def _synthetic_token_corpus(rs: np.random.RandomState, n: int,
                            vocab: int, mean_len: int):
    """Zipf-distributed word-id sequences (schema stand-in)."""
    lengths = np.clip(rs.poisson(mean_len, n), 4, None)
    return [rs.zipf(1.3, size=int(l)).clip(0, vocab - 1).astype(np.int32)
            for l in lengths]


def load_lm1b(cache_dir: str, tokenizer, block_size: int = 128, *,
              synthetic: bool = False, n_synthetic: int = 2048,
              valid_size: int = 300_000
              ) -> Dict[str, Dict[str, np.ndarray]]:
    """LM1B with the fork's held-out validation split: `valid_size`
    examples carved from train with seed 42 (reference
    dataloader.py:310-343). wrap=False: per-example pad/truncate with
    BOS/EOS (data/lm1b.yaml add_special_tokens=True)."""
    key = hashlib.md5(
        f'lm1b-{block_size}-{synthetic}-{valid_size}'.encode()
    ).hexdigest()[:10]
    cache = os.path.join(cache_dir, f'lm1b_{key}.npz')
    if os.path.exists(cache):
        z = np.load(cache)
        return {s: {'input_ids': z[f'{s}_ids'],
                    'attention_mask': z[f'{s}_mask']}
                for s in ['train', 'validation', 'test']}
    bos = tokenizer.bos_token_id
    eos = tokenizer.eos_token_id
    pad = tokenizer.pad_token_id
    if synthetic:
        rs = np.random.RandomState(0)
        vocab = tokenizer.vocab_size
        def toks(n):
            seqs = _synthetic_token_corpus(rs, n, vocab - 10,
                                           block_size // 2)
            return [[bos] + list(s[:block_size - 2]) + [eos]
                    for s in seqs]
        train_tok = toks(n_synthetic)
        test_tok = toks(max(n_synthetic // 8, 8))
    else:
        try:
            import datasets as hf_datasets
            ds = hf_datasets.load_dataset('lm1b', split='train')
            test = hf_datasets.load_dataset('lm1b', split='test')
            train_tok = [tokenizer.encode(lm1b_detokenizer(t))
                         for t in ds['text']]
            test_tok = [tokenizer.encode(lm1b_detokenizer(t))
                        for t in test['text']]
        except Exception as e:
            raise FileNotFoundError(
                'lm1b dataset unavailable offline; pass '
                f'synthetic=True ({e})') from e
    # 300K-val carve-out, seed 42 (dataloader.py:310-343).
    rs = np.random.RandomState(42)
    perm = rs.permutation(len(train_tok))
    n_val = min(valid_size, len(train_tok) // 10)
    val_idx = set(perm[:n_val].tolist())
    val_tok = [train_tok[i] for i in sorted(val_idx)]
    tr_tok = [t for i, t in enumerate(train_tok) if i not in val_idx]
    out, save = {}, {}
    for split, toks_list in [('train', tr_tok), ('validation', val_tok),
                             ('test', test_tok)]:
        d = pad_texts(toks_list, block_size, pad)
        out[split] = d
        save[f'{split}_ids'] = d['input_ids']
        save[f'{split}_mask'] = d['attention_mask']
    os.makedirs(cache_dir, exist_ok=True)
    np.savez(cache, **save)
    return out


def load_amazon_polarity(cache_dir: str, tokenizer,
                         block_size: int = 128, *,
                         synthetic: bool = False,
                         n_synthetic: int = 512
                         ) -> Dict[str, Dict[str, np.ndarray]]:
    """Amazon Polarity reviews with binary sentiment labels
    (reference dataloader.py:267-307, data/amazon_polarity.yaml)."""
    key = hashlib.md5(
        f'amazon-{block_size}-{synthetic}'.encode()).hexdigest()[:10]
    cache = os.path.join(cache_dir, f'amazon_{key}.npz')
    if os.path.exists(cache):
        z = np.load(cache)
        return {s: {'input_ids': z[f'{s}_ids'],
                    'attention_mask': z[f'{s}_mask'],
                    'label': z[f'{s}_label']}
                for s in ['train', 'test']}
    bos, eos, pad = (tokenizer.bos_token_id, tokenizer.eos_token_id,
                     tokenizer.pad_token_id)
    if synthetic:
        rs = np.random.RandomState(0)
        vocab = tokenizer.vocab_size
        def make(n):
            seqs = _synthetic_token_corpus(rs, n, vocab - 10,
                                           block_size // 2)
            toks_list = [[bos] + list(s[:block_size - 2]) + [eos]
                         for s in seqs]
            labels = rs.randint(0, 2, n).astype(np.int32)
            d = pad_texts(toks_list, block_size, pad, labels)
            return d
        out = {'train': make(n_synthetic),
               'test': make(max(n_synthetic // 8, 8))}
    else:
        try:
            import datasets as hf_datasets
            out = {}
            for split in ['train', 'test']:
                ds = hf_datasets.load_dataset('amazon_polarity',
                                              split=split)
                toks_list = [tokenizer.encode(t)
                             for t in ds['content']]
                out[split] = pad_texts(
                    toks_list, block_size, pad,
                    np.asarray(ds['label'], np.int32))
        except Exception as e:
            raise FileNotFoundError(
                'amazon_polarity unavailable offline; pass '
                f'synthetic=True ({e})') from e
    save = {}
    for split, d in out.items():
        save[f'{split}_ids'] = d['input_ids']
        save[f'{split}_mask'] = d['attention_mask']
        save[f'{split}_label'] = d['label']
    os.makedirs(cache_dir, exist_ok=True)
    np.savez(cache, **save)
    return out


# ---------------------------------------------------------------------------
# Species10 genomics
# ---------------------------------------------------------------------------

_COMPLEMENT = str.maketrans('ACGTacgt', 'TGCAtgca')


def reverse_complement(seq: str) -> str:
    """DNA reverse complement (non-ACGT characters pass through,
    reference ten_species_dataset.py:13-33)."""
    return seq.translate(_COMPLEMENT)[::-1]


def rc_augment(ids: np.ndarray, rng: np.random.RandomState,
               *, tokenizer: Optional[DNATokenizer] = None) -> np.ndarray:
    """Batch-level reverse-complement augmentation on token ids:
    A<->T (7<->10), C<->G (8<->9), sequence reversed; applied per row
    with p=0.5."""
    tok = tokenizer or DNATokenizer()
    lut = np.arange(len(tok.vocab), dtype=ids.dtype)
    a, c, g, t = (tok.vocab[x] for x in 'ACGT')
    lut[a], lut[t] = t, a
    lut[c], lut[g] = g, c
    flip = rng.rand(ids.shape[0]) < 0.5
    out = ids.copy()
    out[flip] = lut[ids[flip]][:, ::-1]
    return out


def load_ten_species(cache_dir: str, max_length: int = 32768, *,
                     synthetic: bool = False, n_synthetic: int = 64
                     ) -> Dict[str, Dict[str, np.ndarray]]:
    """Species10: chunked genomes with species labels; 95/5 split seed
    42 (reference ten_species_dataset.py:35-90)."""
    tok = DNATokenizer()
    if synthetic:
        rs = np.random.RandomState(0)
        # species-dependent base composition so classifiers can learn
        probs = rs.dirichlet(np.ones(4) * 2, size=10)
        ids_list, labels = [], []
        for i in range(n_synthetic):
            label = i % 10
            bases = rs.choice(4, size=max_length, p=probs[label]) + 7
            ids_list.append(bases.astype(np.int32))
            labels.append(label)
        ids = np.stack(ids_list)
        labels = np.asarray(labels, np.int32)
    else:
        try:
            import datasets as hf_datasets
            ds = hf_datasets.load_dataset(
                'yairschiff/ten_species', split='train',
                chunk_length=max_length, overlap=0,
                trust_remote_code=True)
            lut = np.full(256, tok.unk_token_id, np.int32)
            for ch, idx in tok.vocab.items():
                if len(ch) == 1:
                    lut[ord(ch)] = idx
                    lut[ord(ch.lower())] = idx
            ids = np.stack([
                lut[np.frombuffer(
                    s.encode('latin-1')[:max_length], np.uint8)]
                for s in ds['sequence']])
            labels = np.asarray(ds['species_label'], np.int32)
        except Exception as e:
            raise FileNotFoundError(
                'ten_species dataset unavailable offline; pass '
                f'synthetic=True ({e})') from e
    rs = np.random.RandomState(42)
    perm = rs.permutation(len(ids))
    n_test = max(1, int(0.05 * len(perm)))
    test_idx, train_idx = perm[:n_test], perm[n_test:]
    out = {}
    for split, idx in [('train', train_idx), ('test', test_idx)]:
        out[split] = {
            'input_ids': ids[idx],
            'attention_mask': np.ones_like(ids[idx], np.float32),
            'label': labels[idx]}
    return out


# ---------------------------------------------------------------------------
# Discretized CIFAR10
# ---------------------------------------------------------------------------

def load_cifar10(cache_dir: str, *, synthetic: bool = False,
                 n_synthetic: int = 256
                 ) -> Dict[str, Dict[str, np.ndarray]]:
    """Flat (N, 3072) uint8 pixel tokens + class labels
    (reference custom_datasets/discretized_cifar10.py:41-79)."""
    if synthetic:
        rs = np.random.RandomState(0)
        def make(n):
            return {'input_ids': rs.randint(0, 256, (n, 3072)).astype(
                        np.int32),
                    'attention_mask': np.ones((n, 3072), np.float32),
                    'label': rs.randint(0, 10, (n,)).astype(np.int32)}
        return {'train': make(n_synthetic), 'test': make(n_synthetic // 4)}
    import pickle
    base = os.path.join(cache_dir, 'cifar-10-batches-py')
    if not os.path.isdir(base):
        raise FileNotFoundError(
            f'CIFAR-10 python batches not found at {base}; place the '
            'extracted archive there (no network egress), or pass '
            'synthetic=True.')
    def read(files):
        xs, ys = [], []
        for f in files:
            with open(os.path.join(base, f), 'rb') as fh:
                d = pickle.load(fh, encoding='bytes')
            xs.append(np.asarray(d[b'data']))
            ys.append(np.asarray(d[b'labels']))
        x = np.concatenate(xs).astype(np.int32)  # (N, 3072) CHW flat
        y = np.concatenate(ys).astype(np.int32)
        return {'input_ids': x,
                'attention_mask': np.ones_like(x, np.float32),
                'label': y}
    return {'train': read([f'data_batch_{i}' for i in range(1, 6)]),
            'test': read(['test_batch'])}
