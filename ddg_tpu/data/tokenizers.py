"""Tokenizers: text8 char-level, SMILES regex (QM9 / ZINC250k), vision
dummy, plus an adapter for HF tokenizers when a local cache exists.

Vocabulary layouts are kept bit-identical to the reference so token ids
(and therefore checkpoints/samples) are interchangeable:
  * Text8Tokenizer: specials at 0..7, 'a'..'z' + ' ' at 8..34
    (reference dataloader.py:49-101);
  * SMILESTokenizer: bos=0, eos=1, mask=2, pad=3, unk=4, dataset tokens
    at +5 (reference tokenizer.py:94-102); QM9/ZINC vocabularies are the
    published token inventories of yairschiff/{qm9,zinc250k}-tokenizer
    (mirrored in reference notebooks/{qm9,zinc250k}_vocab.json).

Self-contained: no `transformers` dependency in the core classes (the
framework runs offline); `HFTokenizerAdapter` wraps AutoTokenizer when
assets are available (lm1b/amazon use bert-base-uncased in the
reference, dataloader.py:445-485).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence

import numpy as np


class Tokenizer:
    """Minimal tokenizer protocol used across the framework."""

    vocab: Dict[str, int]

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    # Special-token ids; None when absent.
    bos_token_id: Optional[int] = None
    eos_token_id: Optional[int] = None
    pad_token_id: Optional[int] = None
    mask_token_id: Optional[int] = None
    unk_token_id: Optional[int] = None

    def _tokenize(self, text: str) -> List[str]:
        raise NotImplementedError

    def encode(self, text: str, add_special_tokens: bool = True
               ) -> List[int]:
        ids = [self.vocab.get(t, self.unk_token_id)
               for t in self._tokenize(text)]
        if add_special_tokens:
            return self._with_specials(ids)
        return ids

    def _with_specials(self, ids: List[int]) -> List[int]:
        out = list(ids)
        if self.bos_token_id is not None:
            out = [self.bos_token_id] + out
        if self.eos_token_id is not None:
            out = out + [self.eos_token_id]
        return out

    def decode(self, ids: Sequence[int],
               skip_special_tokens: bool = True) -> str:
        toks = []
        for i in ids:
            tok = self.ids_to_tokens.get(int(i), '')
            if skip_special_tokens and int(i) in self.special_ids:
                continue
            toks.append(tok)
        return self.convert_tokens_to_string(toks)

    def batch_decode(self, batch, skip_special_tokens: bool = True
                     ) -> List[str]:
        return [self.decode(row, skip_special_tokens)
                for row in np.asarray(batch)]

    def convert_tokens_to_string(self, tokens: List[str]) -> str:
        return ''.join(tokens)

    @property
    def ids_to_tokens(self) -> Dict[int, str]:
        if not hasattr(self, '_ids_to_tokens'):
            self._ids_to_tokens = {v: k for k, v in self.vocab.items()}
        return self._ids_to_tokens

    _extra_special_ids: frozenset = frozenset()

    @property
    def special_ids(self):
        return {i for i in [self.bos_token_id, self.eos_token_id,
                            self.pad_token_id, self.mask_token_id,
                            self.unk_token_id] if i is not None
                } | set(self._extra_special_ids)


class Text8Tokenizer(Tokenizer):
    """27-character text8 vocabulary + 8 specials
    (layout parity: reference dataloader.py:49-101)."""

    def __init__(self):
        chars = list('abcdefghijklmnopqrstuvwxyz ')
        self.vocab = {'[CLS]': 0, '[SEP]': 1, '[BOS]': 2, '[EOS]': 3,
                      '[MASK]': 4, '[PAD]': 5, '[RESERVED]': 6,
                      '[UNK]': 7,
                      **{ch: i + 8 for i, ch in enumerate(chars)}}
        self.bos_token_id = 2
        self.eos_token_id = 3
        self.mask_token_id = 4
        self.pad_token_id = 5
        self.unk_token_id = 7
        # CLS/SEP/RESERVED also skip on decode (HF all-special-ids
        # behavior of the reference tokenizer).
        self._extra_special_ids = frozenset({0, 1, 6})

    def _tokenize(self, text: str) -> List[str]:
        return list(text.lower())


# Published token inventories (data, not code) of the QM9 / ZINC250k
# SMILES tokenizers used by the reference (yairschiff/qm9-tokenizer and
# yairschiff/zinc250k-tokenizer vocab.json), in id order.
QM9_TOKENS = [
    '#', '(', ')', '-', '1', '2', '3', '4', '5', '=', 'C', 'F', 'N',
    'O', '[C-]', '[CH-]', '[N+]', '[N-]', '[NH+]', '[NH2+]', '[NH3+]',
    '[O-]', '[c-]', '[cH-]', '[n-]', '[nH+]', '[nH]', 'c', 'n', 'o',
]
ZINC250K_TOKENS = [
    '#', '(', ')', '-', '/', '1', '2', '3', '4', '5', '6', '7', '8',
    '=', 'Br', 'C', 'Cl', 'F', 'I', 'N', 'O', 'P', 'S', '[C@@H]',
    '[C@@]', '[C@H]', '[C@]', '[CH-]', '[CH2-]', '[N+]', '[N-]',
    '[NH+]', '[NH-]', '[NH2+]', '[NH3+]', '[O+]', '[O-]', '[OH+]',
    '[P+]', '[P@@H]', '[P@@]', '[P@]', '[PH+]', '[PH2]', '[PH]',
    '[S+]', '[S-]', '[S@@+]', '[S@@]', '[S@]', '[SH+]', '[n+]',
    '[n-]', '[nH+]', '[nH]', '[o+]', '[s+]', '\\', 'c', 'n', 'o', 's',
]

# Regex pattern from github.com/pschwllr/MolecularTransformer (also used
# by the reference, tokenizer.py:106-111).
SMILES_PATTERN = (
    r"(\[[^\]]+]|Br?|Cl?|N|O|S|P|F|I|b|c|n|o|s|p|\(|\)|\.|=|#|-|\+|"
    r"\\|\/|:|~|@|\?|>|\*|\$|\%[0-9]{2}|[0-9])")


class SMILESTokenizer(Tokenizer):
    """Regex SMILES tokenizer; specials bos/eos/mask/pad/unk at 0..4
    followed by the dataset token inventory (reference
    tokenizer.py:77-144)."""

    def __init__(self, base_tokens: Sequence[str]):
        self.vocab = {'<bos>': 0, '<eos>': 1, '<mask>': 2, '<pad>': 3,
                      '<unk>': 4,
                      **{t: i + 5 for i, t in enumerate(base_tokens)}}
        self.bos_token_id = 0
        self.eos_token_id = 1
        self.mask_token_id = 2
        self.pad_token_id = 3
        self.unk_token_id = 4
        self._regex = re.compile(SMILES_PATTERN)

    def _tokenize(self, text: str) -> List[str]:
        return self._regex.findall(text)

    def convert_tokens_to_string(self, tokens: List[str]) -> str:
        return ''.join(tokens).strip()


def QM9Tokenizer() -> SMILESTokenizer:
    return SMILESTokenizer(QM9_TOKENS)


def Zinc250kTokenizer() -> SMILESTokenizer:
    return SMILESTokenizer(ZINC250K_TOKENS)


class DummyVisionTokenizer(Tokenizer):
    """Identity 'tokenizer' for discretized images: ids are pixel values
    (reference custom_datasets/discretized_cifar10.py:7-38; including its
    quirk that bos reuses the mask id when both are enabled).

    decode returns the (B, 3072) flat pixel array reshaped to images.
    """

    def __init__(self, vocab_size: int = 256, image_size: int = 32,
                 add_mask_token: bool = True,
                 add_special_tokens: bool = True):
        base = vocab_size
        self.pad_token_id = None
        if add_mask_token:
            self.mask_token_id = base
            vocab_size = base + 1
        else:
            self.mask_token_id = None
        if add_special_tokens:
            self.bos_token_id = base
            self.eos_token_id = base + 1
            vocab_size = vocab_size + 2
        self._vocab_size = vocab_size
        self.image_size = image_size
        self.image_shape = (3, image_size, image_size)
        self.vocab = {str(i): i for i in range(vocab_size)}

    @property
    def vocab_size(self) -> int:
        return self._vocab_size

    def batch_decode(self, batch, skip_special_tokens: bool = True):
        arr = np.asarray(batch)
        return arr.reshape(arr.shape[0], *self.image_shape)


class DNATokenizer(Tokenizer):
    """Character-level DNA tokenizer, vocabulary-compatible with the
    HyenaDNA/Caduceus CharacterTokenizer used by the reference for
    Species10 (kuleshov-group/caduceus-*, reference
    configs/data/ten_species.yaml): specials [CLS]=0 [SEP]=1 [BOS]=2
    [MASK]=3 [PAD]=4 [RESERVED]=5 [UNK]=6, then A C G T N at 7..11."""

    def __init__(self):
        chars = list('ACGTN')
        self.vocab = {'[CLS]': 0, '[SEP]': 1, '[BOS]': 2, '[MASK]': 3,
                      '[PAD]': 4, '[RESERVED]': 5, '[UNK]': 6,
                      **{ch: i + 7 for i, ch in enumerate(chars)}}
        self.bos_token_id = 2
        self.eos_token_id = 1  # SEP doubles as EOS (CharacterTokenizer)
        self.mask_token_id = 3
        self.pad_token_id = 4
        self.unk_token_id = 6
        self._extra_special_ids = frozenset({0, 5})

    def _tokenize(self, text: str) -> List[str]:
        return list(text.upper())


class FallbackWordTokenizer(Tokenizer):
    """Stand-in word-level tokenizer with a bert-like special-token
    layout, used for synthetic lm1b/amazon data in offline environments
    (the real runs use bert-base-uncased via HFTokenizerAdapter)."""

    def __init__(self, vocab_size: int = 30522):
        self._vocab_size = vocab_size
        self.pad_token_id = 0
        self.unk_token_id = 100
        self.bos_token_id = 101   # [CLS]
        self.eos_token_id = 102   # [SEP]
        self.mask_token_id = 103  # [MASK]
        self.vocab = {}

    @property
    def vocab_size(self) -> int:
        return self._vocab_size

    def encode(self, text, add_special_tokens: bool = True):
        ids = [(hash(w) % (self._vocab_size - 1000)) + 1000
               for w in text.split()]
        if add_special_tokens:
            return [self.bos_token_id] + ids + [self.eos_token_id]
        return ids

    def decode(self, ids, skip_special_tokens: bool = True):
        out = []
        for i in ids:
            i = int(i)
            if skip_special_tokens and i in self.special_ids:
                continue
            out.append(f'w{i}')
        return ' '.join(out)


class HFTokenizerAdapter(Tokenizer):
    """Wrap a transformers tokenizer (bert-base-uncased, gpt2, ...) into
    the local protocol, applying the reference's special-token fixups
    (BOS<-CLS, EOS<-SEP, add [PAD] if absent; dataloader.py:460-485)."""

    def __init__(self, name_or_path: str):
        from transformers import AutoTokenizer
        tok = AutoTokenizer.from_pretrained(name_or_path)
        if tok.bos_token is None and tok.cls_token is not None:
            tok.bos_token = tok.cls_token
        if tok.eos_token is None and tok.sep_token is not None:
            tok.eos_token = tok.sep_token
        if tok.pad_token is None:
            tok.add_special_tokens({'pad_token': '[PAD]'})
        self.hf = tok
        self.bos_token_id = tok.bos_token_id
        self.eos_token_id = tok.eos_token_id
        self.pad_token_id = tok.pad_token_id
        self.mask_token_id = tok.mask_token_id
        self.unk_token_id = tok.unk_token_id
        self.vocab = tok.get_vocab()

    def encode(self, text: str, add_special_tokens: bool = True):
        return self.hf.encode(text, add_special_tokens=add_special_tokens)

    def decode(self, ids, skip_special_tokens: bool = True):
        return self.hf.decode(ids, skip_special_tokens=skip_special_tokens)

    def batch_decode(self, batch, skip_special_tokens: bool = True):
        return self.hf.batch_decode(
            np.asarray(batch), skip_special_tokens=skip_special_tokens)


def get_tokenizer(dataset_name: str, hf_name: Optional[str] = None
                  ) -> Tokenizer:
    """Dataset -> tokenizer dispatch (reference dataloader.py:445-485)."""
    if dataset_name == 'text8':
        return Text8Tokenizer()
    if dataset_name == 'qm9':
        return QM9Tokenizer()
    if dataset_name == 'zinc250k':
        return Zinc250kTokenizer()
    if dataset_name == 'cifar10':
        return DummyVisionTokenizer()
    if dataset_name == 'ten_species':
        return DNATokenizer()
    try:
        return HFTokenizerAdapter(hf_name or 'bert-base-uncased')
    except Exception:
        # Offline fallback keeps the pipeline runnable with synthetic
        # data; real runs need the HF tokenizer assets in the cache.
        return FallbackWordTokenizer()
