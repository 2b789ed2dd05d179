"""ctypes binding for the native tokenization library
(native/fast_tokenize.cpp), with automatic build and pure-Python
fallback.

Usage:
    tok = NativeTrieTokenizer(QM9_TOKENS, unk_id=4)
    ids, mask = tok.tokenize_batch(smiles_list, block_size=32,
                                   bos_id=0, eos_id=1, pad_id=3)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), '..', '..',
                         'native', 'libfast_tokenize.so')


def _build_and_load(path: str) -> Optional[ctypes.CDLL]:
    """Load the shared library, (re)building it when missing OR stale
    (source .cpp newer than the .so — a stale binary would load fine
    and then crash on a changed/missing symbol)."""
    path = os.path.abspath(path)
    src = os.path.join(os.path.dirname(path),
                       os.path.basename(os.path.splitext(path)[0])
                       .removeprefix('lib') + '.cpp')
    stale = (os.path.exists(src) and os.path.exists(path)
             and os.path.getmtime(src) > os.path.getmtime(path))
    if not os.path.exists(path) or stale:
        build = os.path.join(os.path.dirname(path), 'build.sh')
        try:
            subprocess.run(['bash', build, os.path.basename(path)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        return ctypes.CDLL(path)
    except OSError:
        return None


def _load_library() -> Optional[ctypes.CDLL]:
    lib = _build_and_load(_LIB_PATH)
    if lib is None:
        return None
    try:
        _bind_tokenize_prototypes(lib)
    except AttributeError:  # symbol missing (stale/foreign binary)
        return None
    return lib


def _bind_tokenize_prototypes(lib: ctypes.CDLL) -> None:
    lib.ddg_trie_new.restype = ctypes.c_void_p
    lib.ddg_trie_new.argtypes = [ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.c_int32),
                                 ctypes.c_int32]
    lib.ddg_trie_free.argtypes = [ctypes.c_void_p]
    lib.ddg_trie_tokenize.restype = ctypes.c_int32
    lib.ddg_trie_tokenize.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
    lib.ddg_trie_tokenize_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float)]
    lib.ddg_smiles_tokenize.restype = ctypes.c_int32
    lib.ddg_smiles_tokenize.argtypes = lib.ddg_trie_tokenize.argtypes
    lib.ddg_smiles_tokenize_batch.argtypes = \
        lib.ddg_trie_tokenize_batch.argtypes


_LIB = None


def get_library() -> Optional[ctypes.CDLL]:
    # Success is cached; failure is NOT (a transient condition — g++
    # missing, read-only checkout — would otherwise disable the native
    # path for the process lifetime). Retries are rare (one per
    # tokenizer/loader construction) and fail fast.
    global _LIB
    if _LIB is None:
        _LIB = _load_library()
    return _LIB


class NativeTrieTokenizer:
    """Greedy longest-match tokenizer over a fixed inventory.

    For SMILES inventories (bracket atoms, Br/Cl) greedy longest match
    agrees with the reference's regex tokenization; falls back to a
    Python trie when the native library is unavailable.
    """

    def __init__(self, tokens: Sequence[str], unk_id: int,
                 id_offset: int = 0, mode: str = 'greedy'):
        # mode='smiles' uses the exact SMILES regex lexer (reference
        # tokenizer.py:106-111 parity: Cl/Br units, bracket atoms, and
        # silent dropping of unmatched characters).
        self.tokens = list(tokens)
        self.unk_id = unk_id
        self.id_offset = id_offset
        self.mode = mode
        self._lib = get_library()
        if self._lib is not None:
            blob = b''.join(t.encode() for t in tokens)
            lengths = np.asarray([len(t.encode()) for t in tokens],
                                 np.int32)
            self._handle = self._lib.ddg_trie_new(
                blob, lengths.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_int32)), len(tokens))
        else:
            self._py_trie = {}
            for i, t in enumerate(tokens):
                node = self._py_trie
                for ch in t:
                    node = node.setdefault(ch, {})
                node['__id__'] = i

    @property
    def native(self) -> bool:
        return self._lib is not None

    def __del__(self):
        if getattr(self, '_lib', None) is not None \
                and getattr(self, '_handle', None):
            try:
                self._lib.ddg_trie_free(self._handle)
            except Exception:
                pass

    def tokenize(self, text: str) -> List[int]:
        if self._lib is not None:
            data = text.encode()
            out = np.empty(len(data) + 1, np.int32)
            fn = (self._lib.ddg_smiles_tokenize
                  if self.mode == 'smiles'
                  else self._lib.ddg_trie_tokenize)
            n = fn(
                self._handle, data, len(data),
                self.unk_id - self.id_offset,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(out))
            return [int(i) + self.id_offset for i in out[:n]]
        # Python fallback
        if self.mode == 'smiles':
            import re
            from ddg_tpu.data.tokenizers import SMILES_PATTERN
            vocab = {t: i for i, t in enumerate(self.tokens)}
            return [vocab.get(t, self.unk_id - self.id_offset)
                    + self.id_offset
                    for t in re.findall(SMILES_PATTERN, text)]
        ids, i = [], 0
        while i < len(text):
            node, best, blen = self._py_trie, None, 0
            for j in range(i, len(text)):
                node = node.get(text[j])
                if node is None:
                    break
                if '__id__' in node:
                    best, blen = node['__id__'], j - i + 1
            if best is not None:
                ids.append(best + self.id_offset)
                i += blen
            else:
                ids.append(self.unk_id)
                i += 1
        return ids

    def tokenize_batch(self, texts: Sequence[str], *, block_size: int,
                       bos_id: int = -1, eos_id: int = -1,
                       pad_id: int = 0
                       ) -> Tuple[np.ndarray, np.ndarray]:
        n = len(texts)
        if self._lib is not None:
            data = b''.join(t.encode() for t in texts)
            offsets = np.zeros(n + 1, np.int64)
            np.cumsum([len(t.encode()) for t in texts],
                      out=offsets[1:])
            ids = np.empty((n, block_size), np.int32)
            mask = np.empty((n, block_size), np.float32)
            off = self.id_offset
            disabled = -1000000
            batch_fn = (self._lib.ddg_smiles_tokenize_batch
                        if self.mode == 'smiles'
                        else self._lib.ddg_trie_tokenize_batch)
            batch_fn(
                self._handle, data,
                offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                n, self.unk_id - off,
                bos_id - off if bos_id >= 0 else disabled,
                eos_id - off if eos_id >= 0 else disabled,
                pad_id - off, block_size,
                ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            ids = ids + off
            return ids, mask
        ids = np.full((n, block_size), pad_id, np.int32)
        mask = np.zeros((n, block_size), np.float32)
        for r, t in enumerate(texts):
            row = self.tokenize(t)
            if bos_id >= 0:
                row = [bos_id] + row
            row = row[:block_size]
            if eos_id >= 0 and len(row) < block_size:
                row.append(eos_id)
            ids[r, :len(row)] = row
            mask[r, :len(row)] = 1.0
        return ids, mask


# --------------------------------------------------------------------
# Native batch-assembly pipeline (native/data_pipeline.cpp)
# --------------------------------------------------------------------

_PIPE_LIB_PATH = os.path.join(os.path.dirname(__file__), '..', '..',
                              'native', 'libdata_pipeline.so')
_PIPE_LIB = None


def _load_pipeline_library() -> Optional[ctypes.CDLL]:
    lib = _build_and_load(_PIPE_LIB_PATH)
    if lib is None:
        return None
    try:
        _bind_pipeline_prototypes(lib)
    except AttributeError:  # symbol missing (stale/foreign binary)
        return None
    return lib


def _bind_pipeline_prototypes(lib: ctypes.CDLL) -> None:
    lib.ddg_loader_new.restype = ctypes.c_void_p
    lib.ddg_loader_new.argtypes = [
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int32]
    lib.ddg_loader_set_columns.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p)]
    lib.ddg_loader_start_epoch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64]
    lib.ddg_loader_submit.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_void_p)]
    lib.ddg_loader_wait.restype = ctypes.c_int32
    lib.ddg_loader_wait.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.ddg_loader_stop.argtypes = [ctypes.c_void_p]
    lib.ddg_loader_free.argtypes = [ctypes.c_void_p]


def get_pipeline_library() -> Optional[ctypes.CDLL]:
    # Success cached, failure retried (see get_library).
    global _PIPE_LIB
    if _PIPE_LIB is None:
        _PIPE_LIB = _load_pipeline_library()
    return _PIPE_LIB


class NativeBatchPipeline:
    """Multi-threaded batch assembler over in-memory numpy columns.

    The reference's torch DataLoader runs gather/collate in native
    worker processes (/root/reference/dataloader.py:536-562); this is
    the framework's equivalent. Row gather runs in C++ threads
    entirely outside the GIL, writing DIRECTLY into the numpy arrays
    that will be yielded. Prefetch is bounded on the PYTHON side: the
    consumer submits at most `lookahead` batches ahead of what it has
    consumed (the C++ work queue itself never fills up and workers
    never block on back-pressure), so the critical-path cost of one
    batch is a condvar wait. Python retains RNG / epoch-order /
    fault-tolerance semantics (see loader.FaultTolerantLoader).

    Raises RuntimeError at construction when the native library is
    unavailable — callers fall back to the pure-Python gather.
    """

    def __init__(self, data, batch_size: int, *, n_threads: int = 2,
                 lookahead: int = 3):
        lib = get_pipeline_library()
        if lib is None:
            raise RuntimeError('native data pipeline unavailable')
        self._lib = lib
        self._names = list(data.keys())
        # C-contiguous views; kept alive for the pipeline's lifetime.
        self._cols = [np.ascontiguousarray(data[k]) for k in self._names]
        self.batch_size = int(batch_size)
        self.lookahead = max(1, int(lookahead))
        row_bytes = np.asarray(
            [c.itemsize * int(np.prod(c.shape[1:], dtype=np.int64))
             for c in self._cols], np.int64)
        self._handle = lib.ddg_loader_new(
            len(self._cols),
            row_bytes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            self.batch_size, n_threads)
        bases = (ctypes.c_void_p * len(self._cols))(
            *[c.ctypes.data_as(ctypes.c_void_p).value
              for c in self._cols])
        lib.ddg_loader_set_columns(self._handle, bases)
        self._order = None    # keep the epoch permutation alive for C++
        self._inflight = {}   # seq -> batch dict (C++ writes into it)

    def __del__(self):
        lib = getattr(self, '_lib', None)
        if lib is not None and getattr(self, '_handle', None):
            try:
                # joins workers before the inflight numpy buffers and
                # the order array can be released
                lib.ddg_loader_free(self._handle)
            except Exception:
                pass
            self._handle = None

    def _submit(self, seq: int):
        outs = [np.empty((self.batch_size,) + c.shape[1:], c.dtype)
                for c in self._cols]
        ptrs = (ctypes.c_void_p * len(outs))(
            *[o.ctypes.data_as(ctypes.c_void_p).value for o in outs])
        self._inflight[seq] = dict(zip(self._names, outs))
        self._lib.ddg_loader_submit(self._handle, seq, ptrs)

    def run_epoch(self, order: np.ndarray, start_batch: int = 0):
        """Yield (batch_index, {col: (B, ...) array}) in order, with
        the gather running in the background C++ threads."""
        self._order = np.ascontiguousarray(order, np.int64)
        self._inflight.clear()
        self._lib.ddg_loader_start_epoch(
            self._handle,
            self._order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(self._order))
        n_batches = len(self._order) // self.batch_size
        start_batch = int(start_batch)
        for b in range(start_batch,
                       min(start_batch + self.lookahead, n_batches)):
            self._submit(b)
        for b in range(start_batch, n_batches):
            if b + self.lookahead < n_batches:
                self._submit(b + self.lookahead)
            if self._lib.ddg_loader_wait(self._handle, b) != 0:
                return
            yield b, self._inflight.pop(b)

    def stop(self):
        self._lib.ddg_loader_stop(self._handle)
