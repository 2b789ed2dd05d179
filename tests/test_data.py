"""Data layer tests: tokenizer round-trips, dataset shaping, loader
fault tolerance."""

import os

import numpy as np
import pytest

from ddg_tpu.data import datasets as D
from ddg_tpu.data.loader import FaultTolerantLoader
from ddg_tpu.data.tokenizers import (DummyVisionTokenizer, QM9Tokenizer,
                                     Text8Tokenizer, Zinc250kTokenizer)


class TestText8Tokenizer:
    def test_vocab_layout_parity(self):
        tok = Text8Tokenizer()
        assert tok.vocab_size == 35
        assert tok.vocab['[BOS]'] == 2 and tok.vocab['[EOS]'] == 3
        assert tok.vocab['[MASK]'] == 4 and tok.vocab['[PAD]'] == 5
        assert tok.vocab['a'] == 8 and tok.vocab[' '] == 34

    def test_roundtrip(self):
        tok = Text8Tokenizer()
        ids = tok.encode('hello world', add_special_tokens=False)
        assert tok.decode(ids) == 'hello world'
        ids2 = tok.encode('hello', add_special_tokens=True)
        assert ids2[0] == 2 and ids2[-1] == 3


class TestSMILESTokenizer:
    def test_qm9_vocab_parity(self):
        tok = QM9Tokenizer()
        assert tok.vocab_size == 35  # 5 specials + 30 tokens
        assert tok.vocab['<bos>'] == 0 and tok.vocab['<unk>'] == 4
        assert tok.vocab['#'] == 5 and tok.vocab['o'] == 34

    def test_zinc_vocab_matches_reference_file(self):
        import json
        ref = json.load(open(
            '/root/reference/notebooks/zinc250k_vocab.json'))
        tok = Zinc250kTokenizer()
        for t, i in ref.items():
            assert tok.vocab[t] == i + 5, t
        assert tok.vocab_size == len(ref) + 5

    def test_regex_tokenization(self):
        tok = QM9Tokenizer()
        ids = tok.encode('C[NH3+]c1ccccc1', add_special_tokens=False)
        toks = [tok.ids_to_tokens[i] for i in ids]
        assert toks == ['C', '[NH3+]', 'c', '1', 'c', 'c', 'c', 'c',
                        'c', '1']
        assert tok.decode(tok.encode('C(=O)N')) == 'C(=O)N'


def test_vision_tokenizer_decode_shape():
    tok = DummyVisionTokenizer()
    imgs = tok.batch_decode(np.zeros((2, 3072), np.int32))
    assert imgs.shape == (2, 3, 32, 32)


class TestText8Dataset:
    def test_shapes_and_cache(self, tmp_path):
        data = D.load_text8(str(tmp_path), max_seq_length=64,
                            synthetic=True, synthetic_chars=100_000)
        assert set(data) == {'train', 'validation', 'test'}
        assert data['train']['input_ids'].shape[1] == 64
        assert data['train']['input_ids'].shape[0] == 90_000 // 64
        # ids all within char range (no specials in raw text8)
        assert data['train']['input_ids'].min() >= 8
        # cache round-trip
        data2 = D.load_text8(str(tmp_path), max_seq_length=64,
                             synthetic=True, synthetic_chars=100_000)
        np.testing.assert_array_equal(data['train']['input_ids'],
                                      data2['train']['input_ids'])

    def test_crop_train_doubles_train_len(self, tmp_path):
        data = D.load_text8(str(tmp_path), max_seq_length=64,
                            crop_train=True, synthetic=True,
                            synthetic_chars=100_000)
        assert data['train']['input_ids'].shape[1] == 128
        assert data['validation']['input_ids'].shape[1] == 64

    def test_missing_raw_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            D.load_text8(str(tmp_path / 'nope'), synthetic=False)


class TestGroupAndPad:
    def test_group_texts_wraps_with_bos_eos(self):
        lists = [[10, 11, 12], [13, 14, 15, 16, 17]]
        out = D.group_texts(lists, block_size=5, bos=2, eos=3)
        assert out['input_ids'].shape == (2, 5)
        np.testing.assert_array_equal(out['input_ids'][0],
                                      [2, 10, 11, 12, 3])
        np.testing.assert_array_equal(out['input_ids'][1],
                                      [2, 13, 14, 15, 3])

    def test_pad_texts(self):
        out = D.pad_texts([[1, 2], [1, 2, 3, 4, 5, 6]], block_size=4,
                          pad=0)
        np.testing.assert_array_equal(out['input_ids'],
                                      [[1, 2, 0, 0], [1, 2, 3, 4]])
        np.testing.assert_array_equal(out['attention_mask'],
                                      [[1, 1, 0, 0], [1, 1, 1, 1]])

    def test_percentile_labels(self):
        vals = np.arange(100, dtype=np.float32)
        labels = D.percentile_threshold_labels(vals, 4)
        counts = np.bincount(labels)
        assert len(counts) == 4
        assert counts.min() >= 24  # roughly balanced quartiles


class TestQM9Dataset:
    def test_synthetic_schema(self, tmp_path):
        data = D.load_qm9(str(tmp_path), block_size=32, num_classes=2,
                          synthetic=True)
        for split in ['train', 'test']:
            assert data[split]['input_ids'].shape[1] == 32
            assert set(np.unique(data[split]['label'])) <= {0, 1}
        # seeded split is deterministic
        data2 = D.load_qm9(str(tmp_path), block_size=32, num_classes=2,
                           synthetic=True)
        np.testing.assert_array_equal(data['test']['input_ids'],
                                      data2['test']['input_ids'])


def test_cifar10_synthetic():
    data = D.load_cifar10('/tmp/nonexistent', synthetic=True)
    assert data['train']['input_ids'].shape == (256, 3072)
    assert data['train']['input_ids'].max() < 256


class TestLoader:
    def _data(self, n=64):
        return {'input_ids': np.arange(n)[:, None].repeat(4, 1),
                'attention_mask': np.ones((n, 4), np.float32)}

    def test_epoch_covers_all(self):
        loader = FaultTolerantLoader(self._data(), 8, seed=1,
                                     process_index=0, process_count=1)
        it = iter(loader)
        seen = []
        for _ in range(8):
            seen.append(next(it)['input_ids'][:, 0])
        assert sorted(np.concatenate(seen).tolist()) == list(range(64))

    def test_host_sharding_disjoint(self):
        loaders = [FaultTolerantLoader(self._data(), 8, seed=1,
                                       process_index=i, process_count=2)
                   for i in range(2)]
        seen = [[], []]
        for i, ld in enumerate(loaders):
            it = iter(ld)
            for _ in range(4):
                seen[i].extend(next(it)['input_ids'][:, 0].tolist())
        assert not (set(seen[0]) & set(seen[1]))
        assert len(set(seen[0]) | set(seen[1])) == 64

    def test_resume_mid_epoch(self):
        loader = FaultTolerantLoader(self._data(), 8, seed=3,
                                     process_index=0, process_count=1)
        it = iter(loader)
        consumed = [next(it)['input_ids'][:, 0] for _ in range(3)]
        ckpt = loader.state_dict()
        rest = [next(it)['input_ids'][:, 0] for _ in range(5)]

        loader2 = FaultTolerantLoader(self._data(), 8, seed=3,
                                      process_index=0, process_count=1)
        loader2.load_state_dict(ckpt)
        it2 = iter(loader2)
        rest2 = [next(it2)['input_ids'][:, 0] for _ in range(5)]
        np.testing.assert_array_equal(np.concatenate(rest),
                                      np.concatenate(rest2))


class TestNativeTokenizer:
    def test_smiles_parity_with_regex(self):
        from ddg_tpu.data.native import NativeTrieTokenizer
        from ddg_tpu.data.tokenizers import QM9_TOKENS, QM9Tokenizer
        nat = NativeTrieTokenizer(QM9_TOKENS, unk_id=4, id_offset=5,
                                  mode='smiles')
        ref = QM9Tokenizer()
        for t in ['C[NH3+]c1ccccc1', 'CC(=O)N', 'CFCl', 'BrC(Cl)C',
                  'C%12CC%12', 'Xy[zz', '[C@@H](O)/C=C\\F', '']:
            assert nat.tokenize(t) == ref.encode(
                t, add_special_tokens=False), t

    def test_batch_with_specials(self):
        from ddg_tpu.data.native import NativeTrieTokenizer
        from ddg_tpu.data.tokenizers import QM9_TOKENS
        nat = NativeTrieTokenizer(QM9_TOKENS, unk_id=4, id_offset=5,
                                  mode='smiles')
        ids, mask = nat.tokenize_batch(['CC', 'C(=O)N'], block_size=8,
                                       bos_id=0, eos_id=1, pad_id=3)
        np.testing.assert_array_equal(ids[0], [0, 15, 15, 1, 3, 3, 3, 3])
        np.testing.assert_array_equal(mask[0], [1, 1, 1, 1, 0, 0, 0, 0])

    def test_greedy_mode(self):
        from ddg_tpu.data.native import NativeTrieTokenizer
        nat = NativeTrieTokenizer(['a', 'ab', 'c'], unk_id=99)
        assert nat.tokenize('abca') == [1, 2, 0]   # longest match 'ab'
        assert nat.tokenize('axc') == [0, 99, 2]   # unk passthrough


class TestLM1BAmazonSynthetic:
    def test_lm1b_schema_and_val_carveout(self, tmp_path):
        from ddg_tpu.data.tokenizers import FallbackWordTokenizer
        tok = FallbackWordTokenizer()
        data = D.load_lm1b(str(tmp_path), tok, block_size=32,
                           synthetic=True, n_synthetic=128)
        assert set(data) == {'train', 'validation', 'test'}
        assert data['train']['input_ids'].shape[1] == 32
        assert len(data['validation']['input_ids']) > 0
        # rows start with BOS where unpadded
        assert data['train']['input_ids'][0, 0] == tok.bos_token_id

    def test_amazon_schema(self, tmp_path):
        from ddg_tpu.data.tokenizers import FallbackWordTokenizer
        tok = FallbackWordTokenizer()
        data = D.load_amazon_polarity(str(tmp_path), tok, block_size=32,
                                      synthetic=True, n_synthetic=64)
        assert set(np.unique(data['train']['label'])) <= {0, 1}
        assert data['train']['input_ids'].shape == (64, 32)


def test_prefetch_to_device():
    from ddg_tpu.data.loader import prefetch_to_device
    batches = [{'x': np.full((2, 3), i, np.float32)} for i in range(5)]
    out = list(prefetch_to_device(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b['x']),
                                      batches[i]['x'])


def test_loader_raises_when_batch_exceeds_dataset():
    import pytest as _pytest
    loader = FaultTolerantLoader(
        {'input_ids': np.zeros((4, 2), np.int32),
         'attention_mask': np.ones((4, 2), np.float32)},
        batch_size=8, process_index=0, process_count=1)
    with _pytest.raises(ValueError, match='exceeds'):
        next(iter(loader))


class TestNativePipeline:
    """native/data_pipeline.cpp: the C++ batch assembler must be
    batch-for-batch identical to the pure-Python gather (RNG and
    resume state live in Python; C++ only gathers + prefetches)."""

    def _loaders(self, n=200, batch=16, seed=11, **kw):
        def mk(native):
            data = {
                'input_ids': np.arange(n, dtype=np.int64)[:, None]
                             .repeat(8, 1),
                'attention_mask': np.ones((n, 8), np.float32),
                'label': (np.arange(n, dtype=np.int32) % 7),
            }
            return FaultTolerantLoader(data, batch, seed=seed,
                                       process_index=0,
                                       process_count=1,
                                       native=native, **kw)
        return mk(True), mk(False)

    def _skip_if_no_lib(self):
        import pytest
        from ddg_tpu.data.native import get_pipeline_library
        if get_pipeline_library() is None:
            pytest.skip('native data pipeline not built')

    def test_parity_across_epochs(self):
        self._skip_if_no_lib()
        nat, py = self._loaders()
        it_n, it_p = iter(nat), iter(py)
        for _ in range(30):  # 200//16=12 batches/epoch: crosses epochs
            bn, bp = next(it_n), next(it_p)
            assert set(bn) == set(bp)
            for k in bp:
                np.testing.assert_array_equal(bn[k], bp[k])
                assert bn[k].dtype == bp[k].dtype

    def test_resume_python_to_native(self):
        self._skip_if_no_lib()
        nat, py = self._loaders(seed=5)
        it_p = iter(py)
        for _ in range(7):
            next(it_p)
        nat.load_state_dict(py.state_dict())
        it_n = iter(nat)
        for _ in range(10):
            bn, bp = next(it_n), next(it_p)
            for k in bp:
                np.testing.assert_array_equal(bn[k], bp[k])

    def test_native_true_requires_numpy(self):
        import pytest
        ld = FaultTolerantLoader({'x': [1, 2, 3]}, 1, native=True,
                                 process_index=0, process_count=1)
        with pytest.raises(ValueError):
            next(iter(ld))

    def test_abandoned_iterator_is_safe(self):
        """Dropping the iterator mid-epoch (with `lookahead` batches
        submitted ahead, possibly still being gathered) must join the
        C++ workers via __del__ before the inflight numpy buffers are
        released — no hang, no crash at GC. (The C++ queue is
        unbounded; back-pressure lives in the Python submit window, so
        there is no blocked-producer state to exercise.)"""
        self._skip_if_no_lib()
        import gc
        nat, _ = self._loaders(n=512, batch=8)
        it = iter(nat)
        next(it)                    # start the epoch, fill the queue
        del it, nat
        gc.collect()

    def test_object_dtype_columns_never_reach_cpp(self):
        """object-dtype columns hold raw PyObject*: the C++ memcpy
        would copy pointers without refcounting. auto falls back to
        the Python gather; native=True refuses."""
        data = {'input_ids': np.arange(32, dtype=np.int32).reshape(8, 4),
                'meta': np.array([{'k': i} for i in range(8)],
                                 dtype=object)}
        ld = FaultTolerantLoader(dict(data), 4, native='auto',
                                 process_index=0, process_count=1)
        batch = next(iter(ld))
        assert batch['meta'].dtype == object
        with pytest.raises(ValueError, match='object'):
            next(iter(FaultTolerantLoader(dict(data), 4, native=True,
                                          process_index=0,
                                          process_count=1)))

    def test_take_first_matches_iter(self):
        """take_first (the model-init example path) must be
        bit-identical to next(iter(loader)) including the resume
        counter, so training skips the same batch either way."""
        a, _ = self._loaders(n=64, batch=8)
        b, _ = self._loaders(n=64, batch=8)
        fa, fb = a.take_first(), next(iter(b))
        for k in fa:
            np.testing.assert_array_equal(fa[k], fb[k])
        assert a.state_dict() == b.state_dict()
        na, nb = next(iter(a)), None
        it = iter(b)
        nb = next(it)
        for k in na:
            np.testing.assert_array_equal(na[k], nb[k])

    @pytest.mark.slow
    def test_tsan_stress_gate(self):
        """Race-detection gate (native/check_tsan.sh): the stress
        driver + pipeline built under ThreadSanitizer must run clean
        (epoch churn, mid-flight abandonment, stop-vs-wait race).
        Skips when the sandbox can't run TSAN (ASLR/ptrace limits),
        fails on an actual race report (exitcode 66)."""
        import subprocess
        root = os.path.join(os.path.dirname(__file__), '..')
        r = subprocess.run(
            ['bash', os.path.join(root, 'native', 'check_tsan.sh')],
            capture_output=True, text=True, timeout=600)
        if r.returncode == 0:
            assert 'no races detected' in r.stdout
            return
        blob = r.stdout + r.stderr
        if r.returncode == 66 or 'WARNING: ThreadSanitizer' in blob:
            raise AssertionError(f'data race detected:\n{blob[-3000:]}')
        pytest.skip(f'TSAN unavailable in this sandbox: {blob[-300:]}')
