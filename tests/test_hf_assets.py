"""Asset on-ramp tests.

The always-run test exercises scripts/verify_real_weight_parity.py in
synthetic stand-in mode (same loader/convert/mirror code path the real
kuleshov-group checkpoints will take). The `hf_assets`-marked tests run
only when DDG_HF_ASSETS_DIR points at real assets — the zero-code-change
flip the VERDICT asked for (BASELINE.json real-weight parity bar;
reference README.md:231-250, eval_utils.py:28-90).
"""

import os
import sys

import pytest

SCRIPTS = os.path.join(os.path.dirname(__file__), '..', 'scripts')
sys.path.insert(0, SCRIPTS)

ASSETS = os.environ.get('DDG_HF_ASSETS_DIR', '/root/hf_assets')
HAVE_REAL = os.path.isfile(os.path.join(ASSETS, 'udlm-lm1b',
                                        'config.json'))


def test_parity_onramp_synthetic(tmp_path):
    """Synthetic stand-in mode: the exact real-weight code path
    (hub-layout folder -> import_hf_udlm -> flax DIT vs torch mirror
    of reference dit.py) passes the 1e-3 bar."""
    import verify_real_weight_parity as V

    ckpt_dir, is_real = V.ensure_checkpoint(str(tmp_path / 'none'),
                                            str(tmp_path))
    assert not is_real
    diff = V.check_parity(ckpt_dir, is_real)
    assert diff < 1e-3


@pytest.mark.hf_assets
@pytest.mark.skipif(not HAVE_REAL, reason='no real HF assets on disk')
def test_parity_real_checkpoint(tmp_path):
    import verify_real_weight_parity as V

    ckpt_dir, is_real = V.ensure_checkpoint(ASSETS, str(tmp_path))
    assert is_real
    V.check_parity(ckpt_dir, is_real)


@pytest.mark.hf_assets
@pytest.mark.skipif(
    not os.path.isdir(os.path.join(ASSETS, 'gpt2-large')),
    reason='no gpt2-large judge on disk')
def test_gen_ppl_real_judge(tmp_path):
    import verify_real_weight_parity as V

    ckpt_dir, _ = V.ensure_checkpoint(ASSETS, str(tmp_path))
    V.maybe_gen_ppl(ASSETS, ckpt_dir)
