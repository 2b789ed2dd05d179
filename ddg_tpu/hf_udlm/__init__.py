"""Torch-side HF remote-code package shipped with `export_hf_udlm`
output folders (parity: /root/reference/models/hf/__init__.py; the
reference publishes kuleshov-group/udlm-* with these two modules as
`trust_remote_code` files).

These files are COPIED INTO the exported checkpoint directory so that
`transformers.AutoModelForMaskedLM.from_pretrained(out_dir,
trust_remote_code=True)` reconstructs the model without this repo on
the path — the same contract the reference's hub checkpoints honor.
"""

from ddg_tpu.hf_udlm.configuration_udlm import UDLMConfig
from ddg_tpu.hf_udlm.modeling_udlm import UDLM

__all__ = ['UDLMConfig', 'UDLM']
