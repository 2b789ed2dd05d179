"""On-chip ancestral T=1000 composition sweep (VERDICT r3 next #3).

Measures the literal north-star line (reference diffusion.py:1281-1376,
T=1000 ancestral D-CFG) with the perf knobs COMPOSED instead of
separate: int8 dynamic-quant trunk(+head), feature-mix CFG (always on
via sampler.fused), and the head-fused sampling kernel. Round-3
measured the knobs individually (bf16 fused 3.00/s = 1.36x, int8
3.50/s = 1.59x at B=24); this sweep asks whether the composition (and
a batch retune under int8) reaches >=1.8x.

One process, one TPU job: each variant is its own jit; nothing is
donated, so there is no cross-variant buffer interference (the
round-4 fused-block A/B taught us donation is what breaks same-process
A/Bs). Run:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/drive_ancestral_compose_tpu.py
"""
import argparse
import sys

sys.path.insert(0, '/root/repo')

import bench  # noqa: E402


def ns(**kw):
    base = dict(quick=False, batch=None, steps=1000, cache=False,
                fused=None, fused_head=False, int8=False, accum=1,
                fp32=False)
    base.update(kw)
    return argparse.Namespace(**base)


VARIANTS = [
    # (tag, args) — ordered cheapest-compile first so early output
    # confirms the process is healthy.
    ('int8+fmix B=24 (round-3 tie point)', ns(int8=True, batch=24)),
    ('int8+fmix B=32', ns(int8=True, batch=32)),
    ('int8+fmix+fused-head B=24',
     ns(int8=True, fused_head=True, batch=24)),
    ('int8+fmix+fused-head B=32',
     ns(int8=True, fused_head=True, batch=32)),
    ('bf16+fmix+fused-head B=24 (isolate fh)',
     ns(fused_head=True, batch=24)),
]


def main():
    import jax
    print('devices:', jax.devices(), flush=True)
    for tag, args in VARIANTS:
        print(f'--- variant: {tag}', flush=True)
        try:
            bench.bench_sampling(args, first_hitting=False)
        except Exception as e:  # keep sweeping on a single failure
            print(f'variant {tag} FAILED: {type(e).__name__}: {e}',
                  flush=True)


if __name__ == '__main__':
    main()
