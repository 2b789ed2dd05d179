"""On-chip validation of the dt-lowrank selective-scan kernel.

Compares selective_scan_pallas_dtlr (dt_proj + softplus fused
in-kernel) against the composite path — softplus(dtlr @ W + b) fed to
the plain Pallas kernel — on the REAL TPU (interpret mode was already
checked in tests/test_selective_scan_pallas.py; this catches Mosaic
lowering differences the interpreter can't).

Checks forward values and all nine gradients, at a chunk-aligned
Species10-block-like shape, for (seg=8, seg_bwd=None) and the
measured-fastest (seg=8, seg_bwd=4) schedule.

Usage: PYTHONPATH=/root/repo python scripts/validate_dtlr_tpu.py
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ddg_tpu.ops.selective_scan_pallas import (selective_scan_pallas,
                                               selective_scan_pallas_dtlr)

B, L, d, N, R = 2, 1024, 512, 16, 16
CHUNK = 128


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 9)
    u = jax.random.normal(ks[0], (B, L, d))
    dtlr = jax.random.normal(ks[1], (B, L, R)) * 0.5
    Wdt = jax.random.normal(ks[2], (R, d)) * 0.3
    bdt = jax.random.normal(ks[3], (d,)) - 1.0
    A = -jnp.exp(jax.random.normal(ks[4], (d, N)) * 0.5)
    Bc = jax.random.normal(ks[5], (B, L, N))
    Cc = jax.random.normal(ks[6], (B, L, N))
    Dp = jax.random.normal(ks[7], (d,))
    z = jax.random.normal(ks[8], (B, L, d))
    args = (u, dtlr, Wdt, bdt, A, Bc, Cc, Dp, z)
    w = jax.random.normal(jax.random.PRNGKey(1), (B, L, d))

    def composite(u, dtlr, Wdt, bdt, A, Bc, Cc, Dp, z):
        # precision=HIGHEST: the TPU default is single-pass bf16,
        # which injects ~1e-3 into dt (then exp-amplified in the
        # recurrence). The fused kernel runs its in-kernel dt matmul
        # at HIGHEST, so the reference must too.
        pre = jax.lax.dot_general(
            dtlr, Wdt, (((2,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST) + bdt
        delta = jax.nn.softplus(pre)
        return selective_scan_pallas(u, delta, A, Bc, Cc, Dp, z,
                                     chunk=CHUNK)

    names = ['u', 'dtlr', 'Wdt', 'bdt', 'A', 'B', 'C', 'D', 'z']
    ref_y = np.asarray(jax.jit(composite)(*args))
    g_ref = jax.jit(jax.grad(lambda *a: (composite(*a) * w).sum(),
                             argnums=tuple(range(9))))(*args)
    g_ref = [np.asarray(g) for g in g_ref]

    for seg_bwd in (None, 4):
        lr = functools.partial(selective_scan_pallas_dtlr, chunk=CHUNK,
                               seg_bwd=seg_bwd)
        y = np.asarray(jax.jit(lambda *a: lr(*a))(*args))
        err = np.abs(y - ref_y).max() / (np.abs(ref_y).max() + 1e-9)
        print(f'seg_bwd={seg_bwd}: fwd rel-err {err:.2e}', flush=True)
        assert err < 1e-5, f'forward mismatch (seg_bwd={seg_bwd})'
        g = jax.jit(jax.grad(lambda *a: (lr(*a) * w).sum(),
                             argnums=tuple(range(9))))(*args)
        for name, a, b in zip(names, g, g_ref):
            a = np.asarray(a)
            rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
            print(f'  grad {name}: rel-err {rel:.2e}', flush=True)
            assert rel < 5e-4, f'grad {name} (seg_bwd={seg_bwd})'
    print('OK: dt-lowrank kernel matches composite on chip')


if __name__ == '__main__':
    main()
