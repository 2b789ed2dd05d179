"""On-chip sweep: seg x scan_dtype for the selective-scan kernel at the
Species10 shape, fwd and fwd+bwd, with honest sync + correctness vs
the fp32 kernel."""
import time
import jax, jax.numpy as jnp
from ddg_tpu.ops.selective_scan_pallas import selective_scan_pallas

def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    float(jax.device_get(jnp.sum(leaf)))

def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _sync(out)
    return (time.perf_counter() - t0) / iters

ks = jax.random.split(jax.random.PRNGKey(0), 7)
B, L, d, N = 2, 32768, 512, 16
u = jax.random.normal(ks[0], (B, L, d))
delta = jax.nn.softplus(jax.random.normal(ks[1], (B, L, d)) - 1)
A = -jnp.exp(jax.random.normal(ks[2], (d, N)) * 0.5)
Bc = jax.random.normal(ks[3], (B, L, N))
Cc = jax.random.normal(ks[4], (B, L, N))
D = jax.random.normal(ks[5], (d,))
z = jax.random.normal(ks[6], (B, L, d))

K = 16  # amortize the ~30 ms per-dispatch overhead (K>=16, see DESIGN)
ref = None
import sys
SWEEP = [(8, jnp.float32, 'hybrid'), (4, jnp.float32, 'hybrid'),
         (16, jnp.float32, 'hybrid'), (8, jnp.bfloat16, 'hybrid'),
         (16, jnp.bfloat16, 'hybrid')]
if '--pps' in sys.argv:
    SWEEP = [(8, jnp.float32, 'hybrid'), (4, jnp.float32, 'pps'),
             (8, jnp.float32, 'pps'), (16, jnp.float32, 'pps'),
             (32, jnp.float32, 'pps')]
# bf16 retest under pps: the round-3 bf16 negative result was measured
# on the hybrid impl, whose Hillis-Steele levels hit the sub-32-bit
# roll fallback (slice+concat per level). The pps inner loop is
# shift-free (static slices only), so bf16's halved VPU width can now
# show up. Runs at the model-default tiles (512/256 fwd/bwd).
if '--pps-bf16' in sys.argv:
    SWEEP = [(32, jnp.float32, 'pps'), (32, jnp.bfloat16, 'pps'),
             (64, jnp.bfloat16, 'pps'), (16, jnp.bfloat16, 'pps')]
# Sweep the OTHER kernel knobs under pps: (chunk, d_tile, d_tile_bwd,
# seg). Baseline first = current defaults.
SWEEP2 = [(128, 256, 128, 32), (256, 256, 128, 32),
          (512, 256, 128, 32), (128, 512, 128, 32),
          (256, 512, 128, 32), (128, 256, 256, 32),
          (256, 256, 256, 32), (128, 256, 128, 64),
          (256, 256, 128, 64), (256, 256, 256, 64)]
# Round-2 of the sweep: combine the per-knob winners (tb=256 cut
# fwd+bwd 18.42 -> 16.18; seg=64 cut fwd 10.71 -> 9.42) + probe the
# remaining corners at chunk=128 (chunk>=256 with tb=256 VMEM-OOMs).
SWEEP3 = [(128, 256, 256, 64), (128, 512, 256, 64),
          (128, 256, 256, 128), (128, 256, 512, 32)]
# Final confirm: mixed fwd/bwd segments — fwd fastest at seg=64,
# bwd at seg_bwd=32 + tb=256. Entries: (chunk, tf, tb, seg, seg_bwd).
SWEEP4 = [(128, 256, 128, 32, 32),      # current model default
          (128, 256, 256, 64, 32),
          (128, 512, 256, 64, 32),
          (128, 256, 256, 32, 32)]
if '--pps2' in sys.argv:
    SWEEP = [(chunk, dt_f, dt_b, seg) for chunk, dt_f, dt_b, seg
             in SWEEP2]
if '--pps3' in sys.argv:
    SWEEP = [(chunk, dt_f, dt_b, seg) for chunk, dt_f, dt_b, seg
             in SWEEP3]
if '--pps4' in sys.argv:
    SWEEP = list(SWEEP4)
# pps vs pps2 (seeded recompute + fused fwd readout, no h_all/p_cum
# materialization). pps2's smaller VMEM footprint may unlock chunk=256
# configs that OOM'd under pps. Entries: (impl, chunk, tf, tb, seg,
# seg_bwd); baseline first = current model default.
SWEEP5 = [('pps',  128, 512, 256, 32, 32),    # current default
          ('pps2', 128, 512, 256, 32, 32),
          ('pps2', 128, 512, 256, 64, 32),
          ('pps2', 128, 512, 256, 16, 16),
          ('pps2', 256, 512, 256, 32, 32),
          ('pps2', 256, 512, 256, 64, 64),
          ('pps2', 512, 512, 256, 64, 32)]
if '--pps5' in sys.argv:
    SWEEP = list(SWEEP5)
# Grid-overhead probe: vary the grid-step count (B x d/tf x L/chunk)
# at ~fixed total work to find the per-step fixed cost. tb kept small
# at big chunk so the bwd (more live arrays) has VMEM headroom.
SWEEP6 = [('pps2', 128, 512, 256, 64, 32),    # 512 steps (best so far)
          ('pps2', 256, 256, 256, 64, 32),    # 512 steps, same VMEM
          ('pps2', 512, 256, 128, 64, 32),    # 256 steps
          ('pps2', 512, 128, 128, 64, 32),    # 512 fwd / 512 bwd
          ('pps2', 1024, 128, 128, 64, 32),   # 256 fwd steps
          ('pps2', 256, 256, 256, 128, 64)]   # longer inner seg
if '--pps6' in sys.argv:
    SWEEP = list(SWEEP6)
# Decisive default pick: pps vs pps2 at the same seg pairs.
SWEEP7 = [('pps',  128, 512, 256, 64, 32),
          ('pps2', 128, 512, 256, 64, 32),
          ('pps',  128, 512, 256, 64, 64),
          ('pps2', 128, 512, 256, 64, 64)]
if '--pps7' in sys.argv:
    SWEEP = list(SWEEP7)
# pps3's leaner bwd VMEM footprint (no h_all/dh concats) may now fit
# d_tile_bwd=512 (OOM'd under pps/pps2).
SWEEP8 = [('pps3', 128, 512, 256, 64, 64),    # current default
          ('pps3', 128, 512, 512, 64, 64),
          ('pps3', 256, 512, 256, 64, 64),
          ('pps3', 128, 512, 256, 128, 128)]
if '--pps8' in sys.argv:
    SWEEP = list(SWEEP8)
for entry in SWEEP:
    if any(f in sys.argv for f in ('--pps5', '--pps6', '--pps7', '--pps8')):
        impl, chunk, tile_f, tile_b, seg, seg_bwd = entry
        dt = jnp.float32
        tag = (f'{impl:>4} chunk={chunk:>3} tf={tile_f} tb={tile_b} '
               f'seg={seg:>2}/{seg_bwd:>2}')
        one = (lambda *a, impl=impl, chunk=chunk, tile_f=tile_f,
               tile_b=tile_b, seg=seg, seg_bwd=seg_bwd:
               selective_scan_pallas(
                   *a, chunk=chunk, d_tile=tile_f, d_tile_bwd=tile_b,
                   seg=seg, seg_bwd=seg_bwd, scan_impl=impl))
    elif '--pps2' in sys.argv or '--pps3' in sys.argv \
            or '--pps4' in sys.argv:
        if len(entry) == 5:
            chunk, tile_f, tile_b, seg, seg_bwd = entry
        else:
            chunk, tile_f, tile_b, seg = entry
            seg_bwd = seg
        dt, impl = jnp.float32, 'pps'
        tag = (f'chunk={chunk:>3} tf={tile_f} tb={tile_b} '
               f'seg={seg:>2}/{seg_bwd:>2}')
        one = (lambda *a, chunk=chunk, tile_f=tile_f, tile_b=tile_b,
               seg=seg, seg_bwd=seg_bwd: selective_scan_pallas(
                   *a, chunk=chunk, d_tile=tile_f, d_tile_bwd=tile_b,
                   seg=seg, seg_bwd=seg_bwd, scan_impl='pps'))
    else:
        seg, dt, impl = entry
        name = 'bf16' if dt == jnp.bfloat16 else 'fp32'
        tag = f'seg={seg:>2} {name} {impl:>6}'
        one = (lambda *a, seg=seg, dt=dt, impl=impl:
               selective_scan_pallas(*a, seg=seg, scan_dtype=dt,
                                     scan_impl=impl))

    @jax.jit
    def fwdK(u, delta, A, Bc, Cc, D, z, one=one):
        acc = 0.0
        for _ in range(K):
            y = one(u + acc * 1e-20, delta, A, Bc, Cc, D, z)
            acc = jnp.sum(y[0, 0])
        return acc

    @jax.jit
    def fbK(u, delta, A, Bc, Cc, D, z, one=one):
        loss = lambda *b: jnp.sum(one(*b))
        acc = 0.0
        for _ in range(K):
            g = jax.grad(loss, argnums=(0, 1, 3, 4, 6))(
                u + acc * 1e-20, delta, A, Bc, Cc, D, z)[0]
            acc = jnp.sum(g[0, 0])
        return acc

    try:
        y = jax.jit(one)(u, delta, A, Bc, Cc, D, z)
        if ref is None:
            ref = y
        rel = float(jnp.max(jnp.abs(y - ref))
                    / (jnp.max(jnp.abs(ref)) + 1e-9))
        t_f = timeit(fwdK, u, delta, A, Bc, Cc, D, z, iters=3) / K
    except Exception as e:  # e.g. VMEM overflow at big chunk x tile
        print(f'{tag}: fwd FAILED {type(e).__name__}: {str(e)[:120]}',
              flush=True)
        continue
    print(f'{tag}: fwd {t_f*1e3:7.2f} ms  rel-err {rel:.2e}',
          flush=True)
    try:  # bwd separately: a VMEM-OOM here shouldn't hide the fwd win
        t_fb = timeit(fbK, u, delta, A, Bc, Cc, D, z, iters=3) / K
    except Exception as e:
        print(f'{tag}: fwd+bwd FAILED {type(e).__name__}: '
              f'{str(e)[:120]}', flush=True)
        continue
    print(f'{tag}: fwd+bwd {t_fb*1e3:7.2f} ms', flush=True)
