"""Microbench: fused Pallas ancestry-attend vs the jnp slice+attend path.

Times the beam-step self-attention in isolation at the headline shape
(B=1024 x beam 5 -> N=5120 lanes, 6 layers, h=8, T=21, dk=64), scanned
over the layer axis the way the (since-reverted) stacked-cache decode
step ran its eval layers.  RETAINED EXPERIMENT: production uses
per-layer caches (models/transformer.py:init_state), so this benchmark
measures a layout no production model uses — see ops/anc_attend.py.  The jnp path must materialize each layer's [N, h, T, dk] K/V
slice (dynamic_index_in_dim at a traced layer index); the kernel reads
the stacked cache tiles directly via scalar-prefetch index maps.

Usage: python tools/bench_anc_attend.py [N] [T] [iters]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '.')
from captioning_tpu.ops.anc_attend import anc_attend, anc_attend_ref  # noqa: E402


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 5120
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 21
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    L, h, dk, bw = 6, 8, 64, 5
    D = h * dk
    rng = np.random.default_rng(0)
    t = T - 2  # worst case: nearly full cache
    K = jnp.asarray(rng.standard_normal((N, L, h, T, dk)), jnp.bfloat16)
    V = jnp.asarray(rng.standard_normal((N, L, h, T, dk)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((N, D)), jnp.bfloat16)
    anc = jnp.asarray(rng.integers(0, bw, (N, T)), jnp.int32)

    @jax.jit
    def run_jnp(K, V, q, anc, t):
        def body(x, l):
            return anc_attend_ref(K, V, x, anc, l, t, bw), None
        out, _ = jax.lax.scan(body, q, jnp.arange(L))
        return out

    @jax.jit
    def run_pl(K, V, q, anc, t):
        def body(x, l):
            return anc_attend(K, V, x, anc, l, t, bw), None
        out, _ = jax.lax.scan(body, q, jnp.arange(L))
        return out

    # correctness on this backend (single layer, exact match expected)
    a = anc_attend_ref(K, V, q, anc, jnp.int32(3), jnp.int32(t), bw)
    b = anc_attend(K, V, q, anc, jnp.int32(3), jnp.int32(t), bw)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) -
                                b.astype(jnp.float32))))
    print(f'max_abs_err(single layer) = {err:.3e}')

    for name, fn in [('jnp ', run_jnp), ('plas', run_pl)]:
        out = fn(K, V, q, anc, jnp.int32(t))
        out.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(K, V, q, anc, jnp.int32(t))
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        print(f'{name}: {dt * 1e3:8.3f} ms / 6-layer step '
              f'({dt * 1e6 / 6:7.1f} us/layer)')


if __name__ == '__main__':
    main()
