"""Microbenchmark: greedy/sample decode self-attention cache layouts.

Current greedy cache is [B, h, T, dk] = [1024, 8, 21, 64]; XLA tiles the
last two dims to [32, 128] (bf16), ~3x the logical bytes.  Candidate:
merged-lane [B, T, D] = [1024, 21, 512] (lanes exact, sublanes 21->32,
1.52x) with per-head contraction expressed over a free reshape view.

Usage:  python tools/bench_greedy_layout.py {check|cur|mrg|curW|mrgW}
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

B, H, T, DK = 1024, 8, 21, 64
D = H * DK
LAYERS = 6
STEPS = 20
NEG = -1e9


def rand(key, shape, dtype=jnp.bfloat16):
    return jax.random.normal(key, shape, jnp.float32).astype(dtype)


def attend_cur(q, k, v, t):
    """Production math: _attend over [B, h, T, dk] with time mask."""
    mask = (jnp.arange(T) <= t)[None, None, None, :]
    scores = jnp.einsum('bhd,bhtd->bht', q, k)[:, :, None] / jnp.sqrt(
        jnp.asarray(DK, q.dtype))
    scores = jnp.where(mask == 0, NEG, scores)
    p = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum('bhqt,bhtd->bhqd', p, v)[:, :, 0]      # [B, h, dk]


def attend_mrg(q, k, v, t):
    """Merged-lane cache [B, T, D]; per-head contraction via reshape view."""
    kv = k.reshape(B, T, H, DK)
    vv = v.reshape(B, T, H, DK)
    mask = (jnp.arange(T) <= t)[None, None, :]
    scores = jnp.einsum('bhd,bthd->bht', q, kv) / jnp.sqrt(
        jnp.asarray(DK, q.dtype))
    scores = jnp.where(mask, scores, NEG)
    p = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum('bht,bthd->bhd', p, vv)                 # [B, h, dk]


def write_cur(cache, new, t):
    return jax.lax.dynamic_update_slice_in_dim(
        cache, new[:, :, None, :], t, axis=-2)


def write_mrg(cache, new, t):
    return jax.lax.dynamic_update_slice_in_dim(
        cache, new.reshape(B, 1, D), t, axis=-2)


VARIANTS = {
    'cur': (attend_cur, write_cur, (B, H, T, DK)),
    'mrg': (attend_mrg, write_mrg, (B, T, D)),
}


def to_mrg(k):
    return jnp.transpose(k, (0, 2, 1, 3)).reshape(B, T, D)


def check():
    key = jax.random.PRNGKey(0)
    kq, k1, k2, k3 = jax.random.split(key, 4)
    q = rand(kq, (B, H, DK))
    kf, vf = rand(k1, (B, H, T, DK)), rand(k2, (B, H, T, DK))
    t = jnp.int32(T - 2)
    ref = np.asarray(attend_cur(q, kf, vf, t), np.float32)
    got = np.asarray(attend_mrg(q, to_mrg(kf), to_mrg(vf), t), np.float32)
    err = np.abs(ref - got).max()
    print(f'mrg: max |ref - got| = {err:.2e}')
    assert err < 0.125, err
    new = rand(k3, (B, H, DK))
    a = np.asarray(to_mrg(write_cur(kf, new, t)), np.float32)
    b = np.asarray(write_mrg(to_mrg(kf), new, t), np.float32)
    assert np.abs(a - b).max() == 0.0
    print('check OK')


def bench(variant, with_write):
    attend, write, shape = VARIANTS[variant]
    q0 = rand(jax.random.PRNGKey(0), (B, H, DK))
    caches0 = [(jnp.zeros(shape, jnp.bfloat16), jnp.zeros(shape, jnp.bfloat16))
               for _ in range(LAYERS)]

    def step(carry, _):
        caches, q, t = carry
        if with_write:
            caches = [(write(k, q * 1.01, t), write(v, q * 0.99, t))
                      for k, v in caches]
        outs = [attend(q, k, v, t) for k, v in caches]
        q2 = (jnp.stack(outs).sum(0) * 0.5).astype(q.dtype)
        return (caches, q2, t + 1), ()

    @jax.jit
    def loop(caches, q):
        (_, q, _), _ = jax.lax.scan(
            step, (caches, q, jnp.int32(0)), None, length=STEPS)
        return q

    name = variant + ('+write' if with_write else '')
    t0 = time.perf_counter()
    np.asarray(loop(caches0, q0))
    print(f'{name:12s} compile+1 {time.perf_counter()-t0:6.1f}s', flush=True)
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        out = loop(caches0, q0)
    np.asarray(out)
    ms = (time.perf_counter() - t0) / iters / STEPS * 1e3
    print(f'{name:12s} {ms:7.3f} ms/step ({LAYERS} layers)', flush=True)


if __name__ == '__main__':
    w = sys.argv[1] if len(sys.argv) > 1 else 'check'
    if w == 'check':
        check()
    else:
        bench(w.rstrip('W'), w.endswith('W'))
