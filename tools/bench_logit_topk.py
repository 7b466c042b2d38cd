"""Parity + timing for ops/logit_topk.py vs the jnp table epilogue."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from captioning_tpu.ops.logit_topk import logit_topk, logit_topk_ref

N, D, V1, k = 5120, 512, 9488, 5
dt = jnp.bfloat16
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(N, D), dt)
w = jnp.asarray(rng.randn(D, V1) * 0.05, dt)
b = jnp.asarray(rng.randn(V1) * 0.1, jnp.float32)

for unk_idx, unk_bias, temp in ((-1, 0.0, 1.0), (9487, -1000.0, 1.0),
                                (9487, -1000.0, 0.7)):
    tv, ti, rs, en = logit_topk(x, w, b, temp, unk_bias, k=k,
                                unk_idx=unk_idx)
    tv2, ti2, rs2, en2 = logit_topk_ref(x, w, b, temp, unk_bias, k=k,
                                        unk_idx=unk_idx)
    tv, ti, rs, en, tv2, ti2, rs2, en2 = map(
        np.asarray, (tv, ti, rs, en, tv2, ti2, rs2, en2))
    ix_match = (ti == ti2).mean()
    print('unk=%d/%g temp=%g: idx match=%.5f  lsm max|d|=%.2e  '
          'row_sum max|d|=%.2e  ent max|d|=%.2e'
          % (unk_idx, unk_bias, temp, ix_match,
             np.abs(tv - tv2).max(), np.abs(rs - rs2).max(),
             np.abs(en - en2).max()))
    if ix_match < 1.0:
        bad = np.where((ti != ti2).any(1))[0]
        r = bad[0]
        print('  e.g. row %d: kernel %s ref %s  vals %s / %s' %
              (r, ti[r], ti2[r], np.round(tv[r], 4), np.round(tv2[r], 4)))


def time_fn(f, iters=30):
    jax.block_until_ready(f())
    t = time.time()
    for _ in range(iters):
        r = f()
    np.asarray(r[0])
    return (time.time() - t) / iters * 1000

p_ms = time_fn(lambda: logit_topk(x, w, b, 1.0, 0.0, k=k))
j_ms = time_fn(lambda: logit_topk_ref(x, w, b, k=k))


# the production fast-path epilogue it replaces: cand table + flat topk
@jax.jit
def prod(x, w, b, sums):
    logits = (jnp.dot(x.astype(w.dtype), w,
                      preferred_element_type=w.dtype) + b.astype(w.dtype)
              ).astype(jnp.float32)
    lsm = jax.nn.log_softmax(logits, axis=-1)
    row_sum = lsm.sum(-1)
    ent = -(jnp.exp(lsm) * lsm).sum(-1)
    cand = lsm + sums[:, None]
    ys, ix = jax.lax.top_k(cand.reshape(N // 5, 5 * V1), 5)
    return ys, ix, row_sum, ent

sums = jnp.zeros((N,), jnp.float32)
f_ms = time_fn(lambda: prod(x, w, b, sums))
print('epilogue: pallas %.3f ms  vs jnp-ref(topk only) %.3f ms  vs '
      'full prod table path %.3f ms' % (p_ms, j_ms, f_ms))
