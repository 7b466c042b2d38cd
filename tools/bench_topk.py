"""Microbench: beam-search candidate top-k strategies on the real chip.

The beam step picks bdash winners out of [B, bdash*V1] candidates
(sums[...,None] + lp3).  Strategies:
  A) single top_k over the flattened [B, bdash*V1] candidates (current)
  B) two-stage: per-beam top_k over V1 (on lp3, offset-invariant), then
     top_k over [B, bdash*bdash] — avoids materializing candidates and
     runs top_k on much shorter rows
Both are tie-equivalent (lax.top_k is stable by index; flat index order ==
(beam, per-beam-rank) order for equal values).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

B, BD, V1 = 1024, 5, 9488


def single(sums, lp3):
    cands = sums[..., None] + lp3                       # [B, BD, V1]
    ys, ix = jax.lax.top_k(cands.reshape(B, BD * V1), BD)
    return ys, ix // V1, ix % V1


def twostage(sums, lp3):
    v, vi = jax.lax.top_k(lp3.reshape(B * BD, V1), BD)  # [B*BD, BD]
    cand = sums.reshape(B * BD, 1) + v                  # [B*BD, BD]
    ys, ci = jax.lax.top_k(cand.reshape(B, BD * BD), BD)
    beam_ix = ci // BD
    sel_ix = jnp.take_along_axis(
        vi.reshape(B, BD * BD), ci, axis=1)
    return ys, beam_ix, sel_ix


def pallas_stream(sums, lp3):
    from captioning_tpu.ops.topk import topk_lastdim
    cands = sums[..., None] + lp3                       # [B, BD, V1]
    ys, ix = topk_lastdim(cands.reshape(B, BD * V1), BD)
    return ys, ix // V1, ix % V1


def main():
    rng = np.random.RandomState(0)
    sums = jnp.asarray(rng.randn(B, BD).astype('float32'))
    lp3 = jnp.asarray(rng.randn(B, BD, V1).astype('float32'))

    fns = {'single': jax.jit(single), 'twostage': jax.jit(twostage),
           'pallas': jax.jit(pallas_stream)}
    outs = {}
    for name, fn in fns.items():
        ys, bix, six = fn(sums, lp3)
        outs[name] = (np.asarray(ys), np.asarray(bix), np.asarray(six))
        # time: force execution by pulling results to host
        n = 50
        t0 = time.perf_counter()
        for _ in range(n):
            ys, bix, six = fn(sums, lp3)
        _ = np.asarray(ys)
        dt = (time.perf_counter() - t0) / n
        print('%s: %.3f ms' % (name, dt * 1e3))

    for other in ('twostage', 'pallas'):
        same_vals = np.allclose(outs['single'][0], outs[other][0])
        same_sel = (outs['single'][1] == outs[other][1]).all() and \
            (outs['single'][2] == outs[other][2]).all()
        print('%s vs single: values equal: %s  selections identical: %s' %
              (other, same_vals, same_sel))


if __name__ == '__main__':
    main()
