"""Isolate beam-search table math from the model on the real chip.

Runs engine.decoding.beam_search with a trivial model step (one cheap add
over a precomputed logits table), so the measured per-step cost is the
beam bookkeeping itself: constraints, candidate top-k, pool merge, carried
tables, state reorder glue.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from captioning_tpu.engine.decoding import DecodeModel, beam_search

B, BD, V1, L = 1024, 5, 9488, 20


def make_dm():
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(L + 1, V1).astype('float32'))

    def prepare(fc, att, am, rng):
        return {}

    def init_state(batch):
        return {'t': jnp.zeros((batch,), jnp.int32)}

    def step(it, feats, state, rng, logsoftmax=True, uniform_t=False,
             beam_width=0):
        t = state['t']
        # trivially cheap "model": row t of a fixed table + token-dependent
        # jitter so beams diverge
        lp = table[t[0] % (L + 1)][None, :] + \
            0.01 * it.astype(jnp.float32)[:, None]
        lp = jax.nn.log_softmax(lp, axis=-1)
        return lp, {'t': t + 1}

    return DecodeModel(prepare=prepare, init_state=init_state, step=step,
                       seq_length=L, vocab_plus=V1)


def main():
    dm = make_dm()
    opt = {'beam_size': BD, 'group_size': 1, 'sample_n': 1}
    init_lp = jnp.zeros((B, V1), jnp.float32)
    state0 = dm.init_state(B)

    fn = jax.jit(lambda lp, st, rng: beam_search(dm, lp, st, {}, rng, opt))
    rng = jax.random.PRNGKey(0)
    out = fn(init_lp, state0, rng)
    _ = np.asarray(out['seq'])

    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(init_lp, state0, rng)
    _ = np.asarray(out['seq'])
    dt = (time.perf_counter() - t0) / n
    print('beam tables only: %.2f ms total, %.3f ms/step (L=%d)'
          % (dt * 1e3, dt * 1e3 / L, L))


if __name__ == '__main__':
    main()
