"""Decompose the HOST-reward SCST fallback iteration into its phases.

The fused on-device path (`trainer.sc_fused_step`) is the production
default, but rewards the device scorer does not cover (self-CIDEr
structure rewards, --drop_worst_rate, a missing native scorer) fall back
to the host loop in tools/train.py:417-439: decode on device -> fetch
token arrays -> score on the host (native C++ CIDEr-D) -> upload the
reward -> grad step.  Across rounds this loop measured 0.19-0.85 s/iter
for identical work (BENCH.md), an unexplained spread this tool pins
down: it times every phase per iteration and reports median / min / max,
plus an axon-tunnel RTT probe so link jitter is separated from compute.

Phases per iteration (B=50 images x train_sample_n=5 + 50 greedy,
reference rewards.py:41-81 shapes):
  decode    sc_decode dispatch + device decode + [N,L] int32 fetch (sync)
  reward    native_self_critical_reward: host padding/glue + ctypes call
    (score) the C++ scorer call alone, timed inside via a wrapper
  grad      reward upload + sc_grad_step dispatch (async)
  sync      float(out['loss']) — drains the step
  rtt       a jitted scalar fetch before each iter (tunnel round trip)

Usage: python tools/bench_scst_glue.py [--iters 30] [--batch 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

from tools.bench_suite import transformer_opt, V


def stats(xs):
    xs = sorted(xs)
    return (xs[len(xs) // 2], xs[0], xs[-1])


def main():
    import jax
    import jax.numpy as jnp
    from captioning_tpu.models import setup
    from captioning_tpu.modules.trainer import Trainer
    from captioning_tpu.utils.cider_native import (
        NativeCiderD, native_self_critical_reward)

    parser = argparse.ArgumentParser()
    parser.add_argument('--iters', type=int, default=30)
    parser.add_argument('--batch', type=int, default=50)
    parser.add_argument('--df_ngrams', type=int, default=1_200_000)
    args = parser.parse_args()
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   '..', '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    jax.config.update('jax_default_prng_impl', 'rbg')

    opt = transformer_opt()
    rng = np.random.RandomState(0)
    vocab = {str(i): 'w%d' % i for i in range(1, V + 1)}
    cap = setup(opt, vocab)
    variables = cap.init_params(jax.random.PRNGKey(0), att_len=36)
    trainer = Trainer(cap, opt)
    opt_state = trainer.init_opt_state(variables)

    B = args.batch
    fcs = jnp.asarray(rng.randn(B, 2048).astype('float32'))
    atts = jnp.asarray(rng.randn(B, 36, 2048).astype('float32'))
    ams = jnp.ones((B, 36), jnp.float32)
    gts = [rng.randint(1, V, (5, 16)) for _ in range(B)]
    for g in gts:
        g[:, -1] = 0

    # COCO-scale synthetic df table (same construction as bench_suite)
    drng = np.random.RandomState(1)
    df = {}
    while len(df) < args.df_ngrams:
        n = drng.randint(1, 5)
        df[tuple(str(t) for t in drng.randint(1, V, n))] = float(
            drng.randint(1, 40))
    nat = NativeCiderD(df, ref_len=113287.0)

    score_t = []
    inner = nat.score

    def timed_score(*a, **kw):
        t0 = time.time()
        out = inner(*a, **kw)
        score_t.append(time.time() - t0)
        return out
    nat.score = timed_score

    probe = jax.jit(lambda x: x + 1)

    # warm up compiles outside the timed loop
    greedy, gen = trainer.sc_decode(variables, fcs, atts, ams,
                                    jax.random.PRNGKey(0),
                                    jax.random.PRNGKey(1))
    np.asarray(gen)
    variables, opt_state, out = trainer.sc_grad_step(
        variables, opt_state, fcs, atts, ams, gen,
        jnp.zeros(gen.shape, jnp.float32), 1e-5, jax.random.PRNGKey(1))
    float(out['loss'])
    float(probe(jnp.zeros(())))

    cols = {k: [] for k in ('rtt', 'decode', 'reward', 'grad', 'sync',
                            'total')}
    for i in range(args.iters):
        t0 = time.time()
        float(probe(jnp.asarray(float(i))))
        t1 = time.time()
        r1, r2 = jax.random.split(jax.random.PRNGKey(i))
        greedy, gen = trainer.sc_decode(variables, fcs, atts, ams, r1, r2)
        g_np, s_np = np.asarray(greedy), np.asarray(gen)
        t2 = time.time()
        reward = native_self_critical_reward(nat, g_np, gts, s_np)
        t3 = time.time()
        variables, opt_state, out = trainer.sc_grad_step(
            variables, opt_state, fcs, atts, ams, gen,
            jnp.asarray(reward), 1e-5, r2)
        t4 = time.time()
        float(out['loss'])
        t5 = time.time()
        for k, v in (('rtt', t1 - t0), ('decode', t2 - t1),
                     ('reward', t3 - t2), ('grad', t4 - t3),
                     ('sync', t5 - t4), ('total', t5 - t1)):
            cols[k].append(v)

    print('SCST host-fallback glue, B=%d x %d samples, %d iters '
          '(median [min, max], seconds):' % (B, opt.train_sample_n,
                                             args.iters))
    for k in ('rtt', 'decode', 'reward', 'grad', 'sync', 'total'):
        m, lo, hi = stats(cols[k])
        print('  %-7s %.4f  [%.4f, %.4f]' % (k, m, lo, hi))
    m, lo, hi = stats(score_t[-args.iters:])
    print('  %-7s %.4f  [%.4f, %.4f]  (ctypes C++ scorer inside reward)'
          % ('score', m, lo, hi))


if __name__ == '__main__':
    main()
