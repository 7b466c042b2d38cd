"""Decompose the XE training step cost on the real chip.

Times, at the BENCH.md operating point (transformer, B=128 images x 5
seqs, COCO shapes):
  * forward only (train=True, dropout on)
  * forward only (train=False, dropout off)  -> dropout/rng cost
  * value_and_grad (no optimizer)            -> backward cost
  * full xe_step (grad + clip + adam)        -> optimizer cost

Usage: python tools/bench_xe_parts.py [--batch 128] [--iters 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

from tools.bench_suite import transformer_opt, V


def timed(fn, *args, iters=10, force=None):
    out = fn(*args)
    (force or (lambda o: np.asarray(jax.tree_util.tree_leaves(o)[0])))(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    (force or (lambda o: np.asarray(jax.tree_util.tree_leaves(o)[0])))(out)
    return (time.time() - t0) / iters


def main():
    global jax
    import jax
    import jax.numpy as jnp
    from captioning_tpu.models import setup
    from captioning_tpu.modules.trainer import Trainer
    from captioning_tpu.modules import losses

    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=128)
    parser.add_argument('--iters', type=int, default=10)
    parser.add_argument('--rng_impl', type=str, default='',
                        help="e.g. 'rbg' for the fast TPU generator")
    parser.add_argument('--remat', type=int, default=0,
                        help='jax.checkpoint the teacher-forcing forward')
    args = parser.parse_args()
    if args.rng_impl:
        jax.config.update('jax_default_prng_impl', args.rng_impl)
    B, iters = args.batch, args.iters

    opt = transformer_opt()
    vocab = {str(i): 'w%d' % i for i in range(1, V + 1)}
    cap = setup(opt, vocab)
    variables = cap.init_params(jax.random.PRNGKey(0), att_len=36)
    rng = np.random.RandomState(0)
    fc = jnp.asarray(rng.randn(B, 2048).astype('float32'))
    att = jnp.asarray(rng.randn(B, 36, 2048).astype('float32'))
    am = jnp.ones((B, 36), jnp.float32)
    labels = jnp.asarray(rng.randint(1, V, (B, 5, 18)), jnp.int32)
    masks = jnp.ones((B, 5, 18), jnp.float32)
    key = jax.random.PRNGKey(0)

    def fwd(train):
        def f(variables, rng):
            lp = cap.forward_tf(variables, fc, att, labels[..., :-1], am,
                                0.0, rng, train=train)
            return losses.language_model_criterion(
                lp, labels[..., 1:], masks[..., 1:], 'mean')
        return jax.jit(f)

    f_train = fwd(True)
    f_eval = fwd(False)
    dt = timed(f_train, variables, key, iters=iters,
               force=lambda o: float(o))
    print('forward+loss train=True : %.1f ms  (%.0f img/s)' %
          (dt * 1e3, B / dt))
    dt = timed(f_eval, variables, key, iters=iters, force=lambda o: float(o))
    print('forward+loss train=False: %.1f ms  (%.0f img/s)' %
          (dt * 1e3, B / dt))

    def loss_fn(variables, rng):
        lp = cap.forward_tf(variables, fc, att, labels[..., :-1], am,
                            0.0, rng, train=True)
        return losses.language_model_criterion(
            lp, labels[..., 1:], masks[..., 1:], 'mean')

    if args.remat:
        loss_fn = jax.checkpoint(loss_fn)
    vg = jax.jit(jax.value_and_grad(loss_fn))
    dt = timed(vg, variables, key, iters=iters,
               force=lambda o: float(o[0]))
    print('value_and_grad          : %.1f ms  (%.0f img/s)' %
          (dt * 1e3, B / dt))

    trainer = Trainer(cap, opt)
    opt_state = trainer.init_opt_state(variables)

    # non-donating wrapper so the same buffers can be reused in the loop
    state = {'v': variables, 'o': opt_state}

    def full_step():
        v, o, out = trainer.xe_step(state['v'], state['o'], fc, att, labels,
                                    masks, am, 4e-4, 0.0, key)
        state['v'], state['o'] = v, o
        return out

    out = full_step()
    float(out['loss'])
    t0 = time.time()
    for _ in range(iters):
        out = full_step()
    float(out['loss'])
    dt = (time.time() - t0) / iters
    print('full xe_step            : %.1f ms  (%.0f img/s)' %
          (dt * 1e3, B / dt))


if __name__ == '__main__':
    main()
