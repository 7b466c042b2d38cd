"""Capture a real-TPU trace of the beam-5 decode and print the HLO op
breakdown (top self-time ops), to target the decode-step optimization work
with measured data instead of roofline guesses.

Usage:  python tools/profile_decode.py [--batch 1024] [--mode beam|greedy]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from types import SimpleNamespace

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def build(batch, mode):
    import jax
    import jax.numpy as jnp
    from captioning_tpu.models import setup

    V = 9487
    opt = SimpleNamespace(
        caption_model='transformer', vocab_size=V,
        input_encoding_size=512, rnn_size=2048, num_layers=6,
        drop_prob_lm=0.5, fc_feat_size=2048, att_feat_size=2048,
        att_hid_size=512, seq_per_img=5, max_length=20,
        compute_dtype='bfloat16',
        N_enc=6, N_dec=6, d_model=512, d_ff=2048, num_att_heads=8,
        dropout=0.1)
    vocab = {str(i): 'w%d' % i for i in range(1, V + 1)}
    cap = setup(opt, vocab)
    variables = cap.init_params(jax.random.PRNGKey(0), att_len=36)
    rng = np.random.RandomState(0)
    fc = jnp.asarray(rng.randn(batch, 2048).astype('float32'))
    att = jnp.asarray(rng.randn(batch, 36, 2048).astype('float32'))
    am = jnp.ones((batch, 36), jnp.float32)

    if mode == 'beam':
        dopt = {'beam_size': 5, 'group_size': 1, 'sample_n': 1,
                'sample_method': 'greedy', 'temperature': 1.0,
                'length_penalty': ''}

        def run(key):
            seq, _, _ = cap.sample_beam_jit(variables, fc, att, am, key,
                                            dopt, want_logps=False)
            return seq
    else:
        dopt = {'sample_method': 'greedy', 'beam_size': 1, 'sample_n': 1}

        def run(key):
            # production eval path (carried stats, early-exit while_loop)
            seq, _ = cap.sample_stats_jit(variables, fc, att, am, key, dopt)
            return seq
    return run


def hlo_stats_from_trace(logdir):
    """Parse the captured xplane into per-HLO op time rows.

    Uses the self-contained wire-format parser (tools/xplane.py): the
    tensorboard_plugin_profile converter is unimportable in this image
    (its generated protos predate protobuf 4, and the pywrap fallback
    lacks xspace_to_tools_data)."""
    from xplane import op_self_times
    return op_self_times(logdir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=1024)
    ap.add_argument('--mode', default='beam')
    ap.add_argument('--logdir', default='/tmp/jax_trace_decode')
    ap.add_argument('--top', type=int, default=40)
    args = ap.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(
                          os.path.dirname(os.path.abspath(__file__))),
                          '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)

    run = build(args.batch, args.mode)
    print('compiling/warmup...')
    t0 = time.time()
    _ = np.asarray(run(jax.random.PRNGKey(0)))
    print('warmup done in %.1fs' % (time.time() - t0))
    t0 = time.time()
    _ = np.asarray(run(jax.random.PRNGKey(1)))
    steady = time.time() - t0
    print('steady decode: %.3fs (%.1f captions/s)' %
          (steady, args.batch / steady))

    os.makedirs(args.logdir, exist_ok=True)
    jax.profiler.start_trace(args.logdir)
    _ = np.asarray(run(jax.random.PRNGKey(2)))
    jax.profiler.stop_trace()

    rows = hlo_stats_from_trace(args.logdir)
    total = sum(r[1] for r in rows)
    print('total device op time: %.1f ms (incl. while/conditional '
          'wrappers, which nest their bodies)' % total)
    for op, ms, n in rows[:args.top]:
        print('%9.3f ms  x%-5d %s' % (ms, n, op))


if __name__ == '__main__':
    main()
