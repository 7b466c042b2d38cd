"""Extended benchmark suite (bench.py is the driver's one-line headline).

Measures, on synthetic COCO-shaped data:
  * beam-5 / greedy decode throughput for transformer and updown
  * XE training step throughput (batch 10x5 reference config and batch 128)
  * SCST iteration rate (decode + native CIDEr-D reward + grad step)

Usage: python tools/bench_suite.py [--batch 256]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from types import SimpleNamespace

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

V = 9487


def transformer_opt():
    return SimpleNamespace(
        caption_model='transformer', vocab_size=V, input_encoding_size=512,
        rnn_size=2048, num_layers=6, drop_prob_lm=0.5, fc_feat_size=2048,
        att_feat_size=2048, att_hid_size=512, seq_per_img=5, max_length=20,
        compute_dtype='bfloat16', N_enc=6, N_dec=6, d_model=512, d_ff=2048,
        num_att_heads=8, dropout=0.1,
        optim='adam', optim_alpha=0.9, optim_beta=0.999, optim_epsilon=1e-8,
        weight_decay=0, grad_clip_mode='value', grad_clip_value=0.1,
        label_smoothing=0, noamopt=False, drop_worst_rate=0,
        train_sample_n=5, train_sample_method='sample', train_beam_size=1,
        sc_sample_method='greedy', sc_beam_size=1, structure_loss_type='new_self_critical',
        structure_loss_weight=1, struc_use_logsoftmax=False, use_ppo=0,
        cider_reward_weight=1, bleu_reward_weight=0)


def updown_opt():
    o = transformer_opt()
    o.caption_model = 'updown'
    o.rnn_size = 1000
    o.input_encoding_size = 1000
    o.att_hid_size = 512
    return o


def att2in2_opt():
    o = updown_opt()
    o.caption_model = 'att2in2'
    return o


def aoa_opt():
    # configs/aoa/aoa.yml shapes: rnn 1024, AoA refiner + decoder
    o = transformer_opt()
    o.caption_model = 'aoa'
    o.rnn_size = 1024
    o.input_encoding_size = 1024
    o.att_hid_size = 512
    o.refine = 1
    o.refine_aoa = 1
    o.use_ff = 0
    o.decoder_type = 'AoA'
    o.use_multi_head = 2
    o.num_heads = 8
    o.multi_head_scale = 1
    o.mean_feats = 1
    o.ctx_drop = 1
    o.dropout_aoa = 0.3
    return o


def bert_opt():
    # native flax BERT blocks at transformer.yml shapes
    o = transformer_opt()
    o.caption_model = 'bert'
    return o


def m2_opt():
    # meshed-memory: 3 enc/dec layers (paper config), d_model 512
    o = transformer_opt()
    o.caption_model = 'm2transformer'
    o.N_enc = 3
    o.N_dec = 3
    return o


def main():
    import jax
    import jax.numpy as jnp
    from captioning_tpu.models import setup
    from captioning_tpu.modules.trainer import Trainer

    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=256)
    parser.add_argument('--iters', type=int, default=5)
    parser.add_argument('--models', type=str,
                        default='transformer,updown',
                        help='comma list: transformer,updown,att2in2,aoa,'
                             'bert,m2transformer')
    parser.add_argument('--fused', type=int, default=1,
                        help='also bench the fully-fused on-device SCST step'
                             ' (--on_device_cider path)')
    parser.add_argument('--df_ngrams', type=int, default=1_200_000,
                        help='synthetic df-table size (COCO words-df is'
                             ' ~1.2M ngrams)')
    parser.add_argument('--rows', type=str,
                        default='beam,greedy,xe,scst,fused',
                        help='comma list of benchmark rows to run: '
                             'beam,greedy,xe,scst,fused')
    parser.add_argument('--eos_boost', type=float, default=0.0,
                        help='add this to the eos logit bias so random-'
                             'weight captions end at realistic lengths '
                             '(COCO averages ~10 tokens) — demonstrates '
                             'the exact decode early exit, which full-'
                             'length random decodes never trigger')
    args = parser.parse_args()
    rows = set(args.rows.split(','))
    # same persistent compile cache as bench.py: the beam program is large
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   '..', '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    B, iters = args.batch, args.iters
    rng = np.random.RandomState(0)
    vocab = {str(i): 'w%d' % i for i in range(1, V + 1)}

    def data(B):
        return (jnp.asarray(rng.randn(B, 2048).astype('float32')),
                jnp.asarray(rng.randn(B, 36, 2048).astype('float32')),
                jnp.ones((B, 36), jnp.float32))

    all_opts = {'transformer': transformer_opt, 'updown': updown_opt,
                'att2in2': att2in2_opt, 'aoa': aoa_opt,
                'bert': bert_opt, 'm2transformer': m2_opt}
    for name in args.models.split(','):
        opt = all_opts[name]()
        cap = setup(opt, vocab)
        variables = cap.init_params(jax.random.PRNGKey(0), att_len=36)
        if args.eos_boost:
            import jax.tree_util as jtu
            def _boost(path, x):
                keys = [getattr(p, 'key', None) for p in path]
                if ('logit' in keys or 'generator' in keys) and \
                        keys[-1] == 'bias':
                    return x.at[0].add(args.eos_boost)
                return x
            variables = jtu.tree_map_with_path(_boost, variables)
        fc, att, am = data(B)

        # decode rows run under eval's production PRNG (threefry: decode
        # measured ~10% slower under rbg); training rows switch to rbg,
        # the train production default (opts --rng_impl)
        jax.config.update('jax_default_prng_impl', 'threefry2x32')
        if 'beam' in rows:
            bo = {'beam_size': 5, 'sample_n': 1, 'group_size': 1,
                  'suppress_UNK': 1}
            # want_logps=False is the production eval path (carried stats,
            # no winner-logprob replay)
            s, _, _ = cap.sample_beam_jit(variables, fc, att, am,
                                          jax.random.PRNGKey(1), bo,
                                          want_logps=False)
            np.asarray(s)
            t0 = time.time()
            for i in range(iters):
                s, _, _ = cap.sample_beam_jit(variables, fc, att, am,
                                              jax.random.PRNGKey(i), bo,
                                              want_logps=False)
                np.asarray(s)
            dt = (time.time() - t0) / iters
            print('%s beam5  B=%d: %.3fs -> %.1f captions/s (mean len %.1f)'
                  % (name, B, dt, B / dt,
                     float((np.asarray(s) > 0).sum(1).mean())))

            # pipelined (deferred-fetch) beam: eval_split's production
            # pattern — see the greedy PIPELINED row for the mechanism
            prev = None
            t0 = time.time()
            for i in range(iters):
                s, st, _ = cap.sample_beam_jit(variables, fc, att, am,
                                               jax.random.PRNGKey(i), bo,
                                               want_logps=False)
                if prev is not None:
                    np.asarray(prev[0])
                    np.asarray(prev[1]['ent_sum'])
                prev = (s, st)
            np.asarray(prev[0])
            np.asarray(prev[1]['ent_sum'])
            dt = (time.time() - t0) / iters
            print('%s beam5  B=%d PIPELINED: %.3fs -> %.1f captions/s'
                  % (name, B, dt, B / dt))

        if 'greedy' in rows:
            # production eval path: carried ent/perplexity stats, the full
            # [N, L, V+1] table never materializes (sample_stats_jit)
            s, _ = cap.sample_stats_jit(variables, fc, att, am,
                                        jax.random.PRNGKey(1),
                                        {'sample_method': 'greedy'})
            np.asarray(s)
            t0 = time.time()
            for i in range(iters):
                s, _ = cap.sample_stats_jit(variables, fc, att, am,
                                            jax.random.PRNGKey(i),
                                            {'sample_method': 'greedy'})
                np.asarray(s)
            dt = (time.time() - t0) / iters
            print('%s greedy B=%d: %.3fs -> %.1f captions/s (mean len %.1f)'
                  % (name, B, dt, B / dt,
                     float((np.asarray(s) > 0).sum(1).mean())))

            # pipelined greedy: ONE batch in flight — batch i's fetch happens
            # after batch i+1 is dispatched, exactly eval_split's deferred
            # _process pattern, so the per-batch transfer RTT hides under
            # the next decode.  This is the production eval number; the
            # synced row above charges the full round trip to every batch.
            prev = None
            t0 = time.time()
            for i in range(iters):
                s, st = cap.sample_stats_jit(variables, fc, att, am,
                                             jax.random.PRNGKey(i),
                                             {'sample_method': 'greedy'})
                if prev is not None:
                    np.asarray(prev[0])
                    np.asarray(prev[1]['ent_sum'])
                prev = (s, st)
            np.asarray(prev[0])
            np.asarray(prev[1]['ent_sum'])
            dt = (time.time() - t0) / iters
            print('%s greedy B=%d PIPELINED: %.3fs -> %.1f captions/s'
                  % (name, B, dt, B / dt))

        # XE training step (rbg: the train production default)
        jax.config.update('jax_default_prng_impl', 'rbg')
        trainer = Trainer(cap, opt)
        opt_state = trainer.init_opt_state(variables)
        for xb in (10, 128) if 'xe' in rows else ():
            fcx, attx, amx = data(xb)
            labels = jnp.asarray(rng.randint(0, V, (xb, 5, 18)), jnp.int32)
            masks = jnp.ones((xb, 5, 18), jnp.float32)
            v, os_, out = trainer.xe_step(variables, opt_state, fcx, attx,
                                          labels, masks, amx, 4e-4, 0.0,
                                          jax.random.PRNGKey(0))
            float(out['loss'])
            # pipelined like the production loop: tools/train.py defers the
            # loss fetch one iteration, so steps dispatch back-to-back and
            # the per-call sync RTT (~40ms through the axon tunnel) is not
            # paid per step
            t0 = time.time()
            n = max(iters, 5)
            for i in range(n):
                v, os_, out = trainer.xe_step(v, os_, fcx, attx, labels,
                                              masks, amx, 4e-4, 0.0,
                                              jax.random.PRNGKey(i))
            float(out['loss'])
            dt = (time.time() - t0) / n
            print('%s XE step B=%dx5: %.3fs -> %.1f images/s' %
                  (name, xb, dt, xb / dt))
            variables, opt_state = v, os_

        # SCST iteration (decode + reward + grad)
        if not rows & {'scst', 'fused'}:
            continue
        try:
            from captioning_tpu.utils.cider_native import (
                NativeCiderD, native_self_critical_reward)
            df = {('1',): 2.0, ('2',): 1.0}
            nat = NativeCiderD(df, ref_len=100.0)
        except Exception:
            nat = None
        scb = 50
        fcs, atts, ams = data(scb)
        gts = [rng.randint(1, V, (5, 16)) for _ in range(scb)]
        for g in gts:
            g[:, -1] = 0
        if 'scst' in rows:
            greedy, gen = trainer.sc_decode(variables, fcs, atts, ams,
                                            jax.random.PRNGKey(0),
                                            jax.random.PRNGKey(1))
            np.asarray(gen)
            # warm up the grad step compile outside the timed loop
            variables, opt_state, out = trainer.sc_grad_step(
                variables, opt_state, fcs, atts, ams, gen,
                jnp.zeros((gen.shape[0], gen.shape[1]), jnp.float32), 1e-5,
                jax.random.PRNGKey(1))
            float(out['loss'])
            t0 = time.time()
            for i in range(iters):
                r1, r2 = jax.random.split(jax.random.PRNGKey(i))
                greedy, gen = trainer.sc_decode(variables, fcs, atts, ams,
                                                r1, r2)
                if nat is not None:
                    reward = native_self_critical_reward(
                        nat, np.asarray(greedy), gts, np.asarray(gen))
                else:
                    reward = np.zeros((gen.shape[0], gen.shape[1]),
                                      np.float32)
                variables, opt_state, out = trainer.sc_grad_step(
                    variables, opt_state, fcs, atts, ams, gen,
                    jnp.asarray(reward), 1e-5, r2)
                float(out['loss'])
            dt = (time.time() - t0) / iters
            print('%s SCST iter B=%dx%d samples: %.3fs -> %.2f iters/s' %
                  (name, scb, opt.train_sample_n, dt, 1 / dt))

        # fully-fused on-device SCST (decode + CIDEr-D + grad in one program)
        if args.fused and 'fused' in rows:
            from captioning_tpu.ops.cider_device import DeviceCiderD, pad_gts
            if not hasattr(main, '_dev_scorer'):
                drng = np.random.RandomState(1)
                df = {}
                while len(df) < args.df_ngrams:
                    n = drng.randint(1, 5)
                    df[tuple(str(t) for t in
                             drng.randint(1, V, n))] = float(
                        drng.randint(1, 40))
                main._dev_scorer = DeviceCiderD(df, ref_len=113287.0)
            dev = main._dev_scorer
            refs_np, mask_np = pad_gts(gts)
            refs_j = jnp.asarray(refs_np)
            mask_j = jnp.asarray(mask_np)
            v, os_, out = trainer.sc_fused_step(
                variables, opt_state, fcs, atts, ams, refs_j, mask_j,
                1e-5, jax.random.PRNGKey(0), jax.random.PRNGKey(1), dev)
            float(out['loss'])
            # pipelined: the production loop defers the loss/reward fetch
            # (tools/train.py flush_metrics), so iterations dispatch
            # back-to-back with no per-call sync
            t0 = time.time()
            for i in range(iters):
                r1, r2 = jax.random.split(jax.random.PRNGKey(i))
                v, os_, out = trainer.sc_fused_step(
                    v, os_, fcs, atts, ams, refs_j, mask_j, 1e-5, r1, r2,
                    dev)
            float(out['loss'])
            dt = (time.time() - t0) / iters
            print('%s SCST FUSED iter B=%dx%d samples (%d-ngram df): '
                  '%.3fs -> %.2f iters/s' %
                  (name, scb, opt.train_sample_n, len(dev.table_df), dt,
                   1 / dt))
            variables, opt_state = v, os_


if __name__ == '__main__':
    main()
