"""Benchmark: captions/sec/chip at beam=5 on the flagship transformer.

Production shapes: COCO vocab (9487+1), bottom-up 36x2048 att features,
transformer N=6 / d_model=512 / d_ff=2048 / h=8 (configs/transformer.yml),
max_length=20, beam_size=5 — the MODEL_ZOO headline eval configuration.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md);
the denominator is a measured-order estimate of the reference's single-GPU
beam-5 transformer eval throughput (~15 captions/s at batch 10 on a
contemporary GPU: COCO 5k test in ~5-6 min).

Timing convention: PIPELINED with one batch in flight — batch i's token
fetch happens after batch i+1 is dispatched, exactly how the production
eval loop runs (eval_utils.eval_split defers each batch's fetch and
post-processing by one iteration).  The synced-per-batch number (every
batch charged a full device->host round trip — on this axon-tunneled
setup ~35 ms of RTT, microseconds on a directly-attached host) is
printed in the details line for cross-round comparability.
"""

from __future__ import annotations

import json
import os
import time
from types import SimpleNamespace

import numpy as np

REFERENCE_CAPTIONS_PER_SEC = 15.0  # estimated torch single-GPU baseline
_CACHE_STATE = 'cold'  # set by main(): persistent-cache state at startup

# published bf16 peaks per chip (TFLOP/s) for the MFU denominator
_PEAK_BF16_TFLOPS = {
    'TPU v2': 45.0, 'TPU v3': 123.0, 'TPU v4': 275.0,
    'TPU v5 lite': 197.0, 'TPU v5e': 197.0, 'TPU v5': 459.0,
    'TPU v5p': 459.0, 'TPU v6 lite': 918.0, 'TPU v6e': 918.0,
}


def _chip_peak_tflops(device) -> float:
    kind = getattr(device, 'device_kind', '') or ''
    for name, peak in sorted(_PEAK_BF16_TFLOPS.items(),
                             key=lambda kv: -len(kv[0])):
        if kind.startswith(name):
            return peak
    return 197.0  # default to the v5e-class chip the bench runs on


def decode_step_flops(opt, n_mem: int, cache_len: int) -> float:
    """FLOP model of ONE transformer decode step for ONE lane.

    Matmul FLOPs only (2*m*n*k), the >99% term: per layer the q/k/v/o
    self projections (8d^2), the ancestry attend over the cache (4*T*d),
    the lazy cross-attention (8d^2 fold/projections + 4*M*d scores/ctx),
    the FFN (4*d*ff); plus the vocab logits (2*d*V).  Layernorms,
    softmaxes and the embedding gather are bandwidth, not FLOPs, and are
    deliberately excluded — this is the numerator of an honest MFU.

    The ancestry-attend term counts ALGORITHMIC FLOPs (4*T*d per lane:
    one score + one weighted-sum pass over the lane's own history).  The
    executed ``_attend_beam`` computes scores/context against all bw
    sibling slots and masks (4*bw*T*d executed), so the hardware runs
    ~bw-fold more attend FLOPs than this numerator credits — at the
    headline shape that term is <2%% of the step's FLOPs, and the useful
    -work convention keeps mfu_pct meaning "progress on the problem",
    not "MXU occupancy".
    """
    d, f, L = opt.d_model, opt.d_ff, opt.N_dec
    per_layer = 16.0 * d * d + 4.0 * cache_len * d + 4.0 * n_mem * d \
        + 4.0 * d * f
    return L * per_layer + 2.0 * d * (opt.vocab_size + 1)


def main():
    import jax
    # persistent compile cache: the beam-search program is large; cache it
    # across bench invocations
    global _CACHE_STATE
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             '.jax_cache')
    _CACHE_STATE = ('warm' if os.path.isdir(cache_dir) and os.listdir(cache_dir)
                    else 'cold')
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
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
    captioner = setup(opt, vocab)
    variables = captioner.init_params(jax.random.PRNGKey(0), att_len=36)

    B = 1024
    rng = np.random.RandomState(0)
    fc = jnp.asarray(rng.randn(B, 2048).astype('float32'))
    att = jnp.asarray(rng.randn(B, 36, 2048).astype('float32'))
    am = jnp.ones((B, 36), jnp.float32)

    beam_opt = {'beam_size': 5, 'sample_n': 1, 'group_size': 1,
                'suppress_UNK': 1}

    # want_logps=False is the production eval path (eval_split): entropy /
    # perplexity sums are carried through the beam scan, no winner replay
    # compile (np.asarray forces real execution + transfer; plain
    # block_until_ready can be deferred by remoted backends)
    t0 = time.time()
    seq, _, _ = captioner.sample_beam_jit(variables, fc, att, am,
                                          jax.random.PRNGKey(1), beam_opt,
                                          want_logps=False)
    np.asarray(seq)
    compile_s = time.time() - t0

    # steady state, SYNCED: every batch pays the full device->host round
    # trip (kept for cross-round comparability; ~35 ms/batch of tunnel RTT
    # on this setup, microseconds on directly-attached hosts)
    iters = 3
    t0 = time.time()
    for i in range(iters):
        seq, _, _ = captioner.sample_beam_jit(variables, fc, att, am,
                                              jax.random.PRNGKey(i), beam_opt,
                                              want_logps=False)
        np.asarray(seq)
    dt = time.time() - t0
    cps_synced = B * iters / dt

    # steady state, PIPELINED (the headline): one batch in flight — batch
    # i's token fetch happens after batch i+1 is dispatched, which is
    # exactly how the production eval loop runs (eval_utils.eval_split
    # defers each batch's fetch+post-processing by one iteration, like
    # tools/train.py's deferred metrics flush)
    prev = None
    t0 = time.time()
    for i in range(iters):
        seq, st, _ = captioner.sample_beam_jit(variables, fc, att, am,
                                               jax.random.PRNGKey(i),
                                               beam_opt, want_logps=False)
        if prev is not None:
            np.asarray(prev[0])
            np.asarray(prev[1]['ent_sum'])
        prev = (seq, st)
    np.asarray(prev[0])
    np.asarray(prev[1]['ent_sum'])
    dt = time.time() - t0
    cps = B * iters / dt

    # MFU against the chip's published bf16 peak: FLOP model of the full
    # beam decode (5 lanes/caption, max_length+1 steps/lane) over measured
    # wall time — progress vs physics, not only vs the torch estimate
    # (decode_step_flops documents what's counted)
    lanes = B * beam_opt['beam_size']
    steps = opt.max_length + 1
    flops_per_iter = decode_step_flops(opt, n_mem=36, cache_len=steps) \
        * lanes * steps
    peak = _chip_peak_tflops(jax.devices()[0]) * 1e12
    mfu_pct = 100.0 * flops_per_iter * iters / dt / peak

    # compile_s is honest about the persistent .jax_cache: 'cold' means
    # the cache dir was empty/absent when this process started, 'warm'
    # means prior entries existed (production deployments ship the cache;
    # BENCH.md records both numbers)
    print(json.dumps({
        'metric': 'captions_per_sec_per_chip_beam5_transformer',
        'value': round(cps, 2),
        'unit': 'captions/s',
        'vs_baseline': round(cps / REFERENCE_CAPTIONS_PER_SEC, 2),
        'mfu_pct': round(mfu_pct, 2),
        'compile_s': round(compile_s, 1),
        'compile_cache': _CACHE_STATE,
    }))
    import sys
    print('details: batch=%d iters=%d steady=%.2fs (pipelined; synced '
          '%.1f cap/s) compile=%.1fs mfu=%.2f%% (%.1f MFLOP/lane/step, '
          'peak %.0f TF/s)' %
          (B, iters, dt, cps_synced, compile_s, mfu_pct,
           decode_step_flops(opt, 36, steps) / 1e6, peak / 1e12),
          file=sys.stderr)

    # ---- compact suite (VERDICT r4 item 6): the non-headline production
    # numbers, tracked in the driver artifact's tail each round so
    # regressions beyond the single beam-5 headline are visible.
    if os.environ.get('BENCH_SUITE', '1') != '0':
        suite = {}
        try:
            suite.update(_suite_rows(captioner, variables, fc, att, am,
                                     opt, B))
        except Exception as e:  # pragma: no cover - keep headline alive
            suite['suite_error'] = repr(e)[:200]
        print('suite: %s' % json.dumps(suite), file=sys.stderr)


def _pipelined(fn, fetch, iters=3, warm=True):
    """Deferred-fetch timing: batch i's fetch after batch i+1 dispatches
    (the production loop pattern; see the headline timing above).  One
    warmup call first so compile time stays out of the steady-state
    number (the headline reports compile_s separately)."""
    import time as _t
    if warm:
        fetch(fn(97))
    prev = None
    t0 = _t.time()
    for i in range(iters):
        r = fn(i)
        if prev is not None:
            fetch(prev)
        prev = r
    fetch(prev)
    return (_t.time() - t0) / iters


def _suite_rows(captioner, variables, fc, att, am, opt, B):
    """Greedy eval, XE train, fused SCST, and updown beam-5 rows."""
    import jax
    import jax.numpy as jnp
    from captioning_tpu.models import setup
    from captioning_tpu.modules.trainer import Trainer
    from captioning_tpu.ops.cider_device import DeviceCiderD, pad_gts

    out = {}
    rng = np.random.RandomState(1)

    # greedy eval (production sample_stats path: carried ent/ppl sums)
    g = lambda i: captioner.sample_stats_jit(
        variables, fc, att, am, jax.random.PRNGKey(i),
        {'sample_method': 'greedy'})
    dt = _pipelined(g, lambda r: (np.asarray(r[0]),
                                  np.asarray(r[1]['ent_sum'])))
    out['greedy_cap_s'] = round(B / dt, 1)

    # XE train step at B=128x5 (rbg prng = the train production default).
    # The train steps DONATE (variables, opt_state) — thread both through,
    # exactly like tools/train.py does (re-passing a donated array is a
    # deleted-buffer error on TPU; CPU only warns)
    jax.config.update('jax_default_prng_impl', 'rbg')
    try:
        topt = _train_opt(opt)
        trainer = Trainer(captioner, topt)
        tvars = jax.tree.map(jnp.copy, variables)  # keep caller's alive
        opt_state = trainer.init_opt_state(tvars)
        xb = 128
        fcx, attx, amx = fc[:xb], att[:xb], am[:xb]
        labels = jnp.asarray(rng.randint(1, opt.vocab_size, (xb, 5, 18)),
                             jnp.int32)
        masks = jnp.ones((xb, 5, 18), jnp.float32)

        def xe(i):
            nonlocal opt_state, tvars
            tvars, opt_state, o = trainer.xe_step(
                tvars, opt_state, fcx, attx, labels, masks, amx,
                4e-4, 0.0, jax.random.PRNGKey(i))
            return o
        dt = _pipelined(xe, lambda o: float(o['loss']))
        out['xe_img_s'] = round(xb * 5 / dt, 1)

        # fused on-device SCST (the production RL default): B=50x5
        sb = 50
        gts = [rng.randint(1, opt.vocab_size, (5, 16)).astype('int32')
               for _ in range(sb)]
        refs, ref_mask = pad_gts(gts, pad_to_multiple=5)
        df = {(i,): 2.0 for i in range(1, 50)}
        scorer = DeviceCiderD(df, ref_len=1000.0)
        fcs, atts, ams = fc[:sb], att[:sb], am[:sb]
        refs, ref_mask = jnp.asarray(refs), jnp.asarray(ref_mask)

        def sc(i):
            nonlocal opt_state, tvars
            r1, r2 = jax.random.split(jax.random.PRNGKey(i))
            tvars, opt_state, o = trainer.sc_fused_step(
                tvars, opt_state, fcs, atts, ams, refs, ref_mask,
                4e-4, r1, r2, scorer)
            return o
        dt = _pipelined(sc, lambda o: float(o['loss']))
        out['scst_fused_s_iter'] = round(dt, 4)
    finally:
        jax.config.update('jax_default_prng_impl', 'threefry2x32')

    # updown beam-5 (the RNN-family flagship row)
    from types import SimpleNamespace
    uopt = SimpleNamespace(
        caption_model='updown', vocab_size=opt.vocab_size,
        input_encoding_size=1000, rnn_size=1000, num_layers=2,
        drop_prob_lm=0.5, fc_feat_size=2048, att_feat_size=2048,
        att_hid_size=512, seq_per_img=5, max_length=20,
        compute_dtype='bfloat16', use_pallas=getattr(opt, 'use_pallas', -1))
    ucap = setup(uopt, {str(i): 'w%d' % i
                        for i in range(1, opt.vocab_size + 1)})
    uvars = ucap.init_params(jax.random.PRNGKey(0), att_len=36)
    bo = {'beam_size': 5, 'sample_n': 1, 'group_size': 1, 'suppress_UNK': 1}
    ub = lambda i: ucap.sample_beam_jit(uvars, fc, att, am,
                                        jax.random.PRNGKey(i), bo,
                                        want_logps=False)
    dt = _pipelined(ub, lambda r: (np.asarray(r[0]),
                                   np.asarray(r[1]['ent_sum'])))
    out['updown_beam5_cap_s'] = round(B / dt, 1)
    return out


def _train_opt(opt):
    """Trainer options over the bench model shapes."""
    from types import SimpleNamespace
    t = SimpleNamespace(**vars(opt))
    t.optim = 'adam'
    t.optim_alpha, t.optim_beta, t.optim_epsilon = 0.9, 0.999, 1e-8
    t.weight_decay = 0
    t.grad_clip_mode, t.grad_clip_value = 'value', 0.1
    t.label_smoothing = 0
    t.noamopt = False
    t.drop_worst_rate = 0
    t.cider_reward_weight = 1.0
    t.bleu_reward_weight = 0.0
    t.sc_sample_method = 'greedy'
    t.sc_beam_size = 1
    t.train_sample_method = 'sample'
    t.train_beam_size = 1
    t.train_sample_n = 5
    return t


if __name__ == '__main__':
    main()
