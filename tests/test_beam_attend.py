"""Merged-lane decode-cache layout (ops/beam_attend.py integration).

The transformer's use_pallas eval decode stores per-layer KV caches as
[B, Tp, h*dk] and runs the fused write+attend kernel on TPU.  On CPU the
jnp twin ``_attend_merged_eval`` carries the same layout; these tests pin

* math equivalence of the merged-layout attend against the production
  unmerged `_attend_beam` / `_attend`,
* caption-level parity of the whole decode across layouts (use_pallas 1
  vs 0 on CPU is bit-exact — only the TPU kernel introduces bf16
  accumulation-order rounding, bounded separately in
  tools/bench_beam_attend.py),
* the train/eval layout gate (rng-exact RL recompute keeps the unmerged
  layout).

Kernel-vs-oracle checks (TPU-only; conftest pins the test backend to
CPU) live in tools/bench_beam_attend.py and tools/bench_anc_layout.py.
"""
from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from captioning_tpu.models import setup
from captioning_tpu.models.transformer import (_attend_beam, _attend,
                                               _attend_merged_eval)


def test_attend_merged_eval_matches_attend_beam():
    nb, bw, h, T, dk = 3, 4, 2, 7, 8
    D = h * dk
    N = nb * bw
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(N, D), jnp.float32)
    k_m = jnp.asarray(rng.randn(N, T, D), jnp.float32)
    v_m = jnp.asarray(rng.randn(N, T, D), jnp.float32)
    anc = jnp.asarray(rng.randint(0, bw, (N, T)), jnp.int32)
    tmask = jnp.asarray(rng.rand(N, T) > 0.3)
    tmask = tmask.at[:, 0].set(True)  # every row attends something

    out = _attend_merged_eval(q, k_m, v_m, anc, tmask, bw, h, lambda p: p)

    # production layout [N, h, T, dk] holding identical values
    k_o = jnp.transpose(k_m.reshape(N, T, h, dk), (0, 2, 1, 3))
    v_o = jnp.transpose(v_m.reshape(N, T, h, dk), (0, 2, 1, 3))
    ref = _attend_beam(q.reshape(N, h, 1, dk), k_o, v_o, anc, tmask, bw,
                       lambda p: p).reshape(N, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_attend_merged_eval_nonbeam_matches_attend():
    N, h, T, dk = 6, 2, 5, 8
    D = h * dk
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(N, D), jnp.float32)
    k_m = jnp.asarray(rng.randn(N, T, D), jnp.float32)
    v_m = jnp.asarray(rng.randn(N, T, D), jnp.float32)
    tmask = jnp.asarray(rng.rand(N, T) > 0.3).at[:, 0].set(True)

    out = _attend_merged_eval(q, k_m, v_m, None, tmask, 0, h, lambda p: p)

    k_o = jnp.transpose(k_m.reshape(N, T, h, dk), (0, 2, 1, 3))
    v_o = jnp.transpose(v_m.reshape(N, T, h, dk), (0, 2, 1, 3))
    ref = _attend(q.reshape(N, h, 1, dk), k_o, v_o,
                  tmask[:, None, None, :], lambda p: p)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref.reshape(N, D)), atol=1e-5)


def _build(up, V=30):
    opt = SimpleNamespace(caption_model='transformer', vocab_size=V,
                          input_encoding_size=16, rnn_size=32, num_layers=2,
                          drop_prob_lm=0.5, fc_feat_size=8, att_feat_size=10,
                          att_hid_size=16, seq_per_img=2, max_length=8,
                          compute_dtype='float32', N_enc=2, N_dec=2,
                          d_model=16, d_ff=32, num_att_heads=4, dropout=0.1,
                          use_pallas=up)
    cap = setup(opt, {str(i): 'w%d' % i for i in range(1, V + 1)})
    vs = cap.init_params(jax.random.PRNGKey(0), att_len=5)
    return cap, vs


def test_cache_layout_gate():
    cap, _ = _build(1)
    s_eval = cap.module.init_state(4, train=False)
    s_train = cap.module.init_state(4, train=True)
    assert s_eval['k0'].ndim == 3 and s_eval['k0'].shape[1] % 8 == 0
    assert s_train['k0'].ndim == 4
    cap0, _ = _build(0)
    assert cap0.module.init_state(4, train=False)['k0'].ndim == 4


@pytest.mark.parametrize('so', [
    {'sample_method': 'greedy'},
    {'sample_method': 'sample', 'temperature': 1.0},
    {'beam_size': 3, 'sample_n': 1, 'group_size': 1},
    {'beam_size': 4, 'sample_n': 1, 'group_size': 2,
     'diversity_lambda': 0.5},
], ids=['greedy', 'sample', 'beam', 'dbs'])
def test_merged_layout_caption_parity(so):
    """use_pallas=1 (merged fallback on CPU) == use_pallas=0, bit-exact."""
    cap0, v0 = _build(0)
    cap1, v1 = _build(1)
    rng = np.random.RandomState(0)
    fc = jnp.asarray(rng.randn(6, 8), jnp.float32)
    att = jnp.asarray(rng.randn(6, 5, 10), jnp.float32)
    am = jnp.ones((6, 5), jnp.float32)
    key = jax.random.PRNGKey(7)
    if 'beam_size' in so:
        a = cap0.sample_beam_jit(v0, fc, att, am, key, so,
                                 want_logps=False)[0]
        b = cap1.sample_beam_jit(v1, fc, att, am, key, so,
                                 want_logps=False)[0]
    else:
        a = cap0.sample_stats_jit(v0, fc, att, am, key, so)[0]
        b = cap1.sample_stats_jit(v1, fc, att, am, key, so)[0]
    assert (np.asarray(a) == np.asarray(b)).all()
