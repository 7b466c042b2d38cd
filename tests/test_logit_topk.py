"""Fused logit epilogue (ops/logit_topk.py) — engine algebra on CPU.

The TPU kernel itself is oracle-checked in tools/bench_logit_topk.py
(conftest pins the test backend to CPU).  What CPU can pin exactly is

* the jnp twin `logit_topk_ref` against the engine's materialized-table
  math (generator + log_softmax + _unk_adjust + stats + lax.top_k), and
* the ENGINE's fused branches: injecting a `step_topk` built from the
  twin into DecodeModel must reproduce the non-fused beam/greedy decode
  bit-exactly — this covers the risky algebra (per-row top-bdash
  survivors commuting with the beam-sum shift, the t=0 lane-0 trick,
  (beam, rank) tie ordering, index remapping, carried stats).
"""
import dataclasses
from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from captioning_tpu.models import setup
from captioning_tpu.engine import decoding
from captioning_tpu.ops.logit_topk import logit_topk_ref


V = 29


def _mk(B=4, seed=0):
    opt = SimpleNamespace(
        caption_model='transformer', vocab_size=V,
        input_encoding_size=16, rnn_size=32, num_layers=2,
        drop_prob_lm=0.0, fc_feat_size=10, att_feat_size=12,
        att_hid_size=16, seq_per_img=5, max_length=8,
        N_enc=2, N_dec=2, d_model=16, d_ff=32, num_att_heads=4,
        dropout=0.0, use_pallas=0)
    cap = setup(opt, {str(i): 'w%d' % i for i in range(1, V + 1)})
    variables = cap.init_params(jax.random.PRNGKey(seed), att_len=5)
    rng = np.random.RandomState(seed)
    fc = jnp.asarray(rng.randn(B, 10).astype('float32'))
    att = jnp.asarray(rng.randn(B, 5, 12).astype('float32'))
    am = jnp.ones((B, 5), jnp.float32)
    return cap, variables, fc, att, am


def _inject_step_topk(cap, variables, dm):
    """api.py's step_topk wrapper with the jnp twin standing in for the
    TPU kernel (api.py gates the real one on backend == 'tpu')."""
    module = cap.module
    gen = variables['params']['generator']

    def step_topk(it, feats, state, rng, k, temp, unk_bias,
                  unk_idx, beam_width=0):
        hid, st = module.apply(
            variables, it, feats, state, False, False, True,
            beam_width, True, method=type(module).step)
        tv, ti, rs, en = logit_topk_ref(
            hid, gen['kernel'], gen['bias'], temp, unk_bias,
            k=int(k), unk_idx=int(unk_idx))
        return tv, ti, rs, en, st

    return dataclasses.replace(dm, step_topk=step_topk)


@pytest.mark.parametrize('suppress_unk,temp', [(0, 1.0), (1, 0.8)])
def test_fused_beam_matches_table_path(suppress_unk, temp):
    cap, variables, fc, att, am = _mk(B=4)
    opt = {'beam_size': 4, 'group_size': 1, 'sample_n': 1,
           'suppress_UNK': suppress_unk, 'temperature': temp}
    dm = cap.bind(variables, False)
    assert dm.step_topk is None  # CPU: the TPU kernel gate is off
    rng = jax.random.PRNGKey(3)
    seq0, st0, _ = decoding.sample_beam(dm, fc, att, am, rng, opt,
                                        want_logps=False)
    dmf = _inject_step_topk(cap, variables, dm)
    seq1, st1, _ = decoding.sample_beam(dmf, fc, att, am, rng, opt,
                                        want_logps=False)
    np.testing.assert_array_equal(np.asarray(seq0), np.asarray(seq1))
    np.testing.assert_allclose(np.asarray(st0['ent_sum']),
                               np.asarray(st1['ent_sum']), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(st0['lp_sum']),
                               np.asarray(st1['lp_sum']), rtol=1e-6)


def test_fused_beam_dynamic_params_program():
    """The traced-operand program (temperature / suppress_unk / lp_alpha
    as scalars) takes the fused branch too and matches the static one."""
    cap, variables, fc, att, am = _mk(B=2)
    opt = {'beam_size': 4, 'group_size': 1, 'sample_n': 1,
           'suppress_UNK': 1, 'temperature': 0.7}
    rng = jax.random.PRNGKey(5)
    dm = cap.bind(variables, False)
    dmf = _inject_step_topk(cap, variables, dm)
    seq_s, st_s, _ = decoding.sample_beam(dmf, fc, att, am, rng, opt,
                                          want_logps=False)
    dyn = {'temperature': jnp.float32(0.7),
           'suppress_unk': jnp.float32(1.0),
           'lp_alpha': jnp.float32(0.0)}
    seq_d, st_d, _ = decoding.sample_beam(
        dmf, fc, att, am, rng, dict(opt, length_penalty=''),
        want_logps=False, dynamic_params=dyn)
    np.testing.assert_array_equal(np.asarray(seq_s), np.asarray(seq_d))
    np.testing.assert_allclose(np.asarray(st_s['lp_sum']),
                               np.asarray(st_d['lp_sum']), rtol=1e-6)


def test_fused_greedy_matches_table_path():
    cap, variables, fc, att, am = _mk(B=8)
    opt = {'sample_method': 'greedy', 'beam_size': 1, 'group_size': 1,
           'sample_n': 1}
    dm = cap.bind(variables, False)
    rng = jax.random.PRNGKey(7)
    seq0, st0 = decoding.sample(dm, fc, att, am, rng, opt,
                                return_stats=True)
    dmf = _inject_step_topk(cap, variables, dm)
    seq1, st1 = decoding.sample(dmf, fc, att, am, rng, opt,
                                return_stats=True)
    np.testing.assert_array_equal(np.asarray(seq0), np.asarray(seq1))
    np.testing.assert_allclose(np.asarray(st0['ent_sum']),
                               np.asarray(st1['ent_sum']), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(st0['lp_sum']),
                               np.asarray(st1['lp_sum']), rtol=1e-6)


def test_ref_twin_matches_engine_table_math():
    """logit_topk_ref == generator + log_softmax + _unk_adjust + stats +
    lax.top_k, on random activations (the twin IS the oracle the TPU
    kernel is benched against)."""
    rng = np.random.RandomState(1)
    N, D, V1, k = 16, 8, 13, 4
    x = jnp.asarray(rng.randn(N, D).astype('float32'))
    w = jnp.asarray(rng.randn(D, V1).astype('float32'))
    b = jnp.asarray(rng.randn(V1).astype('float32'))
    for temp, ub, ui in ((1.0, 0.0, -1), (0.8, -1000.0, 5)):
        tv, ti, rs, en = logit_topk_ref(x, w, b, temp, ub, k=k, unk_idx=ui)
        lsm = jax.nn.log_softmax((x @ w + b) / temp, axis=-1)
        lsm = lsm + jnp.where(jnp.arange(V1) == ui, ub, 0.0)
        tv2, ti2 = jax.lax.top_k(lsm, k)
        np.testing.assert_array_equal(np.asarray(ti), np.asarray(ti2))
        np.testing.assert_allclose(np.asarray(tv), np.asarray(tv2),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(rs),
                                   np.asarray(lsm.sum(-1)), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(en),
            np.asarray(-(jnp.exp(lsm) * lsm).sum(-1)), rtol=1e-5)
