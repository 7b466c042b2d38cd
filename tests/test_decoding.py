"""Decoding engine tests: golden semantics vs an independent numpy replica
of the reference algorithms (CaptionModel.py:35-209,370-407)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from captioning_tpu.engine import decoding
from captioning_tpu.engine.decoding import DecodeModel


def make_mock_model(V1=11, seq_length=5, seed=0, feat_dim=4):
    """A tiny markov-ish mock: logprobs depend on (last token, feats)."""
    rng = np.random.RandomState(seed)
    table = rng.randn(V1, V1).astype('float32') * 2.0
    W = rng.randn(feat_dim, V1).astype('float32')

    def prepare(fc, att, att_masks, rng_):
        return {'f': fc}

    def init_state(batch):
        return {'t': jnp.zeros((batch,), jnp.int32),
                'prev': jnp.zeros((batch,), jnp.int32)}

    def step(it, feats, state, rng_, logsoftmax=True, uniform_t=False):
        logits = jnp.asarray(table)[it] + feats['f'] @ jnp.asarray(W)
        state = dict(state, t=state['t'] + 1, prev=it)
        if logsoftmax:
            return jax.nn.log_softmax(logits, -1), state
        return logits, state

    dm = DecodeModel(prepare=prepare, init_state=init_state, step=step,
                     seq_length=seq_length, vocab_plus=V1,
                     bad_endings_ix=(3, 4), unk_idx=V1 - 1)
    return dm, table, W


def np_logprobs(table, W, fc, it):
    logits = table[it] + fc @ W
    x = logits - logits.max(-1, keepdims=True)
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


def test_greedy_matches_manual_loop():
    dm, table, W = make_mock_model()
    B = 3
    fc = np.random.RandomState(1).randn(B, 4).astype('float32')
    seq, lp = decoding.sample(dm, jnp.asarray(fc), None, None,
                              jax.random.PRNGKey(0),
                              {'sample_method': 'greedy'})
    seq = np.asarray(seq)
    lp = np.asarray(lp)
    # manual replication of AttModel._sample greedy (reference :288-350)
    it = np.zeros(B, np.int64)
    unfinished = np.ones(B, bool)
    for t in range(dm.seq_length):
        logprobs = np_logprobs(table, W, fc, it)
        nxt = logprobs.argmax(-1)
        if t == 0:
            unfinished_new = nxt != 0
        else:
            nxt = np.where(unfinished, nxt, 0)
            logprobs = logprobs * unfinished[:, None]
            unfinished_new = unfinished & (nxt != 0)
        assert (seq[:, t] == nxt).all(), t
        assert np.allclose(lp[:, t], logprobs, atol=1e-5), t
        unfinished = unfinished_new
        it = nxt


def _reference_beam_search(table, W, fc, beam_size, seq_length, group_size=1,
                           diversity_lambda=0.5, length_penalty=None,
                           suppress_unk=0, unk_idx=None):
    """Independent numpy replica of reference CaptionModel.beam_search
    (batched, :35-209) for the mock model."""
    B, V1 = fc.shape[0], table.shape[0]
    bdash = beam_size // group_size
    length_penalty = length_penalty or (lambda L, p: p)

    init_logprobs = np_logprobs(table, W, fc, np.zeros(B, np.int64))
    beam_seq = [np.zeros((B, bdash, 0), np.int64) for _ in range(group_size)]
    beam_lp_sum = [np.zeros((B, bdash)) for _ in range(group_size)]
    logprobs_tbl = [init_logprobs.copy() for _ in range(group_size)]
    state_prev = [np.zeros((B * bdash,), np.int64) if False else
                  np.tile(np.zeros((B, 1), np.int64), (1, 1)).reshape(-1)
                  for _ in range(group_size)]
    # mock state is just the previous token; at t=0 batch is B
    state = [np.zeros((B,), np.int64) for _ in range(group_size)]
    done = [[[] for _ in range(group_size)] for _ in range(B)]

    for t in range(seq_length + group_size - 1):
        for g in range(group_size):
            if not (g <= t <= seq_length + g - 1):
                continue
            lt = t - g
            lp = logprobs_tbl[g].copy()
            if suppress_unk and unk_idx is not None:
                lp[:, unk_idx] -= 1000.0
            unaug = lp.copy()
            # diversity
            if g > 0:
                rows = lp.shape[0]
                change = np.zeros((B, V1))
                for pg in range(g):
                    for b in range(B):
                        for k in range(bdash):
                            change[b, beam_seq[pg][b, k, lt]] += 1
                if lt == 0:
                    lp = lp - change * diversity_lambda
                else:
                    lp = lp - np.repeat(change, bdash, 0) * diversity_lambda
            # beam step
            lp3 = lp.reshape(B, -1, V1)
            sums = beam_lp_sum[g][:, :1] if lt == 0 else beam_lp_sum[g]
            cand = sums[..., None] + lp3
            flat = cand.reshape(B, -1)
            ix = np.argsort(-flat, axis=1, kind='stable')[:, :bdash]
            ys = np.take_along_axis(flat, ix, 1)
            beam_ix = ix // V1
            sel_ix = ix % V1
            if beam_seq[g].shape[2] > 0:
                hist = np.stack([beam_seq[g][b][beam_ix[b]]
                                 for b in range(B)])
            else:
                hist = np.zeros((B, bdash, 0), np.int64)
            new_seq = np.concatenate([hist, sel_ix[..., None]], axis=2)
            beam_seq[g] = new_seq
            beam_lp_sum[g] = ys
            # state = previous token per beam row
            state[g] = sel_ix.reshape(-1)
            # collect finished
            for b in range(B):
                for k in range(bdash):
                    is_end = new_seq[b, k, lt] == 0 or lt == seq_length - 1
                    if is_end:
                        p = length_penalty(lt + 1, ys[b, k])
                        done[b][g].append(
                            {'seq': new_seq[b, k].copy(), 'p': p})
                        beam_lp_sum[g][b, k] -= 1000.0
            # model step
            fc_rep = np.repeat(fc, bdash, 0)
            nxt = np_logprobs(table, W, fc_rep, state[g])
            logprobs_tbl[g] = nxt  # log_softmax(lp/1) == lp
    out = [[sorted(done[b][g], key=lambda x: -x['p'])[:bdash]
            for g in range(group_size)] for b in range(B)]
    return out


@pytest.mark.parametrize('beam_size,group_size', [(3, 1), (4, 2)])
def test_beam_search_matches_reference_replica(beam_size, group_size):
    dm, table, W = make_mock_model()
    B = 2
    fc = np.random.RandomState(2).randn(B, 4).astype('float32')
    seq, logps, donej = decoding.sample_beam(
        dm, jnp.asarray(fc), None, None, jax.random.PRNGKey(0),
        {'beam_size': beam_size, 'group_size': group_size, 'sample_n': 1,
         'suppress_UNK': 0})
    ref = _reference_beam_search(table, W, fc, beam_size, dm.seq_length,
                                 group_size=group_size)
    bdash = beam_size // group_size
    pool_seq = np.asarray(donej['seq'])
    pool_p = np.asarray(donej['p'])
    for b in range(B):
        for g in range(group_size):
            for k in range(bdash):
                ref_seq = ref[b][g][k]['seq']
                got = pool_seq[b, g, k][:len(ref_seq)]
                assert (got == ref_seq).all(), (b, g, k, got, ref_seq)
                assert np.allclose(pool_p[b, g, k], ref[b][g][k]['p'],
                                   atol=1e-4), (b, g, k)


def test_beam_length_penalty_applied():
    dm, table, W = make_mock_model()
    B = 2
    fc = np.random.RandomState(3).randn(B, 4).astype('float32')
    _, _, done_plain = decoding.sample_beam(
        dm, jnp.asarray(fc), None, None, jax.random.PRNGKey(0),
        {'beam_size': 3, 'sample_n': 1, 'suppress_UNK': 0})
    _, _, done_avg = decoding.sample_beam(
        dm, jnp.asarray(fc), None, None, jax.random.PRNGKey(0),
        {'beam_size': 3, 'sample_n': 1, 'length_penalty': 'avg_1',
         'suppress_UNK': 0})
    ref = _reference_beam_search(
        table, W, fc, 3, dm.seq_length,
        length_penalty=lambda L, p: p / max(L, 1))
    for b in range(B):
        assert np.allclose(np.asarray(done_avg['p'])[b, 0, 0],
                           ref[b][0][0]['p'], atol=1e-4)


def test_decoding_constraint_blocks_repeats():
    dm, table, W = make_mock_model()
    fc = np.random.RandomState(4).randn(3, 4).astype('float32')
    seq, _ = decoding.sample(dm, jnp.asarray(fc), None, None,
                             jax.random.PRNGKey(0),
                             {'sample_method': 'greedy',
                              'decoding_constraint': 1})
    seq = np.asarray(seq)
    for row in seq:
        for a, b in zip(row[:-1], row[1:]):
            if a != 0 or b != 0:
                assert a != b


def test_remove_bad_endings_blocks_eos_after_function_word():
    dm, table, W = make_mock_model()
    # craft a table where token 3 (a bad ending) strongly precedes eos
    fc = np.zeros((2, 4), np.float32)
    seq, lp = decoding.sample(dm, jnp.asarray(fc), None, None,
                              jax.random.PRNGKey(0),
                              {'sample_method': 'greedy',
                               'remove_bad_endings': 1})
    seq = np.asarray(seq)
    lpn = np.asarray(lp)
    for b in range(2):
        for t in range(1, dm.seq_length):
            if seq[b, t - 1] in (3, 4) and seq[b, t - 1] != 0:
                # eos cannot be chosen right after a bad-ending word
                assert seq[b, t] != 0 or lpn[b, t].sum() == 0


def test_topk_sampling_support():
    dm, table, W = make_mock_model()
    fc = np.random.RandomState(5).randn(4, 4).astype('float32')
    seq, _ = decoding.sample(dm, jnp.asarray(fc), None, None,
                             jax.random.PRNGKey(1),
                             {'sample_method': 'top2', 'temperature': 1.0})
    seq = np.asarray(seq)
    # every sampled token must be within the top-2 of its conditional dist
    it = np.zeros(4, np.int64)
    unfinished = np.ones(4, bool)
    for t in range(dm.seq_length):
        logprobs = np_logprobs(table, W, fc, it)
        top2 = np.argsort(-logprobs, 1)[:, :2]
        for b in range(4):
            if unfinished[b]:
                assert seq[b, t] in top2[b]
        nxt = seq[:, t].copy()
        unfinished = unfinished & (nxt != 0)
        it = nxt
        if not unfinished.any():
            break


def test_scan_logprobs_matches_sample():
    dm, table, W = make_mock_model()
    fc = np.random.RandomState(6).randn(3, 4).astype('float32')
    rng = jax.random.PRNGKey(7)
    seq, lp = decoding.sample(dm, jnp.asarray(fc), None, None, rng,
                              {'sample_method': 'sample', 'sample_n': 2,
                               'temperature': 1.0})
    lp2 = decoding.scan_logprobs(dm, jnp.asarray(fc), None, None, seq, rng,
                                 sample_n=2)
    assert np.allclose(np.asarray(lp), np.asarray(lp2), atol=1e-5)


def test_diverse_sample_shapes_and_groups_differ():
    dm, table, W = make_mock_model()
    fc = np.random.RandomState(8).randn(2, 4).astype('float32')
    seq, lps = decoding.diverse_sample(
        dm, jnp.asarray(fc), None, None, jax.random.PRNGKey(0),
        {'sample_method': 'greedy', 'group_size': 3,
         'diversity_lambda': 2.0})
    assert seq.shape == (6, dm.seq_length)
    assert lps.shape == (6, dm.seq_length)
    seq = np.asarray(seq).reshape(2, 3, -1)
    # with a large diversity penalty later groups should diverge
    assert not (seq[0, 0] == seq[0, 1]).all() or \
        not (seq[0, 0] == seq[0, 2]).all()


@pytest.mark.slow  # compiles real model programs
@pytest.mark.parametrize('model', ['transformer', 'bert', 'm2transformer'])
def test_ancestry_beam_equals_physical_reorder(model):
    """Beam search through the ancestry-indexed KV caches must produce the
    SAME captions and pool scores as physically reordering the caches
    (engine/decoding.py beam_search use_anc branch vs reorder_state)."""
    from types import SimpleNamespace
    from captioning_tpu.models import setup as jx_setup

    vocab = {str(i): 'w%d' % i for i in range(1, 21)}
    opt = SimpleNamespace(
        caption_model=model, vocab_size=20, input_encoding_size=16,
        rnn_size=24, num_layers=1, drop_prob_lm=0.5, fc_feat_size=10,
        att_feat_size=12, att_hid_size=8, seq_length=7, max_length=7,
        rnn_type='lstm', logit_layers=1, use_bn=0, vocab=vocab,
        seq_per_img=1, compute_dtype='float32',
        N_enc=2, N_dec=2, d_model=16, d_ff=32, num_att_heads=4, dropout=0.1)
    cap = jx_setup(opt, vocab)
    variables = cap.init_params(jax.random.PRNGKey(0), att_len=5)
    rng = np.random.RandomState(3)
    fc = jnp.asarray(rng.randn(3, 10).astype('float32'))
    att = jnp.asarray(rng.randn(3, 5, 12).astype('float32'))

    outs = []
    for use_anc in (True, False):
        dm = cap.bind(variables, train=False)
        if not use_anc:
            dm = dataclasses.replace(dm, beam_init=None, beam_reorder=None)
        for opt_b in ({'beam_size': 4, 'group_size': 1, 'sample_n': 1},
                      {'beam_size': 4, 'group_size': 2, 'sample_n': 1,
                       'diversity_lambda': 0.5}):
            seq, lps, done = decoding.sample_beam(
                dm, fc, att, None, jax.random.PRNGKey(0), opt_b)
            outs.append((np.asarray(seq), np.asarray(lps),
                         np.asarray(done['seq']), np.asarray(done['p'])))
    n = len(outs) // 2
    for i in range(n):
        a, b = outs[i], outs[n + i]
        assert (a[0] == b[0]).all(), (model, i, 'seq')
        assert (a[2] == b[2]).all(), (model, i, 'pool seq')
        assert np.allclose(a[3], b[3], atol=1e-5), (model, i, 'pool p')
        assert np.allclose(a[1], b[1], atol=1e-5), (model, i, 'logps')


@pytest.mark.parametrize('beam_size,group_size,sample_n',
                         [(3, 1, 1), (4, 2, 1), (3, 1, 3)])
def test_beam_carried_stats_match_replay(beam_size, group_size, sample_n):
    """want_logps=False carries entropy/chosen-logprob sums through the beam
    scan; they must equal the same reductions over the replayed winner
    distributions (what eval_split computes, reference eval_utils.py:173-174).
    """
    dm, table, W = make_mock_model()
    B = 2
    fc = np.random.RandomState(4).randn(B, 4).astype('float32')
    opt = {'beam_size': beam_size, 'group_size': group_size,
           'sample_n': sample_n, 'suppress_UNK': 1}
    seq, logps, _ = decoding.sample_beam(
        dm, jnp.asarray(fc), None, None, jax.random.PRNGKey(0), opt)
    seq_f, stats, _ = decoding.sample_beam(
        dm, jnp.asarray(fc), None, None, jax.random.PRNGKey(0), opt,
        want_logps=False)
    seq, seq_f = np.asarray(seq), np.asarray(seq_f)
    assert (seq == seq_f).all()
    lp = np.asarray(logps)
    ent_replay = -(np.exp(lp) * lp).sum(-1).sum(1)
    lp_replay = np.take_along_axis(lp, seq[..., None], axis=2)[..., 0].sum(1)
    assert np.allclose(np.asarray(stats['ent_sum']), ent_replay,
                       rtol=1e-4, atol=1e-4)
    assert np.allclose(np.asarray(stats['lp_sum']), lp_replay,
                       rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('method,temp', [('greedy', 1.0), ('sample', 1.0),
                                         ('sample', 0.7), ('gumbel', 1.0),
                                         ('top3', 1.0), ('top0.8', 0.9)])
def test_dynamic_sampler_matches_static(method, temp):
    """sample() with traced method params (the shared compiled program)
    must reproduce the statically-specialized sampler token-for-token."""
    from captioning_tpu.models.api import Captioner
    dm, table, W = make_mock_model()
    B = 4
    fc = jnp.asarray(np.random.RandomState(5).randn(B, 4).astype('float32'))
    opt = {'sample_method': method, 'temperature': temp, 'sample_n': 2,
           'beam_size': 1, 'group_size': 1}
    seq_s, lp_s = decoding.sample(dm, fc, None, None,
                                  jax.random.PRNGKey(7), opt)
    dyn = Captioner._dynamic_sample_params(method, temp)
    seq_d, lp_d = decoding.sample(dm, fc, None, None, jax.random.PRNGKey(7),
                                  opt, dynamic_params=dyn)
    assert (np.asarray(seq_s) == np.asarray(seq_d)).all()
    assert np.allclose(np.asarray(lp_s), np.asarray(lp_d),
                       rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # compiles real model programs
def test_dynamic_sampler_one_program_across_methods():
    """Switching eval sampling methods reuses ONE compiled program
    (VERDICT round-1 item 10: eval over 3 methods compiles <= 2)."""
    from captioning_tpu.models import setup as jx_setup
    from types import SimpleNamespace
    vocab = {str(i): 'w%d' % i for i in range(1, 14)}
    opt = SimpleNamespace(
        caption_model='updown', vocab_size=13, input_encoding_size=16,
        rnn_size=24, num_layers=1, drop_prob_lm=0.5, fc_feat_size=10,
        att_feat_size=12, att_hid_size=8, seq_length=7, max_length=7,
        rnn_type='lstm', logit_layers=1, use_bn=0, seq_per_img=1,
        compute_dtype='float32')
    cap = jx_setup(opt, vocab)
    variables = cap.init_params(jax.random.PRNGKey(0), att_len=5)
    rng = np.random.RandomState(6)
    fc = jnp.asarray(rng.randn(2, 10).astype('float32'))
    att = jnp.asarray(rng.randn(2, 5, 12).astype('float32'))
    outs = {}
    for m in ('sample', 'gumbel', 'top3', 'top0.9'):
        o = {'sample_method': m, 'temperature': 1.0, 'sample_n': 2,
             'beam_size': 1}
        seq, _ = cap.sample_dynamic_jit(variables, fc, att, None,
                                        jax.random.PRNGKey(3), o)
        outs[m] = np.asarray(seq)
    dyn_keys = [k for k in cap._jit_cache if k[0] == 'sample_dyn']
    assert len(dyn_keys) == 1, dyn_keys
    # methods genuinely differ in behavior through the one program
    assert not (outs['sample'] == outs['top3']).all() or \
           not (outs['sample'] == outs['gumbel']).all()


@pytest.mark.slow  # compiles real model programs
def test_sample_stats_matches_table_reductions():
    """sample(return_stats=True) carries the exact reductions eval_split
    takes from the full distribution table (same finish-row gating)."""
    dm, table, W = make_mock_model()
    B = 4
    fc = jnp.asarray(np.random.RandomState(13).randn(B, 4).astype('float32'))
    opt = {'sample_method': 'greedy', 'sample_n': 2}
    seq, lp = decoding.sample(dm, fc, None, None, jax.random.PRNGKey(5), opt)
    seq2, stats = decoding.sample(dm, fc, None, None, jax.random.PRNGKey(5),
                                  opt, return_stats=True)
    seq, lp = np.asarray(seq), np.asarray(lp)
    assert (seq == np.asarray(seq2)).all()
    ent_tab = -(np.exp(lp) * lp).sum(-1).sum(1)
    lp_tab = np.take_along_axis(lp, seq[..., None], axis=2)[..., 0].sum(1)
    assert np.allclose(np.asarray(stats['ent_sum']), ent_tab,
                       rtol=1e-4, atol=1e-4)
    assert np.allclose(np.asarray(stats['lp_sum']), lp_tab,
                       rtol=1e-5, atol=1e-5)


def test_topk_iterated_equals_lax_topk():
    """_topk_iterated must reproduce lax.top_k(cand.reshape(B, bdash*V1), k)
    exactly — values, flat indices, order, AND tie resolution (smaller flat
    index wins) — including tables full of duplicates and -inf entries
    (log_softmax underflow), which the exclusion mask must never re-pick."""
    rng = np.random.RandomState(0)
    B, bdash, V1 = 4, 5, 37
    for trial, tbl in enumerate([
            rng.randn(B * bdash, V1).astype('float32'),
            # heavy ties: few distinct values
            rng.randint(-3, 3, (B * bdash, V1)).astype('float32'),
            # all-equal rows + -inf columns
            np.where(rng.rand(B * bdash, V1) < 0.4, -np.inf,
                     0.0).astype('float32'),
            np.full((B * bdash, V1), -1e9, np.float32)]):
        cand = jnp.asarray(tbl)
        for k in (1, 3, bdash):
            ys, ix = decoding._topk_iterated(cand, B, bdash, k)
            ys_r, ix_r = jax.lax.top_k(cand.reshape(B, bdash * V1), k)
            assert (np.asarray(ix) == np.asarray(ix_r)).all(), (trial, k)
            assert (np.asarray(ys) == np.asarray(ys_r)).all(), (trial, k)


@pytest.mark.parametrize('suppress,lp', [(0, ''), (1, 'wu_0.9')])
def test_fast_beam_path_equals_general(suppress, lp):
    """The G==1 write-time-fused beam body must match the general body
    token-for-token and score-for-score (stats to fp tolerance)."""
    dm, table, W = make_mock_model()
    B = 3
    fc = jnp.asarray(np.random.RandomState(11).randn(B, 4).astype('float32'))
    base = {'beam_size': 4, 'group_size': 1, 'sample_n': 1,
            'suppress_UNK': suppress, 'length_penalty': lp,
            'temperature': 0.9}
    sf, lf, df = decoding.sample_beam(dm, fc, None, None,
                                     jax.random.PRNGKey(2), dict(base))
    sg, lg, dg = decoding.sample_beam(dm, fc, None, None,
                                     jax.random.PRNGKey(2),
                                     dict(base, _beam_general=1))
    assert (np.asarray(sf) == np.asarray(sg)).all()
    assert (np.asarray(df['seq']) == np.asarray(dg['seq'])).all()
    for k in ('p', 'unaug_p', 'ent_sum', 'lp_sum'):
        assert np.allclose(np.asarray(df[k]), np.asarray(dg[k]),
                           rtol=1e-4, atol=1e-4), k
    assert np.allclose(np.asarray(lf), np.asarray(lg), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('lp', ['', 'wu_0.9', 'avg_0.3'])
def test_beam_early_exit_exact_on_finishing_captions(lp):
    """The fast body's while_loop exit (stop once no pool can change) must
    be bit-exact in the regime where it actually engages: every caption
    ends by step ~3 of a 12-step budget, so the loop provably exits early
    and the outputs must still equal the full-length general body."""
    dm, table, W = make_mock_model(seq_length=12, seed=7)
    # strongly prefer EOS after any non-BOS token: captions finish at 2-3
    table = table.copy()
    table[1:, 0] += 12.0

    def step(it, feats, state, rng_, logsoftmax=True, uniform_t=False):
        logits = jnp.asarray(table)[it] + feats['f'] @ jnp.asarray(W)
        state = dict(state, t=state['t'] + 1, prev=it)
        if logsoftmax:
            return jax.nn.log_softmax(logits, -1), state
        return logits, state

    dm2 = dataclasses.replace(dm, step=step)
    B = 4
    fc = jnp.asarray(np.random.RandomState(3).randn(B, 4).astype('float32'))
    base = {'beam_size': 4, 'group_size': 1, 'sample_n': 1,
            'suppress_UNK': 0, 'length_penalty': lp, 'temperature': 1.0}
    sf, lf, df = decoding.sample_beam(dm2, fc, None, None,
                                      jax.random.PRNGKey(2), dict(base))
    sg, lg, dg = decoding.sample_beam(dm2, fc, None, None,
                                      jax.random.PRNGKey(2),
                                      dict(base, _beam_general=1))
    # captions must genuinely finish early for this test to mean anything
    lens = (np.asarray(sf) > 0).sum(1)
    assert lens.max() <= 4, lens
    assert (np.asarray(sf) == np.asarray(sg)).all()
    assert (np.asarray(df['seq']) == np.asarray(dg['seq'])).all()
    for k in ('p', 'unaug_p', 'ent_sum', 'lp_sum'):
        assert np.allclose(np.asarray(df[k]), np.asarray(dg[k]),
                           rtol=1e-4, atol=1e-4), k

    # the greedy stats path's all-rows-finished exit, same regime
    o = {'sample_method': 'greedy'}
    seq, lpv = decoding.sample(dm2, fc, None, None, jax.random.PRNGKey(5), o)
    seq2, stats = decoding.sample(dm2, fc, None, None, jax.random.PRNGKey(5),
                                  o, return_stats=True)
    seq, lpv = np.asarray(seq), np.asarray(lpv)
    assert (seq == np.asarray(seq2)).all()
    ent_tab = -(np.exp(lpv) * lpv).sum(-1).sum(1)
    lp_tab = np.take_along_axis(lpv, seq[..., None], axis=2)[..., 0].sum(1)
    assert np.allclose(np.asarray(stats['ent_sum']), ent_tab,
                       rtol=1e-4, atol=1e-4)
    assert np.allclose(np.asarray(stats['lp_sum']), lp_tab,
                       rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # compiles real model programs
def test_dynamic_beam_one_program_across_params():
    """temperature / suppress_UNK / length-penalty alpha are traced beam
    operands: an eval sweep over them reuses ONE compiled program per
    penalty type (VERDICT round-2 item 8), with results equal to the
    statically-specialized beam search."""
    from types import SimpleNamespace
    from captioning_tpu.models import setup as jx_setup
    V = 13
    vocab = {str(i): 'w%d' % i for i in range(1, V)}
    vocab[str(V)] = 'UNK'  # unk_idx = vocab_size (CaptionModel.py:159)
    opt = SimpleNamespace(
        caption_model='updown', vocab_size=V, input_encoding_size=16,
        rnn_size=24, num_layers=1, drop_prob_lm=0.5, fc_feat_size=10,
        att_feat_size=12, att_hid_size=8, seq_length=7, max_length=7,
        rnn_type='lstm', logit_layers=1, use_bn=0, seq_per_img=1,
        compute_dtype='float32')
    cap = jx_setup(opt, vocab)
    variables = cap.init_params(jax.random.PRNGKey(0), att_len=5)
    rng = np.random.RandomState(9)
    fc = jnp.asarray(rng.randn(2, 10).astype('float32'))
    att = jnp.asarray(rng.randn(2, 5, 12).astype('float32'))

    sweep = [dict(temperature=1.0, suppress_UNK=0, length_penalty='wu_0.9'),
             dict(temperature=0.7, suppress_UNK=1, length_penalty='wu_0.2'),
             dict(temperature=1.3, suppress_UNK=1, length_penalty='wu_0.5')]
    seqs = []
    for extra in sweep:
        o = dict(beam_size=3, group_size=1, sample_n=1, **extra)
        seq, _, _ = cap.sample_beam_jit(variables, fc, att, None,
                                        jax.random.PRNGKey(3), o)
        seqs.append(np.asarray(seq))
    beam_keys = [k for k in cap._jit_cache if k[0] == 'beam']
    assert len(beam_keys) == 1, beam_keys

    # the traced operands genuinely steer behavior: each sweep point must
    # match the statically-compiled beam search token-for-token
    for extra, got in zip(sweep, seqs):
        o = dict(beam_size=3, group_size=1, sample_n=1, **extra)
        dm = cap.bind(variables, train=False)
        want, _, _ = decoding.sample_beam(dm, fc, att, None,
                                          jax.random.PRNGKey(3), o)
        assert (np.asarray(want) == got).all(), extra

    # a different penalty TYPE is a structural change -> one more program
    o = dict(beam_size=3, group_size=1, sample_n=1, temperature=1.0,
             suppress_UNK=0, length_penalty='avg_1')
    cap.sample_beam_jit(variables, fc, att, None, jax.random.PRNGKey(3), o)
    beam_keys = [k for k in cap._jit_cache if k[0] == 'beam']
    assert len(beam_keys) == 2, beam_keys


@pytest.mark.parametrize('model', ['transformer', 'bert', 'm2transformer',
                                   'updown', 'att2in2', 'stackatt', 'aoa'])
@pytest.mark.slow  # compiles real model programs
def test_shared_beam_feats_equal_replicated(model):
    """Block-shared beam feats (one att/memory row per beam block) must
    produce the same captions and pool scores as lane-replicated feats."""
    from types import SimpleNamespace
    from captioning_tpu.models import setup as jx_setup

    vocab = {str(i): 'w%d' % i for i in range(1, 21)}
    opt = SimpleNamespace(
        caption_model=model, vocab_size=20, input_encoding_size=16,
        rnn_size=24, num_layers=1, drop_prob_lm=0.5, fc_feat_size=10,
        att_feat_size=12, att_hid_size=8, seq_length=7, max_length=7,
        rnn_type='lstm', logit_layers=1, use_bn=0, vocab=vocab,
        seq_per_img=1, compute_dtype='float32',
        N_enc=2, N_dec=2, d_model=16, d_ff=32, num_att_heads=4, dropout=0.1)
    cap = jx_setup(opt, vocab)
    variables = cap.init_params(jax.random.PRNGKey(0), att_len=5)
    rng = np.random.RandomState(8)
    fc = jnp.asarray(rng.randn(3, 10).astype('float32'))
    att = jnp.asarray(rng.randn(3, 5, 12).astype('float32'))
    am = jnp.ones((3, 5), jnp.float32)

    dm = cap.bind(variables, train=False)
    assert dm.shared_beam_feats, model
    dm_rep = dataclasses.replace(dm, shared_beam_feats=False)
    for opt_b in ({'beam_size': 4, 'group_size': 1, 'sample_n': 1},
                  {'beam_size': 4, 'group_size': 2, 'sample_n': 1,
                   'diversity_lambda': 0.5}):
        s1, lp1, d1 = decoding.sample_beam(dm, fc, att, am,
                                           jax.random.PRNGKey(0), opt_b)
        s2, lp2, d2 = decoding.sample_beam(dm_rep, fc, att, am,
                                           jax.random.PRNGKey(0), opt_b)
        assert (np.asarray(s1) == np.asarray(s2)).all(), (model, opt_b)
        assert (np.asarray(d1['seq']) == np.asarray(d2['seq'])).all()
        assert np.allclose(np.asarray(d1['p']), np.asarray(d2['p']),
                           atol=1e-5)
        assert np.allclose(np.asarray(lp1), np.asarray(lp2), atol=1e-5)


@pytest.mark.slow  # compiles real model programs
@pytest.mark.parametrize('model', ['transformer', 'bert', 'updown', 'aoa'])
def test_grouped_tf_equals_replicated(model):
    """Teacher forcing with seq_per_img>1 shares one encoder-memory row per
    image (grouped cross-attention / shared feats in the step scan); it
    must equal running each sequence against its own replicated image."""
    from types import SimpleNamespace
    from captioning_tpu.models import setup as jx_setup
    opt = SimpleNamespace(
        caption_model=model, vocab_size=20, input_encoding_size=16,
        rnn_size=24, num_layers=1, drop_prob_lm=0.5, fc_feat_size=10,
        att_feat_size=12, att_hid_size=8, max_length=7, rnn_type='lstm',
        logit_layers=1, use_bn=0, seq_per_img=3, compute_dtype='float32',
        N_enc=2, N_dec=2, d_model=16, d_ff=32, num_att_heads=4, dropout=0.1)
    vocab = {str(i): 'w%d' % i for i in range(1, 21)}
    cap = jx_setup(opt, vocab)
    v = cap.init_params(jax.random.PRNGKey(0), att_len=5)
    rng = np.random.RandomState(2)
    B, spi = 2, 3
    fc = jnp.asarray(rng.randn(B, 10).astype('float32'))
    att = jnp.asarray(rng.randn(B, 5, 12).astype('float32'))
    am = jnp.ones((B, 5), jnp.float32)
    seq = jnp.asarray(rng.randint(1, 20, (B * spi, 8)), jnp.int32)
    lp_grouped = cap.forward_tf(v, fc, att, seq, am, 0.0, None, False)
    lp_rep = cap.forward_tf(v, jnp.repeat(fc, spi, 0),
                            jnp.repeat(att, spi, 0), seq,
                            jnp.repeat(am, spi, 0), 0.0, None, False)
    assert np.allclose(np.asarray(lp_grouped), np.asarray(lp_rep),
                       atol=1e-4), model


def test_lazy_cross_eval_matches_materialized_tiny():
    """Quick-tier lazy-cross sentinel: eval-mode _lazy_cross_stk equals the
    materialized q@(K+bk)^T -> softmax -> p@(V+bv) -> Wo formulation it
    replaced (reference cachedTransformer.py:201-242 semantics), on
    hand-built params so no model program compiles.  The full train-mode
    dropout variants live in the slow tier below."""
    from captioning_tpu.models.transformer import _lazy_cross_stk

    D, h, M, nb, bw = 16, 4, 5, 3, 2
    dk = D // h
    B = nb * bw
    rng = np.random.RandomState(7)
    y = jnp.asarray(rng.randn(B, 1, D), jnp.float32)
    mem = jnp.asarray(rng.randn(nb, M, D), jnp.float32)
    am = jnp.asarray((rng.rand(nb, M) > 0.3).astype('float32'))
    lp = {n: {'kernel': jnp.asarray(rng.randn(D, D) * 0.2, jnp.float32),
              'bias': jnp.asarray(rng.randn(D) * 0.1, jnp.float32)}
          for n in ('wq', 'wk', 'wv', 'wo')}
    out = np.asarray(_lazy_cross_stk(lp, y, mem, am, bw, h, jnp.float32,
                                     lambda p: p))[:, 0]

    p_ = {n: {k: np.asarray(v) for k, v in d.items()} for n, d in lp.items()}
    q = np.asarray(y[:, 0]) @ p_['wq']['kernel'] + p_['wq']['bias']
    k = np.asarray(mem) @ p_['wk']['kernel'] + p_['wk']['bias']
    v = np.asarray(mem) @ p_['wv']['kernel'] + p_['wv']['bias']
    rep = np.repeat(np.arange(nb), bw)
    scores = np.einsum('bhd,bmhd->bhm', q.reshape(B, h, dk),
                       k.reshape(nb, M, h, dk)[rep]) / np.sqrt(dk)
    scores = np.where(np.asarray(am)[rep][:, None, :] == 0, -1e9, scores)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    ctx = np.einsum('bhm,bmhd->bhd', p, v.reshape(nb, M, h, dk)[rep])
    ref = ctx.reshape(B, D) @ p_['wo']['kernel'] + p_['wo']['bias']
    assert np.allclose(out, ref, atol=1e-5), np.abs(out - ref).max()


@pytest.mark.slow  # compiles real model programs
def test_lazy_cross_exact_under_attention_dropout():
    """_lazy_cross_stk == materialized cached-K/V cross-attention with the
    SAME attention-dropout mask: the V bias must be weighted by the dropped
    probability mass (sum_m p_m), not by 1 (reference
    cachedTransformer.py:201-242 applies dropout to p and then p @ (mem@Wv
    + bv)).  Guards the train-mode RL decode path."""
    from types import SimpleNamespace
    from captioning_tpu.models import setup
    from captioning_tpu.models.transformer import _lazy_cross_stk

    opt = SimpleNamespace(caption_model='transformer', vocab_size=15,
                          input_encoding_size=16, rnn_size=32, num_layers=2,
                          drop_prob_lm=0.5, fc_feat_size=8, att_feat_size=10,
                          att_hid_size=16, seq_per_img=2, max_length=6,
                          compute_dtype='float32',
                          N_enc=2, N_dec=2, d_model=16, d_ff=32,
                          num_att_heads=4, dropout=0.1)
    vocab = {str(i): 'w%d' % i for i in range(1, 16)}
    cap = setup(opt, vocab)
    variables = cap.init_params(jax.random.PRNGKey(0), att_len=4)
    D, h, M, nb, bw = 16, 4, 4, 3, 2
    dk = D // h
    B = nb * bw
    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.randn(B, 1, D), jnp.float32)
    mem = jnp.asarray(rng.randn(nb, M, D), jnp.float32)
    am = jnp.asarray((rng.rand(nb, M) > 0.2).astype('float32'))
    keep = 0.7

    def fixed_drop(p):
        # deterministic "dropout": zero every 3rd probability, rescale rest
        m = (jnp.arange(p.size).reshape(p.shape) % 3) != 0
        return jnp.where(m, p / keep, jnp.zeros_like(p))

    # layer-0 slice of the stacked dec_src params
    pt = jax.device_get(variables['params'])
    lp = {n: {'kernel': jnp.asarray(pt['dec_src_%s_kernel' % n][0]),
              'bias': jnp.asarray(pt['dec_src_%s_bias' % n][0])}
          for n in ('wq', 'wk', 'wv', 'wo')}
    out = _lazy_cross_stk(lp, y, mem, am, bw, h, jnp.float32, fixed_drop,
                          dropped=True)
    out = np.asarray(out, np.float32)[:, 0]                   # [B, D]

    # materialized reference: q@(K+bk)^T -> softmax -> drop -> p@(V+bv) -> Wo
    p_ = {n: {'kernel': pt['dec_src_%s_kernel' % n][0],
              'bias': pt['dec_src_%s_bias' % n][0]}
          for n in ('wq', 'wk', 'wv', 'wo')}
    q = (np.asarray(y[:, 0]) @ p_['wq']['kernel']) + p_['wq']['bias']
    k = (np.asarray(mem) @ p_['wk']['kernel']) + p_['wk']['bias']
    v = (np.asarray(mem) @ p_['wv']['kernel']) + p_['wv']['bias']
    qh = q.reshape(B, h, dk)
    kh = k.reshape(nb, M, h, dk)
    vh = v.reshape(nb, M, h, dk)
    scores = np.einsum('bhd,bmhd->bhm', qh,
                       kh[np.repeat(np.arange(nb), bw)]) / np.sqrt(dk)
    scores = np.where(np.repeat(np.asarray(am), bw, 0)[:, None, :] == 0,
                      -1e9, scores)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)                          # [B, h, M]
    # same mask as fixed_drop: lazy p is [nb, bw*h, M] with (lane, head)
    # row-major == [B, h, M] row-major, so the iota mask matches elementwise
    mask = (np.arange(p.size).reshape(p.shape) % 3) != 0
    p = np.where(mask, p / keep, 0.0)
    ctx = np.einsum('bhm,bmhd->bhd', p, vh[np.repeat(np.arange(nb), bw)])
    ref = ctx.reshape(B, D) @ p_['wo']['kernel'] + p_['wo']['bias']
    assert np.allclose(out, ref, atol=1e-5), np.abs(out - ref).max()

    # and the old formulation (bias weight 1) must NOT match — the test
    # distinguishes the two
    out_eval = _lazy_cross_stk(lp, y, mem, am, bw, h, jnp.float32,
                               fixed_drop, dropped=False)
    assert not np.allclose(np.asarray(out_eval)[:, 0], ref, atol=1e-5)


@pytest.mark.slow  # compiles real model programs
def test_bert_lazy_cross_equals_cached():
    """The bert step's lazy cross-attention (transformer._lazy_cross_attend)
    must equal the materialized cached-K/V formulation it replaced
    (mem_k/mem_v per layer + _attend with a src mask), in eval mode and in
    train mode with the SAME dropout rng stream (the lazy p is [nb, bw*h, M]
    whose row-major order equals the cached [B, h, 1, M], so the masks
    match elementwise)."""
    from types import SimpleNamespace
    from captioning_tpu.models import setup
    from captioning_tpu.models.transformer import _split_heads

    vocab = {str(i): 'w%d' % i for i in range(1, 21)}
    opt = SimpleNamespace(
        caption_model='bert', vocab_size=20, input_encoding_size=16,
        rnn_size=24, num_layers=1, drop_prob_lm=0.5, fc_feat_size=10,
        att_feat_size=12, att_hid_size=8, seq_length=7, max_length=7,
        rnn_type='lstm', logit_layers=1, use_bn=0, vocab=vocab,
        seq_per_img=1, compute_dtype='float32',
        N_enc=2, N_dec=2, d_model=16, d_ff=32, num_att_heads=4, dropout=0.3)
    cap = setup(opt, vocab)
    variables = cap.init_params(jax.random.PRNGKey(0), att_len=5)
    module = cap.module
    rng = np.random.RandomState(3)
    B = 3
    fc = jnp.asarray(rng.randn(B, 10).astype('float32'))
    att = jnp.asarray(rng.randn(B, 5, 12).astype('float32'))
    am = jnp.asarray((rng.rand(B, 5) > 0.2).astype('float32'))
    it = jnp.asarray(rng.randint(1, 20, (B,)), jnp.int32)

    def new_step(train):
        def run(m):
            feats = m.prepare_feature(fc, att, am, train)
            state = m.init_state(B)
            return m.step(it, feats, state, train)[0]
        return module.apply(variables, run, method=lambda m, f: f(m),
                            rngs={'dropout': jax.random.PRNGKey(7)})

    def old_step(train):
        """the pre-lazy step: per-layer materialized cross K/V + _attn."""
        def run(m):
            cfg = m.cfg
            h = cfg.num_att_heads
            memory = m.encode(att, am, train)
            mem_kv = [( _split_heads(m.dec_cross[i].wk(memory), h),
                        _split_heads(m.dec_cross[i].wv(memory), h))
                      for i in range(cfg.N_dec)]
            state = m.init_state(B)
            t_rows = state['t']
            T = state['k0'].shape[-2]
            x = m._embed_tokens_rows(it, t_rows, train)
            self_mask = (jnp.arange(T)[None, :] <= t_rows[:, None]
                         )[:, None, None, :]
            rows = jnp.arange(B)
            src_mask = am[:, None, None, :]
            for i in range(cfg.N_dec):
                blk = m.dec_self[i]
                k_cache = state['k%d' % i].at[rows, :, t_rows, :].set(
                    _split_heads(blk.wk(x), h)[:, :, 0, :])
                v_cache = state['v%d' % i].at[rows, :, t_rows, :].set(
                    _split_heads(blk.wv(x), h)[:, :, 0, :])
                x2 = m._attn(blk, x, k_cache, v_cache, self_mask, train)
                x2 = m._attn(m.dec_cross[i], x2, mem_kv[i][0], mem_kv[i][1],
                             src_mask, train)
                x = m._ffn(m.dec_ffn[i], x2, train)
            return jax.nn.log_softmax(
                m.generator(x[:, 0]).astype(jnp.float32), axis=-1)
        return module.apply(variables, run, method=lambda m, f: f(m),
                            rngs={'dropout': jax.random.PRNGKey(7)})

    for train in (False, True):
        lp_new = np.asarray(new_step(train))
        lp_old = np.asarray(old_step(train))
        assert np.allclose(lp_new, lp_old, atol=1e-5), (
            train, np.abs(lp_new - lp_old).max())


@pytest.mark.slow  # compiles real model programs
def test_m2_lazy_cross_equals_cached():
    """The m2 step's lazy meshed cross-attention must equal the materialized
    per-(layer, level) K/V formulation it replaced.  The old layout is still
    the forward_tf path: feeding step() a feats dict carrying mem_k/mem_v
    (the pre-refactor prepare_feature output) drives _decoder_layer's
    materialized branch, which must match the lazy branch in eval mode and
    in train mode under the SAME dropout rng stream."""
    from types import SimpleNamespace
    from captioning_tpu.models import setup
    from captioning_tpu.models.transformer import _split_heads

    vocab = {str(i): 'w%d' % i for i in range(1, 21)}
    opt = SimpleNamespace(
        caption_model='m2transformer', vocab_size=20, input_encoding_size=16,
        rnn_size=24, num_layers=1, drop_prob_lm=0.5, fc_feat_size=10,
        att_feat_size=12, att_hid_size=8, seq_length=7, max_length=7,
        rnn_type='lstm', logit_layers=1, use_bn=0, vocab=vocab,
        seq_per_img=1, compute_dtype='float32',
        N_enc=2, N_dec=2, d_model=16, d_ff=32, num_att_heads=4, dropout=0.3)
    cap = setup(opt, vocab)
    variables = cap.init_params(jax.random.PRNGKey(0), att_len=5)
    module = cap.module
    rng = np.random.RandomState(5)
    B = 3
    fc = jnp.asarray(rng.randn(B, 10).astype('float32'))
    att = jnp.asarray(rng.randn(B, 5, 12).astype('float32'))
    am = jnp.asarray((rng.rand(B, 5) > 0.2).astype('float32'))
    it = jnp.asarray(rng.randint(1, 20, (B,)), jnp.int32)

    def run_step(materialize, train):
        def run(m):
            cfg = m.cfg
            h = cfg.num_att_heads
            feats = m.prepare_feature(fc, att, am, train)
            if materialize:            # rebuild the pre-refactor layout
                levels = feats['levels']
                mem_k, mem_v = [], []
                for i in range(cfg.N_dec):
                    blk = m.dec_cross[i]
                    mem_k.append(jnp.stack(
                        [_split_heads(blk.wk(levels[:, e]), h)
                         for e in range(cfg.N_enc)], 1))
                    mem_v.append(jnp.stack(
                        [_split_heads(blk.wv(levels[:, e]), h)
                         for e in range(cfg.N_enc)], 1))
                feats = {'mem_k': jnp.stack(mem_k, 1),
                         'mem_v': jnp.stack(mem_v, 1),
                         'att_masks': feats['att_masks']}
            state = m.init_state(B)
            return m.step(it, feats, state, train)[0]
        return module.apply(variables, run, method=lambda m, f: f(m),
                            rngs={'dropout': jax.random.PRNGKey(9)})

    for train in (False, True):
        lp_new = np.asarray(run_step(False, train))
        lp_old = np.asarray(run_step(True, train))
        assert np.allclose(lp_new, lp_old, atol=1e-5), (
            train, np.abs(lp_new - lp_old).max())


def test_diverse_sample_block_trigrams():
    """_diverse_sample supports block_trigrams (reference AttModel.py:
    411-437 applies the trigram scheme per group at its local time)."""
    dm, table, W = make_mock_model(seed=3)
    fc = np.zeros((2, 4), np.float32)
    opt = {'sample_method': 'greedy', 'group_size': 2,
           'diversity_lambda': 0.0}
    s_plain, _ = decoding.diverse_sample(dm, jnp.asarray(fc), None, None,
                                         jax.random.PRNGKey(0), opt)
    s_block, _ = decoding.diverse_sample(dm, jnp.asarray(fc), None, None,
                                         jax.random.PRNGKey(0),
                                         dict(opt, block_trigrams=1))

    def n_repeated_trigrams(row):
        tris = [tuple(row[i:i + 3]) for i in range(len(row) - 2)]
        return len(tris) - len(set(tris))

    plain = sum(n_repeated_trigrams(list(r)) for r in np.asarray(s_plain))
    blocked = sum(n_repeated_trigrams(list(r)) for r in np.asarray(s_block))
    assert blocked <= plain


def test_sample_return_stats_on_beam_route():
    """sample(return_stats=True) with beam_size>1 must honor the stats
    contract (carried ent/lp sums), not return the replay logprob table."""
    dm, table, W = make_mock_model(seed=5)
    fc = np.random.RandomState(4).randn(3, 4).astype('float32')
    opt = {'sample_method': 'greedy', 'beam_size': 3, 'group_size': 1,
           'sample_n': 1, 'suppress_UNK': 0}
    seq, stats = decoding.sample(dm, jnp.asarray(fc), None, None,
                                 jax.random.PRNGKey(0), opt,
                                 return_stats=True)
    assert isinstance(stats, dict) and 'ent_sum' in stats and 'lp_sum' in stats
    assert stats['ent_sum'].shape == (3,)
    seq_ref, _, _ = decoding.sample_beam(dm, jnp.asarray(fc), None, None,
                                         jax.random.PRNGKey(0), opt)
    assert (np.asarray(seq) == np.asarray(seq_ref)).all()
