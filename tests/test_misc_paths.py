"""Coverage for remaining paths: ensemble, trigram blocking, checkpoint
round trip, gumbel/nucleus sampling, decode_sequence."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from captioning_tpu.engine import decoding
from tests.test_decoding import make_mock_model, np_logprobs


def _mini_captioner(seed=0):
    from types import SimpleNamespace
    from captioning_tpu.models import setup
    opt = SimpleNamespace(caption_model='att2in2', vocab_size=15,
                          input_encoding_size=12, rnn_size=16, num_layers=1,
                          drop_prob_lm=0.5, fc_feat_size=8, att_feat_size=10,
                          att_hid_size=8, seq_per_img=2, max_length=6,
                          compute_dtype='float32')
    vocab = {str(i): 'w%d' % i for i in range(1, 16)}
    cap = setup(opt, vocab)
    variables = cap.init_params(jax.random.PRNGKey(seed), att_len=4)
    return cap, variables


@pytest.mark.slow  # heavy compile: see pytest.ini
def test_ensemble_of_identical_models_matches_single():
    from captioning_tpu.models.ensemble import EnsembleCaptioner
    cap, variables = _mini_captioner()
    ens = EnsembleCaptioner([cap, cap], weights=[1.0, 1.0])
    B = 3
    fc = jnp.ones((B, 8))
    att = jnp.asarray(np.random.RandomState(0).randn(B, 4, 10), jnp.float32)
    am = jnp.ones((B, 4))
    s1, _ = cap.sample_jit(variables, fc, att, am, jax.random.PRNGKey(1),
                           {'sample_method': 'greedy'})
    s2, _ = ens.sample_jit([variables, variables], fc, att, am,
                           jax.random.PRNGKey(1), {'sample_method': 'greedy'})
    assert (np.asarray(s1) == np.asarray(s2)).all()


@pytest.mark.slow  # heavy compile: see pytest.ini
def test_ensemble_averages_probabilities():
    from captioning_tpu.models.ensemble import EnsembleCaptioner
    cap, v1 = _mini_captioner(0)
    _, v2 = _mini_captioner(1)
    ens = EnsembleCaptioner([cap, cap], weights=[1.0, 3.0])
    B = 2
    fc = jnp.ones((B, 8))
    att = jnp.ones((B, 4, 10))
    am = jnp.ones((B, 4))
    dm = ens.bind([v1, v2], train=False)
    feats = dm.prepare(fc, att, am, None)
    state = dm.init_state(B)
    lp, _ = dm.step(jnp.zeros((B,), jnp.int32), feats, state, None)
    # manual mixture
    d1 = cap.bind(v1, False)
    d2 = cap.bind(v2, False)
    l1, _ = d1.step(jnp.zeros((B,), jnp.int32), d1.prepare(fc, att, am, None),
                    d1.init_state(B), None)
    l2, _ = d2.step(jnp.zeros((B,), jnp.int32), d2.prepare(fc, att, am, None),
                    d2.init_state(B), None)
    mix = np.log(0.25 * np.exp(np.asarray(l1)) + 0.75 * np.exp(np.asarray(l2)))
    assert np.allclose(np.asarray(lp), mix, atol=1e-5)


def test_trigram_blocking_penalizes_repeats():
    dm, table, W = make_mock_model(seed=3)
    fc = np.zeros((2, 4), np.float32)
    # unconstrained greedy tends to loop on the mock; blocking must reduce
    # the count of repeated trigrams
    s_plain, _ = decoding.sample(dm, jnp.asarray(fc), None, None,
                                 jax.random.PRNGKey(0),
                                 {'sample_method': 'greedy'})
    s_block, _ = decoding.sample(dm, jnp.asarray(fc), None, None,
                                 jax.random.PRNGKey(0),
                                 {'sample_method': 'greedy',
                                  'block_trigrams': 1})

    def n_repeated_trigrams(row):
        tris = [tuple(row[i:i + 3]) for i in range(len(row) - 2)]
        return len(tris) - len(set(tris))

    plain = sum(n_repeated_trigrams(list(r)) for r in np.asarray(s_plain))
    blocked = sum(n_repeated_trigrams(list(r)) for r in np.asarray(s_block))
    assert blocked <= plain


def test_checkpoint_roundtrip(tmp_path):
    from captioning_tpu.utils.misc import save_pytree, load_pytree
    tree = {'params': {'a': np.arange(6).reshape(2, 3).astype('float32'),
                       'nested': {'b': np.ones(4)}},
            'extra': [np.zeros(2), np.ones(3)],
            'none_leaf': None}
    p = str(tmp_path / 'ck.npz')
    save_pytree(tree, p)
    back = load_pytree(p)
    assert back['none_leaf'] is None
    assert np.allclose(back['params']['a'], tree['params']['a'])
    assert np.allclose(back['extra'][1], tree['extra'][1])
    assert isinstance(back['extra'], list)


@pytest.mark.slow  # heavy compile: see pytest.ini
def test_gumbel_and_nucleus_sampling_valid():
    dm, table, W = make_mock_model(seed=4)
    fc = np.random.RandomState(0).randn(4, 4).astype('float32')
    for method in ('gumbel', 'top0.7', 'sample'):
        seq, lp = decoding.sample(dm, jnp.asarray(fc), None, None,
                                  jax.random.PRNGKey(2),
                                  {'sample_method': method,
                                   'temperature': 0.9})
        s = np.asarray(seq)
        assert s.shape == (4, dm.seq_length)
        assert (s >= 0).all() and (s < dm.vocab_plus).all()
    # nucleus restricts to the top-p mass of each conditional
    seq, _ = decoding.sample(dm, jnp.asarray(fc), None, None,
                             jax.random.PRNGKey(3),
                             {'sample_method': 'top0.5', 'temperature': 1.0})
    s = np.asarray(seq)
    it = np.zeros(4, np.int64)
    unfinished = np.ones(4, bool)
    for t in range(dm.seq_length):
        logprobs = np_logprobs(table, W, fc, it)
        probs = np.exp(logprobs)
        order = np.argsort(-probs, axis=1)
        for b in range(4):
            if not unfinished[b]:
                continue
            csum = np.cumsum(probs[b][order[b]])
            keep = set(order[b][:max(1, int((csum < 0.5).sum()) + 1)])
            assert s[b, t] in keep
        it = s[:, t].copy()
        unfinished = unfinished & (it != 0)
        if not unfinished.any():
            break


def test_decode_sequence_bpe_and_stop():
    from captioning_tpu.utils.misc import decode_sequence
    vocab = {'1': 'a@@', '2': 'cat', '3': 'dog'}
    seqs = np.array([[1, 2, 0, 3], [3, 0, 0, 0]])
    out = decode_sequence(vocab, seqs)
    assert out[0] == 'acat'  # BPE joiner stripped, stops at 0
    assert out[1] == 'dog'


@pytest.mark.slow  # heavy compile: see pytest.ini
def test_batchnorm_stats_update_in_xe_step():
    """use_bn running statistics must accumulate during training
    (reference att_embed BatchNorm1d, AttModel.py:80-85)."""
    from types import SimpleNamespace
    from captioning_tpu.models import setup
    from captioning_tpu.modules.trainer import Trainer
    opt = SimpleNamespace(
        caption_model='att2in2', vocab_size=15, input_encoding_size=12,
        rnn_size=16, num_layers=1, drop_prob_lm=0.5, fc_feat_size=8,
        att_feat_size=10, att_hid_size=8, seq_per_img=2, max_length=6,
        compute_dtype='float32', use_bn=2,
        optim='adam', optim_alpha=0.9, optim_beta=0.999, optim_epsilon=1e-8,
        weight_decay=0, grad_clip_mode='value', grad_clip_value=0.1,
        label_smoothing=0, noamopt=False, drop_worst_rate=0)
    vocab = {str(i): 'w%d' % i for i in range(1, 16)}
    cap = setup(opt, vocab)
    variables = cap.init_params(jax.random.PRNGKey(0), att_len=4)
    assert 'batch_stats' in variables
    before = jax.tree.leaves(jax.device_get(variables['batch_stats']))
    tr = Trainer(cap, opt)
    os_ = tr.init_opt_state(variables)
    B = 3
    fc = jnp.ones((B, 8))
    att = jnp.asarray(np.random.RandomState(0).randn(B, 4, 10), jnp.float32)
    am = jnp.ones((B, 4))
    labels = jnp.asarray(np.random.RandomState(1).randint(0, 15, (B, 2, 8)))
    masks = jnp.ones((B, 2, 8))
    v2, _, out = tr.xe_step(variables, os_, fc, att, labels, masks, am,
                            1e-3, 0.0, jax.random.PRNGKey(1))
    after = jax.tree.leaves(jax.device_get(v2['batch_stats']))
    assert any(not np.allclose(a, b) for a, b in zip(before, after))


@pytest.mark.slow  # heavy compile: see pytest.ini
def test_mixed_ensemble_ancestry_beam_equals_physical():
    """Ensemble beam with per-member ancestry (transformer member) matches
    the all-physical-reorder path exactly, including diverse groups."""
    import dataclasses
    from tests.test_reference_parity import mkopt, VOCAB
    from captioning_tpu.models import setup as jx_setup
    from captioning_tpu.models.ensemble import EnsembleCaptioner
    from captioning_tpu.engine import decoding

    c1 = jx_setup(mkopt('updown', num_layers=2), VOCAB)
    c2 = jx_setup(mkopt('transformer'), VOCAB)
    v1 = c1.init_params(jax.random.PRNGKey(0), att_len=5)
    v2 = c2.init_params(jax.random.PRNGKey(1), att_len=5)
    ens = EnsembleCaptioner([c1, c2], [1.0, 1.0])
    rng = np.random.RandomState(0)
    fc = jnp.asarray(rng.randn(2, 10).astype('f4'))
    att = jnp.asarray(rng.randn(2, 5, 12).astype('f4'))
    bo = {'beam_size': 4, 'group_size': 2, 'diversity_lambda': 0.5,
          'sample_n': 1}

    dm = ens.bind([v1, v2])
    s1, _, d1 = decoding.sample_beam(dm, fc, att, None,
                                     jax.random.PRNGKey(0), bo)
    dm0 = dataclasses.replace(dm, beam_init=None, beam_reorder=None)
    s2, _, d2 = decoding.sample_beam(dm0, fc, att, None,
                                     jax.random.PRNGKey(0), bo)
    assert (np.asarray(s1) == np.asarray(s2)).all()
    assert (np.asarray(d1['seq']) == np.asarray(d2['seq'])).all()
    assert np.allclose(np.asarray(d1['p']), np.asarray(d2['p']), atol=1e-5)


@pytest.mark.slow  # heavy compile: see pytest.ini
def test_profiling_helpers(tmp_path):
    """trace/annotate/StepTimer run end-to-end and emit a trace dir."""
    from captioning_tpu.utils import profiling
    timer = profiling.StepTimer(window=4)
    with profiling.trace(str(tmp_path / 'tb')):
        for _ in range(3):
            timer.start()
            with profiling.annotate('tiny-step'):
                jnp.dot(jnp.ones((8, 8)), jnp.ones((8, 8))).block_until_ready()
            timer.stop()
    s = timer.summary()
    assert 'steps=3' in s and 'p99' in s
    # the profiler wrote something under the logdir
    import os
    found = any(files for _, _, files in os.walk(tmp_path / 'tb'))
    assert found


def test_set_rng_impl_switches_and_restores():
    """--rng_impl plumbing: set_rng_impl('rbg') makes new PRNGKeys use the
    fast TPU generator (key shape uint32[4]); dropout/sampling still work.
    Restores the default impl so other tests are unaffected."""
    import jax
    from captioning_tpu.utils.misc import set_rng_impl
    default = jax.config.jax_default_prng_impl
    try:
        set_rng_impl('rbg')
        k = jax.random.PRNGKey(0)
        assert jax.random.key_impl(jax.random.wrap_key_data(
            k, impl='rbg')).__repr__  # key constructs under rbg
        assert k.shape == (4,)
        x = jax.random.uniform(k, (8,))
        assert x.shape == (8,)
        set_rng_impl('')  # no-op leaves impl unchanged
        assert jax.config.jax_default_prng_impl == 'rbg'
    finally:
        jax.config.update('jax_default_prng_impl', default)
    assert jax.random.PRNGKey(0).shape == (2,)


def test_honor_jax_platforms_env():
    """An explicit JAX_PLATFORMS env var wins over site-level config
    overrides (hosted-TPU sitecustomize forces jax_platforms to the
    accelerator, which would make JAX_PLATFORMS=cpu CLI subprocesses
    target — or hang on — the device the user opted out of)."""
    import os

    import jax

    from captioning_tpu.utils.misc import honor_jax_platforms_env
    before = jax.config.jax_platforms
    prev_env = os.environ.get('JAX_PLATFORMS')
    try:
        os.environ['JAX_PLATFORMS'] = 'cpu'
        jax.config.update('jax_platforms', 'cpu,cpu')  # site-style override
        honor_jax_platforms_env()
        assert jax.config.jax_platforms == 'cpu'
        # unset env -> no-op
        del os.environ['JAX_PLATFORMS']
        jax.config.update('jax_platforms', 'cpu,cpu')
        honor_jax_platforms_env()
        assert jax.config.jax_platforms == 'cpu,cpu'
    finally:
        if prev_env is None:
            os.environ.pop('JAX_PLATFORMS', None)
        else:
            os.environ['JAX_PLATFORMS'] = prev_env
        jax.config.update('jax_platforms', before)


@pytest.mark.slow  # heavy compile: see pytest.ini
def test_batchnorm_stats_update_in_rl_steps():
    """use_bn running statistics must also accumulate during SCST training
    (the reference's model.train() sampling forward updates them,
    loss_wrapper.py:64-68) — the jitted RL steps thread the decode's
    discarded batch_stats mutation back into variables."""
    from types import SimpleNamespace
    from captioning_tpu.models import setup
    from captioning_tpu.modules.trainer import Trainer
    opt = SimpleNamespace(
        caption_model='att2in2', vocab_size=15, input_encoding_size=12,
        rnn_size=16, num_layers=1, drop_prob_lm=0.5, fc_feat_size=8,
        att_feat_size=10, att_hid_size=8, seq_per_img=2, max_length=6,
        compute_dtype='float32', use_bn=2,
        optim='adam', optim_alpha=0.9, optim_beta=0.999, optim_epsilon=1e-8,
        weight_decay=0, grad_clip_mode='value', grad_clip_value=0.1,
        label_smoothing=0, noamopt=False, drop_worst_rate=0,
        sc_sample_method='greedy', sc_beam_size=1,
        train_sample_method='sample', train_beam_size=1, train_sample_n=2)
    vocab = {str(i): 'w%d' % i for i in range(1, 16)}
    cap = setup(opt, vocab)
    variables = cap.init_params(jax.random.PRNGKey(0), att_len=4)
    before = jax.tree.leaves(jax.device_get(variables['batch_stats']))
    tr = Trainer(cap, opt)
    os_ = tr.init_opt_state(variables)
    B = 3
    fc = jnp.ones((B, 8))
    att = jnp.asarray(np.random.RandomState(0).randn(B, 4, 10), jnp.float32)
    am = jnp.ones((B, 4))
    _, gen_seq = tr.sc_decode(variables, fc, att, am,
                              jax.random.PRNGKey(1), jax.random.PRNGKey(2))
    reward = jnp.ones((B * 2, gen_seq.shape[1]), jnp.float32)
    v2, _, _ = tr.sc_grad_step(variables, os_, fc, att, am, gen_seq,
                               reward, 1e-3, jax.random.PRNGKey(2))
    after = jax.tree.leaves(jax.device_get(v2['batch_stats']))
    assert any(not np.allclose(a, b) for a, b in zip(before, after))


@pytest.mark.slow  # compiles real model programs
def test_logit_hidden_dropout_fires_in_train_mode():
    """--logit_layers > 1 inserts Dropout(0.5) between logit hidden layers
    (reference AttModel.py:86-92); it must fire in train mode and be a
    no-op at eval."""
    from types import SimpleNamespace
    from captioning_tpu.models import setup
    opt = SimpleNamespace(
        caption_model='att2in2', vocab_size=15, input_encoding_size=12,
        rnn_size=16, num_layers=1, drop_prob_lm=0.0, fc_feat_size=8,
        att_feat_size=10, att_hid_size=8, seq_per_img=2, max_length=6,
        compute_dtype='float32', logit_layers=2)
    vocab = {str(i): 'w%d' % i for i in range(1, 16)}
    cap = setup(opt, vocab)
    variables = cap.init_params(jax.random.PRNGKey(0), att_len=4)
    B = 2
    fc = jnp.ones((B, 8))
    att = jnp.ones((B, 4, 10))
    am = jnp.ones((B, 4))
    it = jnp.zeros((B,), jnp.int32)

    def step_lp(train, rng):
        dm = cap.bind(variables, train=train)
        feats = dm.prepare(fc, att, am, rng)
        lp, _ = dm.step(it, feats, dm.init_state(B), rng)
        return np.asarray(lp)

    e1 = step_lp(False, None)
    e2 = step_lp(False, None)
    np.testing.assert_array_equal(e1, e2)  # eval: deterministic
    t1 = step_lp(True, jax.random.PRNGKey(1))
    t2 = step_lp(True, jax.random.PRNGKey(2))
    assert not np.allclose(t1, t2)  # train: dropout mask varies with rng
