"""On-device CIDEr-D must match the python scorer exactly."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.util_synth import build_synthetic_dataset

pytestmark = pytest.mark.slow  # heavy tier: see pytest.ini


@pytest.fixture(scope='module')
def ds(tmp_path_factory):
    return build_synthetic_dataset(str(tmp_path_factory.mktemp('dcid')),
                                   vocab_size=25, seq_length=6)


def test_device_cider_matches_python(ds):
    from captioning_tpu.ops.cider_device import DeviceCiderD, pad_gts
    from captioning_tpu.utils.cider_scorer import CiderD
    from captioning_tpu.utils.rewards import array_to_str

    py = CiderD(df=ds.cached_tokens)
    dev = DeviceCiderD(ds.cached_tokens)

    rng = np.random.RandomState(0)
    B, n, L = 5, 3, 7
    gen = rng.randint(0, 26, (B * n, L)).astype(np.int32)
    gts = [rng.randint(1, 26, (rng.randint(2, 5), 6)) for _ in range(B)]
    for g in gts:
        g[:, -1] = 0

    res = [{'image_id': i, 'caption': [array_to_str(gen[i])]}
           for i in range(B * n)]
    gts_map = {i: [array_to_str(g[j]) for j in range(len(g))]
               for i, g in enumerate(gts)}
    gts_for = {i: gts_map[i // n] for i in range(B * n)}
    _, py_scores = py.compute_score(gts_for, res)

    refs, mask = pad_gts(gts)
    refs_exp = jnp.repeat(jnp.asarray(refs), n, axis=0)
    mask_exp = jnp.repeat(jnp.asarray(mask), n, axis=0)
    dev_scores = np.asarray(dev.score(jnp.asarray(gen), refs_exp, mask_exp))

    assert np.allclose(py_scores, dev_scores, atol=1e-4), \
        np.abs(py_scores - dev_scores).max()


def test_device_self_critical_reward_matches(ds):
    from captioning_tpu.ops.cider_device import DeviceCiderD, pad_gts
    from captioning_tpu.utils import rewards
    from captioning_tpu.utils.cider_scorer import CiderD

    rewards.CiderD_scorer = CiderD(df=ds.cached_tokens)

    class Opt:
        cider_reward_weight = 1
        bleu_reward_weight = 0

    rng = np.random.RandomState(1)
    B, n, L = 4, 2, 7
    greedy = rng.randint(0, 26, (B, L)).astype(np.int32)
    gen = rng.randint(0, 26, (B * n, L)).astype(np.int32)
    gts = [rng.randint(1, 26, (3, 6)) for _ in range(B)]
    for g in gts:
        g[:, -1] = 0

    ref_reward = rewards.get_self_critical_reward(greedy, gts, gen, Opt())

    dev = DeviceCiderD(ds.cached_tokens)
    refs, mask = pad_gts(gts)
    dev_reward = np.asarray(dev.self_critical_reward(
        jnp.asarray(greedy), jnp.asarray(gen), jnp.asarray(refs),
        jnp.asarray(mask)))
    assert np.allclose(ref_reward, dev_reward, atol=1e-4), \
        np.abs(ref_reward - dev_reward).max()
    rewards.CiderD_scorer = None


def test_device_cider_jits(ds):
    import jax
    from captioning_tpu.ops.cider_device import DeviceCiderD, pad_gts
    dev = DeviceCiderD(ds.cached_tokens)
    rng = np.random.RandomState(2)
    gen = jnp.asarray(rng.randint(0, 26, (6, 7)).astype(np.int32))
    gts = [rng.randint(1, 26, (3, 6)) for _ in range(3)]
    for g in gts:
        g[:, -1] = 0
    refs, mask = pad_gts(gts)
    f = jax.jit(lambda c, r, m: dev.score(c, jnp.repeat(r, 2, 0),
                                          jnp.repeat(m, 2, 0)))
    out = f(gen, jnp.asarray(refs), jnp.asarray(mask))
    assert np.isfinite(np.asarray(out)).all()


def test_sc_fused_step_runs_and_learns(ds):
    """Fully-fused SCST step: one jitted program, reward improves loss
    signal sanity."""
    import jax
    from types import SimpleNamespace
    from captioning_tpu.models import setup
    from captioning_tpu.modules.trainer import Trainer
    from captioning_tpu.ops.cider_device import DeviceCiderD, pad_gts

    opt = SimpleNamespace(
        caption_model='newfc', vocab_size=25, input_encoding_size=12,
        rnn_size=16, num_layers=1, drop_prob_lm=0.5, fc_feat_size=8,
        att_feat_size=10, att_hid_size=8, seq_per_img=2, max_length=6,
        compute_dtype='float32',
        optim='adam', optim_alpha=0.9, optim_beta=0.999, optim_epsilon=1e-8,
        weight_decay=0, grad_clip_mode='value', grad_clip_value=0.1,
        label_smoothing=0, noamopt=False, drop_worst_rate=0,
        train_sample_n=3, train_sample_method='sample', train_beam_size=1,
        sc_sample_method='greedy', sc_beam_size=1, cider_reward_weight=1)
    vocab = {str(i): 'w%d' % i for i in range(1, 26)}
    cap = setup(opt, vocab)
    variables = cap.init_params(jax.random.PRNGKey(0), att_len=4)
    trainer = Trainer(cap, opt)
    opt_state = trainer.init_opt_state(variables)
    dev = DeviceCiderD(ds.cached_tokens)

    rng = np.random.RandomState(3)
    B = 4
    fc = jnp.asarray(rng.randn(B, 8).astype('float32'))
    att = jnp.asarray(rng.randn(B, 4, 10).astype('float32'))
    am = jnp.ones((B, 4))
    gts = [rng.randint(1, 26, (3, 6)) for _ in range(B)]
    for g in gts:
        g[:, -1] = 0
    refs, mask = pad_gts(gts)

    import jax as _j
    for i in range(3):
        r1, r2 = _j.random.split(_j.random.PRNGKey(i))
        variables, opt_state, out = trainer.sc_fused_step(
            variables, opt_state, fc, att, am, jnp.asarray(refs),
            jnp.asarray(mask), 1e-4, r1, r2, dev)
    assert np.isfinite(float(out['loss']))
    assert np.isfinite(float(out['reward']))


def test_struc_fused_step_runs(ds):
    """Fused NSC structure-loss step executes and is finite."""
    import jax
    from types import SimpleNamespace
    from captioning_tpu.models import setup
    from captioning_tpu.modules.trainer import Trainer
    from captioning_tpu.ops.cider_device import DeviceCiderD, pad_gts

    opt = SimpleNamespace(
        caption_model='att2in2', vocab_size=25, input_encoding_size=12,
        rnn_size=16, num_layers=1, drop_prob_lm=0.5, fc_feat_size=8,
        att_feat_size=10, att_hid_size=8, seq_per_img=2, max_length=6,
        compute_dtype='float32',
        optim='adam', optim_alpha=0.9, optim_beta=0.999, optim_epsilon=1e-8,
        weight_decay=0, grad_clip_mode='value', grad_clip_value=0.1,
        label_smoothing=0, noamopt=False, drop_worst_rate=0,
        train_sample_n=3, train_sample_method='sample', train_beam_size=1,
        structure_loss_type='new_self_critical', structure_loss_weight=1.0,
        struc_use_logsoftmax=False, cider_reward_weight=1,
        entropy_reward_weight=0, use_ppo=0)
    vocab = {str(i): 'w%d' % i for i in range(1, 26)}
    cap = setup(opt, vocab)
    variables = cap.init_params(jax.random.PRNGKey(0), att_len=4)
    trainer = Trainer(cap, opt)
    opt_state = trainer.init_opt_state(variables)
    dev = DeviceCiderD(ds.cached_tokens)

    rng = np.random.RandomState(4)
    B = 4
    fc = jnp.asarray(rng.randn(B, 8).astype('float32'))
    att = jnp.asarray(rng.randn(B, 4, 10).astype('float32'))
    am = jnp.ones((B, 4))
    labels = jnp.asarray(rng.randint(0, 25, (B, 2, 8)))
    masks = jnp.ones((B, 2, 8))
    gts = [rng.randint(1, 26, (3, 6)) for _ in range(B)]
    for g in gts:
        g[:, -1] = 0
    refs, mask = pad_gts(gts)

    import jax as _j
    for i in range(2):
        r1, r2 = _j.random.split(_j.random.PRNGKey(i))
        variables, opt_state, out = trainer.struc_fused_step(
            variables, opt_state, fc, att, labels, masks, am,
            jnp.asarray(refs), jnp.asarray(mask), 1e-4, r1, r2, dev)
    assert np.isfinite(float(out['loss']))
    assert np.isfinite(float(np.asarray(out['reward']).mean()))


def test_device_bleu4_matches_python(ds):
    """Device BLEU-4 (per-image, closest-BP, tiny/small smoothing) must
    match the host Bleu scorer (utils/cider_scorer.py:Bleu, the behavioural
    port of the reference's pycocoevalcap BLEU, reference rewards.py:60-67)
    on the same id-string sequences."""
    from captioning_tpu.ops.cider_device import DeviceCiderD, pad_gts
    from captioning_tpu.utils.cider_scorer import Bleu
    from captioning_tpu.utils.rewards import array_to_str

    dev = DeviceCiderD(ds.cached_tokens)
    rng = np.random.RandomState(3)
    B, n, L = 6, 3, 9
    gen = rng.randint(0, 26, (B * n, L)).astype(np.int32)
    # include degenerate candidates: immediate eos, repeated tokens
    gen[0, 0] = 0
    gen[1] = 7
    gts = [rng.randint(1, 26, (rng.randint(2, 6), rng.randint(4, 8)))
           for _ in range(B)]
    for g in gts:
        g[:, -1] = 0

    res = {i: [array_to_str(gen[i])] for i in range(B * n)}
    gts_map = {i: [array_to_str(g[j]) for j in range(len(g))]
               for i, g in enumerate(gts)}
    gts_for = {i: gts_map[i // n] for i in range(B * n)}
    _, per_n = Bleu(4).compute_score(gts_for, res)
    py_scores = np.asarray(per_n[3])

    refs, mask = pad_gts(gts)
    dev_scores = np.asarray(dev.score_grouped(
        jnp.asarray(gen), jnp.asarray(refs), jnp.asarray(mask), n,
        cider_weight=0.0, bleu_weight=1.0))
    assert np.allclose(py_scores, dev_scores, atol=1e-4), \
        np.abs(py_scores - dev_scores).max()


def test_device_mixed_self_critical_reward_matches(ds):
    """Mixed cider+bleu SCST reward on device == host get_self_critical_reward
    (reference rewards.py:60-74 weighting)."""
    from captioning_tpu.ops.cider_device import DeviceCiderD, pad_gts
    from captioning_tpu.utils import rewards
    from captioning_tpu.utils.cider_scorer import Bleu, CiderD

    rewards.CiderD_scorer = CiderD(df=ds.cached_tokens)
    rewards.Bleu_scorer = Bleu(4)

    class Opt:
        cider_reward_weight = 1.0
        bleu_reward_weight = 2.5

    rng = np.random.RandomState(4)
    B, n, L = 4, 2, 8
    greedy = rng.randint(0, 26, (B, L)).astype(np.int32)
    gen = rng.randint(0, 26, (B * n, L)).astype(np.int32)
    gts = [rng.randint(1, 26, (3, 6)) for _ in range(B)]
    for g in gts:
        g[:, -1] = 0

    ref_reward = rewards.get_self_critical_reward(greedy, gts, gen, Opt())

    dev = DeviceCiderD(ds.cached_tokens)
    refs, mask = pad_gts(gts)
    dev_reward = np.asarray(dev.self_critical_reward(
        jnp.asarray(greedy), jnp.asarray(gen), jnp.asarray(refs),
        jnp.asarray(mask), cider_weight=1.0, bleu_weight=2.5))
    assert np.allclose(ref_reward, dev_reward, atol=1e-4), \
        np.abs(ref_reward - dev_reward).max()
    rewards.CiderD_scorer = None
    rewards.Bleu_scorer = None


def test_device_grouped_scores_match_host_get_scores_mixed(ds):
    """score_grouped with mixed weights == host get_scores (struc-loss
    reward path, reference rewards.py:83-114)."""
    from captioning_tpu.ops.cider_device import DeviceCiderD, pad_gts
    from captioning_tpu.utils import rewards
    from captioning_tpu.utils.cider_scorer import Bleu, CiderD

    rewards.CiderD_scorer = CiderD(df=ds.cached_tokens)
    rewards.Bleu_scorer = Bleu(4)

    class Opt:
        cider_reward_weight = 0.7
        bleu_reward_weight = 3.0

    rng = np.random.RandomState(5)
    B, n, L = 5, 2, 7
    gen = rng.randint(0, 26, (B * n, L)).astype(np.int32)
    gts = [rng.randint(1, 26, (3, 6)) for _ in range(B)]
    for g in gts:
        g[:, -1] = 0

    host = rewards.get_scores(gts, gen, Opt())
    dev = DeviceCiderD(ds.cached_tokens)
    refs, mask = pad_gts(gts)
    dev_scores = np.asarray(dev.score_grouped(
        jnp.asarray(gen), jnp.asarray(refs), jnp.asarray(mask), n,
        cider_weight=0.7, bleu_weight=3.0))
    assert np.allclose(host, dev_scores, atol=1e-4), \
        np.abs(host - dev_scores).max()
    rewards.CiderD_scorer = None
    rewards.Bleu_scorer = None


def test_device_self_cider_matches(ds):
    """self_cider_grouped == utils/rewards.get_self_cider_scores (the host
    plain-Cider gram + eig diversity), up to f32-vs-f64 eig rounding."""
    from captioning_tpu.ops.cider_device import DeviceCiderD
    from captioning_tpu.utils import rewards
    from captioning_tpu.utils.cider_scorer import Cider

    rewards.Cider_scorer = Cider(df=ds.cached_tokens)

    class Opt:
        pass

    rng = np.random.RandomState(3)
    B, n, L = 6, 5, 7
    gen = rng.randint(0, 26, (B * n, L)).astype(np.int32)
    # ensure some variety: a duplicated pair (rank-deficient gram) and a
    # row that terminates immediately
    gen[1] = gen[0]
    gen[2 * n][0] = 0
    gts = [rng.randint(1, 26, (3, 6)) for _ in range(B)]

    host = rewards.get_self_cider_scores(gts, gen, Opt())

    dev = DeviceCiderD(ds.cached_tokens)
    got = np.asarray(dev.self_cider_grouped(jnp.asarray(gen), n))

    assert host.shape == got.shape == (B,)
    assert np.allclose(host, got, atol=2e-4), np.abs(host - got).max()


def test_struc_fused_step_self_cider_runs(ds):
    """Fused structure step with the on-device self-CIDEr diversity reward
    (self_cider_reward_weight > 0 no longer forces the host path)."""
    import jax
    from types import SimpleNamespace
    from captioning_tpu.models import setup
    from captioning_tpu.modules.trainer import Trainer
    from captioning_tpu.ops.cider_device import DeviceCiderD, pad_gts

    opt = SimpleNamespace(
        caption_model='att2in2', vocab_size=25, input_encoding_size=12,
        rnn_size=16, num_layers=1, drop_prob_lm=0.5, fc_feat_size=8,
        att_feat_size=10, att_hid_size=8, seq_per_img=2, max_length=6,
        compute_dtype='float32',
        optim='adam', optim_alpha=0.9, optim_beta=0.999, optim_epsilon=1e-8,
        weight_decay=0, grad_clip_mode='value', grad_clip_value=0.1,
        label_smoothing=0, noamopt=False, drop_worst_rate=0,
        train_sample_n=3, train_sample_method='sample', train_beam_size=1,
        structure_loss_type='new_self_critical', structure_loss_weight=1.0,
        struc_use_logsoftmax=False, cider_reward_weight=1,
        entropy_reward_weight=0, use_ppo=0, self_cider_reward_weight=0.5)
    vocab = {str(i): 'w%d' % i for i in range(1, 26)}
    cap = setup(opt, vocab)
    variables = cap.init_params(jax.random.PRNGKey(0), att_len=4)
    trainer = Trainer(cap, opt)
    opt_state = trainer.init_opt_state(variables)
    dev = DeviceCiderD(ds.cached_tokens)

    rng = np.random.RandomState(4)
    B = 4
    fc = jnp.asarray(rng.randn(B, 8).astype('float32'))
    att = jnp.asarray(rng.randn(B, 4, 10).astype('float32'))
    am = jnp.ones((B, 4))
    labels = jnp.asarray(rng.randint(0, 25, (B, 2, 8)))
    masks = jnp.ones((B, 2, 8))
    gts = [rng.randint(1, 26, (3, 6)) for _ in range(B)]
    for g in gts:
        g[:, -1] = 0
    refs, mask = pad_gts(gts)

    import jax as _j
    for i in range(2):
        r1, r2 = _j.random.split(_j.random.PRNGKey(i))
        variables, opt_state, out = trainer.struc_fused_step(
            variables, opt_state, fc, att, labels, masks, am,
            jnp.asarray(refs), jnp.asarray(mask), 1e-4, r1, r2, dev)
    assert np.isfinite(float(out['loss']))
    assert np.isfinite(float(np.asarray(out['reward']).mean()))
