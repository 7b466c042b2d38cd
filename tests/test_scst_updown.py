"""Fused on-device SCST for the updown family (VERDICT round-1 item 8).

The fully-fused SCST step (trainer.sc_fused_step: decode + on-device
CIDEr-D + policy gradient in one jitted program) is model-agnostic; this
pins it for updown — the reference's best RL headline family
(/root/reference/MODEL_ZOO.md self-critical section; loss_wrapper.py:55-75
is the semantics anchor).  The fused reward must EXACTLY match the host
path's reward for the same rngs: sc_decode + the python CiderD scorer.
"""

from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.util_synth import build_synthetic_dataset

pytestmark = pytest.mark.slow  # heavy tier: see pytest.ini


@pytest.fixture(scope='module')
def ds(tmp_path_factory):
    return build_synthetic_dataset(str(tmp_path_factory.mktemp('updown_sc')),
                                   vocab_size=25, seq_length=6)


def _updown_opt():
    return SimpleNamespace(
        caption_model='updown', vocab_size=25, input_encoding_size=12,
        rnn_size=16, num_layers=1, drop_prob_lm=0.5, fc_feat_size=8,
        att_feat_size=10, att_hid_size=8, seq_per_img=2, max_length=6,
        compute_dtype='float32',
        optim='adam', optim_alpha=0.9, optim_beta=0.999, optim_epsilon=1e-8,
        weight_decay=0, grad_clip_mode='value', grad_clip_value=0.1,
        label_smoothing=0, noamopt=False, drop_worst_rate=0,
        train_sample_n=3, train_sample_method='sample', train_beam_size=1,
        sc_sample_method='greedy', sc_beam_size=1, cider_reward_weight=1)


def test_updown_fused_scst_reward_matches_host_path(ds):
    """Same rngs -> same decoded sequences -> the fused on-device reward
    equals the host path's python-scorer reward exactly."""
    from captioning_tpu.models import setup
    from captioning_tpu.modules.trainer import Trainer
    from captioning_tpu.ops.cider_device import DeviceCiderD, pad_gts
    from captioning_tpu.utils import rewards
    from captioning_tpu.utils.cider_scorer import CiderD

    opt = _updown_opt()
    vocab = {str(i): 'w%d' % i for i in range(1, 26)}
    cap = setup(opt, vocab)
    variables = cap.init_params(jax.random.PRNGKey(0), att_len=4)
    trainer = Trainer(cap, opt)
    opt_state = trainer.init_opt_state(variables)
    dev = DeviceCiderD(ds.cached_tokens)

    rng = np.random.RandomState(7)
    B = 4
    fc = jnp.asarray(rng.randn(B, 8).astype('float32'))
    att = jnp.asarray(rng.randn(B, 4, 10).astype('float32'))
    am = jnp.ones((B, 4))
    gts = [rng.randint(1, 26, (3, 6)) for _ in range(B)]
    for g in gts:
        g[:, -1] = 0
    refs, mask = pad_gts(gts)

    rng_g, rng_s = jax.random.split(jax.random.PRNGKey(42))

    # host path: decode with the same rngs, score with the python scorer
    greedy_seq, gen_seq = trainer.sc_decode(variables, fc, att, am,
                                            rng_g, rng_s)
    rewards.CiderD_scorer = CiderD(df=ds.cached_tokens)

    class ROpt:
        cider_reward_weight = 1
        bleu_reward_weight = 0
    host_reward = rewards.get_self_critical_reward(
        np.asarray(greedy_seq), gts, np.asarray(gen_seq), ROpt())
    rewards.CiderD_scorer = None

    # fused path: one jitted program, same rngs
    _, _, out = trainer.sc_fused_step(
        variables, opt_state, fc, att, am, jnp.asarray(refs),
        jnp.asarray(mask), 1e-4, rng_g, rng_s, dev)

    assert np.allclose(float(out['reward']), host_reward[:, 0].mean(),
                       atol=1e-4), (float(out['reward']),
                                    host_reward[:, 0].mean())


def test_updown_fused_scst_step_learns(ds):
    """A few fused updown SCST steps run and stay finite."""
    from captioning_tpu.models import setup
    from captioning_tpu.modules.trainer import Trainer
    from captioning_tpu.ops.cider_device import DeviceCiderD, pad_gts

    opt = _updown_opt()
    vocab = {str(i): 'w%d' % i for i in range(1, 26)}
    cap = setup(opt, vocab)
    variables = cap.init_params(jax.random.PRNGKey(1), att_len=4)
    trainer = Trainer(cap, opt)
    opt_state = trainer.init_opt_state(variables)
    dev = DeviceCiderD(ds.cached_tokens)

    rng = np.random.RandomState(8)
    B = 4
    fc = jnp.asarray(rng.randn(B, 8).astype('float32'))
    att = jnp.asarray(rng.randn(B, 4, 10).astype('float32'))
    am = jnp.ones((B, 4))
    gts = [rng.randint(1, 26, (3, 6)) for _ in range(B)]
    for g in gts:
        g[:, -1] = 0
    refs, mask = pad_gts(gts)

    for i in range(3):
        r1, r2 = jax.random.split(jax.random.PRNGKey(i))
        variables, opt_state, out = trainer.sc_fused_step(
            variables, opt_state, fc, att, am, jnp.asarray(refs),
            jnp.asarray(mask), 1e-4, r1, r2, dev)
    assert np.isfinite(float(out['loss']))
    assert np.isfinite(float(out['reward']))
