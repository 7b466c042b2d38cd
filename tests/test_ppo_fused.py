"""Fused on-device PPO iteration (trainer.struc_fused_step with use_ppo).

The fused program runs sampling + the frozen old policy's logprob scan +
on-device CIDEr-D + clip-PPO/KL + the gradient in ONE jitted step.  With
the same rngs it must match the host path exactly: struc_decode + python
CiderD scores + struc_grad_step (the reference's PPO semantics anchor is
losses.py:267-357 + loss_wrapper.py:26-53)."""

from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.util_synth import build_synthetic_dataset

pytestmark = pytest.mark.slow  # heavy tier: see pytest.ini


@pytest.fixture(scope='module')
def ds(tmp_path_factory):
    return build_synthetic_dataset(str(tmp_path_factory.mktemp('ppo_fused')),
                                   vocab_size=25, seq_length=6)


def _opt():
    return SimpleNamespace(
        caption_model='updown', vocab_size=25, input_encoding_size=12,
        rnn_size=16, num_layers=1, drop_prob_lm=0.0, fc_feat_size=8,
        att_feat_size=10, att_hid_size=8, seq_per_img=2, max_length=6,
        compute_dtype='float32',
        optim='adam', optim_alpha=0.9, optim_beta=0.999, optim_epsilon=1e-8,
        weight_decay=0, grad_clip_mode='value', grad_clip_value=0.1,
        label_smoothing=0, noamopt=False, drop_worst_rate=0,
        train_sample_n=3, train_sample_method='sample', train_beam_size=1,
        structure_loss_type='new_self_critical', structure_loss_weight=1.0,
        struc_use_logsoftmax=False, use_ppo=1, ppo_cliprange=0.2,
        ppo_kl_coef=0.02, cider_reward_weight=1, bleu_reward_weight=0)


def test_fused_ppo_matches_host_path(ds):
    from captioning_tpu.models import setup
    from captioning_tpu.modules.trainer import Trainer
    from captioning_tpu.ops.cider_device import DeviceCiderD, pad_gts
    from captioning_tpu.utils import rewards
    from captioning_tpu.utils.cider_scorer import CiderD

    opt = _opt()
    vocab = {str(i): 'w%d' % i for i in range(1, 26)}
    cap = setup(opt, vocab)
    old_variables = cap.init_params(jax.random.PRNGKey(9), att_len=4)

    rng = np.random.RandomState(5)
    B = 4
    fc = jnp.asarray(rng.randn(B, 8).astype('float32'))
    att = jnp.asarray(rng.randn(B, 4, 10).astype('float32'))
    am = jnp.ones((B, 4))
    labels = jnp.asarray(rng.randint(1, 25, (B, 2, 8)), jnp.int32)
    masks = jnp.ones((B, 2, 8), jnp.float32)
    gts = [rng.randint(1, 25, (3, 6)) for _ in range(B)]
    for g in gts:
        g[:, -1] = 0
    refs, mask = pad_gts(gts)
    dev = DeviceCiderD(ds.cached_tokens)
    rng_a, rng_lm = jax.random.split(jax.random.PRNGKey(123))

    def fresh():
        t = Trainer(cap, opt, old_variables=old_variables)
        v = cap.init_params(jax.random.PRNGKey(0), att_len=4)
        return t, v, t.init_opt_state(v)

    # host path
    t1, v1, os1 = fresh()
    gen_seq = t1.struc_decode(v1, fc, att, am, rng_a)
    rewards.CiderD_scorer = CiderD(df=ds.cached_tokens)

    class ROpt:
        cider_reward_weight = 1
        bleu_reward_weight = 0
    scores = rewards.get_scores(gts, np.asarray(gen_seq), ROpt())
    rewards.CiderD_scorer = None
    v1, os1, out_host = t1.struc_grad_step(
        v1, os1, fc, att, labels, masks, am, gen_seq,
        jnp.asarray(scores, jnp.float32), jnp.zeros((B,), jnp.float32),
        1e-4, rng_a, rng_lm)

    # fused path, same rngs
    t2, v2, os2 = fresh()
    v2, os2, out_fused = t2.struc_fused_step(
        v2, os2, fc, att, labels, masks, am, jnp.asarray(refs),
        jnp.asarray(mask), 1e-4, rng_a, rng_lm, dev)

    assert np.allclose(float(out_host['loss']), float(out_fused['loss']),
                       atol=2e-4), (float(out_host['loss']),
                                    float(out_fused['loss']))
    assert np.allclose(np.asarray(out_host['reward']),
                       np.asarray(out_fused['reward']), atol=1e-4)
    for k in ('pg_loss', 'kl_loss', 'clipfrac'):
        assert np.allclose(float(out_host[k]), float(out_fused[k]),
                           atol=2e-4), k
    # the applied update is the same
    l1 = jax.tree.leaves(v1['params'])
    l2 = jax.tree.leaves(v2['params'])
    for a, b in zip(l1, l2):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_fused_ppo_steps_run(ds):
    from captioning_tpu.models import setup
    from captioning_tpu.modules.trainer import Trainer
    from captioning_tpu.ops.cider_device import DeviceCiderD, pad_gts

    opt = _opt()
    vocab = {str(i): 'w%d' % i for i in range(1, 26)}
    cap = setup(opt, vocab)
    old_variables = cap.init_params(jax.random.PRNGKey(9), att_len=4)
    trainer = Trainer(cap, opt, old_variables=old_variables)
    variables = cap.init_params(jax.random.PRNGKey(0), att_len=4)
    opt_state = trainer.init_opt_state(variables)
    dev = DeviceCiderD(ds.cached_tokens)

    rng = np.random.RandomState(6)
    B = 4
    fc = jnp.asarray(rng.randn(B, 8).astype('float32'))
    att = jnp.asarray(rng.randn(B, 4, 10).astype('float32'))
    am = jnp.ones((B, 4))
    labels = jnp.asarray(rng.randint(1, 25, (B, 2, 8)), jnp.int32)
    masks = jnp.ones((B, 2, 8), jnp.float32)
    gts = [rng.randint(1, 25, (3, 6)) for _ in range(B)]
    for g in gts:
        g[:, -1] = 0
    refs, mask = pad_gts(gts)

    for i in range(3):
        r1, r2 = jax.random.split(jax.random.PRNGKey(i))
        variables, opt_state, out = trainer.struc_fused_step(
            variables, opt_state, fc, att, labels, masks, am,
            jnp.asarray(refs), jnp.asarray(mask), 1e-4, r1, r2, dev)
    assert np.isfinite(float(out['loss']))
    assert np.isfinite(float(out['kl_loss']))
