"""COMPOSED N-step train-loop parity vs the reference torch implementation.

Per-component parity exists elsewhere (test_reference_parity: model
forwards; test_losses: criteria; test_optimizers: 7 optimizers, 5 steps) —
this test crosses the seams between them, driving the reference's ACTUAL
training composition for N consecutive steps from identical imported
weights on identical batches and asserting the loss trajectories match:

  reference:  tools/train.py:174-196 — get batch -> LossWrapper
              (modules/loss_wrapper.py:26-73) -> loss.backward() ->
              clip_grad_value_ -> optimizer.step()
  ours:       modules/trainer.py xe_step / sc_decode+sc_grad_step

Composition bugs (clip-before-vs-after, mask conventions, reward
broadcasting, lr application order) live exactly in these seams.

Determinism: dropout is 0 on both sides and the SCST sampling pass uses
``train_sample_method='greedy'`` — torch and JAX PRNGs can never be made
to agree, so randomness is eliminated rather than matched; every other
piece of the composition (decode, reward, criterion, clip, adam) is
exercised at full fidelity.  The reference's cider submodule is absent in
this environment, so its ``rewards.CiderD_scorer`` global is patched with
THIS repo's native CiderD (exact-match tested vs the reference formula in
test_cider.py) — both sides then score through the same object, making
any reward divergence attributable to the loop seams under test.
"""

import sys
from types import SimpleNamespace

import numpy as np
import pytest

sys.path.append('/root/reference')

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

from captioning_tpu.models import setup as jx_setup
from captioning_tpu.models.harness import config_from_opt
from captioning_tpu.modules.trainer import Trainer
from captioning_tpu.utils import rewards as jx_rewards
from captioning_tpu.utils.cider_scorer import CiderD
from captioning_tpu.utils.torch_convert import convert_state_dict

pytestmark = pytest.mark.slow

VOCAB = {str(i): 'w%d' % i for i in range(1, 21)}

B, SPI, M, L = 4, 2, 5, 7
LR = 4e-4
CLIP = 0.1


def mkopt(model, **kw):
    opt = SimpleNamespace(
        caption_model=model, vocab_size=20, input_encoding_size=16,
        rnn_size=24, num_layers=1, drop_prob_lm=0.0, fc_feat_size=10,
        att_feat_size=12, att_hid_size=8, seq_length=L, max_length=L,
        rnn_type='lstm', logit_layers=1, use_bn=0, vocab=VOCAB,
        seq_per_img=SPI, compute_dtype='float32',
        N_enc=2, N_dec=2, d_model=16, d_ff=32, num_att_heads=4, dropout=0.0,
        label_smoothing=0,
        # optimizer / clip (tools/train.py:185-196 composition)
        optim='adam', learning_rate=LR, optim_alpha=0.9, optim_beta=0.999,
        optim_epsilon=1e-8, weight_decay=0.0,
        grad_clip_mode='value', grad_clip_value=CLIP,
        noamopt=False, reduce_on_plateau=False,
        # RL (loss_wrapper.py:55-73); greedy sampling => deterministic
        sc_sample_method='greedy', sc_beam_size=1,
        train_sample_method='greedy', train_beam_size=1, train_sample_n=1,
        cider_reward_weight=1.0, bleu_reward_weight=0.0,
        # StructureLosses/PPOLoss ctor requirements (unused branches)
        structure_loss_type='seqnll', structure_loss_weight=0,
        use_ppo=0, ppo_cliprange=0.2, ppo_kl_coef=0.0,
        entropy_reward_weight=0, self_cider_reward_weight=0,
        drop_worst_rate=0,
    )
    for k, v in kw.items():
        setattr(opt, k, v)
    return opt


def _batches(n, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        fc = rng.randn(B, 10).astype('float32')
        att = rng.randn(B, M, 12).astype('float32')
        labels = np.zeros((B, SPI, L + 2), 'int64')
        lens = rng.randint(3, L + 1, (B, SPI))
        for b in range(B):
            for s in range(SPI):
                labels[b, s, 1:1 + lens[b, s]] = rng.randint(
                    1, 21, lens[b, s])
        masks = (labels > 0).astype('float32')
        masks[:, :, 0] = 1
        # mask covers tokens + the terminating 0 (dataloader.py semantics)
        for b in range(B):
            for s in range(SPI):
                masks[b, s, 1 + lens[b, s]] = 1
        gts = [rng.randint(1, 21, (3, L)).astype('int64') for _ in range(B)]
        for g in gts:
            g[:, -2:] = 0
        out.append((fc, att, labels, masks, gts))
    return out


def _ref_side(opt):
    from captioning import models as ref_models
    from captioning.modules.loss_wrapper import LossWrapper
    from captioning.utils import misc as ref_utils
    torch.manual_seed(0)
    model = ref_models.setup(opt)
    lw = LossWrapper(model, opt)
    optimizer = ref_utils.build_optimizer(model.parameters(), opt)
    return model, lw, optimizer


def _jax_side(opt, ref_model):
    cfg = config_from_opt(opt, opt.vocab_size)
    cap = jx_setup(opt, VOCAB)
    variables = convert_state_dict(ref_model.state_dict(), cfg)
    trainer = Trainer(cap, opt)
    opt_state = trainer.init_opt_state(variables)
    return cap, trainer, variables, opt_state


def _torch_xe_step(lw, optimizer, opt, fc, att, labels, masks):
    optimizer.zero_grad()
    out = lw(torch.from_numpy(fc), torch.from_numpy(att),
             torch.from_numpy(labels), torch.from_numpy(masks), None,
             None, None, False, False, False)
    loss = out['loss'].mean()
    loss.backward()
    torch.nn.utils.clip_grad_value_(lw.model.parameters(),
                                    opt.grad_clip_value)
    optimizer.step()
    return float(loss)


def _torch_sc_step(lw, optimizer, opt, fc, att, labels, masks, gts):
    optimizer.zero_grad()
    out = lw(torch.from_numpy(fc), torch.from_numpy(att),
             torch.from_numpy(labels), torch.from_numpy(masks), None,
             gts, torch.arange(0, len(gts)), True, False, False)
    loss = out['loss'].mean()
    loss.backward()
    torch.nn.utils.clip_grad_value_(lw.model.parameters(),
                                    opt.grad_clip_value)
    optimizer.step()
    return float(loss), float(out['reward'])


@pytest.fixture()
def _shared_scorer(monkeypatch):
    """Point BOTH reward paths at this repo's native CiderD (the reference
    wires its scorer through module globals; its cider submodule is not in
    this environment)."""
    import captioning.utils.rewards as ref_rewards
    scorer = CiderD(df='corpus')
    monkeypatch.setattr(ref_rewards, 'CiderD_scorer', scorer)
    monkeypatch.setattr(jx_rewards, 'CiderD_scorer', scorer)
    yield
    # globals restored by monkeypatch


@pytest.mark.parametrize('model', ['att2in2', 'transformer'])
def test_xe_loop_trajectory(model):
    """20 composed XE steps: identical loss trajectory to fp32 tolerance.

    Reference semantics: tools/train.py:174-196 (zero_grad -> LossWrapper
    XE branch -> backward -> clip_grad_value_(0.1) -> adam step)."""
    opt = mkopt(model)
    ref_model, lw, optimizer = _ref_side(opt)
    cap, trainer, variables, opt_state = _jax_side(opt, ref_model)

    n_steps = 20
    rng = jax.random.PRNGKey(7)
    ref_losses, jx_losses = [], []
    for (fc, att, labels, masks, gts) in _batches(n_steps):
        ref_losses.append(_torch_xe_step(lw, optimizer, opt, fc, att,
                                         labels, masks))
        rng, step_rng = jax.random.split(rng)
        variables, opt_state, out = trainer.xe_step(
            variables, opt_state, jnp.asarray(fc), jnp.asarray(att),
            jnp.asarray(labels), jnp.asarray(masks), None, LR, 0.0,
            step_rng)
        jx_losses.append(float(out['loss']))

    ref_losses = np.asarray(ref_losses)
    jx_losses = np.asarray(jx_losses)
    # losses must track step by step — composition bugs (clip order, lr
    # application, mask off-by-one) produce divergence far above fp32
    # accumulation noise within a few steps
    np.testing.assert_allclose(jx_losses, ref_losses, rtol=2e-3, atol=2e-4)
    # and the trajectory is actually evolving (optimizer steps taking hold,
    # not a constant function agreeing trivially)
    assert np.ptp(ref_losses) > 1e-3


def test_scst_loop_trajectory(_shared_scorer):
    """5 composed host-reward SCST steps after 3 XE warm-up steps:
    greedy baseline + (greedy) sample -> CIDEr-D reward -> RewardCriterion
    -> clip -> adam, reference loss_wrapper.py:55-73 + train.py:185-196."""
    opt = mkopt('att2in2')
    ref_model, lw, optimizer = _ref_side(opt)
    cap, trainer, variables, opt_state = _jax_side(opt, ref_model)

    batches = _batches(8, seed=3)
    rng = jax.random.PRNGKey(11)

    # brief XE warm-up so the SCST decodes aren't from raw init
    for (fc, att, labels, masks, gts) in batches[:3]:
        _torch_xe_step(lw, optimizer, opt, fc, att, labels, masks)
        rng, step_rng = jax.random.split(rng)
        variables, opt_state, _ = trainer.xe_step(
            variables, opt_state, jnp.asarray(fc), jnp.asarray(att),
            jnp.asarray(labels), jnp.asarray(masks), None, LR, 0.0,
            step_rng)

    ref_losses, jx_losses = [], []
    ref_rewards_l, jx_rewards_l = [], []
    for (fc, att, labels, masks, gts) in batches[3:]:
        loss_t, reward_t = _torch_sc_step(lw, optimizer, opt, fc, att,
                                          labels, masks, gts)
        ref_losses.append(loss_t)
        ref_rewards_l.append(reward_t)

        rng, r_g, r_s, r_c = jax.random.split(rng, 4)
        greedy_seq, gen_seq = trainer.sc_decode(
            variables, jnp.asarray(fc), jnp.asarray(att), None, r_g, r_s)
        reward = jx_rewards.get_self_critical_reward(
            np.asarray(greedy_seq), gts, np.asarray(gen_seq), opt)
        jx_rewards_l.append(float(reward[:, 0].mean()))
        variables, opt_state, out = trainer.sc_grad_step(
            variables, opt_state, jnp.asarray(fc), jnp.asarray(att), None,
            gen_seq, jnp.asarray(reward, jnp.float32), LR, r_s)
        jx_losses.append(float(out['loss']))

    np.testing.assert_allclose(np.asarray(jx_rewards_l),
                               np.asarray(ref_rewards_l),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(jx_losses),
                               np.asarray(ref_losses),
                               rtol=2e-3, atol=3e-4)
