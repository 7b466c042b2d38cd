"""Criterion tests vs torch reference implementations
(/root/reference/captioning/modules/losses.py), computed with torch CPU."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from captioning_tpu.modules import losses as L


def _rand_lp(rng, N, T, V):
    x = rng.randn(N, T, V).astype('float32')
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


def test_language_model_criterion_matches_torch():
    rng = np.random.RandomState(0)
    N, T, V = 6, 5, 9
    lp = _rand_lp(rng, N, T, V)
    target = rng.randint(0, V, (N, T))
    mask = (rng.rand(N, T) > 0.3).astype('float32')
    mask[:, 0] = 1  # real masks always count bos/eos (dataloader.py:245-249)
    # torch reference (losses.py:204-224)
    inp = torch.tensor(lp)
    tgt = torch.tensor(target)
    msk = torch.tensor(mask)
    out_t = -inp.gather(2, tgt.unsqueeze(2)).squeeze(2) * msk
    ref = (out_t.sum() / msk.sum()).item()
    got = float(L.language_model_criterion(jnp.asarray(lp),
                                           jnp.asarray(target),
                                           jnp.asarray(mask)))
    assert abs(ref - got) < 1e-5
    # reduction none
    ref_n = (out_t.sum(1) / msk.sum(1)).numpy()
    got_n = np.asarray(L.language_model_criterion(
        jnp.asarray(lp), jnp.asarray(target), jnp.asarray(mask),
        reduction='none'))
    assert np.allclose(ref_n, got_n, atol=1e-5)


def test_label_smoothing_matches_torch():
    rng = np.random.RandomState(1)
    N, T, V = 4, 5, 8
    lp = _rand_lp(rng, N, T, V)
    target = rng.randint(0, V, (N, T))
    mask = (rng.rand(N, T) > 0.2).astype('float32')
    smoothing = 0.1
    # torch reference (losses.py:227-265)
    inp = torch.tensor(lp).reshape(-1, V)
    tgt = torch.tensor(target).reshape(-1)
    msk = torch.tensor(mask).reshape(-1)
    true_dist = inp.data.clone()
    true_dist.fill_(smoothing / (V - 1))
    true_dist.scatter_(1, tgt.data.unsqueeze(1), 1.0 - smoothing)
    crit = torch.nn.KLDivLoss(reduction='none')
    ref = ((crit(inp, true_dist).sum(1) * msk).sum() / msk.sum()).item()
    got = float(L.label_smoothing_criterion(
        jnp.asarray(lp), jnp.asarray(target), jnp.asarray(mask), smoothing))
    assert abs(ref - got) < 1e-5


def test_reward_criterion_matches_torch():
    rng = np.random.RandomState(2)
    N, T, V = 6, 5, 9
    lp = _rand_lp(rng, N, T, V)
    seq = rng.randint(0, V, (N, T))
    seq[:, -1] = 0
    reward = rng.randn(N, T).astype('float32')
    # torch reference (losses.py:18-37)
    inp = torch.tensor(lp).gather(2, torch.tensor(seq).unsqueeze(2)).squeeze(2)
    inp = inp.reshape(-1)
    rwd = torch.tensor(reward).reshape(-1)
    m = (torch.tensor(seq) > 0).float()
    m = torch.cat([m.new(m.size(0), 1).fill_(1), m[:, :-1]], 1).reshape(-1)
    ref = (-(inp * rwd * m).sum() / m.sum()).item()
    got = float(L.reward_criterion(jnp.asarray(lp), jnp.asarray(seq),
                                   jnp.asarray(reward)))
    assert abs(ref - got) < 1e-5


@pytest.mark.parametrize('loss_type', ['seqnll', 'risk', 'max_margin',
                                       'multi_margin', 'softmax_margin',
                                       'new_self_critical', 'best_of_n'])
def test_structure_losses_match_torch(loss_type):
    rng = np.random.RandomState(3)
    B, n, T, V = 3, 4, 5, 8
    N = B * n
    lp = _rand_lp(rng, N, T, V)
    seq = rng.randint(1, V, (N, T))
    seq[:, -1] = 0
    scores = rng.rand(N).astype('float32')

    got = L.structure_loss(jnp.asarray(lp), jnp.asarray(seq),
                           jnp.asarray(scores), loss_type, n)
    got_loss = float(got['loss'])

    # torch reference (losses.py:40-202)
    input = torch.tensor(lp)
    seq_t = torch.tensor(seq)
    mask = (seq_t > 0).float()
    mask = torch.cat([mask.new_full((mask.size(0), 1), 1), mask[:, :-1]], 1)
    sc = torch.tensor(scores).view(-1, n)
    costs = -sc
    if loss_type in ('risk', 'softmax_margin'):
        costs = costs - costs.min(1, keepdim=True)[0]
        costs = costs / costs.max(1, keepdim=True)[0]
    inp = input.gather(2, seq_t.unsqueeze(2)).squeeze(2)
    if loss_type == 'seqnll':
        i2 = (inp * mask).sum(1) / mask.sum(1)
        i2 = i2.view(-1, n)
        target = costs.min(1)[1]
        ref = F.cross_entropy(i2, target).item()
    elif loss_type == 'risk':
        i2 = (inp * mask).sum(1).view(-1, n)
        ref = (F.softmax(i2.exp(), dim=1) * costs).sum(1).mean().item()
    elif loss_type in ('max_margin', 'multi_margin'):
        i2 = ((inp * mask).sum(1) / mask.sum(1)).view(-1, n)
        costs_star, star = costs.min(1, keepdim=True)
        input_star = i2.gather(1, star)
        viol = F.relu(costs - costs_star - input_star + i2)
        ref = ((viol.max(1)[0] / 2).mean() if loss_type == 'max_margin'
               else viol.mean()).item()
    elif loss_type == 'softmax_margin':
        i2 = ((inp * mask).sum(1) / mask.sum(1)).view(-1, n) + costs
        target = costs.min(1)[1]
        ref = F.cross_entropy(i2, target).item()
    elif loss_type == 'new_self_critical':
        baseline = (sc.sum(1, keepdim=True) - sc) / (sc.shape[1] - 1)
        sc2 = sc - baseline
        out = -inp * mask * sc2.view(-1, 1)
        ref = (out.sum() / mask.sum()).item()
    elif loss_type == 'best_of_n':
        sc2 = (sc == sc.max(1, keepdim=True)[0]).float()
        out = -inp * mask * sc2.view(-1, 1)
        ref = (out.sum() / mask.sum()).item()
    assert abs(ref - got_loss) < 1e-5, (loss_type, ref, got_loss)


def test_ppo_loss_matches_torch():
    rng = np.random.RandomState(4)
    B, n, T, V = 2, 3, 4, 7
    N = B * n
    lp_new = _rand_lp(rng, N, T, V)
    lp_old = _rand_lp(rng, N, T, V)
    seq = rng.randint(1, V, (N, T))
    seq[:, -1] = 0
    scores = rng.rand(N).astype('float32')
    cliprange, kl_coef = 0.2, 0.02

    got = L.ppo_loss(jnp.asarray(lp_new), jnp.asarray(lp_old),
                     jnp.asarray(seq), jnp.asarray(scores), n,
                     cliprange, kl_coef)

    # torch reference (losses.py:292-357)
    input = torch.tensor(lp_new)
    logprobs_old = torch.tensor(lp_old)
    seq_t = torch.tensor(seq)
    mask = (seq_t > 0).float()
    mask = torch.cat([mask.new_full((mask.size(0), 1), 1), mask[:, :-1]], 1)
    sc = torch.tensor(scores).view(-1, n)
    baseline = (sc.sum(1, keepdim=True) - sc) / (sc.shape[1] - 1)
    sc = (sc - baseline).view(-1, 1)
    word_lp = input.gather(2, seq_t.unsqueeze(2)).squeeze(2)
    word_lp_old = logprobs_old.gather(2, seq_t.unsqueeze(2)).squeeze(2)
    ratio = torch.exp(word_lp - word_lp_old)
    pg = torch.max(-sc * ratio,
                   -sc * torch.clamp(ratio, 1 - cliprange, 1 + cliprange))
    kl = F.kl_div(input, logprobs_old, reduction='none',
                  log_target=True).sum(-1)
    pg_loss = (pg * mask).sum() / mask.sum()
    kl_loss = (kl * mask).sum() / mask.sum()
    ref = (pg_loss + kl_coef * kl_loss).item()
    assert abs(float(got['loss']) - ref) < 1e-5
    assert abs(float(got['pg_loss']) - pg_loss.item()) < 1e-5
    assert abs(float(got['kl_loss']) - kl_loss.item()) < 1e-5
