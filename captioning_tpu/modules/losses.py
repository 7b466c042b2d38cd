"""Training criterions as pure jnp functions.

TPU-native counterparts of ``/root/reference/captioning/modules/losses.py``.
Reward/score inputs (CIDEr-D etc.) are computed host-side by
``utils.rewards`` and passed in as arrays; everything here is jit-able.

``reduction='none'`` returns per-sequence means (for drop-worst), matching
the reference semantics.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def _gather_tokens(logprobs, seq):
    """[N, L, V] gathered at seq -> [N, L]."""
    return jnp.take_along_axis(logprobs, seq[..., None], axis=2)[..., 0]


def _reward_mask(seq):
    """(seq>0) shifted right with a leading 1 — counts the generated tokens
    incl. the first EOS (reference losses.py:28-29)."""
    m = (seq > 0).astype(jnp.float32)
    return jnp.concatenate([jnp.ones_like(m[:, :1]), m[:, :-1]], axis=1)


def language_model_criterion(logprobs, target, mask, reduction='mean'):
    """Masked NLL (reference losses.py:204-224)."""
    if target.ndim == 3:
        target = target.reshape(-1, target.shape[2])
        mask = mask.reshape(-1, mask.shape[2])
    L = logprobs.shape[1]
    target = target[:, :L]
    mask = mask[:, :L].astype(jnp.float32)
    out = -_gather_tokens(logprobs, target) * mask
    if reduction == 'none':
        return out.sum(1) / jnp.maximum(mask.sum(1), 1e-8)
    return out.sum() / jnp.maximum(mask.sum(), 1e-8)


def label_smoothing_criterion(logprobs, target, mask, smoothing: float,
                              reduction='mean'):
    """KLDiv vs smoothed one-hot (reference losses.py:227-265)."""
    if target.ndim == 3:
        target = target.reshape(-1, target.shape[2])
        mask = mask.reshape(-1, mask.shape[2])
    N = logprobs.shape[0]
    L = logprobs.shape[1]
    V = logprobs.shape[2]
    target = target[:, :L].reshape(-1)
    mask = mask[:, :L].astype(jnp.float32).reshape(-1)
    x = logprobs.reshape(-1, V)
    confidence = 1.0 - smoothing
    smooth_val = smoothing / (V - 1)
    true_dist = jnp.full_like(x, smooth_val)
    true_dist = true_dist.at[jnp.arange(x.shape[0]), target].set(confidence)
    # KLDiv(log_input, target) = target * (log(target) - input); 0log0 := 0
    log_td = jnp.where(true_dist > 0, jnp.log(jnp.maximum(true_dist, 1e-38)),
                       0.0)
    kl = (true_dist * (log_td - x)).sum(-1) * mask
    if reduction == 'none':
        kl = kl.reshape(N, L)
        m = mask.reshape(N, L)
        return kl.sum(1) / jnp.maximum(m.sum(1), 1e-8)
    return kl.sum() / jnp.maximum(mask.sum(), 1e-8)


def reward_criterion(sample_logprobs, seq, reward, reduction='mean'):
    """SCST policy gradient (reference losses.py:18-37)."""
    N, L = sample_logprobs.shape[:2]
    inp = _gather_tokens(sample_logprobs, seq)
    mask = _reward_mask(seq)
    out = -inp * reward.reshape(N, L) * mask
    if reduction == 'none':
        return out.sum(1) / jnp.maximum(mask.sum(1), 1e-8)
    return out.sum() / jnp.maximum(mask.sum(), 1e-8)


def structure_loss(input_lp, seq, scores, loss_type: str, seq_per_img: int,
                   entropy_reward_weight: float = 0.0,
                   self_cider_scores=None, self_cider_weight: float = 0.0,
                   reduction='mean') -> Dict[str, jnp.ndarray]:
    """Structured-prediction loss family (reference losses.py:40-202).

    input_lp: [N, L, V] logprobs (or logits for margin losses);
    scores:   [N] per-sequence metric scores from utils.rewards.get_scores.
    """
    out = {}
    mask = _reward_mask(seq)
    scores = scores.reshape(-1, seq_per_img)
    out['reward'] = scores
    if entropy_reward_weight > 0:
        p = jax.nn.softmax(input_lp, axis=2)
        entropy = -(p * jax.nn.log_softmax(input_lp, axis=2)).sum(2)
        entropy = jax.lax.stop_gradient(
            (entropy * mask).sum(1) / mask.sum(1))
        scores = scores + entropy_reward_weight * entropy.reshape(
            -1, seq_per_img)

    costs = -scores
    if loss_type in ('risk', 'softmax_margin'):
        costs = costs - costs.min(1, keepdims=True)
        costs = costs / jnp.maximum(costs.max(1, keepdims=True), 1e-8)

    tok_lp = _gather_tokens(input_lp, seq)

    def seq_mean(x):
        return ((x * mask).sum(1) / jnp.maximum(mask.sum(1), 1e-8)
                ).reshape(-1, seq_per_img)

    if loss_type == 'seqnll':
        inp = seq_mean(tok_lp)
        target = jnp.argmin(costs, axis=1)
        ce = -jnp.take_along_axis(jax.nn.log_softmax(inp, axis=1),
                                  target[:, None], axis=1)[:, 0]
        output = ce.mean() if reduction == 'mean' else ce
    elif loss_type == 'risk':
        inp = ((tok_lp * mask).sum(1)).reshape(-1, seq_per_img)
        output = (jax.nn.softmax(jnp.exp(inp), axis=1) * costs).sum(1).mean()
    elif loss_type in ('max_margin', 'multi_margin'):
        inp = seq_mean(tok_lp)
        star = jnp.argmin(costs, axis=1, keepdims=True)
        costs_star = jnp.take_along_axis(costs, star, axis=1)
        input_star = jnp.take_along_axis(inp, star, axis=1)
        viol = jax.nn.relu(costs - costs_star - input_star + inp)
        if loss_type == 'max_margin':
            output = (viol.max(1) / 2).mean()
        else:
            output = viol.mean()
    elif loss_type in ('softmax_margin', 'real_softmax_margin'):
        inp = seq_mean(tok_lp) + costs
        target = jnp.argmin(costs, axis=1)
        ce = -jnp.take_along_axis(jax.nn.log_softmax(inp, axis=1),
                                  target[:, None], axis=1)[:, 0]
        output = ce.mean() if reduction == 'mean' else ce
    elif loss_type == 'new_self_critical':
        # leave-one-out mean baseline (reference losses.py:168-187)
        baseline = (scores.sum(1, keepdims=True) - scores) / (
            scores.shape[1] - 1)
        adv = scores - baseline
        if self_cider_scores is not None and self_cider_weight > 0:
            sc = self_cider_scores.reshape(-1, 1)
            adv = adv + self_cider_weight * jnp.broadcast_to(
                sc, adv.shape)
        o = -tok_lp * mask * adv.reshape(-1, 1)
        if reduction == 'none':
            output = o.sum(1) / jnp.maximum(mask.sum(1), 1e-8)
        else:
            output = o.sum() / jnp.maximum(mask.sum(), 1e-8)
    elif loss_type == 'best_of_n':
        best = (scores == scores.max(1, keepdims=True)).astype(jnp.float32)
        o = -tok_lp * mask * best.reshape(-1, 1)
        if reduction == 'none':
            output = o.sum(1) / jnp.maximum(mask.sum(1), 1e-8)
        else:
            output = o.sum() / jnp.maximum(mask.sum(), 1e-8)
    else:
        raise ValueError('unknown structure_loss_type %s' % loss_type)

    out['loss'] = output
    return out


def masked_mean(tensor, mask, axis=None):
    return (tensor * mask).sum(axis) / jnp.maximum(mask.sum(axis), 1e-8)


def ppo_loss(new_logprobs, old_logprobs, seq, scores, seq_per_img: int,
             cliprange: float = 0.2, kl_coef: float = 0.02,
             reduction='mean') -> Dict[str, jnp.ndarray]:
    """clip-PPO + KL vs the frozen old policy (reference losses.py:267-357).

    new/old_logprobs: [N, L, V] log-softmax outputs over the sampled seq.
    """
    out = {}
    mask = _reward_mask(seq)
    scores = scores.reshape(-1, seq_per_img)
    out['reward'] = scores
    baseline = (scores.sum(1, keepdims=True) - scores) / (scores.shape[1] - 1)
    adv = (scores - baseline).reshape(-1, 1)

    word_lp = _gather_tokens(new_logprobs, seq)
    word_lp_old = jax.lax.stop_gradient(_gather_tokens(old_logprobs, seq))
    ratio = jnp.exp(word_lp - word_lp_old)

    pg_losses = -adv * ratio
    pg_losses2 = -adv * jnp.clip(ratio, 1.0 - cliprange, 1.0 + cliprange)
    pg_loss = jnp.maximum(pg_losses, pg_losses2)

    # KL(old || new) summed over vocab (torch F.kl_div(log_target=True))
    kl = (jnp.exp(old_logprobs) * (old_logprobs - new_logprobs)).sum(-1)
    out['pg_loss'] = masked_mean(pg_loss, mask)
    out['kl_loss'] = masked_mean(kl, mask)
    out['clipfrac'] = masked_mean(
        (jnp.abs(ratio - 1.0) > cliprange).astype(jnp.float32), mask)
    if reduction == 'none':
        loss = pg_loss + kl_coef * kl
        out['loss'] = masked_mean(loss, mask, axis=1)
    else:
        out['loss'] = out['pg_loss'] + kl_coef * out['kl_loss']
    return out
