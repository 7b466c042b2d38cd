"""Jitted train steps: XE, SCST, structure/PPO — the LossWrapper redesigned.

The reference bundles model+criterions in an nn.Module so DataParallel
computes loss per replica (``/root/reference/captioning/modules/loss_wrapper.py``).
Here each training mode is one (or two) jit-compiled pure functions over a
``jax.sharding.Mesh``: params replicated, batch sharded on the ``data``
axis, gradient psum inserted by XLA.

RL modes split at the host boundary exactly once per step (SURVEY.md
section 5.8): phase A decodes greedy+samples on device, phase B scores
CIDEr-D on host, phase C recomputes sample logprobs with the *same rngs*
as phase A (bit-identical activations under dropout, see
``engine.decoding.scan_logprobs``) and applies the policy gradient.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from ..engine import decoding
from ..utils import optimizers as optim_utils
from . import losses


class Trainer:
    def __init__(self, captioner, opt, old_variables=None):
        self.captioner = captioner
        self.opt = opt
        self.label_smoothing = float(getattr(opt, 'label_smoothing', 0) or 0)
        if getattr(opt, 'noamopt', False):
            self.tx = optax.chain(optim_utils.clip_transform(opt),
                                  optim_utils.build_noam_optimizer(opt))
        else:
            self.tx = optax.chain(optim_utils.clip_transform(opt),
                                  optim_utils.build_optimizer(opt))
        self.old_variables = old_variables  # PPO frozen policy
        self._cache: Dict[Any, Any] = {}
        # whether the struc sample pass emits log-softmaxed outputs
        # (loss_wrapper.py:31-37 semantics) — shared by the fused, decode
        # and grad paths so the three can never disagree
        self.struc_out_ls = int(
            getattr(opt, 'struc_use_logsoftmax', False) or
            getattr(opt, 'structure_loss_type', '') == 'softmax_margin' or
            'margin' not in getattr(opt, 'structure_loss_type', ''))

    # -- plumbing -----------------------------------------------------------
    def init_opt_state(self, variables):
        return self.tx.init(variables['params'])

    def _apply_updates(self, variables, opt_state, grads, lr):
        updates, opt_state = self.tx.update(grads, opt_state,
                                            variables['params'])
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(variables['params'], updates)
        return dict(variables, params=params), opt_state

    def _crit(self, logprobs, target, mask, reduction):
        if self.label_smoothing > 0:
            return losses.label_smoothing_criterion(
                logprobs, target, mask, self.label_smoothing, reduction)
        return losses.language_model_criterion(logprobs, target, mask,
                                               reduction)

    @staticmethod
    def _drop_worst(loss_vec, drop_worst_rate):
        k = int(loss_vec.shape[0] * (1 - drop_worst_rate))
        worst_removed, _ = jax.lax.top_k(-loss_vec, k)  # k smallest losses
        return (-worst_removed).mean()

    # -- XE -----------------------------------------------------------------
    def xe_step(self, variables, opt_state, fc, att, labels, masks, am,
                lr, ss_prob, rng, drop_worst_flag=False):
        key = ('xe', drop_worst_flag)
        if key not in self._cache:
            cap = self.captioner
            drop_worst_rate = float(getattr(self.opt, 'drop_worst_rate', 0))

            def loss_fn(variables, fc, att, labels, masks, am, ss_prob, rng):
                logprobs, new_vars = cap.forward_tf(
                    variables, fc, att, labels[..., :-1], am, ss_prob,
                    rng, train=True, return_new_vars=True)
                reduction = 'none' if drop_worst_flag else 'mean'
                loss = self._crit(logprobs, labels[..., 1:], masks[..., 1:],
                                  reduction)
                if drop_worst_flag:
                    loss = self._drop_worst(loss, drop_worst_rate)
                return loss, new_vars

            def step(variables, opt_state, fc, att, labels, masks, am,
                     lr, ss_prob, rng):
                (loss, new_vars), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(
                    variables, fc, att, labels, masks, am, ss_prob, rng)
                # carry updated batch_stats (use_bn running statistics)
                if 'batch_stats' in new_vars:
                    variables = dict(variables,
                                     batch_stats=jax.lax.stop_gradient(
                                         new_vars['batch_stats']))
                variables, opt_state = self._apply_updates(
                    variables, opt_state, grads['params'], lr)
                return variables, opt_state, {'loss': loss}

            self._cache[key] = jax.jit(step, donate_argnums=(0, 1))
        return self._cache[key](variables, opt_state, fc, att, labels,
                                masks, am, jnp.float32(lr),
                                jnp.float32(ss_prob), rng)

    # -- SCST ------------------------------------------------------------------
    def sc_decode(self, variables, fc, att, am, rng_greedy, rng_sample):
        """Phase A: greedy baseline (eval mode, loss_wrapper.py:57-62) +
        train_sample_n samples (train mode, :64-68).  ``rng_sample`` must be
        reused by sc_grad_step for rng-exact recompute."""
        opt = self.opt
        key = 'sc_decode'
        if key not in self._cache:
            cap = self.captioner
            sc_opt = {'sample_method': opt.sc_sample_method,
                      'beam_size': opt.sc_beam_size}
            tr_opt = {'sample_method': opt.train_sample_method,
                      'beam_size': opt.train_beam_size,
                      'sample_n': opt.train_sample_n}

            def fn(variables, fc, att, am, rng_greedy, rng_sample):
                # neither pass is differentiated here (sc_grad_step
                # recomputes logprobs rng-exactly), so both use the
                # early-exit while_loop path (return_stats) — no per-step
                # distribution tables, loop stops when all rows finish
                dm_eval = cap.bind(variables, train=False)
                greedy_seq, _ = decoding.sample(dm_eval, fc, att, am,
                                                rng_greedy, sc_opt,
                                                return_stats=True)
                dm_train = cap.bind(variables, train=True)
                gen_seq, _ = decoding.sample(dm_train, fc, att, am,
                                             rng_sample, tr_opt,
                                             return_stats=True)
                return greedy_seq, gen_seq

            self._cache[key] = jax.jit(fn)
        return self._cache[key](variables, fc, att, am, rng_greedy,
                                rng_sample)

    def sc_grad_step(self, variables, opt_state, fc, att, am, gen_seq,
                     reward, lr, rng, drop_worst_flag=False):
        """Phase C: recompute sample logprobs (rng-matched) + REINFORCE."""
        opt = self.opt
        key = ('sc_grad', drop_worst_flag)
        if key not in self._cache:
            cap = self.captioner
            sample_n = int(opt.train_sample_n)
            drop_worst_rate = float(getattr(opt, 'drop_worst_rate', 0))
            # the decode that produced gen_seq (sc_decode's train pass);
            # only used to derive its prepare rng for the BN-stats refresh
            tr_opt = {'sample_method': opt.train_sample_method,
                      'beam_size': opt.train_beam_size}

            def loss_fn(variables, fc, att, am, gen_seq, reward, rng):
                dm = cap.bind(variables, train=True)
                lp = decoding.scan_logprobs(dm, fc, att, am, gen_seq, rng,
                                            sample_n=sample_n)
                reduction = 'none' if drop_worst_flag else 'mean'
                loss = losses.reward_criterion(lp, gen_seq, reward, reduction)
                if drop_worst_flag:
                    loss = self._drop_worst(loss, drop_worst_rate)
                return loss

            def step(variables, opt_state, fc, att, am, gen_seq, reward,
                     lr, rng):
                loss, grads = jax.value_and_grad(loss_fn)(
                    variables, fc, att, am, gen_seq, reward, rng)
                # thread BN running stats (use_bn) exactly as the decode's
                # train-mode prepare updated them — the functional decode
                # discards its mutated collection (reference model.train()
                # forwards keep updating BN stats during RL)
                if 'batch_stats' in variables:
                    variables = dict(variables, batch_stats=jax.lax.stop_gradient(
                        cap.bn_stats_after_prepare(
                            variables, fc, att, am,
                            decoding.prep_rng_for_sample(rng, tr_opt))))
                variables, opt_state = self._apply_updates(
                    variables, opt_state, grads['params'], lr)
                return variables, opt_state, {'loss': loss}

            self._cache[key] = jax.jit(step, donate_argnums=(0, 1))
        return self._cache[key](variables, opt_state, fc, att, am, gen_seq,
                                reward, jnp.float32(lr), rng)

    def sc_fused_step(self, variables, opt_state, fc, att, am, refs,
                      ref_mask, lr, rng_greedy, rng_sample,
                      device_scorer):
        """Fully-fused SCST iteration: greedy baseline + sampling + on-device
        mixed reward (cider_reward_weight * CIDEr-D + bleu_reward_weight *
        BLEU-4, ops/cider_device.py; reference rewards.py:60-74) + policy
        gradient in ONE jitted program — zero host synchronization inside
        the RL loop (the host/device boundary SURVEY.md 5.8 calls out is
        gone entirely).

        Gradients flow through the sampling scan's logprobs directly (the
        same forward the tokens came from), exactly like the reference's
        backprop through its sampling pass.
        """
        opt = self.opt
        key = 'sc_fused'
        if key not in self._cache:
            cap = self.captioner
            sc_opt = {'sample_method': opt.sc_sample_method,
                      'beam_size': opt.sc_beam_size}
            tr_opt = {'sample_method': opt.train_sample_method,
                      'beam_size': opt.train_beam_size,
                      'sample_n': opt.train_sample_n}
            cider_w = float(opt.cider_reward_weight)
            bleu_w = float(getattr(opt, 'bleu_reward_weight', 0))

            def loss_fn(variables, fc, att, am, refs, ref_mask,
                        rng_greedy, rng_sample):
                # the baseline is gradient-free (int tokens + stop_gradient),
                # so it rides the early-exit while_loop path; the sampling
                # pass below keeps the scan (gradients flow through its
                # logprobs, and lax.while_loop is not reverse-differentiable)
                dm_eval = cap.bind(variables, train=False)
                greedy_seq, _ = decoding.sample(
                    dm_eval, fc, att, am, rng_greedy, sc_opt,
                    return_stats=True)
                greedy_seq = jax.lax.stop_gradient(greedy_seq)
                dm_train = cap.bind(variables, train=True)
                gen_seq, gen_logprobs = decoding.sample(
                    dm_train, fc, att, am, rng_sample, tr_opt)
                reward = device_scorer.self_critical_reward(
                    greedy_seq, gen_seq, refs, ref_mask, cider_w, bleu_w)
                reward = jax.lax.stop_gradient(reward)
                loss = losses.reward_criterion(gen_logprobs, gen_seq, reward)
                return loss, reward[:, 0].mean()

            def step(variables, opt_state, fc, att, am, refs, ref_mask,
                     lr, rng_greedy, rng_sample):
                (loss, avg_reward), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(
                    variables, fc, att, am, refs, ref_mask, rng_greedy,
                    rng_sample)
                # thread BN running stats (use_bn) exactly as the decode's
                # train-mode prepare updated them — the functional decode
                # discards its mutated collection (reference model.train()
                # forwards keep updating BN stats during RL)
                if 'batch_stats' in variables:
                    variables = dict(variables, batch_stats=jax.lax.stop_gradient(
                        cap.bn_stats_after_prepare(
                            variables, fc, att, am,
                            decoding.prep_rng_for_sample(rng_sample,
                                                         tr_opt))))
                variables, opt_state = self._apply_updates(
                    variables, opt_state, grads['params'], lr)
                return variables, opt_state, {'loss': loss,
                                              'reward': avg_reward}

            self._cache[key] = jax.jit(step, donate_argnums=(0, 1))
        return self._cache[key](variables, opt_state, fc, att, am, refs,
                                ref_mask, jnp.float32(lr), rng_greedy,
                                rng_sample)

    def struc_fused_step(self, variables, opt_state, fc, att, labels, masks,
                         am, refs, ref_mask, lr, rng, rng_lm, device_scorer):
        """Fully-fused structure-loss iteration (e.g. new_self_critical or
        PPO): sampling + on-device CIDEr-D scores + structure/PPO loss
        (+ optional XE mix) + gradient in one jitted program.  PPO's frozen
        old policy runs its logprob scan inside the same program.  The
        self-CIDEr diversity reward also runs on device
        (ops/cider_device.py:self_cider_grouped), so self_cider_reward_weight
        no longer forces the host path."""
        opt = self.opt
        key = 'struc_fused'
        if key not in self._cache:
            cap = self.captioner
            w = float(opt.structure_loss_weight)
            sample_n = int(opt.train_sample_n)
            use_ppo = int(getattr(opt, 'use_ppo', 0))
            out_ls = self.struc_out_ls
            tr_opt = {'sample_method': opt.train_sample_method,
                      'beam_size': opt.train_beam_size,
                      'output_logsoftmax': out_ls,
                      'sample_n': sample_n}
            cider_w = float(opt.cider_reward_weight)
            bleu_w = float(getattr(opt, 'bleu_reward_weight', 0))
            entropy_w = float(getattr(opt, 'entropy_reward_weight', 0))
            self_cider_w = float(getattr(opt, 'self_cider_reward_weight', 0))
            old_variables = self.old_variables

            def loss_fn(variables, fc, att, labels, masks, am, refs,
                        ref_mask, rng, rng_lm):
                if w < 1:
                    logprobs = cap.forward_tf(variables, fc, att,
                                              labels[..., :-1], am, 0.0,
                                              rng_lm, train=True)
                    lm_loss = self._crit(logprobs, labels[..., 1:],
                                         masks[..., 1:], 'mean')
                else:
                    lm_loss = jnp.float32(0)
                dm = cap.bind(variables, train=True)
                gen_seq, gen_lp = decoding.sample(dm, fc, att, am, rng,
                                                  tr_opt)
                scores = device_scorer.score_grouped(
                    gen_seq, refs, ref_mask, sample_n,
                    cider_weight=cider_w, bleu_weight=bleu_w)
                scores = jax.lax.stop_gradient(scores.astype(jnp.float32))
                if use_ppo:
                    dm_old = cap.bind(old_variables, train=False)
                    lp_old = decoding.scan_logprobs(
                        dm_old, fc, att, am, gen_seq,
                        jax.random.PRNGKey(0), sample_n=sample_n)
                    struc = losses.ppo_loss(
                        gen_lp, lp_old, gen_seq, scores, sample_n,
                        cliprange=float(opt.ppo_cliprange),
                        kl_coef=float(opt.ppo_kl_coef))
                else:
                    sc_scores = None
                    if self_cider_w > 0:
                        sc_scores = jax.lax.stop_gradient(
                            device_scorer.self_cider_grouped(
                                gen_seq, sample_n).astype(jnp.float32))
                    struc = losses.structure_loss(
                        gen_lp, gen_seq, scores, opt.structure_loss_type,
                        sample_n, entropy_reward_weight=entropy_w,
                        self_cider_scores=sc_scores,
                        self_cider_weight=self_cider_w)
                loss = (1 - w) * lm_loss + w * struc['loss']
                aux = {'lm_loss': lm_loss, 'struc_loss': struc['loss'],
                       'reward': struc['reward']}
                aux.update({k: v for k, v in struc.items()
                            if k not in ('loss', 'reward')})
                return loss, aux

            def step(variables, opt_state, fc, att, labels, masks, am,
                     refs, ref_mask, lr, rng, rng_lm):
                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(
                    variables, fc, att, labels, masks, am, refs, ref_mask,
                    rng, rng_lm)
                # thread BN running stats (use_bn) exactly as the decode's
                # train-mode prepare updated them — the functional decode
                # discards its mutated collection (reference model.train()
                # forwards keep updating BN stats during RL)
                if 'batch_stats' in variables:
                    variables = dict(variables, batch_stats=jax.lax.stop_gradient(
                        cap.bn_stats_after_prepare(
                            variables, fc, att, am,
                            decoding.prep_rng_for_sample(rng, tr_opt))))
                variables, opt_state = self._apply_updates(
                    variables, opt_state, grads['params'], lr)
                aux['loss'] = loss
                return variables, opt_state, aux

            self._cache[key] = jax.jit(step, donate_argnums=(0, 1))
        return self._cache[key](variables, opt_state, fc, att, labels,
                                masks, am, refs, ref_mask, jnp.float32(lr),
                                rng, rng_lm)

    # -- structure losses / PPO -----------------------------------------------
    def struc_decode(self, variables, fc, att, am, rng):
        """Phase A for structure losses (loss_wrapper.py:31-37)."""
        opt = self.opt
        key = 'struc_decode'
        if key not in self._cache:
            cap = self.captioner
            out_ls = self.struc_out_ls
            tr_opt = {'sample_method': opt.train_sample_method,
                      'beam_size': opt.train_beam_size,
                      'output_logsoftmax': out_ls,
                      'sample_n': opt.train_sample_n}

            def fn(variables, fc, att, am, rng):
                dm = cap.bind(variables, train=True)
                # not differentiated (struc_grad_step recomputes): use the
                # early-exit while_loop path
                gen_seq, _ = decoding.sample(dm, fc, att, am, rng, tr_opt,
                                             return_stats=True)
                return gen_seq

            self._cache[key] = jax.jit(fn)
        return self._cache[key](variables, fc, att, am, rng)

    def struc_grad_step(self, variables, opt_state, fc, att, labels, masks,
                        am, gen_seq, scores, self_cider_scores, lr, rng,
                        rng_lm, drop_worst_flag=False):
        """Phase C: (1-w)*XE + w*structure loss (loss_wrapper.py:26-53)."""
        opt = self.opt
        key = ('struc_grad', drop_worst_flag)
        if key not in self._cache:
            cap = self.captioner
            w = float(opt.structure_loss_weight)
            sample_n = int(opt.train_sample_n)
            use_ppo = int(getattr(opt, 'use_ppo', 0))
            out_ls = self.struc_out_ls
            drop_worst_rate = float(getattr(opt, 'drop_worst_rate', 0))
            reduction = 'none' if drop_worst_flag else 'mean'
            old_variables = self.old_variables
            # the decode that produced gen_seq (struc_decode's sample pass);
            # only used to derive its prepare rng for the BN-stats refresh
            tr_opt = {'sample_method': opt.train_sample_method,
                      'beam_size': opt.train_beam_size}

            def loss_fn(variables, fc, att, labels, masks, am, gen_seq,
                        scores, self_cider_scores, rng, rng_lm):
                out = {}
                if w < 1:
                    logprobs = cap.forward_tf(variables, fc, att,
                                              labels[..., :-1], am, 0.0,
                                              rng_lm, train=True)
                    lm_loss = self._crit(logprobs, labels[..., 1:],
                                         masks[..., 1:], reduction)
                else:
                    lm_loss = jnp.float32(0)
                if w > 0:
                    dm = cap.bind(variables, train=True)
                    lp = decoding.scan_logprobs(dm, fc, att, am, gen_seq,
                                                rng, sample_n=sample_n,
                                                output_logsoftmax=out_ls)
                    if use_ppo:
                        dm_old = cap.bind(old_variables, train=False)
                        lp_old = decoding.scan_logprobs(
                            dm_old, fc, att, am, gen_seq,
                            jax.random.PRNGKey(0), sample_n=sample_n)
                        struc = losses.ppo_loss(
                            lp, lp_old, gen_seq, scores, sample_n,
                            cliprange=float(opt.ppo_cliprange),
                            kl_coef=float(opt.ppo_kl_coef),
                            reduction=reduction)
                    else:
                        struc = losses.structure_loss(
                            lp, gen_seq, scores, opt.structure_loss_type,
                            sample_n,
                            entropy_reward_weight=float(
                                getattr(opt, 'entropy_reward_weight', 0)),
                            self_cider_scores=self_cider_scores,
                            self_cider_weight=float(
                                getattr(opt, 'self_cider_reward_weight', 0)),
                            reduction=reduction)
                    struc_loss = struc['loss']
                    out.update({k: v for k, v in struc.items() if k != 'loss'})
                else:
                    struc_loss = jnp.float32(0)
                    # structure_loss_weight 0 is a supported config (pure XE
                    # through the struc path); the metrics consumer reads
                    # out['reward'] unconditionally on struc iterations
                    out['reward'] = scores.reshape(-1, sample_n)
                loss = (1 - w) * lm_loss + w * struc_loss
                if drop_worst_flag:
                    loss = self._drop_worst(loss, drop_worst_rate)
                out['lm_loss'] = (lm_loss.mean()
                                  if hasattr(lm_loss, 'mean') else lm_loss)
                out['struc_loss'] = (struc_loss.mean()
                                     if hasattr(struc_loss, 'mean')
                                     else struc_loss)
                return loss, out

            def step(variables, opt_state, fc, att, labels, masks, am,
                     gen_seq, scores, self_cider_scores, lr, rng, rng_lm):
                (loss, out), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(
                    variables, fc, att, labels, masks, am, gen_seq, scores,
                    self_cider_scores, rng, rng_lm)
                # thread BN running stats (use_bn) exactly as the decode's
                # train-mode prepare updated them — the functional decode
                # discards its mutated collection (reference model.train()
                # forwards keep updating BN stats during RL)
                if 'batch_stats' in variables:
                    variables = dict(variables, batch_stats=jax.lax.stop_gradient(
                        cap.bn_stats_after_prepare(
                            variables, fc, att, am,
                            decoding.prep_rng_for_sample(rng, tr_opt))))
                variables, opt_state = self._apply_updates(
                    variables, opt_state, grads['params'], lr)
                out['loss'] = loss
                return variables, opt_state, out

            self._cache[key] = jax.jit(step, donate_argnums=(0, 1))
        return self._cache[key](variables, opt_state, fc, att, labels,
                                masks, am, gen_seq, scores,
                                self_cider_scores, jnp.float32(lr), rng,
                                rng_lm)
