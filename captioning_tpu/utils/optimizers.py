"""Optimizers and LR schedules with reference torch semantics.

Counterpart of ``/root/reference/captioning/utils/misc.py:105-263``.  The
learning rate is *injected per step* (the reference mutates param-group lr
for epoch decay / warmup / noam / plateau, train.py:133-142,170-172), so
the optax transform is built lr-less and the train step scales updates by
a traced ``lr`` scalar — one compiled graph across all schedules.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def _torch_adagrad(eps: float = 1e-10) -> optax.GradientTransformation:
    """torch.optim.Adagrad semantics: accumulator starts at 0 and the step
    is g / (sqrt(sum) + eps) — optax.scale_by_rss differs on both counts
    (initial_accumulator_value=0.1 and rsqrt(sum + eps))."""

    def init(params):
        return {'sum': jax.tree.map(jnp.zeros_like, params)}

    def update(updates, state, params=None):
        new_sum = jax.tree.map(lambda s, g: s + g * g, state['sum'], updates)
        out = jax.tree.map(lambda g, s: g / (jnp.sqrt(s) + eps),
                           updates, new_sum)
        return out, {'sum': new_sum}

    return optax.GradientTransformation(init, update)


def build_optimizer(opt) -> optax.GradientTransformation:
    """torch-flavoured optimizers (reference misc.py:114-130), lr-less.

    Weight decay is L2-into-grad (torch's coupled form) for everything but
    adamw, which is decoupled.
    """
    name = opt.optim
    wd = float(getattr(opt, 'weight_decay', 0) or 0)
    a, b, eps = opt.optim_alpha, opt.optim_beta, opt.optim_epsilon
    chain = []
    if wd > 0 and name != 'adamw':
        chain.append(optax.add_decayed_weights(wd))
    if name == 'rmsprop':
        # torch RMSprop divides by sqrt(nu) + eps, not sqrt(nu + eps)
        chain.append(optax.scale_by_rms(decay=a, eps=eps, eps_in_sqrt=False))
    elif name == 'adagrad':
        # reference misc.py:118 passes only lr/weight_decay -> torch
        # defaults (eps 1e-10, zero-initialized accumulator)
        chain.append(_torch_adagrad())
    elif name == 'sgd':
        pass
    elif name == 'sgdm':
        chain.append(optax.trace(decay=a))
    elif name == 'sgdmom':
        chain.append(optax.trace(decay=a, nesterov=True))
    elif name == 'adam':
        chain.append(optax.scale_by_adam(b1=a, b2=b, eps=eps))
    elif name == 'adamw':
        chain.append(optax.scale_by_adam(b1=a, b2=b, eps=eps))
        if wd > 0:
            chain.append(optax.add_decayed_weights(wd))
    else:
        raise Exception("bad option opt.optim: {}".format(name))
    if not chain:
        chain.append(optax.identity())
    return optax.chain(*chain)


def build_noam_optimizer(opt) -> optax.GradientTransformation:
    """The optimizer under NoamOpt (reference misc.py:257-263): adam or
    adamw with betas (0.9, 0.98), eps 1e-9; rate supplied per step.
    AdamW keeps torch's default decoupled weight decay (0.01 — the
    reference constructs torch.optim.AdamW without passing weight_decay);
    any other --optim raises, matching the reference's dict KeyError."""
    name = getattr(opt, 'optim', 'adam')
    adam = optax.scale_by_adam(b1=0.9, b2=0.98, eps=1e-9)
    if name == 'adam':
        return adam
    if name == 'adamw':
        return optax.chain(adam, optax.add_decayed_weights(0.01))
    raise KeyError('noamopt supports optim adam/adamw, got %r' % name)


def clip_transform(opt) -> optax.GradientTransformation:
    """Grad clip by value or global norm (reference train.py:194-195)."""
    v = float(opt.grad_clip_value)
    if v == 0:
        return optax.identity()
    if opt.grad_clip_mode == 'value':
        return optax.clip(v)
    return optax.clip_by_global_norm(v)


def noam_rate(step: int, d_model: int, factor: float, warmup: int) -> float:
    """reference misc.py:179-185."""
    step = max(step, 1)
    return factor * (d_model ** -0.5) * min(step ** -0.5,
                                            step * warmup ** -1.5)


def epoch_decay_lr(opt, epoch: int) -> float:
    """Manual epoch-wise exponential decay (reference train.py:134-142)."""
    if (opt.learning_rate_decay_start >= 0 and
            epoch > opt.learning_rate_decay_start):
        frac = ((epoch - opt.learning_rate_decay_start) //
                opt.learning_rate_decay_every)
        return opt.learning_rate * (opt.learning_rate_decay_rate ** frac)
    return opt.learning_rate


class ReduceLROnPlateau:
    """Host-side plateau scheduler (torch semantics; reference
    misc.py:201-255 wraps torch's)."""

    def __init__(self, initial_lr, mode='min', factor=0.1, patience=10,
                 threshold=1e-4, cooldown=0, min_lr=0):
        self.current_lr = initial_lr
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.cooldown = cooldown
        self.min_lr = min_lr
        self.best = None
        self.num_bad_epochs = 0
        self.cooldown_counter = 0

    def _is_better(self, val):
        # torch 'rel' threshold_mode semantics
        if self.best is None:
            return True
        if self.mode == 'min':
            return val < self.best * (1 - self.threshold)
        return val > self.best * (1 + self.threshold)

    def step(self, val):
        if self._is_better(val):
            self.best = val
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            self.current_lr = max(self.current_lr * self.factor, self.min_lr)
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0

    def state_dict(self):
        return dict(current_lr=self.current_lr, best=self.best,
                    num_bad_epochs=self.num_bad_epochs,
                    cooldown_counter=self.cooldown_counter)

    def load_state_dict(self, sd):
        if sd is None:
            return
        self.current_lr = sd.get('current_lr', self.current_lr)
        self.best = sd.get('best')
        self.num_bad_epochs = sd.get('num_bad_epochs', 0)
        self.cooldown_counter = sd.get('cooldown_counter', 0)
