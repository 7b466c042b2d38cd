"""Optimizer parity vs torch.optim — the exact constructors the reference
builds (misc.py:114-130, get_std_opt :257-263)."""

import numpy as np
import pytest
import torch
from types import SimpleNamespace

import jax.numpy as jnp

from captioning_tpu.utils import optimizers as O

LR = 0.1
WD = 0.01
ALPHA = 0.9
BETA = 0.999
EPS = 1e-8


def _opt(name, wd=WD):
    return SimpleNamespace(optim=name, optim_alpha=ALPHA, optim_beta=BETA,
                           optim_epsilon=EPS, weight_decay=wd,
                           learning_rate=LR)


def _run_optax(opt, grads, p0, lr=LR):
    tx = O.build_optimizer(opt)
    p = {'w': jnp.asarray(p0)}
    state = tx.init(p)
    for g in grads:
        u, state = tx.update({'w': jnp.asarray(g)}, state, p)
        # mirrors trainer._apply_updates: params += -lr * update
        p = {'w': p['w'] - lr * u['w']}
    return np.asarray(p['w'])


def _run_torch(make, grads, p0):
    p = torch.nn.Parameter(torch.tensor(p0))
    o = make([p])
    for g in grads:
        o.zero_grad()
        p.grad = torch.tensor(g)
        o.step()
    return p.detach().numpy()


TORCH_MAKERS = {
    # exactly the constructors of reference misc.py:114-130
    'rmsprop': lambda ps: torch.optim.RMSprop(ps, LR, ALPHA, EPS,
                                              weight_decay=WD),
    'adagrad': lambda ps: torch.optim.Adagrad(ps, LR, weight_decay=WD),
    'sgd': lambda ps: torch.optim.SGD(ps, LR, weight_decay=WD),
    'sgdm': lambda ps: torch.optim.SGD(ps, LR, ALPHA, weight_decay=WD),
    'sgdmom': lambda ps: torch.optim.SGD(ps, LR, ALPHA, weight_decay=WD,
                                         nesterov=True),
    'adam': lambda ps: torch.optim.Adam(ps, LR, (ALPHA, BETA), EPS,
                                        weight_decay=WD),
    'adamw': lambda ps: torch.optim.AdamW(ps, LR, (ALPHA, BETA), EPS,
                                          weight_decay=WD),
}


@pytest.mark.parametrize('name', sorted(TORCH_MAKERS))
def test_optimizer_matches_torch(name):
    rng = np.random.RandomState(0)
    p0 = rng.randn(7).astype('float32')
    grads = [rng.randn(7).astype('float32') for _ in range(5)]
    got = _run_optax(_opt(name), grads, p0)
    ref = _run_torch(TORCH_MAKERS[name], grads, p0)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


def test_noam_optimizer_adamw_keeps_default_decay():
    """get_std_opt builds torch.optim.AdamW WITHOUT weight_decay ->
    torch default 0.01 decoupled decay must survive the port."""
    rng = np.random.RandomState(1)
    p0 = rng.randn(7).astype('float32')
    grads = [rng.randn(7).astype('float32') for _ in range(4)]

    tx = O.build_noam_optimizer(SimpleNamespace(optim='adamw'))
    p = {'w': jnp.asarray(p0)}
    state = tx.init(p)
    for g in grads:
        u, state = tx.update({'w': jnp.asarray(g)}, state, p)
        p = {'w': p['w'] - LR * u['w']}
    ref = _run_torch(lambda ps: torch.optim.AdamW(ps, LR, (0.9, 0.98), 1e-9),
                     grads, p0)
    np.testing.assert_allclose(np.asarray(p['w']), ref, rtol=2e-5, atol=2e-6)

    with pytest.raises(KeyError):
        O.build_noam_optimizer(SimpleNamespace(optim='sgd'))
