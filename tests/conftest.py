"""Test config: force CPU backend with a virtual 8-device mesh.

Multi-device sharding tests run on a host-platform device mesh
(SURVEY.md section 4's substitute for the missing fake communicator).
"""
import os

os.environ.setdefault('XLA_FLAGS',
                      '--xla_force_host_platform_device_count=8')
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['JAX_PLATFORM_NAME'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import sys as _sys

# tests import `tools.*` and chdir into tmp dirs; pin the repo root
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import random  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

_DEFAULT_PRNG_IMPL = jax.config.jax_default_prng_impl


@pytest.fixture(autouse=True)
def _hermetic_globals():
    """Every test starts from the same global state.

    Reseeds the process-wide RNGs and clears the reward-scorer singletons
    so no test's outcome can depend on which tests ran before it (the
    round-1 suite had an order-dependent failure traced to exactly this).
    """
    random.seed(1234)
    np.random.seed(1234)
    import captioning_tpu.utils.rewards as rewards
    rewards.CiderD_scorer = None
    rewards.Cider_scorer = None
    rewards.Bleu_scorer = None
    # train()/eval() set the production PRNG impl (--rng_impl rbg); restore
    # the import-time default after every test so streams don't depend on
    # test order.  The baseline is captured ONCE at conftest import — a
    # per-test capture would record the leaked value when a module-scoped
    # fixture (which runs before this autouse fixture) calls train().
    yield
    jax.config.update('jax_default_prng_impl', _DEFAULT_PRNG_IMPL)
    rewards.CiderD_scorer = None
    rewards.Cider_scorer = None
    rewards.Bleu_scorer = None
