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
