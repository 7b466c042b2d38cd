"""REAL 2-process multi-host test (VERDICT round-2 item 5).

``tests/test_multihost.py`` drives the gather helpers with a
thread-simulated allgather — fast, but threads share memory, so pickling
and transport bugs can hide.  Here ``jax.distributed.initialize`` brings
up an actual 2-process CPU cluster on localhost and the SAME production
helpers (``local_batch_slice`` + ``gather_predictions`` over
``multihost_utils.process_allgather``) move real pickled bytes through a
real collective — the path multi-host eval uses
(reference ``train_pl.py:224-276`` DDP gather semantics).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # heavy tier: see pytest.ini

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r'''
import json, os, sys
import numpy as np

sys.path.insert(0, %(repo)r)
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['JAX_PLATFORM_NAME'] = 'cpu'

import jax
jax.config.update('jax_platforms', 'cpu')

pid = int(sys.argv[1])
port = sys.argv[2]
out_dir = sys.argv[3]
jax.distributed.initialize(coordinator_address='127.0.0.1:' + port,
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid

from captioning_tpu.parallel.mesh import (gather_predictions,
                                          local_batch_slice,
                                          object_allgather)
from jax.experimental import multihost_utils

# --- local_batch_slice: each process takes its strided half ---------------
global_batch = list(range(8))
sl = local_batch_slice(len(global_batch))
local = global_batch[sl]
assert local == ([0, 1, 2, 3] if pid == 0 else [4, 5, 6, 7]), local

# --- gather_predictions: DIFFERENT-SIZED pickled objects over a real
# collective (padding + size exchange must both work) ----------------------
preds = [{'image_id': i, 'caption': 'proc%%d cap %%d' %% (pid, i),
          'perplexity': float(i) / 7.0}
         for i in local[: 3 + pid]]   # proc0 sends 3, proc1 sends 4
merged = gather_predictions(preds)
assert len(merged) == 7, len(merged)
assert [p['image_id'] for p in merged] == [0, 1, 2, 4, 5, 6, 7], merged

# --- object_allgather directly: arbitrary nested object -------------------
objs = object_allgather({'pid': pid, 'note': 'x' * (10 + 100 * pid)},
                        multihost_utils.process_allgather)
assert [o['pid'] for o in objs] == [0, 1]
assert len(objs[1]['note']) == 110

# --- a numeric allgather confirms the cross-process data path -------------
total = multihost_utils.process_allgather(np.float32(pid + 1)).sum()
assert float(total) == 3.0, total

if pid == 0:
    with open(os.path.join(out_dir, 'merged.json'), 'w') as f:
        json.dump(merged, f)
print('worker %%d OK' %% pid)
'''


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_gather_real_collective(tmp_path):
    worker = tmp_path / 'worker.py'
    worker.write_text(WORKER % {'repo': REPO})
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS='cpu', PYTHONPATH=REPO)
    env.pop('XLA_FLAGS', None)  # one device per process
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), str(port), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, 'worker %d failed:\n%s' % (pid, out[-3000:])
        assert 'worker %d OK' % pid in out
    merged = json.load(open(tmp_path / 'merged.json'))
    assert [m['image_id'] for m in merged] == [0, 1, 2, 4, 5, 6, 7]
    # pickled floats survive the byte round trip exactly
    assert merged[1]['perplexity'] == 1.0 / 7.0
