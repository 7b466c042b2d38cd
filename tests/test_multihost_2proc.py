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

import numpy as np
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


# ---------------------------------------------------------------------------
# REAL 2-process tools/train.py CLI run (VERDICT round-4 item 3): the full
# user-launchable multi-host path — jax.distributed.initialize from
# --dist_coordinator flags, global data mesh, per-host local_batch_slice
# feeding, cooperative multi-host eval_split, host-0-only checkpointing —
# with loss parity against the identical single-process run.
# (reference equivalent: Lightning DDP launch, train_pl.py:458-499)
# ---------------------------------------------------------------------------

TRAIN_WORKER = r'''
import os, sys
sys.path.insert(0, %(repo)r)
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['JAX_PLATFORM_NAME'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')

from tests.util_synth import build_synthetic_dataset, make_opt
from tools.train import train

ds = build_synthetic_dataset(%(ds_root)r)
extra = %(extra)r
opt = make_opt(ds, 'newfc', max_epochs=1, checkpoint_path=%(ckpt)r,
               save_checkpoint_every=3, language_eval=0, val_images_use=4,
               id='mh', losses_log_every=1, drop_prob_lm=0.0,
               num_data_threads=1, num_prefetch=1)
for k, v in extra.items():
    setattr(opt, k, v)
os.chdir(os.path.dirname(%(ckpt)r))
train(opt)
print('train worker done pid=%%d' %% jax.process_index())
'''


def _run_train(repo, ds_root, ckpt, extra, env_extra, timeout=600):
    import tempfile
    with tempfile.NamedTemporaryFile('w', suffix='.py', delete=False) as f:
        f.write(TRAIN_WORKER % {'repo': repo, 'ds_root': ds_root,
                                'ckpt': ckpt, 'extra': extra})
        path = f.name
    env = dict(os.environ, JAX_PLATFORMS='cpu', PYTHONPATH=repo,
               **env_extra)
    env.pop('XLA_FLAGS', None)  # one CPU device per process
    return subprocess.Popen([sys.executable, path], env=env,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)


def test_two_process_train_cli_parity(tmp_path):
    import pickle

    from tests.util_synth import build_synthetic_dataset

    ds_root = str(tmp_path / 'synth')
    # pre-build: the workers' build_synthetic_dataset calls then reuse it
    # (idempotent marker) instead of racing to rewrite the same files
    build_synthetic_dataset(ds_root)

    # --- single-process reference run -------------------------------------
    ckpt1 = str(tmp_path / 'log_single')
    os.makedirs(ckpt1, exist_ok=True)
    p = _run_train(REPO, ds_root, ckpt1, {}, {})
    out, _ = p.communicate(timeout=900)
    assert p.returncode == 0, 'single-proc run failed:\n%s' % out[-3000:]

    # --- 2-process run: same config + --dist_* flags -----------------------
    ckpt2 = str(tmp_path / 'log_multi')
    os.makedirs(ckpt2, exist_ok=True)
    port = _free_port()
    procs = [_run_train(
        REPO, ds_root, ckpt2,
        {'dist_coordinator': '127.0.0.1:%d' % port, 'dist_nproc': 2,
         'dist_pid': pid}, {})
        for pid in range(2)]
    outs = [pr.communicate(timeout=900)[0] for pr in procs]
    for pid, (pr, out) in enumerate(zip(procs, outs)):
        assert pr.returncode == 0, \
            '2-proc worker %d failed:\n%s' % (pid, out[-4000:])
    assert 'multi-host: process 0/2' in outs[0] + outs[1]

    # --- parity: per-iteration losses + val loss + predictions ------------
    with open(os.path.join(ckpt1, 'histories_mh.pkl'), 'rb') as f:
        h1 = pickle.load(f, encoding='latin-1')
    with open(os.path.join(ckpt2, 'histories_mh.pkl'), 'rb') as f:
        h2 = pickle.load(f, encoding='latin-1')
    assert sorted(h1['loss_history']) == sorted(h2['loss_history'])
    for it in h1['loss_history']:
        np.testing.assert_allclose(h1['loss_history'][it],
                                   h2['loss_history'][it],
                                   rtol=2e-4, atol=2e-5)
    v1 = h1['val_result_history']
    v2 = h2['val_result_history']
    assert sorted(v1) == sorted(v2) and len(v1) >= 1
    for it in v1:
        np.testing.assert_allclose(v1[it]['loss'], v2[it]['loss'],
                                   rtol=2e-4, atol=2e-5)
        caps1 = {p['image_id']: p['caption'] for p in v1[it]['predictions']}
        caps2 = {p['image_id']: p['caption'] for p in v2[it]['predictions']}
        assert caps1 == caps2
    # host-0-only checkpoint writes produced the standard artifact set
    for fname in ('model.npz', 'infos_mh.pkl', 'optimizer.npz'):
        assert os.path.isfile(os.path.join(ckpt2, fname)), fname
