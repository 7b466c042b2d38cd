"""Simulated multi-host (multi-process) path.

Real multi-process JAX needs multiple hosts; here two "processes" are
simulated with threads running the production code in lockstep against a
barrier-based fake of ``multihost_utils.process_allgather``. This
exercises the serialize/pad/gather/deserialize pipeline of
``gather_predictions`` and the input-sharding contract of
``local_batch_slice`` exactly as eval_split uses them (mirroring the
reference's DDP eval merge, train_pl.py:224-276).
"""

import threading

import numpy as np
import pytest

from captioning_tpu.parallel.mesh import (gather_predictions,
                                          local_batch_slice,
                                          object_allgather)

pytestmark = pytest.mark.slow  # heavy tier: see pytest.ini


class LockstepAllgather:
    """Barrier-synchronized allgather over n simulated processes."""

    def __init__(self, n):
        self.n = n
        self._barrier = threading.Barrier(n)
        self._lock = threading.Lock()
        self._slots = {}
        self._round = 0
        self._result = None

    def for_process(self, pid):
        def allgather(x):
            with self._lock:
                self._slots[pid] = np.asarray(x)
            self._barrier.wait()
            with self._lock:
                if self._result is None:
                    self._result = np.stack(
                        [self._slots[p] for p in range(self.n)])
            self._barrier.wait()
            out = self._result
            self._barrier.wait()
            with self._lock:
                if self._result is not None:
                    self._result = None
                    self._slots = {}
            self._barrier.wait()
            return out
        return allgather


def _run_processes(n, fn):
    """Run fn(pid) on n threads; returns per-pid results, re-raises errors."""
    results = [None] * n
    errors = []

    def worker(pid):
        try:
            results[pid] = fn(pid)
        except BaseException as e:  # noqa: BLE001 — surface to main thread
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(p,)) for p in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    if errors:
        raise errors[0]
    return results


def test_object_allgather_roundtrip():
    comm = LockstepAllgather(2)
    objs = [[{'image_id': 1, 'caption': 'a man riding a horse'}],
            [{'image_id': 2, 'caption': 'two dogs'},
             {'image_id': 3, 'caption': 'a cat'}]]

    def fn(pid):
        return object_allgather(objs[pid], comm.for_process(pid))

    out = _run_processes(2, fn)
    # every process sees every process's object, ordered by pid
    assert out[0] == objs and out[1] == objs


def test_gather_predictions_merges_in_pid_order():
    comm = LockstepAllgather(2)
    # global batch split across 2 hosts by local_batch_slice
    global_preds = [{'image_id': i, 'caption': 'cap %d' % i,
                     'perplexity': float(i)} for i in range(8)]
    sl = {}
    for pid in range(2):
        sl[pid] = slice(pid * 4, (pid + 1) * 4)  # what local_batch_slice gives

    def fn(pid):
        local = global_preds[sl[pid]]
        return gather_predictions(local, _allgather=comm.for_process(pid))

    out = _run_processes(2, fn)
    assert out[0] == global_preds  # full merged list on every host
    assert out[1] == global_preds


def test_local_batch_slice_partition(monkeypatch):
    import jax
    monkeypatch.setattr(jax, 'process_count', lambda: 4)
    slices = []
    for pid in range(4):
        monkeypatch.setattr(jax, 'process_index', lambda p=pid: p)
        slices.append(local_batch_slice(16))
    # contiguous, disjoint, covering
    idx = np.arange(16)
    parts = [idx[s] for s in slices]
    assert [p.size for p in parts] == [4, 4, 4, 4]
    assert (np.concatenate(parts) == idx).all()
    # a non-divisible batch still covers every row (remainder spread over
    # the first hosts — dropped rows would silently truncate eval merges)
    slices = []
    for pid in range(4):
        monkeypatch.setattr(jax, 'process_index', lambda p=pid: p)
        slices.append(local_batch_slice(10))
    idx = np.arange(10)
    parts = [idx[s] for s in slices]
    assert [p.size for p in parts] == [3, 3, 2, 2]
    assert (np.concatenate(parts) == idx).all()


def test_eval_split_merge_path(monkeypatch):
    """Drive the eval_split prediction merge the way a 2-host run would:
    each host evaluates its local slice, then gather_predictions produces
    the same full list everywhere (reference train_pl.py:224-276)."""
    comm = LockstepAllgather(2)
    preds_by_host = [
        [{'image_id': 10, 'caption': 'w1 w2', 'perplexity': 2.0,
          'entropy': 1.0}],
        [{'image_id': 11, 'caption': 'w3', 'perplexity': 1.0,
          'entropy': 1.0}],
    ]

    def fn(pid):
        merged = gather_predictions(preds_by_host[pid],
                                    _allgather=comm.for_process(pid))
        # eval_split sorts n_predictions by perplexity after the gather
        return sorted(merged, key=lambda x: x['perplexity'])

    out = _run_processes(2, fn)
    assert out[0] == out[1]
    assert [p['image_id'] for p in out[0]] == [11, 10]
