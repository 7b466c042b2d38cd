"""Device mesh + sharding rules.

The reference's parallelism surface is single-node DataParallel + Lightning
DDP (``/root/reference/tools/train.py:86-88``, ``train_pl.py:479-480``);
here it becomes a ``jax.sharding.Mesh`` with:

* ``data`` axis: batch sharding of every input (the only parallelism the
  workload requires for parity — SURVEY.md section 2.10); gradient psum is
  inserted by XLA over ICI.
* ``model`` axis (optional): tensor parallelism of the vocab projection
  (logit/generator kernel and tgt embedding sharded on the vocab dim) — a
  perf lever for the V~9.5k logit matmul in the per-token decode loop.

Multi-host: each process feeds its local shard of the batch
(``process_index``-strided slice of the global batch); host-side prediction
gather for language_eval uses ``multihost_utils.process_allgather``.
"""

from __future__ import annotations

import functools
import re

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape: str = '', devices=None) -> Mesh:
    """Parse "data:4,model:2" into a Mesh; default all devices on data."""
    devices = devices if devices is not None else jax.devices()
    if not mesh_shape:
        return Mesh(np.array(devices), ('data',))
    axes, sizes = [], []
    for part in mesh_shape.split(','):
        name, size = part.split(':')
        axes.append(name.strip())
        sizes.append(int(size))
    n = int(np.prod(sizes))
    assert n <= len(devices), \
        'mesh %s needs %d devices, have %d' % (mesh_shape, n, len(devices))
    dev = np.array(devices[:n]).reshape(sizes)
    return Mesh(dev, tuple(axes))


# param paths (joined with '/') whose LAST dim is the vocab dim -> shard on
# 'model' when present; these are the big vocab projections.
_VOCAB_OUT_PARAMS = re.compile(
    r'(logit/kernel|generator/kernel|tgt_embed)$')


def param_sharding_spec(path: str, mesh: Mesh, shape=None) -> P:
    model_size = mesh.shape.get('model', 1)
    if 'model' in mesh.axis_names and model_size > 1:
        if _VOCAB_OUT_PARAMS.search(path):
            # kernel [in, V] / embed [V, D]: shard the V dim (when divisible)
            if path.endswith('tgt_embed'):
                if shape is None or shape[0] % model_size == 0:
                    return P('model', None)
            elif shape is None or (len(shape) > 1 and
                                   shape[1] % model_size == 0):
                return P(None, 'model')
    return P()


def shard_variables(variables, mesh: Mesh):
    """Place params on the mesh (replicated except vocab-dim TP shards).

    Works on single- and multi-process meshes: multi-process placement
    goes through ``make_array_from_callback`` (every process passes the
    same full host value — true for seed-initialised or checkpoint-loaded
    params — and contributes its addressable shards)."""
    multiproc = jax.process_count() > 1

    def place(path_entries, x):
        path = '/'.join(str(getattr(p, 'key', getattr(p, 'idx', p)))
                        for p in path_entries)
        spec = param_sharding_spec(path, mesh, getattr(x, 'shape', None))
        sharding = NamedSharding(mesh, spec)
        if multiproc:
            arr = np.asarray(x)
            return jax.make_array_from_callback(
                arr.shape, sharding, lambda idx, a=arr: a[idx])
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map_with_path(place, variables)


def shard_batch(tree, mesh: Mesh):
    """Shard every array's leading (batch) dim on the data axis."""
    def place(x):
        if x is None:
            return None
        spec = P('data') if getattr(x, 'ndim', 0) >= 1 else P()
        return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))
    return jax.tree.map(place, tree)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: None if x is None else
        jax.device_put(x, NamedSharding(mesh, P())), tree)


def local_batch_slice(global_batch_size: int) -> slice:
    """This host's contiguous slice of the global batch (multi-host input
    sharding; replaces Lightning's per-GPU batch split train_pl.py:459).

    A remainder (batch not divisible by the process count) goes to the
    first ``rem`` hosts — every global row belongs to exactly one host, so
    nothing is silently dropped from an eval merge (the reference's
    DistributedSampler pads instead; here the uneven eval shapes are
    absorbed by the per-host pad in eval_split's _shard)."""
    n_proc = jax.process_count()
    per, rem = divmod(global_batch_size, n_proc)
    i = jax.process_index()
    start = i * per + min(i, rem)
    return slice(start, start + per + (1 if i < rem else 0))


def globalize_local(tree, mesh: Mesh, spec: P = P('data')):
    """Build GLOBAL (multi-host) arrays from per-process local shards.

    Each process passes the rows of its ``local_batch_slice`` — contiguous
    in process_index order, exactly how that helper slices the global batch
    — and gets back a jax.Array spanning the global mesh, sharded on the
    data axis.  Scalars / 0-d leaves are replicated.  This is the
    multi-host twin of ``shard_batch`` (which device_puts host-local
    arrays and is only correct single-process)."""
    def place(x):
        if x is None:
            return None
        x = np.asarray(x)
        s = spec if x.ndim >= 1 else P()
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, s), x)
    return jax.tree.map(place, tree)


def globalize_replicated(tree, mesh: Mesh):
    """Replicate identical per-process host arrays onto the global mesh.

    Every process must pass the SAME values (e.g. params initialised from
    a shared seed, or rewards recomputed identically per host)."""
    def place(x):
        if x is None:
            return None
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P()), np.asarray(x))
    return jax.tree.map(place, tree)


@functools.lru_cache(maxsize=8)
def _identity_replicated(mesh: Mesh):
    """Cached jitted identity that reshards every output leaf to fully-
    replicated on ``mesh`` (an XLA all-gather over ICI/DCN when the input
    was sharded; a no-op program when it was already replicated)."""
    return jax.jit(lambda t: t, out_shardings=NamedSharding(mesh, P()))


def replicate_tree(tree, mesh: Mesh):
    """Reshard a pytree of GLOBAL arrays to fully-replicated (async).

    After this every leaf is fully addressable on every process, so plain
    ``np.asarray`` works anywhere — the device->host story for outputs of
    multi-host jitted programs (decoded tokens, eval stats)."""
    return _identity_replicated(mesh)(tree)


def fetch_replicated(tree, mesh: Mesh):
    """Device -> host of multi-host global arrays on EVERY process.

    A data-sharded global array is not addressable from one host;
    resharding it to fully-replicated through a jitted identity (an XLA
    all-gather over ICI/DCN) makes the whole value local everywhere.
    Used by the host-reward SCST fallback to fetch decoded tokens and by
    the multi-host checkpoint path to materialize TP-sharded params."""
    return jax.tree.map(np.asarray, replicate_tree(tree, mesh))


def object_allgather(obj, allgather):
    """All-gather an arbitrary picklable object across processes.

    ``allgather(x)`` must be a lockstep collective returning x stacked over
    processes (production: multihost_utils.process_allgather). Objects are
    pickled to uint8 buffers and padded to the max size — the same
    serialize-to-tensor scheme as detectron2 comm.all_gather, which the
    reference uses for its DDP eval merge (train_pl.py:224-276,
    misc.py:47-58). Returns the per-process objects as a list.
    """
    import pickle
    data = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = np.asarray(allgather(np.array([data.size], np.int64)))
    sizes = sizes.reshape(-1)
    max_size = int(sizes.max())
    padded = np.zeros(max_size, np.uint8)
    padded[:data.size] = data
    bufs = np.asarray(allgather(padded)).reshape(len(sizes), max_size)
    return [pickle.loads(bufs[p, :int(sizes[p])].tobytes())
            for p in range(len(sizes))]


def gather_predictions(predictions, _allgather=None):
    """Host-side all-gather of per-process prediction lists (replaces
    detectron2 comm.gather, train_pl.py:224-276). Every host gets the
    full concatenated list, ordered by process index."""
    if _allgather is None:
        if jax.process_count() == 1:
            return predictions
        from jax.experimental import multihost_utils
        _allgather = multihost_utils.process_allgather
    per_proc = object_allgather(predictions, _allgather)
    merged = []
    for chunk in per_proc:
        merged.extend(chunk)
    return merged
