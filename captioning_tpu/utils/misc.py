"""Misc utilities: sequence decode, length penalties, checkpoint I/O.

TPU-native counterparts of ``/root/reference/captioning/utils/misc.py``.
Model/optimizer state are JAX pytrees saved as flat ``.npz`` archives
(``model.npz`` / ``optimizer.npz``) next to the reference-compatible
``infos_<id>.pkl`` / ``histories_<id>.pkl`` pickles, preserving the
artifact contract (misc.py:87-102) so tools/eval.py semantics carry over.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict

import numpy as np

bad_endings = ['with', 'in', 'on', 'of', 'a', 'at', 'to', 'for', 'an',
               'this', 'his', 'her', 'that', 'the']


def pickle_load(f):
    return pickle.load(f, encoding='latin-1')


def pickle_dump(obj, f):
    return pickle.dump(obj, f, protocol=2)


def decode_sequence(ix_to_word, seq):
    """Turn an [N, D] id array into strings (reference misc.py:62-84).

    Stops at the first 0 token; strips BPE '@@ ' joiners; honours the
    REMOVE_BAD_ENDINGS env toggle used by eval.
    """
    seq = np.asarray(seq)
    N, D = seq.shape
    out = []
    for i in range(N):
        txt = ''
        for j in range(D):
            ix = int(seq[i, j])
            if ix > 0:
                if j >= 1:
                    txt = txt + ' '
                txt = txt + ix_to_word[str(ix)]
            else:
                break
        if int(os.getenv('REMOVE_BAD_ENDINGS', '0')):
            flag = 0
            words = txt.split(' ')
            for j in range(len(words)):
                if words[-j - 1] not in bad_endings:
                    flag = -j
                    break
            txt = ' '.join(words[0:len(words) + flag])
        out.append(txt.replace('@@ ', ''))
    return out


def penalty_builder(penalty_config):
    """Beam length penalties (reference misc.py:133-157)."""
    if penalty_config == '':
        return lambda x, y: y
    pen_type, alpha = penalty_config.split('_')
    alpha = float(alpha)
    if pen_type == 'wu':
        return lambda x, y: length_wu(x, y, alpha)
    if pen_type == 'avg':
        return lambda x, y: length_average(x, y, alpha)
    raise ValueError('unknown length penalty %s' % penalty_config)


def length_wu(length, logprobs, alpha=0.):
    modifier = ((5 + length) ** alpha) / ((5 + 1) ** alpha)
    return logprobs / modifier


def length_average(length, logprobs, alpha=0.):
    return logprobs / length


# ---------------------------------------------------------------------------
# pytree <-> npz checkpoint I/O
# ---------------------------------------------------------------------------

def _flatten_tree(tree: Any, prefix: str = '') -> Dict[str, np.ndarray]:
    """Flatten a nested dict/list pytree of arrays into {path: array}."""
    flat: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(_flatten_tree(v, prefix + str(k) + '/'))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            flat.update(_flatten_tree(v, prefix + '#%d/' % i))
    elif tree is None:
        flat[prefix + '@none'] = np.zeros((), dtype=np.int8)
    else:
        flat[prefix.rstrip('/')] = np.asarray(tree)
    return flat


def _unflatten_tree(flat: Dict[str, np.ndarray]) -> Any:
    root: Dict[str, Any] = {}
    for path, arr in flat.items():
        parts = path.split('/')
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr

    def rebuild(node):
        if not isinstance(node, dict):
            return node
        if '@none' in node and len(node) == 1:
            return None
        keys = list(node.keys())
        if keys and all(k.startswith('#') for k in keys):
            items = sorted(((int(k[1:]), v) for k, v in node.items()))
            return [rebuild(v) for _, v in items]
        return {k: rebuild(v) for k, v in node.items()}

    return rebuild(root)


def save_pytree(tree: Any, path: str) -> None:
    import jax
    tree = jax.device_get(tree)
    np.savez(path, **_flatten_tree(tree))


def load_pytree(path: str) -> Any:
    with np.load(path, allow_pickle=False) as data:
        flat = {k: data[k] for k in data.files}
    return _unflatten_tree(flat)


def save_checkpoint(opt, params, infos, opt_state, histories=None, append=''):
    """Reference artifact contract (misc.py:87-102) with npz tensors."""
    if len(append) > 0:
        append = '-' + append
    if not os.path.isdir(opt.checkpoint_path):
        os.makedirs(opt.checkpoint_path)
    checkpoint_path = os.path.join(opt.checkpoint_path, 'model%s.npz' % append)
    save_pytree(params, checkpoint_path)
    print("model saved to {}".format(checkpoint_path))
    if opt_state is not None:
        optimizer_path = os.path.join(opt.checkpoint_path, 'optimizer%s.npz' % append)
        save_pytree(opt_state, optimizer_path)
    with open(os.path.join(opt.checkpoint_path, 'infos_' + opt.id + '%s.pkl' % append), 'wb') as f:
        pickle_dump(infos, f)
    if histories:
        with open(os.path.join(opt.checkpoint_path, 'histories_' + opt.id + '%s.pkl' % append), 'wb') as f:
            pickle_dump(histories, f)


def honor_jax_platforms_env():
    """Re-apply the JAX_PLATFORMS env var over site-level overrides.

    Hosted TPU images may register their PJRT plugin from sitecustomize
    and force ``jax_platforms`` to the accelerator (clobbering the env
    var), so ``JAX_PLATFORMS=cpu python tools/train.py`` would silently
    target — or, with an unhealthy accelerator tunnel, hang on — the
    device the user explicitly opted out of.  The CLIs call this right
    after importing jax: an explicit env var wins."""
    plats = os.environ.get('JAX_PLATFORMS')
    if plats:
        import jax
        jax.config.update('jax_platforms', plats)


def set_rng_impl(impl: str):
    """Select the JAX PRNG implementation (opts --rng_impl).

    'rbg' (default) uses the hardware-friendly counter generator: dropout
    mask generation is ~6x cheaper than threefry2x32 on TPU (XE train step
    ~1.4x faster end-to-end, tools/bench_xe_parts.py).  Streams differ
    between implementations, so fix one impl when comparing runs."""
    if not impl:
        return
    import jax
    jax.config.update('jax_default_prng_impl', impl)


def enable_compilation_cache(cache_dir: str):
    """Persistent XLA compilation cache (opts --compilation_cache_dir).

    The batched decode programs compile in minutes cold but load in
    seconds once cached; pointing every run of a project at one directory
    amortizes that across train/eval invocations.
    """
    if not cache_dir:
        return
    import jax
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
