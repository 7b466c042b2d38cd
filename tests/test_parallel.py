"""Multi-device sharding tests on the virtual 8-CPU mesh (the stand-in for
real TPU slices, SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from captioning_tpu.parallel.mesh import (make_mesh, shard_batch,
                                          shard_variables)

pytestmark = pytest.mark.slow  # heavy tier: see pytest.ini


@pytest.fixture(scope='module')
def small_transformer():
    import __graft_entry__ as ge
    cap, opt = ge._small_transformer()
    variables = cap.init_params(jax.random.PRNGKey(0), att_len=8)
    return cap, opt, variables


def _batch(B, seed=0):
    rng = np.random.RandomState(seed)
    return {
        'fc': rng.randn(B, 16).astype('float32'),
        'att': rng.randn(B, 8, 16).astype('float32'),
        'am': np.ones((B, 8), 'float32'),
        'labels': rng.randint(0, 60, (B, 2, 10)).astype('int32'),
        'masks': np.ones((B, 2, 10), 'float32'),
    }


def _mk_trainer(cap, opt):
    from captioning_tpu.modules.trainer import Trainer
    opt.optim = 'adam'
    opt.optim_alpha, opt.optim_beta, opt.optim_epsilon = 0.9, 0.999, 1e-8
    opt.weight_decay = 0
    opt.grad_clip_mode, opt.grad_clip_value = 'value', 0.1
    opt.label_smoothing = 0
    opt.noamopt = False
    opt.drop_worst_rate = 0
    return Trainer(cap, opt)


def test_requires_8_devices():
    assert len(jax.devices()) >= 8, \
        'conftest must force xla_force_host_platform_device_count=8'


def test_dp_xe_step_matches_single_device(small_transformer):
    cap, opt, variables = small_transformer
    trainer = _mk_trainer(cap, opt)
    batch = _batch(8)
    rng = jax.random.PRNGKey(3)

    # train steps donate their variables; use fresh copies per run
    def copy(tree):
        return jax.tree.map(lambda x: jnp.array(x), tree)

    # single-device result (fresh trainer to avoid cache/donation aliasing)
    t1 = _mk_trainer(cap, opt)
    os1 = t1.init_opt_state(variables)
    v1, os1b, out1 = t1.xe_step(
        copy(variables), os1, jnp.asarray(batch['fc']), jnp.asarray(batch['att']),
        jnp.asarray(batch['labels']), jnp.asarray(batch['masks']),
        jnp.asarray(batch['am']), 1e-3, 0.0, rng)

    # 8-way data parallel
    mesh = make_mesh('data:8')
    t2 = _mk_trainer(cap, opt)
    with mesh:
        v_sh = shard_variables(copy(variables), mesh)
        os2 = shard_variables(t2.init_opt_state(variables), mesh)
        b_sh = shard_batch(batch, mesh)
        v2, os2b, out2 = t2.xe_step(
            v_sh, os2, b_sh['fc'], b_sh['att'], b_sh['labels'],
            b_sh['masks'], b_sh['am'], 1e-3, 0.0, rng)

    assert np.allclose(float(out1['loss']), float(out2['loss']), atol=1e-5)
    # updated params agree up to cross-device reduction order (adam's
    # rsqrt amplifies float addition-order noise at step 1)
    l1 = jax.tree.leaves(jax.device_get(v1))
    l2 = jax.tree.leaves(jax.device_get(v2))
    for a, b in zip(l1, l2):
        assert np.allclose(a, b, atol=2e-3)


def test_tp_vocab_sharding_decode(small_transformer):
    cap, opt, variables = small_transformer
    mesh = make_mesh('data:4,model:2')
    beam_opt = {'beam_size': 3, 'sample_n': 1, 'group_size': 1}
    B = 4
    rng = np.random.RandomState(1)
    fc = rng.randn(B, 16).astype('float32')
    att = rng.randn(B, 8, 16).astype('float32')
    am = np.ones((B, 8), 'float32')

    seq_ref, _, _ = cap.sample_beam_jit(
        variables, jnp.asarray(fc), jnp.asarray(att), jnp.asarray(am),
        jax.random.PRNGKey(0), beam_opt)

    with mesh:
        v_sh = shard_variables(variables, mesh)
        b = shard_batch({'fc': fc, 'att': att, 'am': am}, mesh)
        # fresh jit cache so shardings propagate
        cap._jit_cache.clear()
        seq_tp, _, _ = cap.sample_beam_jit(
            v_sh, b['fc'], b['att'], b['am'], jax.random.PRNGKey(0),
            beam_opt)
    assert (np.asarray(seq_ref) == np.asarray(seq_tp)).all()


def test_dryrun_multichip_entry():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_mesh_sharded_eval_decode_matches_single_device(small_transformer):
    """eval_split --device_mesh: decoding a batch sharded over the 8-device
    data mesh (with padding to a device multiple) must produce the same
    captions as the unsharded path."""
    from captioning_tpu.parallel.mesh import replicate
    cap, opt, variables = small_transformer
    b = _batch(6, seed=4)   # 6 rows -> pads to 8 on the mesh
    fc, att, am = (jnp.asarray(b['fc']), jnp.asarray(b['att']),
                   jnp.asarray(b['am']))
    so = {'beam_size': 3, 'sample_n': 1, 'group_size': 1}
    seq_ref, _, _ = cap.sample_beam_jit(variables, fc, att, am,
                                        jax.random.PRNGKey(5), so,
                                        want_logps=False)
    seq_ref = np.asarray(seq_ref)

    mesh = make_mesh('')
    n_dev = mesh.devices.size
    var_r = replicate(variables, mesh)
    pad = (-fc.shape[0]) % n_dev
    fc_p = jnp.concatenate([fc, jnp.repeat(fc[:1], pad, 0)], 0)
    att_p = jnp.concatenate([att, jnp.repeat(att[:1], pad, 0)], 0)
    am_p = jnp.concatenate([am, jnp.repeat(am[:1], pad, 0)], 0)
    sharded = shard_batch({'fc': fc_p, 'att': att_p, 'am': am_p}, mesh)
    seq_m, _, _ = cap.sample_beam_jit(var_r, sharded['fc'], sharded['att'],
                                      sharded['am'], jax.random.PRNGKey(5),
                                      so, want_logps=False)
    seq_m = np.asarray(seq_m)[:fc.shape[0]]
    assert (seq_m == seq_ref).all()


def test_eval_split_device_mesh_flag(small_transformer, tmp_path,
                                     monkeypatch):
    """--device_mesh in eval_split pads ragged batches, shards them, and
    reports one caption per real image."""
    from captioning_tpu.utils import eval_utils

    cap, opt, variables = small_transformer

    class FakeLoader:
        def __init__(self):
            self.batches = [_batch(6, seed=7)]
            self.i = 0

        def reset_iterator(self, split):
            self.i = 0

        def get_vocab(self):
            return {str(i): 'w%d' % i for i in range(1, 64)}

        def get_batch(self, split):
            b = self.batches[self.i]
            self.i += 1
            return {
                'fc_feats': b['fc'], 'att_feats': b['att'],
                'att_masks': b['am'], 'labels': None, 'masks': None,
                'infos': [{'id': k} for k in range(6)],
                'bounds': {'it_max': 6, 'wrapped': True},
            }

    monkeypatch.chdir(tmp_path)
    loss, preds, _ = eval_utils.eval_split(
        cap, variables, FakeLoader(),
        {'device_mesh': 1, 'beam_size': 3, 'num_images': 6,
         'language_eval': 0, 'verbose': False, 'verbose_loss': 0,
         'dataset': 'custom'})
    assert len(preds) == 6
    assert all(isinstance(p['caption'], str) for p in preds)
