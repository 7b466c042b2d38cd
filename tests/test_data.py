"""Data layer tests: HybridLoader backends, collate contract, resumable
sampler (the reference had none of these — SURVEY.md section 4)."""

import numpy as np
import pytest

from tests.util_synth import build_synthetic_dataset, make_opt


@pytest.fixture(scope='module')
def ds(tmp_path_factory):
    return build_synthetic_dataset(str(tmp_path_factory.mktemp('synth')))


def test_collate_contract(ds):
    from captioning_tpu.data.dataset import DataLoader
    opt = make_opt(ds)
    loader = DataLoader(opt)
    data = loader.get_batch('train')
    B, spi, L2 = data['labels'].shape
    assert B == 4 and spi == 2 and L2 == ds.seq_length + 2
    # bos/eos zeros
    assert (data['labels'][:, :, 0] == 0).all()
    assert (data['labels'][:, :, -1] == 0).all()
    # masks count tokens + 2
    nz = (data['labels'].reshape(B * spi, L2) != 0).sum(1)
    assert (data['masks'].reshape(B * spi, L2).sum(1) == nz + 2).all()
    # att mask marks the valid prefix
    assert data['att_feats'].shape[0] == B
    assert data['att_masks'].shape == data['att_feats'].shape[:2]
    valid = data['att_masks'].sum(1).astype(int)
    for i in range(B):
        assert np.abs(data['att_feats'][i, valid[i]:]).sum() == 0
    # gts present for reward computation
    assert len(data['gts']) == B
    assert data['gts'][0].ndim == 2


def test_fc_fallback_to_att_mean(ds):
    from captioning_tpu.data.dataset import Dataset
    opt = make_opt(ds, 'updown')  # loads both fc and att streams
    opt.input_fc_dir = '/nonexistent'
    d = Dataset(opt)
    fc, att, seq, ix, pos, wrapped = d.get_item((0, 1, False))
    assert np.allclose(fc, att.mean(0))


def test_sampler_resume_exact(ds):
    # Within an epoch, a loader restored from state_dict must continue
    # with exactly the same indices (reference dataloader.py:355-368
    # semantics, minus the private-field prefetch compensation).
    from captioning_tpu.data.dataset import DataLoader
    opt = make_opt(ds)
    loader = DataLoader(opt)
    loader.get_batch('train')
    state = loader.state_dict()
    next_batch = [i['ix'] for i in loader.get_batch('train')['infos']]
    loader2 = DataLoader(opt)
    loader2.load_state_dict(state)
    resumed = [i['ix'] for i in loader2.get_batch('train')['infos']]
    assert next_batch == resumed


def test_val_split_wraps_on_exhaustion(ds):
    from captioning_tpu.data.dataset import DataLoader
    opt = make_opt(ds)
    loader = DataLoader(opt)
    n_val = len(loader.dataset.split_ix['val'])
    seen = 0
    wrapped = False
    for _ in range(10):
        b = loader.get_batch('val')
        seen += len(b['infos'])
        if seen >= n_val:
            wrapped = True
            break
    assert wrapped


def test_hybrid_loader_h5_and_dir(ds, tmp_path):
    import h5py
    from captioning_tpu.data.hybrid_loader import HybridLoader
    # dir backend
    hl = HybridLoader(ds.input_fc_dir, '.npy')
    x = hl.get('1000')
    assert x.shape == (ds.fc_dim,)
    # h5 backend
    h5p = str(tmp_path / 'feats.h5')
    with h5py.File(h5p, 'w') as f:
        f.create_dataset('1000', data=np.arange(5, dtype='float32'))
    hl2 = HybridLoader(h5p, '.npy')
    assert np.allclose(hl2.get('1000'), np.arange(5))
    # in-memory caching path
    hl3 = HybridLoader(ds.input_att_dir, '.npz', in_memory=True)
    a = hl3.get('1000')
    b = hl3.get('1000')
    assert np.allclose(a, b)


def test_initial_loader_state_not_advanced_by_prefetch(ds):
    """The state saved BEFORE any batch is consumed must be the fresh
    sampler state: the background producer prefetches immediately, and a
    snapshot taken after it started would record a mid-epoch position —
    a checkpoint saved before the first eval would then resume the val
    split a few batches in, silently evaluating the wrong images."""
    from captioning_tpu.data.dataset import DataLoader
    loader = DataLoader(make_opt(ds))
    st = loader.state_dict()
    for split in ('train', 'val', 'test'):
        assert st[split]['iter_counter'] == 0, split
    # reset_iterator restores a fresh pre-consumption state too
    loader.get_batch('val')
    assert loader.state_dict()['val']['iter_counter'] > 0
    loader.reset_iterator('val')
    assert loader.state_dict()['val']['iter_counter'] == 0
    # and the restored state round-trips through a new loader: both see
    # the same first val batch
    ids_a = [i['id'] for i in loader.get_batch('val')['infos']]
    fresh = DataLoader(make_opt(ds))
    ids_b = [i['id'] for i in fresh.get_batch('val')['infos']]
    assert ids_a == ids_b
