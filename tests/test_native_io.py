"""Native batch loader (native/dataio.cpp) parity with the Python item path.

The fast path must be byte-identical to pool.map(get_item)+collate for every
array in the batch dict (reference semantics: dataloader.py:182-299), across
npy/npz backends, compressed members, f8 dtypes, and the fc->att-mean
fallback; ineligible or failing datasets must fall back transparently.
"""

import os
import shutil

import numpy as np
import pytest

from captioning_tpu.data import native_io
from captioning_tpu.data.dataset import DataLoader
from tests.util_synth import build_synthetic_dataset, make_opt

pytestmark = pytest.mark.skipif(not native_io.available(),
                                reason='libdataio not buildable')


def _batches_equal(a, b):
    for key in ['fc_feats', 'att_feats', 'att_masks', 'labels', 'masks']:
        np.testing.assert_array_equal(a[key], b[key], err_msg=key)
        assert a[key].dtype == b[key].dtype, key
    assert a['bounds'] == b['bounds']
    assert a['infos'] == b['infos']
    assert len(a['gts']) == len(b['gts'])
    for ga, gb in zip(a['gts'], b['gts']):
        np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))


def _compare_loaders(ds, n_batches=4, **kw):
    # updown: an att-consuming family (use_att=1), like the production
    # bottom-up pipelines; fc-only models legitimately skip the native path
    native = DataLoader(make_opt(ds, 'updown', native_io=1, **kw))
    python = DataLoader(make_opt(ds, 'updown', native_io=0, **kw))
    assert native.dataset.native_io is not None, 'native path not engaged'
    assert python.dataset.native_io is None
    for split in ['train', 'val']:
        for _ in range(n_batches):
            _batches_equal(native.get_batch(split), python.get_batch(split))
    assert native.dataset.native_io is not None, 'native path fell back'


def test_parity_npz_stored(tmp_path):
    ds = build_synthetic_dataset(str(tmp_path), n_images=14, seed=3)
    _compare_loaders(ds)


def test_parity_fc_missing_mean_fallback(tmp_path):
    # fc_dim == att_dim: the att-mean fallback only type-checks when the
    # dims agree (true for bottom-up 2048/2048; both paths raise otherwise)
    ds = build_synthetic_dataset(str(tmp_path), n_images=14, seed=4,
                                 fc_dim=12, att_dim=12)
    # drop half the fc files: those images take the att-mean fallback
    for i, f in enumerate(sorted(os.listdir(ds.input_fc_dir))):
        if i % 2 == 0:
            os.remove(os.path.join(ds.input_fc_dir, f))
    _compare_loaders(ds)


def test_parity_npy_and_compressed_and_f8(tmp_path):
    ds = build_synthetic_dataset(str(tmp_path), n_images=14, seed=5)
    files = sorted(os.listdir(ds.input_att_dir))
    # rewrite att features across the three on-disk variants the loader
    # supports: deflated npz, and (via a fresh dir) f8 payloads
    for i, f in enumerate(files):
        path = os.path.join(ds.input_att_dir, f)
        feat = np.load(path)['feat']
        if i % 3 == 0:
            np.savez_compressed(path, feat=feat)
        elif i % 3 == 1:
            np.savez(path, feat=feat.astype('float64'))
    _compare_loaders(ds)


def test_ineligible_use_box_falls_back(tmp_path):
    ds = build_synthetic_dataset(str(tmp_path), n_images=10, seed=6)
    loader = DataLoader(make_opt(ds, 'updown', native_io=1, use_box=1))
    assert loader.dataset.native_io is None


def test_corrupt_att_falls_back_to_python(tmp_path, capsys):
    ds = build_synthetic_dataset(str(tmp_path), n_images=10, seed=7)
    f = sorted(os.listdir(ds.input_att_dir))[0]
    with open(os.path.join(ds.input_att_dir, f), 'wb') as fh:
        fh.write(b'not a zip')
    native = DataLoader(make_opt(ds, 'updown', native_io=1))
    python = DataLoader(make_opt(ds, 'updown', native_io=0))
    # the bad file makes the Python path raise too; both paths must keep
    # working on batches that avoid it.  Corrupt only hits 'train' when its
    # image is drawn; use val/test splits which exclude image 0 here.
    for _ in range(2):
        _batches_equal(native.get_batch('val'), python.get_batch('val'))


def test_direct_api_scan_and_load(tmp_path):
    d = tmp_path / 'feats'
    d.mkdir()
    rng = np.random.RandomState(0)
    rows = [3, 7, 1]
    paths = []
    for i, r in enumerate(rows):
        p = str(d / ('%d.npy' % i))
        np.save(p, rng.randn(r, 5).astype('float32'))
        paths.append(p)
    nio = native_io.NativeBatchLoader(feat_dim=5, fc_dim=4, nthreads=2)
    got = nio.scan_rows(paths)
    np.testing.assert_array_equal(got, rows)
    att, fc, fc_ok = nio.load(paths, pad_len=8, fc_paths=[None] * 3)
    assert att.shape == (3, 8, 5)
    assert not fc_ok.any()
    for i, p in enumerate(paths):
        ref = np.load(p)
        np.testing.assert_array_equal(att[i, :rows[i]], ref)
        assert (att[i, rows[i]:] == 0).all()
    # trailing-dim mismatch is a hard error, not a silent reshape
    with pytest.raises(RuntimeError):
        native_io.NativeBatchLoader(feat_dim=3, fc_dim=4).scan_rows(paths)


def test_npz_without_feat_or_z_member_errors(tmp_path):
    """An npz with neither 'feat.npy' nor 'z.npy' must error (routing the
    batch to the Python path, which raises KeyError in _load_npz) — never
    silently decode an arbitrary first member."""
    d = tmp_path / 'feats'
    d.mkdir()
    p = str(d / 'x.npz')
    np.savez(p, np.random.RandomState(0).randn(3, 5).astype('float32'))
    nio = native_io.NativeBatchLoader(feat_dim=5, fc_dim=4)
    with pytest.raises(RuntimeError, match="neither 'feat.npy' nor 'z.npy'"):
        nio.scan_rows([p])


def test_f8_att_mean_fallback_routes_to_python(tmp_path):
    """f8 att with a MISSING fc file: the Python path means in f8 before the
    f32 cast, which the f32-buffer native mean cannot reproduce bit-for-bit,
    so the native loader must refuse (whole batch falls back)."""
    d = tmp_path / 'feats'
    d.mkdir()
    p = str(d / 'y.npy')
    np.save(p, np.random.RandomState(0).randn(3, 5).astype('float64'))
    nio = native_io.NativeBatchLoader(feat_dim=5, fc_dim=4)
    np.testing.assert_array_equal(nio.scan_rows([p]), [3])
    with pytest.raises(RuntimeError, match='f4'):
        nio.load([p], pad_len=4, fc_paths=[str(d / 'missing_fc.npy')])
    # with fc PRESENT the f8 att path stays native (parity holds: the mean
    # is never taken)
    fcp = str(d / 'fc.npy')
    np.save(fcp, np.random.RandomState(1).randn(4).astype('float32'))
    att, fc, fc_ok = nio.load([p], pad_len=4, fc_paths=[fcp])
    assert fc_ok.all()
    np.testing.assert_array_equal(
        att[0, :3], np.load(p).astype('float32'))
