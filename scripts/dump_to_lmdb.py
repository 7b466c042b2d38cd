"""Repack per-image npy/npz feature dirs into an LMDB
(port of ``/root/reference/scripts/dump_to_lmdb.py``, using the ``lmdb``
package directly instead of lmdbdict; values are raw file bytes, keys are
ascii ids — the format HybridLoader's lmdb backend reads)."""

from __future__ import annotations

import argparse
import json
import os


def main(params):
    try:
        import lmdb
    except ImportError:
        raise SystemExit('dump_to_lmdb requires the lmdb package')

    imgs = json.load(open(params['input_json'], 'r'))['images']

    def key_of(img):
        return str(img.get('cocoid', img.get('id')))

    ext = params['ext']
    env = lmdb.open(params['output'], map_size=int(1e12), subdir=False)
    with env.begin(write=True) as txn:
        for img in imgs:
            path = os.path.join(params['input_dir'], key_of(img) + ext)
            with open(path, 'rb') as f:
                txn.put(key_of(img).encode('ascii'), f.read())
    env.sync()
    env.close()
    print('wrote', params['output'])


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--input_json', required=True)
    parser.add_argument('--input_dir', required=True)
    parser.add_argument('--output', required=True,
                        help='output path ending in .lmdb')
    parser.add_argument('--ext', default='.npz', help='.npy or .npz')
    args = parser.parse_args()
    main(vars(args))
