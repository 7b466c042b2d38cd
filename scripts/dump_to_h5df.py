"""Repack per-image npy/npz feature dirs into per-key h5 datasets
(port of ``/root/reference/scripts/dump_to_h5df.py``)."""

from __future__ import annotations

import argparse
import json
import os

import h5py
import numpy as np


def main(params):
    imgs = json.load(open(params['input_json'], 'r'))['images']

    def key_of(img):
        return str(img.get('cocoid', img.get('id')))

    if params['fc_input_dir'] is not None:
        print('processing fc')
        with h5py.File(params['fc_output'], 'w') as file_fc:
            for img in imgs:
                path = os.path.join(params['fc_input_dir'],
                                    key_of(img) + '.npy')
                file_fc.create_dataset(key_of(img), data=np.load(path))

    if params['att_input_dir'] is not None:
        print('processing att')
        with h5py.File(params['att_output'], 'w') as file_att:
            for img in imgs:
                path = os.path.join(params['att_input_dir'],
                                    key_of(img) + '.npz')
                file_att.create_dataset(key_of(img),
                                        data=np.load(path)['feat'])


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--input_json', required=True)
    parser.add_argument('--fc_output', default='data')
    parser.add_argument('--att_output', default='data')
    parser.add_argument('--fc_input_dir', default=None)
    parser.add_argument('--att_input_dir', default=None)
    args = parser.parse_args()
    params = vars(args)
    print('parsed input parameters:')
    print(json.dumps(params, indent=2))
    main(params)
