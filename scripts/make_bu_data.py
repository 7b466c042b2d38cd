"""Convert peteanderson80 bottom-up TSV features (base64 float32) into
``_att``/``_fc``(mean)/``_box`` npy/npz dirs.

Behavioral port of ``/root/reference/scripts/make_bu_data.py``: same four
karpathy-split TSV shards in, same three output directories (compressed
npz att features under key ``feat``, mean-pooled fc, raw boxes).
"""

from __future__ import annotations

import argparse
import base64
import csv
import os
import sys

import numpy as np

TSV_COLUMNS = ('image_id', 'image_w', 'image_h', 'num_boxes', 'boxes',
               'features')
KARPATHY_SHARDS = (
    'trainval/karpathy_test_resnet101_faster_rcnn_genome.tsv',
    'trainval/karpathy_val_resnet101_faster_rcnn_genome.tsv',
    'trainval/karpathy_train_resnet101_faster_rcnn_genome.tsv.0',
    'trainval/karpathy_train_resnet101_faster_rcnn_genome.tsv.1',
)


def decode_matrix(b64_text: str, n_rows: int) -> np.ndarray:
    raw = base64.b64decode(b64_text.encode('ascii'))
    return np.frombuffer(raw, dtype=np.float32).reshape(n_rows, -1)


def convert_shard(tsv_path: str, out_prefix: str) -> int:
    n = 0
    with open(tsv_path) as fh:
        for row in csv.DictReader(fh, delimiter='\t',
                                  fieldnames=list(TSV_COLUMNS)):
            image_id = str(int(row['image_id']))
            n_boxes = int(row['num_boxes'])
            feats = decode_matrix(row['features'], n_boxes)
            boxes = decode_matrix(row['boxes'], n_boxes)
            np.savez_compressed(
                os.path.join(out_prefix + '_att', image_id), feat=feats)
            np.save(os.path.join(out_prefix + '_fc', image_id),
                    feats.mean(0))
            np.save(os.path.join(out_prefix + '_box', image_id), boxes)
            n += 1
    return n


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--downloaded_feats', default='data/bu_data')
    parser.add_argument('--output_dir', default='data/cocobu')
    args = parser.parse_args()

    csv.field_size_limit(sys.maxsize)
    for suffix in ('_att', '_fc', '_box'):
        os.makedirs(args.output_dir + suffix, exist_ok=True)

    for shard in KARPATHY_SHARDS:
        print('Reading ' + shard)
        convert_shard(os.path.join(args.downloaded_feats, shard),
                      args.output_dir)


if __name__ == '__main__':
    main()
