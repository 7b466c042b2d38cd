"""Extract ResNet fc + att features for every image (TPU-native).

Port of ``/root/reference/scripts/prepro_feats.py``: imagenet-normalized
full-size images through the stride-tweaked ResNet (models/resnet.py),
writing per-image ``.npy`` fc (2048) and ``.npz`` att (att_size^2 x 2048)
files.  Needs a torchvision checkpoint at
``<model_root>/<model>.pth`` (no downloads here).
"""

from __future__ import annotations

import argparse
import json
import os
from random import seed

import numpy as np


def main(params):
    import jax
    from captioning_tpu.models.resnet import (load_torch_resnet,
                                              resnet_features)
    from captioning_tpu.utils.misc import honor_jax_platforms_env
    honor_jax_platforms_env()

    weights = os.path.join(params['model_root'], params['model'] + '.pth')
    resnet_params = load_torch_resnet(weights)
    extract = jax.jit(lambda img: resnet_features(
        resnet_params, img, params['model'], params['att_size']))

    imgs = json.load(open(params['input_json'], 'r'))['images']
    N = len(imgs)
    seed(123)

    dir_fc = params['output_dir'] + '_fc'
    dir_att = params['output_dir'] + '_att'
    os.makedirs(dir_fc, exist_ok=True)
    os.makedirs(dir_att, exist_ok=True)

    from PIL import Image
    for i, img in enumerate(imgs):
        path = os.path.join(params['images_root'], img.get('filepath', ''),
                            img['filename'])
        with Image.open(path) as im:
            arr = np.asarray(im.convert('RGB')).astype('float32') / 255.0
        fc, att = extract(arr)
        np.save(os.path.join(dir_fc, str(img['cocoid'])), np.asarray(fc))
        np.savez_compressed(os.path.join(dir_att, str(img['cocoid'])),
                            feat=np.asarray(att))
        if i % 1000 == 0:
            print('processing %d/%d (%.2f%% done)' % (i, N, i * 100.0 / N))
    print('wrote ', params['output_dir'])


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--input_json', required=True)
    parser.add_argument('--output_dir', default='data')
    parser.add_argument('--images_root', default='')
    parser.add_argument('--att_size', default=14, type=int)
    parser.add_argument('--model', default='resnet101', type=str)
    parser.add_argument('--model_root', default='./data/imagenet_weights',
                        type=str)
    args = parser.parse_args()
    params = vars(args)
    print('parsed input parameters:')
    print(json.dumps(params, indent=2))
    main(params)
