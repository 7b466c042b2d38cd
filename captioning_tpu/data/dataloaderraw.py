"""Eval on a folder of raw images: runs the JAX ResNet on the fly.

Port of ``/root/reference/captioning/data/dataloaderraw.py``: lists images
from a folder (or a coco_json file list), emits 2048-d fc + 14x14x2048 att
features per image via the TPU-native ResNet (models/resnet.py).  Requires
a torchvision-format checkpoint at ``data/imagenet_weights/<model>.pth``
(no weight download here — zero-egress environments must provide it).
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..models.resnet import load_torch_resnet, resnet_features


def _load_image(path):
    from PIL import Image
    img = Image.open(path).convert('RGB')
    return np.asarray(img).astype('float32') / 255.0


class DataLoaderRaw:
    def __init__(self, opt):
        self.opt = opt
        self.coco_json = opt.get('coco_json', '')
        self.folder_path = opt.get('folder_path', '')
        self.batch_size = opt.get('batch_size', 1)
        self.seq_per_img = 1
        cnn_model = opt.get('cnn_model', 'resnet101')
        model_root = opt.get('model_root', './data/imagenet_weights')

        weights = os.path.join(model_root, cnn_model + '.pth')
        if not os.path.isfile(weights):
            raise FileNotFoundError(
                'DataLoaderRaw needs %s (torchvision %s checkpoint); '
                'place it there manually in zero-egress environments.'
                % (weights, cnn_model))
        self._resnet_params = load_torch_resnet(weights)
        self._arch = cnn_model

        import jax
        self._extract = jax.jit(
            lambda img: resnet_features(self._resnet_params, img,
                                        self._arch))

        # load the json containing the filenames, or scan the folder
        self.files = []
        self.ids = []
        if len(self.coco_json) > 0:
            print('reading from ' + self.coco_json)
            anns = json.load(open(self.coco_json))
            self.files = [os.path.join(self.folder_path, ann['file_name'])
                          for ann in anns['images']]
            self.ids = [ann['id'] for ann in anns['images']]
        else:
            print('listing all images in directory ' + self.folder_path)
            exts = {'.jpg', '.jpeg', '.png', '.ppm', '.JPG', '.JPEG',
                    '.PNG', '.PPM'}
            n = 1
            for root, dirs, files in os.walk(self.folder_path, topdown=False):
                for file in files:
                    fullpath = os.path.join(self.folder_path, file)
                    if os.path.splitext(fullpath)[1] in exts:
                        self.files.append(fullpath)
                        self.ids.append(str(n))
                        n += 1

        self.N = len(self.files)
        print('DataLoaderRaw found ', self.N, ' images')
        self.iterator = 0
        self.dataset = self  # mirrors the reference's aliasing (":85")
        self.ix_to_word = None

    def get_batch(self, split, batch_size=None):
        batch_size = batch_size or self.batch_size
        fc_batch = np.zeros((batch_size, 2048), dtype='float32')
        att_batch = np.zeros((batch_size, 14 * 14, 2048), dtype='float32')
        max_index = self.N
        wrapped = False
        infos = []

        for i in range(batch_size):
            ri = self.iterator
            ri_next = ri + 1
            if ri_next >= max_index:
                ri_next = 0
                wrapped = True
            self.iterator = ri_next

            img = _load_image(self.files[ri])
            fc, att = self._extract(img)
            fc_batch[i] = np.asarray(fc)
            att_batch[i] = np.asarray(att).reshape(-1, 2048)
            infos.append({'id': self.ids[ri], 'file_path': self.files[ri]})

        data = {}
        data['fc_feats'] = fc_batch
        data['att_feats'] = att_batch
        data['att_masks'] = np.ones(att_batch.shape[:2], dtype='float32')
        data['labels'] = None
        data['masks'] = None
        data['gts'] = [[] for _ in range(batch_size)]
        data['bounds'] = {'it_pos_now': self.iterator, 'it_max': self.N,
                          'wrapped': wrapped}
        data['infos'] = infos
        return data

    def reset_iterator(self, split):
        self.iterator = 0

    def get_vocab_size(self):
        return len(self.ix_to_word)

    def get_vocab(self):
        return self.ix_to_word

    @property
    def vocab_size(self):
        return self.get_vocab_size()

    @property
    def seq_length(self):
        return 1
