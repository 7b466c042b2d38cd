"""TPU-native ResNet image encoder for feature extraction.

Replaces the reference's torchvision ResNet + ``myResnet`` pooling head
(``/root/reference/captioning/utils/resnet.py`` /
``resnet_utils.py:10-26``) with a pure-JAX inference network that loads
torchvision ``.pth`` checkpoints (host-side torch unpickling only).

Reference quirks preserved:
* maxpool is 3x3 stride-2 pad-0 **ceil_mode** (resnet.py:9);
* the first bottleneck of layers 2-4 puts the stride on conv1 instead of
  conv2 (caffe-style, resnet.py:10-12);
* head: ``fc`` = global mean of layer4, ``att`` = adaptive 14x14 average
  pool, channels-last (resnet_utils.py:22-24).

Layout is NHWC (TPU-friendly); weights are transposed from torch OIHW at
load time.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

RESNET_LAYERS = {'resnet18': [2, 2, 2, 2], 'resnet34': [3, 4, 6, 3],
                 'resnet50': [3, 4, 6, 3], 'resnet101': [3, 4, 23, 3],
                 'resnet152': [3, 8, 36, 3]}
BOTTLENECK = {'resnet50', 'resnet101', 'resnet152'}

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def load_torch_resnet(path: str) -> Dict[str, np.ndarray]:
    """Load a torchvision ResNet state_dict into a flat numpy dict with
    conv kernels transposed OIHW -> HWIO."""
    import torch
    sd = torch.load(path, map_location='cpu')
    out = {}
    for k, v in sd.items():
        a = v.numpy() if hasattr(v, 'numpy') else np.asarray(v)
        if a.ndim == 4:  # conv OIHW -> HWIO
            a = a.transpose(2, 3, 1, 0)
        out[k] = a
    return out


def _conv(x, w, stride=1, padding='SAME'):
    if isinstance(padding, int):
        padding = [(padding, padding)] * 2
    return jax.lax.conv_general_dilated(
        x, jnp.asarray(w), (stride, stride), padding,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def _bn(x, p, prefix):
    mean = jnp.asarray(p[prefix + '.running_mean'])
    var = jnp.asarray(p[prefix + '.running_var'])
    w = jnp.asarray(p[prefix + '.weight'])
    b = jnp.asarray(p[prefix + '.bias'])
    return (x - mean) * jax.lax.rsqrt(var + 1e-5) * w + b


def _maxpool_ceil(x, window=3, stride=2):
    """torch MaxPool2d(kernel=3, stride=2, pad=0, ceil_mode=True)."""
    h, w = x.shape[1], x.shape[2]
    def extra(n):
        out = -(-(n - window) // stride) + 1  # ceil
        needed = (out - 1) * stride + window
        return max(needed - n, 0)
    pads = [(0, 0), (0, extra(h)), (0, extra(w)), (0, 0)]
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1), pads)


def _bottleneck(x, p, prefix, stride, first):
    """torchvision Bottleneck with the reference's conv1-stride tweak."""
    identity = x
    s1 = stride if first else 1  # stride moved to conv1 (resnet.py:10-12)
    out = _conv(x, p[prefix + '.conv1.weight'], s1, 0)
    out = jax.nn.relu(_bn(out, p, prefix + '.bn1'))
    out = _conv(out, p[prefix + '.conv2.weight'], 1, 1)
    out = jax.nn.relu(_bn(out, p, prefix + '.bn2'))
    out = _conv(out, p[prefix + '.conv3.weight'], 1, 0)
    out = _bn(out, p, prefix + '.bn3')
    if prefix + '.downsample.0.weight' in p:
        identity = _conv(x, p[prefix + '.downsample.0.weight'], stride, 0)
        identity = _bn(identity, p, prefix + '.downsample.1')
    return jax.nn.relu(out + identity)


def _basic_block(x, p, prefix, stride, first):
    identity = x
    s = stride if first else 1
    out = _conv(x, p[prefix + '.conv1.weight'], s, 1)
    out = jax.nn.relu(_bn(out, p, prefix + '.bn1'))
    out = _conv(out, p[prefix + '.conv2.weight'], 1, 1)
    out = _bn(out, p, prefix + '.bn2')
    if prefix + '.downsample.0.weight' in p:
        identity = _conv(x, p[prefix + '.downsample.0.weight'], stride, 0)
        identity = _bn(identity, p, prefix + '.downsample.1')
    return jax.nn.relu(out + identity)


def adaptive_avg_pool(x, out_hw: int):
    """torch adaptive_avg_pool2d bin semantics on NHWC."""
    def pool_axis(arr, axis, n_out):
        n_in = arr.shape[axis]
        starts = [int(np.floor(i * n_in / n_out)) for i in range(n_out)]
        ends = [int(np.ceil((i + 1) * n_in / n_out)) for i in range(n_out)]
        slices = [jnp.take(arr, jnp.arange(s, e), axis=axis).mean(
            axis=axis, keepdims=True) for s, e in zip(starts, ends)]
        return jnp.concatenate(slices, axis=axis)
    x = pool_axis(x, 1, out_hw)
    x = pool_axis(x, 2, out_hw)
    return x


def resnet_features(params: Dict[str, np.ndarray], img, arch='resnet101',
                    att_size: int = 14):
    """img: [H, W, 3] float in [0,1]. Returns (fc [2048], att [a, a, 2048]).

    Mirrors myResnet.forward (resnet_utils.py:10-26) incl. imagenet
    normalization done by the callers (prepro_feats.py:33-37).
    """
    x = (img - IMAGENET_MEAN) / IMAGENET_STD
    x = x[None]  # N=1
    x = _conv(x, params['conv1.weight'], 2, 3)
    x = jax.nn.relu(_bn(x, params, 'bn1'))
    x = _maxpool_ceil(x)

    block = _bottleneck if arch in BOTTLENECK else _basic_block
    for li, n_blocks in enumerate(RESNET_LAYERS[arch], start=1):
        stride = 1 if li == 1 else 2
        for bi in range(n_blocks):
            x = block(x, params, 'layer%d.%d' % (li, bi),
                      stride, first=(bi == 0))

    fc = x.mean(axis=(1, 2))[0]
    att = adaptive_avg_pool(x, att_size)[0]
    return fc, att
