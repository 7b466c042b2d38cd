"""TPU-native image captioning framework (JAX/XLA/Pallas/pjit).

A from-scratch rebuild of the capabilities of
ruotianluo/ImageCaptioning.pytorch for TPU: jit-compiled caption decoders
over precomputed image features, batched lax.scan beam search / sampling,
XE + SCST / structure-loss / PPO training, and reference-compatible
configs, checkpoints, and CLI tools.
"""

__version__ = '0.1.0'
