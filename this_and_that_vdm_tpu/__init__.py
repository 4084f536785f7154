"""This&That VDM — TPU-native (JAX/XLA/Pallas/pjit) framework.

A from-scratch reimplementation of the capabilities of
Kiteretsu77/This_and_That_VDM (language- & gesture-conditioned video
generation for robot planning on Stable Video Diffusion), designed
TPU-first:

- ``models/``     flax modules: spatio-temporal UNet, GestureNet temporal
                  ControlNet, temporal-decoder VAE, CLIP text/vision encoders.
- ``ops/``        numerics substrate: antialiased resize, fused attention,
                  group norm (Pallas kernels where it pays off).
- ``schedulers/`` EulerDiscrete EDM (Karras sigmas) as pure JAX.
- ``pipelines/``  jitted denoise loops (lax.scan) for VL and VGL inference.
- ``training/``   EDM finetuning for UNet (VL) and GestureNet (VGL).
- ``parallel/``   jax.sharding Mesh axes + sharding rules (dp/fsdp/tp/sp).
- ``data/``       Bridge dataset pipeline + gesture rasterization.
- ``weights/``    HF safetensors -> JAX pytree converters.
"""

__version__ = "0.1.0"

FRAME_COUNT_DEFAULT = 14
HEIGHT_DEFAULT = 256
WIDTH_DEFAULT = 384
