"""VL inference pipeline: image(+text) -> 14-frame video.

TPU-native replication of reference
svd/pipeline_stable_video_diffusion.py:323-578 (``__call__``): the whole
generation — conditioning encode, EDM Euler loop with per-frame linspace CFG,
chunked temporal-VAE decode — compiles to a handful of XLA programs; the
25-step denoise loop is a single ``lax.scan`` (CFG as batch-2, no python
loop), re-jitted only when static shapes change.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip import CLIPTextModel, CLIPVisionModelWithProjection
from ..models.unet import UNetSpatioTemporalConditionModel
from ..models.vae import AutoencoderKLTemporalDecoder
from ..schedulers import make_svd_schedule
from . import common


@dataclasses.dataclass(eq=False)
class StableVideoDiffusionPipeline:
    """Holds module definitions + params; ``__call__`` mirrors the reference API."""

    unet: UNetSpatioTemporalConditionModel
    vae: AutoencoderKLTemporalDecoder
    image_encoder: CLIPVisionModelWithProjection
    unet_params: Any
    vae_params: Any
    image_encoder_params: Any
    text_encoder: Optional[CLIPTextModel] = None
    text_encoder_params: Any = None
    mesh: Any = None  # set via place_on_mesh for data-parallel serving
    # Serving mode: close over the denoiser weights so XLA compiles them in
    # as constants with pre-transformed layouts — measured ~11% faster per
    # denoise step on v5e (8.2 vs 7.3 steps/s) at the cost of a second copy
    # of the weights inside the executable.  Set at construction (denoise
    # executables are cached); leave False when weights change between calls
    # (e.g. validation-in-training renders from live training params).
    bake_params: bool = False

    # ------------------------------------------------------------------ mesh

    def place_on_mesh(self, mesh):
        """Serve over a ``jax.sharding.Mesh`` (the TPU-native answer to "more
        GPUs" at inference, SURVEY §2.8).  Parameters are replicated on every
        chip; per-call inputs are sharded on the leading clip-batch axis and
        GSPMD partitions every jitted stage.  Two mesh flavors:

        * ``make_mesh`` (dp, fsdp) or any mesh without a ``cfg`` axis —
          pure clip-batch data parallelism (throughput); the batch must
          divide the mesh size.
        * ``make_serving_mesh`` (clip, cfg) — additionally splits the
          CFG-folded batch axis of the denoise scan over ``cfg`` chips
          (latency: the uncond/cond UNet+ControlNet passes run on different
          chips, synchronising only at the per-step CFG combine).

        Call before the first generation — denoise executables are cached
        per (steps, frames) and bake the mesh in (this method clears them).
        """
        from ..parallel.mesh import replicate_to_mesh

        self.unet_params = replicate_to_mesh(self.unet_params, mesh)
        self.vae_params = replicate_to_mesh(self.vae_params, mesh)
        self.image_encoder_params = replicate_to_mesh(self.image_encoder_params, mesh)
        if self.text_encoder_params is not None:
            self.text_encoder_params = replicate_to_mesh(self.text_encoder_params, mesh)
        if getattr(self, "controlnet_params", None) is not None:
            self.controlnet_params = replicate_to_mesh(self.controlnet_params, mesh)
        self.mesh = mesh
        self._fn_cache.clear()  # executables bake the mesh in
        return self

    @functools.cached_property
    def _fn_cache(self):
        """Per-instance compiled-fn cache (NOT class-wide like lru_cache on a
        method — placing one pipeline on a mesh must not evict another's
        executables). Keys include the identity of any baked param tree so
        swapping ``unet_params`` or toggling ``bake_params`` can never serve
        a stale executable; each entry retains the baked trees so their ids
        cannot be recycled while cached."""
        return {}

    _FN_CACHE_LIMIT = 8  # executables (+ baked weight copies) retained at most

    def _cached_fn(self, key, build):
        entry = self._fn_cache.get(key)
        if entry is None:
            retain = (self.unet_params, getattr(self, "controlnet_params", None))
            entry = (build(), retain if self.bake_params else None)
            while len(self._fn_cache) >= self._FN_CACHE_LIMIT:
                # evict oldest (dict preserves insertion order) so a process
                # that swaps weights repeatedly can't accumulate baked trees
                self._fn_cache.pop(next(iter(self._fn_cache)))
            self._fn_cache[key] = entry
        return entry[0]

    @staticmethod
    def _tree_identity(tree):
        """Identity of a param tree for bake-cache keys: the root id plus
        EVERY leaf's id, so in-place mutation of any single leaf (same dict,
        one new array anywhere in the tree) is detected as well as
        whole-tree reassignment.  Cost: ~1k ids per pipeline call —
        negligible against a clip generation."""
        if tree is None:
            return None
        return (id(tree), tuple(map(id, jax.tree_util.tree_leaves(tree))))

    def _bake_key(self):
        if not self.bake_params:
            return None
        return (self._tree_identity(self.unet_params),
                self._tree_identity(getattr(self, "controlnet_params", None)))

    def _maybe_shard(self, *arrays):
        if self.mesh is None:
            return arrays
        from ..parallel.mesh import shard_leading

        axes = ("clip",) if "cfg" in self.mesh.axis_names else None
        return tuple(None if a is None else shard_leading(a, self.mesh, axes)
                     for a in arrays)

    def _constrain_cfg(self, x, cfg_fold: int = 2):
        """Anchor the CFG-folded batch axis (cfg-major: ``cfg_concat`` emits
        [uncond(B); cond(B)]) to the ('cfg', 'clip') mesh axes inside the
        denoise scan.  No-op without a cfg mesh axis, when the axis does not
        divide, or when the tensor's CFG fold (``cfg_fold`` branches: 2
        standard, 3 ip2p, 1 for guess-mode cond-only tensors) doesn't match
        the mesh's cfg axis — constraining a non-matching fold would split
        rows mid-branch and defeat the latency parallelism."""
        if self.mesh is None or "cfg" not in self.mesh.axis_names:
            return x
        cfg_size = self.mesh.shape["cfg"]
        if cfg_size > 1 and cfg_size != cfg_fold:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        n = cfg_size * self.mesh.shape["clip"]
        if x.shape[0] % n:
            return x
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, P(("cfg", "clip")))
        )

    # ---------------------------------------------------------------- encode

    def _cond_params(self):
        return dict(
            vae=self.vae_params,
            image_encoder=self.image_encoder_params,
            text_encoder=self.text_encoder_params,
        )

    @functools.cached_property
    def _encode_conditioning(self):
        @jax.jit
        def fn(params, image_m11, input_ids, noise_img):
            """image [B,H,W,3] in [-1,1]; returns (encoder_states_cfg,
            image_latents_cfg [B*2,h,w,4])."""
            px = common.clip_preprocess(image_m11)
            image_embeds = self.image_encoder.apply(params["image_encoder"], px)
            text_states = None
            if self.text_encoder is not None and input_ids is not None:
                text_states = self.text_encoder.apply(params["text_encoder"], input_ids)
            states = common.build_encoder_hidden_states(image_embeds, text_states)
            states_cfg = common.cfg_concat(states)

            noised = image_m11 + noise_img
            lat = self.vae.apply(params["vae"], noised, method="encode_mode")
            lat_cfg = common.cfg_concat(lat)
            return states_cfg, lat_cfg

        return fn

    # --------------------------------------------------------------- denoise

    def _denoise_fn(self, num_steps: int, num_frames: int):
        return self._cached_fn(
            ("denoise", num_steps, num_frames, self._bake_key()),
            lambda: self._build_denoise_fn(num_steps, num_frames),
        )

    def _build_denoise_fn(self, num_steps: int, num_frames: int):
        sched = make_svd_schedule(num_steps)
        sigmas = jnp.asarray(sched.sigmas)
        timesteps = jnp.asarray(sched.timesteps)
        baked = self.unet_params if self.bake_params else None

        @jax.jit
        def fn(unet_params, noise, states_cfg, image_latents_cfg, added_time_ids_cfg, guidance):
            unet_params = baked if baked is not None else unet_params
            b = noise.shape[0]
            img_lat = jnp.repeat(image_latents_cfg[:, None], num_frames, axis=1)

            def body(latents, i):
                inp = jnp.concatenate([latents, latents], axis=0)
                inp = inp / jnp.sqrt(sigmas[i] ** 2 + 1.0)  # scale_model_input
                inp = jnp.concatenate([inp, img_lat], axis=-1)
                inp = self._constrain_cfg(inp)
                pred = self.unet.apply(
                    unet_params, inp, timesteps[i], states_cfg,
                    added_time_ids_cfg,
                    # b independent clips in the CFG-folded batch: per-clip
                    # exact temporal-context mapping — each clip's result is
                    # bit-equal to its solo run (b=1 keeps the reference's
                    # CFG-pair quirk; see models/transformer.py)
                    context_clips=b,
                )
                uncond, cond = jnp.split(pred, 2, axis=0)
                pred = uncond + guidance * (cond - uncond)
                return sched.step(pred, i, latents), None

            latents0 = noise * sched.init_noise_sigma
            latents, _ = jax.lax.scan(body, latents0, jnp.arange(num_steps))
            return latents

        return fn

    def _decode_fn(self, decode_chunk_size: int):
        def build():
            @jax.jit
            def fn(vae_params, latents):
                return common.decode_latents_chunked(
                    lambda z: self.vae.apply(vae_params, z, method="decode"),
                    latents,
                    self.vae.config.scaling_factor,
                    decode_chunk_size,
                )

            return fn

        return self._cached_fn(("decode", decode_chunk_size), build)

    # ------------------------------------------------------------------ call

    def __call__(
        self,
        image: np.ndarray,  # [B, H, W, 3] float in [-1, 1] (pre-resized)
        prompt_ids: Optional[np.ndarray] = None,  # [B, 77] int
        num_frames: int = 14,
        num_inference_steps: int = 25,
        min_guidance_scale: float = 1.0,
        max_guidance_scale: float = 3.0,
        fps: int = 7,
        motion_bucket_id: int = 127,
        noise_aug_strength: float = 0.02,
        decode_chunk_size: Optional[int] = None,
        key: Optional[jax.Array] = None,
        latents: Optional[jnp.ndarray] = None,
        image_noise: Optional[np.ndarray] = None,  # [B, H, W, 3] std-normal;
        # overrides the key-drawn conditioning noise-aug sample (serving:
        # per-request determinism inside a micro-batch)
        output_type: str = "np",
    ):
        b, h, w = image.shape[0], image.shape[1], image.shape[2]
        decode_chunk_size = decode_chunk_size or num_frames
        key = key if key is not None else jax.random.PRNGKey(0)
        k_img, k_lat = jax.random.split(key)

        image = jnp.asarray(image, jnp.float32)
        noise_img = noise_aug_strength * (
            jax.random.normal(k_img, image.shape, image.dtype)
            if image_noise is None else jnp.asarray(image_noise, image.dtype))
        ids = None if prompt_ids is None else jnp.asarray(prompt_ids)
        image, noise_img, ids = self._maybe_shard(image, noise_img, ids)
        states_cfg, img_lat_cfg = self._encode_conditioning(self._cond_params(), image, ids, noise_img)

        add_ids = common.get_add_time_ids(
            fps - 1, motion_bucket_id, noise_aug_strength, b, cfg_mult=2
        )
        guidance = common.guidance_linspace(
            min_guidance_scale, max_guidance_scale, num_frames, b
        )

        if latents is None:
            latents = jax.random.normal(
                k_lat, (b, num_frames, h // 8, w // 8, 4), jnp.float32
            )
        (latents,) = self._maybe_shard(latents)
        latents = self._denoise_fn(num_inference_steps, num_frames)(
            None if self.bake_params else self.unet_params,
            latents, states_cfg, img_lat_cfg, add_ids, guidance
        )

        if output_type == "latent":
            return np.asarray(latents)
        frames = self._decode_fn(decode_chunk_size)(self.vae_params, latents)
        if output_type == "uint8":
            return np.asarray(common.postprocess_frames_uint8(frames))
        return common.postprocess_frames(frames)
