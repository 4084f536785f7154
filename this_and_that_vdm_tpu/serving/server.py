"""In-process micro-batching server for clip generation.

Production-serving layer the reference does not have: its demo
(`app.py:188-271`) rebuilds every model per click and serves one request at
a time, and `test_code/inference.py` loops instances serially.  Here a
resident baked pipeline serves concurrent requests:

* requests are **micro-batched** — grouped by everything that changes the
  compiled program or sampler (resolution, steps, frames, guidance, ...)
  and stacked up to ``max_batch`` along the clip axis, so one pipeline
  invocation amortises dispatch and, on a ``make_serving_mesh``
  ('clip','cfg') mesh, N chips serve N clips at single-clip latency;
* per-request **gesture conditions** batch too ([B, F, H, W, 3] — the
  pipeline extension over the reference's shared-condition API);
* per-request determinism: initial noise is drawn host-side from each
  request's ``seed`` (``jax.random.PRNGKey(seed)``), and the pipelines use
  per-clip exact temporal-context mapping (``context_clips``, see
  PARITY.md), so a batched result equals the same request served alone up
  to float noise (the only batch-level draw left is the tiny conditioning
  noise-aug, disabled at ``noise_aug_strength=0``);
* callers get ``concurrent.futures.Future``s — submit from any thread.

Usage::

    server = VideoGenServer(pipe, mesh=make_serving_mesh(cfg=2))  # max_batch
    # defaults to the mesh's clip-axis size (1 on a single chip — PERF.md
    # measures single-chip batching net-negative)
    fut = server.submit(image, condition=raster, prompt_ids=ids, seed=7)
    frames = fut.result()          # [F, H, W, 3] float in [0, 1]
    server.close()
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from concurrent.futures import Future
from typing import Any, Dict, Optional, Tuple

import jax.random as jr
import numpy as np

__all__ = ["VideoGenServer"]


@dataclasses.dataclass
class _Request:
    image: np.ndarray                     # [H, W, 3] in [-1, 1]
    condition: Optional[np.ndarray]       # [F, H, W, 3] in [0, 1] (VGL) | None
    prompt_ids: Optional[np.ndarray]      # [77] int | None
    seed: int
    sampling: Dict[str, Any]
    future: Future


class VideoGenServer:
    """Resident micro-batching front end over a (usually baked) pipeline.

    ``pipe``: a ``StableVideoDiffusionPipeline`` or
    ``StableVideoDiffusionControlNetPipeline``.  ``mesh``: optional serving
    mesh (``make_serving_mesh``/``make_mesh``) — the pipeline is placed on
    it once at construction.  ``max_batch``: clip-batch cap per invocation.
    Default (None) = the mesh's ``clip``-axis size, i.e. one clip per
    clip-chip — 1 on a single chip, where batching is measured net-negative
    (PERF.md "Concurrent serving": amortisation 0.91, batch-of-4 slower per
    clip than serial).  Pass a multiple of the clip axis to oversubscribe.
    ``max_delay_s``: how long the batcher waits for same-bucket followers
    once a request is in hand — the classic latency/throughput knob.
    """

    def __init__(self, pipe, mesh=None, max_batch: Optional[int] = None,
                 max_delay_s: float = 0.05, **default_sampling):
        self.pipe = pipe.place_on_mesh(mesh) if mesh is not None else pipe
        if max_batch is None:
            max_batch = (mesh.shape.get("clip", 1) if mesh is not None else 1)
        self.max_batch = int(max_batch)
        self.max_delay_s = float(max_delay_s)
        self.default_sampling = default_sampling
        self._queue: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._closed = False
        self._state_lock = threading.Lock()  # submit/close check-then-act
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------------ api
    def submit(self, image: np.ndarray, condition: Optional[np.ndarray] = None,
               prompt_ids: Optional[np.ndarray] = None, seed: int = 0,
               **sampling) -> Future:
        """Enqueue one clip request; returns a Future of [F, H, W, 3]."""
        merged = dict(self.default_sampling)
        merged.update(sampling)
        req = _Request(np.asarray(image), None if condition is None
                       else np.asarray(condition),
                       None if prompt_ids is None else np.asarray(prompt_ids),
                       int(seed), merged, Future())
        with self._state_lock:  # no request may slip in behind the sentinel
            if self._closed:
                raise RuntimeError("server is closed")
            self._queue.put(req)
        return req.future

    def close(self, timeout: Optional[float] = 60.0):
        """Drain outstanding requests and stop the worker."""
        with self._state_lock:
            if self._closed:
                return
            self._closed = True
            self._queue.put(None)
        self._worker.join(timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ---------------------------------------------------------------- batch
    @staticmethod
    def _bucket(req: _Request) -> Tuple:
        """Requests sharing a bucket stack into one pipeline call: identical
        shapes and sampling params (anything else would change the compiled
        program or the sampler schedule mid-batch)."""
        return (
            req.image.shape,
            None if req.condition is None else req.condition.shape,
            None if req.prompt_ids is None else req.prompt_ids.shape,
            tuple(sorted(req.sampling.items())),
        )

    def _take_batch(self):
        """Block for one request, then collect same-bucket followers for up
        to ``max_delay_s`` (or until ``max_batch``)."""
        req = self._queue.get()
        if req is None:
            # shutdown sentinel — but a mixed-bucket request re-queued by an
            # earlier round may sit BEHIND it; serve leftovers before exiting
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                return None
            if req is None:  # close() enqueues exactly one sentinel
                return None
            self._queue.put(None)  # keep the sentinel behind the leftovers
        bucket = self._bucket(req)
        batch = [req]
        deadline = _now() + self.max_delay_s
        while len(batch) < self.max_batch:
            timeout = deadline - _now()
            if timeout <= 0:
                break
            try:
                nxt = self._queue.get(timeout=timeout)
            except queue.Empty:
                break
            if nxt is None:
                self._queue.put(None)  # keep the shutdown signal
                break
            if self._bucket(nxt) == bucket:
                batch.append(nxt)
            else:
                self._queue.put(nxt)  # different program: next batch
                break
        return batch

    def _run(self):
        while True:
            batch = self._take_batch()
            if batch is None:
                return
            try:
                self._execute(batch)
            except Exception as e:  # noqa: BLE001 — propagate to callers
                for r in batch:
                    if not r.future.done():
                        r.future.set_exception(e)

    def _execute(self, batch):
        # claim the futures: a request whose caller cancelled while queued is
        # dropped here; afterwards cancel() can no longer race set_result
        batch = [r for r in batch if r.future.set_running_or_notify_cancel()]
        if not batch:
            return
        sampling = dict(batch[0].sampling)
        num_frames = int(sampling.get("num_frames", 14))
        h, w = batch[0].image.shape[0], batch[0].image.shape[1]
        images = np.stack([r.image for r in batch])
        # per-request determinism: BOTH noise draws come from each request's
        # own seed, split exactly like the pipeline splits its ``key``
        # (k_img, k_lat) — so a batched result equals the same request served
        # alone with key=PRNGKey(seed), including the conditioning noise-aug
        # (a single-key batch draw would entangle co-batched neighbours)
        keys = [jr.split(jr.PRNGKey(r.seed)) for r in batch]
        image_noise = np.concatenate([
            np.asarray(jr.normal(k_img, (1, h, w, 3), np.float32))
            for (k_img, _) in keys
        ])
        latents = np.concatenate([
            np.asarray(jr.normal(k_lat,
                                 (1, num_frames, h // 8, w // 8, 4), np.float32))
            for (_, k_lat) in keys
        ])
        kwargs = dict(sampling, latents=latents, image_noise=image_noise,
                      key=jr.PRNGKey(batch[0].seed))
        if batch[0].prompt_ids is not None:
            kwargs["prompt_ids"] = np.stack([r.prompt_ids for r in batch])
        if batch[0].condition is not None:
            # [B, F, H, W, 3]: per-request gestures batch along the clip axis
            out = self.pipe(images, np.stack([r.condition for r in batch]),
                            **kwargs)
        else:
            out = self.pipe(images, **kwargs)
        out = np.asarray(out)
        for i, r in enumerate(batch):
            r.future.set_result(out[i])


def _now() -> float:
    import time

    return time.monotonic()
