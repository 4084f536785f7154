"""Bridge dataset pipeline (flat instance folders -> training batches).

Replicates reference data_loader/video_dataset.py (``Video_Dataset``,
``get_video_frames``, ``tokenize_captions``) and
data_loader/video_this_that_dataset.py (``Video_ThisThat_Dataset``):

* validity scan: sequential ``im_*.jpg``, frame count in
  ``[F, acceleration_tolerance*F]``, ``lang.txt`` when text is on, ``data.txt``
  for the this/that variant (:155-185);
* frame subsample: gaps ``[N//F]*(F-1)`` with the remainder distributed
  alternately front/back (:35-40);
* cv2 read + channel reversal (the reference's RGB2BGR on BGR input yields
  RGB — replicated by reversing), bicubic resize, flip aug p=0.45 suppressed
  when the prompt mentions left/right (:285-292);
* ``mix_ambiguous``: prompt rewrite to this/there with 0.4/0.2/0.2/0.2
  mixture from ``processed_text.txt`` (:244-270);
* motion value mapper: per-video flow -> z-score -> SVD bucket (:198-223),
  deprecated in favour of fixed ``motion_bucket_id=200``.

Pure numpy/cv2 on the host; batches feed the jitted train step.
"""

from __future__ import annotations

import dataclasses
import os
import random
import threading
import queue as queue_mod
from typing import Callable, List, Optional, Sequence

import cv2
import numpy as np

from .rasterize import load_condition


@dataclasses.dataclass
class DataConfig:
    dataset_path: Sequence[str] = ()
    video_seq_length: int = 14
    height: int = 256
    width: int = 384
    flip_aug_prob: float = 0.45
    acceleration_tolerance: int = 4
    use_text: bool = True
    mix_ambiguous: bool = False
    empty_prompts_proportion: float = 0.0
    motion_bucket_id: Optional[int] = 200
    dataset_motion_mean: float = 35.3
    dataset_motion_std: float = 18.5
    svd_motion_mean: float = 165.0
    svd_motion_std: float = 22.5
    conditioning_channels: int = 3
    dilate: bool = True


def subsample_indices(num_input: int, num_needed: int) -> List[int]:
    """The reference's gap algorithm (video_dataset.py:24-55)."""
    division = num_input // num_needed
    remain = (num_input % num_needed) - 1
    gaps = [division] * (num_needed - 1)
    for idx in range(remain):
        if idx % 2 == 0:
            gaps[idx // 2] += 1
        else:
            gaps[-1 * (1 + idx // 2)] += 1
    out = [0]
    for g in gaps:
        out.append(out[-1] + g)
    return out


def _count_frames(path: str) -> int:
    return sum(1 for f in os.listdir(path) if f.startswith("im_"))


def load_frames(
    path: str, indices: Sequence[int], hw, flip: bool = False, normalized: bool = False
) -> np.ndarray:
    """Decode + RGB + bicubic resize (+flip). The native C++ loader is used
    when built (GIL-free thread pool; bit-identical numerics)."""
    from . import native_loader

    paths = [os.path.join(path, f"im_{i}.jpg") for i in indices]
    if native_loader.available():
        out = native_loader.load_frames_native(paths, hw, flip)
        return out if normalized else (out + 1.0) * 127.5
    h, w = hw
    frames = []
    for p in paths:
        img = cv2.imread(p)
        img = img[:, :, ::-1]  # BGR -> RGB (reference's RGB2BGR-on-BGR effect)
        img = cv2.resize(img, (w, h), interpolation=cv2.INTER_CUBIC)
        if flip:
            img = np.fliplr(img)
        frames.append(img)
    out = np.stack(frames).astype(np.float32)
    return out / 127.5 - 1.0 if normalized else out


def scan_valid_instances(cfg: DataConfig, require_gesture: bool = False) -> List[str]:
    valid = []
    stats = {}
    for root in cfg.dataset_path:
        for name in sorted(os.listdir(root)):
            path = os.path.join(root, name)
            if not os.path.isdir(path):
                continue
            files = set(os.listdir(path))
            n = sum(1 for f in files if f.startswith("im_"))
            if any(f"im_{i}.jpg" not in files for i in range(n)):
                stats["incomplete_img"] = stats.get("incomplete_img", 0) + 1
                continue
            if n < cfg.video_seq_length:
                stats["too_little_frames"] = stats.get("too_little_frames", 0) + 1
                continue
            if not require_gesture and n > cfg.acceleration_tolerance * cfg.video_seq_length:
                stats["too_many_frames"] = stats.get("too_many_frames", 0) + 1
                continue
            if cfg.use_text and "lang.txt" not in files:
                stats["no_lang_txt"] = stats.get("no_lang_txt", 0) + 1
                continue
            if require_gesture and "data.txt" not in files:
                stats["no_data_txt"] = stats.get("no_data_txt", 0) + 1
                continue
            if cfg.motion_bucket_id is None and "flow.txt" not in files:
                # flow-derived motion path needs per-video flow stats
                # (reference 'valid check 3', video_dataset.py:175-184)
                stats["no_flow_txt"] = stats.get("no_flow_txt", 0) + 1
                continue
            valid.append(path)
    if stats:
        print("dataset scan rejects:", stats)
    return valid


def _motion_bucket(cfg: DataConfig, path: str) -> int:
    if cfg.motion_bucket_id is not None:
        return int(cfg.motion_bucket_id)
    with open(os.path.join(path, "flow.txt")) as f:
        per_video = float(f.readlines()[0][:-2])
    n = _count_frames(path)
    corrected = per_video * (n / cfg.video_seq_length)
    z = (corrected - cfg.dataset_motion_mean) / (cfg.dataset_motion_std + 0.001)
    return int(z * cfg.svd_motion_std + cfg.svd_motion_mean)


def ambiguous_prompt(prompt: str) -> str:
    """Inference-time full rewrite: "<verb> this to there" (reference
    test_code/inference.py:100-102).  Lives beside the training mixture in
    ``_read_prompt`` so the two prompt-rewriting rules stay in one module
    (the reference duplicates them across test_code/ and data_loader/)."""
    words = prompt.split()  # split() (not split(" ")) so "" -> [] -> default
    return (words[0] if words else "move") + " this to there"


def _read_prompt(cfg: DataConfig, path: str, rng: random.Random) -> str:
    if not cfg.use_text:
        return ""
    with open(os.path.join(path, "lang.txt")) as f:
        prompt = f.readlines()[0]
    proc = os.path.join(path, "processed_text.txt")
    if cfg.mix_ambiguous and os.path.exists(proc):
        with open(proc) as f:
            lines = f.readlines()
        action, this, there = lines[0][:-1], lines[1][:-1], lines[2][:-1]
        r = rng.random()
        if 0.4 <= r < 0.6:
            prompt = f"{action} this to {there}"
        elif 0.6 <= r < 0.8:
            prompt = f"{action} {this} to there"
        elif r >= 0.8:
            prompt = f"{action} this to there"
    return prompt


class VideoDataset:
    """VL training dataset: frames + tokenized prompt + motion bucket.

    Augmentation draws are a pure function of (seed, epoch, index) — a
    per-item ``random.Random`` rather than one shared stream, because
    PrefetchLoader workers call ``__getitem__`` concurrently and a shared
    stream would make flips/prompt mixing depend on thread scheduling.
    ``set_epoch`` (called by PrefetchLoader each epoch, like torch's
    DistributedSampler contract) re-rolls the augmentations per epoch."""

    def __init__(self, cfg: DataConfig, tokenize: Callable[[str], np.ndarray],
                 seed: int = 42):
        self.cfg = cfg
        self.tokenize = tokenize
        self.paths = scan_valid_instances(cfg)
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = int(epoch)

    def _item_rng(self, idx: int) -> random.Random:
        # hash of an int tuple is deterministic across processes
        # (PYTHONHASHSEED only randomises str/bytes hashing)
        return random.Random(hash((self.seed, self.epoch, idx)))

    def __len__(self):
        return len(self.paths)

    def _flip(self, prompt: str, rng: random.Random) -> bool:
        if rng.random() >= self.cfg.flip_aug_prob:
            return False
        if self.cfg.use_text and ("left" in prompt or "right" in prompt):
            return False
        return True

    def __getitem__(self, idx: int) -> dict:
        rng = self._item_rng(idx)
        path = self.paths[idx]
        prompt = _read_prompt(self.cfg, path, rng)
        # flip suppression checks the REAL caption (reference blanks tokens
        # only, video_dataset.py:88-109 vs :292-299) — blank AFTER deciding
        flip = self._flip(prompt, rng)
        if rng.random() < self.cfg.empty_prompts_proportion:
            prompt = ""
        n = _count_frames(path)
        indices = subsample_indices(n, self.cfg.video_seq_length)
        frames = load_frames(path, indices, (self.cfg.height, self.cfg.width), flip,
                             normalized=True)
        return dict(
            video_frames=frames,  # [F, H, W, 3] in [-1, 1]
            prompt_ids=self.tokenize(prompt),
            motion_bucket_id=np.float32(_motion_bucket(self.cfg, path)),
        )


class VideoThisThatDataset(VideoDataset):
    """VGL dataset: adds the rasterised gesture condition; frames are the
    first F (curation already resampled — video_this_that_dataset.py:168-217)."""

    def __init__(self, cfg: DataConfig, tokenize, seed: int = 42):
        self.cfg = cfg
        self.tokenize = tokenize
        self.paths = scan_valid_instances(cfg, require_gesture=True)
        self.seed = seed
        self.epoch = 0

    def __getitem__(self, idx: int) -> dict:
        rng = self._item_rng(idx)
        path = self.paths[idx]
        prompt = _read_prompt(self.cfg, path, rng)
        flip = self._flip(prompt, rng)
        if rng.random() < self.cfg.empty_prompts_proportion:
            prompt = ""
        indices = list(range(self.cfg.video_seq_length))
        frames = load_frames(path, indices, (self.cfg.height, self.cfg.width), flip,
                             normalized=True)
        cond, motion, ctrl_idx, coords = load_condition(
            path, (self.cfg.height, self.cfg.width), self.cfg.video_seq_length,
            flip=flip, dilate=self.cfg.dilate,
        )
        return dict(
            video_frames=frames,
            prompt_ids=self.tokenize(prompt),
            motion_bucket_id=np.float32(
                motion if self.cfg.motion_bucket_id is None else self.cfg.motion_bucket_id
            ),
            condition=cond,  # [F, H, W, 3] in [0, 1]
            controlnet_image_index=np.asarray(ctrl_idx, np.int32),
        )


class _WorkerError:
    """Wraps an exception raised inside a PrefetchLoader worker so the
    consumer re-raises it (the worker cannot raise across threads)."""

    def __init__(self, exc: Exception):
        self.exc = exc


def _monotonic() -> float:
    import time

    return time.monotonic()


class PrefetchLoader:
    """Threaded shuffling batch loader (host-side, replaces torch DataLoader).

    Collates numpy dicts; ``controlnet_image_index`` (ragged) is dropped from
    batches — the trainers don't consume it (the reference computes but never
    uses its sparse mask, SURVEY.md §2.3)."""

    def __init__(self, dataset, batch_size: int, num_workers: int = 4,
                 seed: int = 42, drop_keys=("controlnet_image_index",),
                 shard=(0, 1)):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.seed = seed
        self.drop_keys = drop_keys
        # (rank, world): multihost data sharding — every process builds the
        # SAME permutation (same seed), then takes a disjoint stride of the
        # batch list (the DistributedSampler contract of the reference's
        # accelerate DDP).  Truncated so every rank yields the same count —
        # a rank with one extra batch would deadlock the collectives.
        self.shard = tuple(shard)
        assert 0 <= self.shard[0] < self.shard[1], shard
        self._epoch = 0  # bumps per __iter__ so each epoch reshuffles

    def __iter__(self):
        # Fresh permutation per epoch (the torch DataLoader reshuffles each
        # epoch, train_svd.py:480-485) — seed + epoch keeps it reproducible.
        epoch, self._epoch = self._epoch, self._epoch + 1
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)  # re-roll per-item augmentations
        order = np.random.RandomState(self.seed + epoch).permutation(len(self.dataset))
        q: queue_mod.Queue = queue_mod.Queue(maxsize=2 * self.num_workers)
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order) - self.batch_size + 1, self.batch_size)
        ]
        rank, world = self.shard
        if world > 1:
            batches = batches[: len(batches) - len(batches) % world][rank::world]
            if not batches:
                # train_loop's `while step < num_iters: for batch in loader`
                # would otherwise spin forever on an empty epoch
                raise ValueError(
                    f"dataset yields {len(order) // self.batch_size} full "
                    f"batches, fewer than world={world}: every rank would "
                    "get zero batches (grow the dataset or shrink the batch)")
        it = iter(enumerate(batches))
        lock = threading.Lock()
        SENTINEL = object()
        # Bound the reorder buffer: a worker may only start a job while
        # fewer than max_ahead batches are un-yielded (ticket released when
        # the consumer yields, not when it dequeues) — otherwise one slow
        # batch lets the others drain past the queue's maxsize into
        # ``pending`` without limit (whole-epoch host OOM on video batches).
        max_ahead = 2 * self.num_workers
        tickets = threading.Semaphore(max_ahead)
        stop = threading.Event()  # consumer gone / worker failed: unwind

        def worker():
            while True:
                tickets.acquire()
                if stop.is_set():
                    return
                with lock:
                    job = next(it, None)
                if job is None:
                    tickets.release()
                    q.put((None, SENTINEL))
                    return
                bidx, idxs = job
                try:
                    items = [self.dataset[int(i)] for i in idxs]
                    batch = {
                        k: np.stack([it_[k] for it_ in items])
                        for k in items[0]
                        if k not in self.drop_keys
                    }
                except Exception as e:  # noqa: BLE001 — surface, don't hang
                    # the torch DataLoader this replaces PROPAGATES worker
                    # errors; a silently-dead worker here would leave the
                    # consumer blocked in q.get() forever
                    q.put((bidx, _WorkerError(e)))
                    return
                q.put((bidx, batch))

        threads = [threading.Thread(target=worker, daemon=True) for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        # Reorder buffer: yield batches in permutation order so runs with the
        # same seed see the same sequence regardless of worker scheduling.
        pending: dict = {}
        next_idx = 0
        done = 0
        try:
            while done < self.num_workers or pending:
                while next_idx in pending:
                    yield pending.pop(next_idx)
                    tickets.release()
                    next_idx += 1
                if done == self.num_workers and not pending:
                    break
                bidx, item = q.get()
                if item is SENTINEL:
                    done += 1
                    continue
                if isinstance(item, _WorkerError):
                    raise RuntimeError(
                        f"PrefetchLoader worker failed on batch {bidx} "
                        f"(dataset item error)") from item.exc
                pending[bidx] = item
            while next_idx in pending:
                yield pending.pop(next_idx)
                tickets.release()
                next_idx += 1
        finally:
            # break early / error / GC of the generator: release the workers
            # (they hold up to max_ahead decoded video batches) instead of
            # leaving them blocked on q.put / tickets.acquire for the rest
            # of the process lifetime
            stop.set()
            deadline = _monotonic() + 10.0
            while any(t.is_alive() for t in threads) and _monotonic() < deadline:
                try:
                    q.get_nowait()  # free queue slots for blocked q.put
                except queue_mod.Empty:
                    pass
                tickets.release()  # wake acquirers so they see `stop`
                for t in threads:
                    t.join(timeout=0.005)
