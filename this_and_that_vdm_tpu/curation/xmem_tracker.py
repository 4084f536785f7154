"""XMem inference: working/long-term memory and the per-frame tracking core.

Replicates the reference's vendored inference stack
(track_anything_code/tracker/inference/{inference_core,memory_manager,
kv_memory_store}.py and tracker/util/{mask_mapper,tensor_util}.py,
SURVEY §2.7) on top of the flax network in ``models/xmem.py``:

  * ``KeyValueMemoryStore`` — token-major key/value store with per-object
    groups, usage counting and range sieving;
  * ``MemoryManager`` — working memory with every-insert overflow checks,
    long-term consolidation into usage-ranked prototypes (128 prototypes,
    1000 max elements — reference tracker/config/config.yaml), and the
    GRU hidden state;
  * ``XMemInferenceCore`` — mem_every/deep_update scheduling
    (inference_core.py:42-115);
  * ``MaskMapper`` / ``pad_divide_by`` utilities.

Storage lives in host numpy (it grows/shrinks dynamically); the compute-heavy
similarity / top-k softmax / readout run as jitted JAX matmuls
(models/xmem.py).  Shapes change only when memory grows (every ``mem_every``
frames), so jit re-traces a handful of small graphs per video — acceptable
for offline curation tooling, and every FLOP lands on the MXU.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..models.xmem import (
    XMem,
    aggregate,
    key_similarity,
    normalize_imagenet,
    topk_softmax,
)

DEFAULT_CONFIG: Dict = {
    # reference track_anything_code/tracker/config/config.yaml
    "top_k": 30,
    "mem_every": 5,
    "deep_update_every": -1,
    "enable_long_term": True,
    "enable_long_term_count_usage": True,
    "max_mid_term_frames": 10,
    "min_mid_term_frames": 5,
    "num_prototypes": 128,
    "max_long_term_elements": 1000,
    "hidden_dim": 64,
}


# ---------------------------------------------------------------------------
# Tensor utilities (reference tracker/util/tensor_util.py)
# ---------------------------------------------------------------------------

def pad_divide_by(arr: np.ndarray, d: int) -> Tuple[np.ndarray, Tuple[int, int, int, int]]:
    """Centre-pad H/W (the two leading-from-the-right spatial axes of an
    [..., H, W] or [H, W, C] array is ambiguous — here: axes (-3,-2) for
    HWC images, (-2,-1) for mask stacks).  Returns (padded, (lw,uw,lh,uh))."""
    if arr.ndim == 3 and arr.shape[-1] in (1, 3):  # HWC image
        h_ax, w_ax = 0, 1
    else:  # [..., H, W]
        h_ax, w_ax = arr.ndim - 2, arr.ndim - 1
    h, w = arr.shape[h_ax], arr.shape[w_ax]
    new_h = (h + d - 1) // d * d
    new_w = (w + d - 1) // d * d
    lh, uh = (new_h - h) // 2, (new_h - h) - (new_h - h) // 2
    lw, uw = (new_w - w) // 2, (new_w - w) - (new_w - w) // 2
    pad = [(0, 0)] * arr.ndim
    pad[h_ax] = (lh, uh)
    pad[w_ax] = (lw, uw)
    return np.pad(arr, pad), (lw, uw, lh, uh)


def unpad(arr: np.ndarray, pad: Tuple[int, int, int, int],
          h_ax: int, w_ax: int) -> np.ndarray:
    lw, uw, lh, uh = pad
    sl = [slice(None)] * arr.ndim
    if lh + uh > 0:
        sl[h_ax] = slice(lh, arr.shape[h_ax] - uh)
    if lw + uw > 0:
        sl[w_ax] = slice(lw, arr.shape[w_ax] - uw)
    return arr[tuple(sl)]


def all_to_onehot(mask: np.ndarray, labels: Sequence[int]) -> np.ndarray:
    """Indexed mask [H,W] -> one-hot [num_labels,H,W] uint8."""
    return np.stack([(mask == l).astype(np.uint8) for l in labels], 0)


class MaskMapper:
    """Remaps possibly non-contiguous object indices to 1..N and back
    (reference tracker/util/mask_mapper.py)."""

    def __init__(self):
        self.labels: List[int] = []
        self.remappings: Dict[int, int] = {}
        self.coherent = True

    def convert_mask(self, mask: np.ndarray, exhaustive: bool = False):
        labels = [int(l) for l in np.unique(mask) if l != 0]
        new_labels = [l for l in labels if l not in self.labels]
        if not exhaustive:
            assert len(new_labels) == len(labels), "old labels in non-exhaustive mode"
        for i, l in enumerate(new_labels):
            self.remappings[l] = i + len(self.labels) + 1
            if self.coherent and i + len(self.labels) + 1 != l:
                self.coherent = False
        if exhaustive:
            mapped = list(range(1, len(self.labels) + len(new_labels) + 1))
        elif self.coherent:
            mapped = new_labels
        else:
            mapped = list(range(len(self.labels) + 1,
                                len(self.labels) + len(new_labels) + 1))
        self.labels.extend(new_labels)
        return all_to_onehot(mask, self.labels).astype(np.float32), mapped

    def remap_index_mask(self, mask: np.ndarray) -> np.ndarray:
        if self.coherent:
            return mask
        out = np.zeros_like(mask)
        for l, i in self.remappings.items():
            out[mask == i] = l
        return out


# ---------------------------------------------------------------------------
# Jitted memory kernels
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("top_k",))
def _suffix_affinity(sim, top_k: Optional[int]):
    return topk_softmax(sim, top_k)


@jax.jit
def _readout_kernel(affinity, mv):
    # affinity [1,P,Ng], mv [num_obj, Ng, CV] -> [num_obj, P, CV]
    return jnp.einsum("xpn,onc->opc", affinity, mv)


# ---------------------------------------------------------------------------
# Key/value store (reference tracker/inference/kv_memory_store.py)
# ---------------------------------------------------------------------------

class KeyValueMemoryStore:
    """Keys are shared across object groups ([1, N, CK]); values are a list
    of per-group arrays ([num_obj_in_group, N_g, CV]) where group ``g`` owns
    the LAST ``N_g`` key slots (objects entering later have shorter memory)."""

    def __init__(self, count_usage: bool):
        self.count_usage = count_usage
        self.k: Optional[np.ndarray] = None      # [1, N, CK]
        self.s: Optional[np.ndarray] = None      # [1, N]
        self.e: Optional[np.ndarray] = None      # [1, N, CK]
        self.v: List[Optional[np.ndarray]] = []  # [n_obj_g, N_g, CV]
        # long-term stores only: exact key slot of every value column
        # ([N_g] int per group).  Consolidation prototypes valid for a group
        # are generally NOT a suffix of the appended keys (validity follows
        # usage-ranked candidate indices), so suffix slicing would misalign
        # keys and values — the hazard behind the reference's
        # NotImplementedError (kv_memory_store.py:146-151).
        self.v_idx: List[Optional[np.ndarray]] = []
        self.obj_groups: List[List[int]] = []
        self.all_objects: List[int] = []
        self.use_count: Optional[np.ndarray] = None  # [N]
        self.life_count: Optional[np.ndarray] = None

    def add(self, key, value, shrinkage, selection, objects: Optional[List[int]],
            value_key_idx: Optional[List[Optional[np.ndarray]]] = None):
        n_new = key.shape[1]
        old_size = 0 if self.k is None else self.k.shape[1]
        if self.k is None:
            self.k, self.s, self.e = key, shrinkage, selection
            if self.count_usage:
                self.use_count = np.zeros(n_new, np.float32)
                self.life_count = np.full(n_new, 1e-7, np.float32)
        else:
            self.k = np.concatenate([self.k, key], 1)
            if shrinkage is not None:
                self.s = np.concatenate([self.s, shrinkage], 1)
            if selection is not None:
                self.e = np.concatenate([self.e, selection], 1)
            if self.count_usage:
                self.use_count = np.concatenate(
                    [self.use_count, np.zeros(n_new, np.float32)])
                self.life_count = np.concatenate(
                    [self.life_count, np.full(n_new, 1e-7, np.float32)])

        if objects is not None:
            # working memory: value is [num_objects, n_new, CV]; distribute
            # onto existing groups, then open a new group for newcomers
            remaining = [obj - 1 for obj in objects]
            for gi, group in enumerate(self.obj_groups):
                for obj in group:
                    remaining.remove(obj)
                self.v[gi] = np.concatenate([self.v[gi], value[group]], 1)
            if remaining:
                self.v.append(value[remaining])
                self.obj_groups.append(list(remaining))
                self.all_objects.extend(remaining)
                assert sorted(self.all_objects) == self.all_objects, \
                    "objects must be inserted in sorted order"
        else:
            # long-term memory: value is a per-group list (None = skip this
            # round for that group).  value_key_idx[gi] gives each value
            # column's position within the n_new appended keys; groups are
            # kept index-aligned with the working store via None placeholders
            # (a group can be skipped for several rounds before its first
            # prototypes land).
            for gi, gv in enumerate(value):
                if gv is None:
                    continue
                local = (np.arange(gv.shape[1], dtype=np.int64)
                         if value_key_idx is None or value_key_idx[gi] is None
                         else np.asarray(value_key_idx[gi], np.int64))
                gidx = old_size + local
                while len(self.v) <= gi:
                    self.v.append(None)
                    self.v_idx.append(None)
                if self.v[gi] is None:
                    self.v[gi] = gv
                    self.v_idx[gi] = gidx
                else:
                    self.v[gi] = np.concatenate([self.v[gi], gv], 1)
                    self.v_idx[gi] = np.concatenate([self.v_idx[gi], gidx])

    def update_usage(self, usage: np.ndarray):
        if not self.count_usage:
            return
        self.use_count = self.use_count + usage.reshape(-1)
        self.life_count = self.life_count + 1.0

    def get_usage(self) -> np.ndarray:
        if not self.count_usage:
            raise RuntimeError("usage was not counted")
        return self.use_count / self.life_count

    def sieve_by_range(self, start: int, end: int, min_size: int):
        """Drop slots in [start, end) of the token axis (end<=0 counts from
        the back); values smaller than min_size are left alone (they were not
        consolidated)."""
        def cut(a, axis):
            if a is None:
                return None
            if end == 0:
                return np.take(a, range(start), axis)
            idx = list(range(start)) + list(range(a.shape[axis] + end if end < 0 else end,
                                                  a.shape[axis]))
            return np.take(a, idx, axis)

        self.k = cut(self.k, 1)
        self.s = cut(self.s, 1)
        self.e = cut(self.e, 1)
        if self.count_usage:
            self.use_count = cut(self.use_count, 0)
            self.life_count = cut(self.life_count, 0)
        for gi in range(self.num_groups):
            if self.v[gi].shape[1] >= min_size:
                self.v[gi] = cut(self.v[gi], 1)

    def remove_obsolete_features(self, max_size: int):
        """Evict the lowest-usage slots down to ``max_size``.

        Goes beyond the reference here: kv_memory_store.py:146-151 raises
        NotImplementedError for >1 object group ("we need to remap the
        indices for keys to values").  Long-term groups carry the exact key
        slot of every value column (``v_idx``, written by the
        consolidation-validity path of ``add``), so the remap is exact:
        keep the value columns whose key survived, then renumber.  Working
        stores (no ``v_idx``) keep the suffix rule, which IS exact there —
        every working ``add`` appends values for all existing groups, and a
        new group starts at the then-current end."""
        usage = self.get_usage()
        old_size = self.size
        drop = old_size - max_size
        if drop <= 0:
            return
        threshold = np.sort(usage)[drop - 1]
        survived = usage > threshold
        new_pos = np.cumsum(survived) - 1  # old key slot -> new key slot
        self.k = self.k[:, survived]
        self.s = self.s[:, survived] if self.s is not None else None
        self.e = self.e[:, survived] if self.e is not None else None
        for gi in range(self.num_groups):
            if self.v[gi] is None:
                continue
            if gi < len(self.v_idx) and self.v_idx[gi] is not None:
                keep = survived[self.v_idx[gi]]
                self.v[gi] = self.v[gi][:, keep]
                self.v_idx[gi] = new_pos[self.v_idx[gi][keep]].astype(np.int64)
            else:
                n_gi = self.v[gi].shape[1]
                self.v[gi] = self.v[gi][:, survived[old_size - n_gi:]]
        self.use_count = self.use_count[survived]
        self.life_count = self.life_count[survived]

    def get_all_sliced(self, start: int, end: int):
        sl = slice(start, None) if end == 0 else slice(start, end)
        k = self.k[:, sl]
        s = self.s[:, sl] if self.s is not None else None
        e = self.e[:, sl] if self.e is not None else None
        usage = self.get_usage()[sl]
        return k, s, e, usage

    def get_v_size(self, gi: int) -> int:
        return 0 if self.v[gi] is None else self.v[gi].shape[1]

    def engaged(self) -> bool:
        return self.k is not None

    @property
    def size(self) -> int:
        return 0 if self.k is None else self.k.shape[1]

    @property
    def num_groups(self) -> int:
        return len(self.v)


# ---------------------------------------------------------------------------
# Memory manager (reference tracker/inference/memory_manager.py)
# ---------------------------------------------------------------------------

class MemoryManager:
    def __init__(self, config: Dict = DEFAULT_CONFIG):
        self.hidden_dim = config["hidden_dim"]
        self.top_k = config["top_k"]
        self.enable_long_term = config["enable_long_term"]
        self.enable_long_term_usage = config["enable_long_term_count_usage"]
        if self.enable_long_term:
            self.max_mt_frames = config["max_mid_term_frames"]
            self.min_mt_frames = config["min_mid_term_frames"]
            # min_mt_frames == 1 makes the consolidation candidate slice
            # [HW:-0] degenerate (latent in the reference too; its config
            # uses 5) — reject early instead of corrupting the store.
            assert self.min_mt_frames >= 2, "min_mid_term_frames must be >= 2"
            self.num_prototypes = config["num_prototypes"]
            self.max_long_elements = config["max_long_term_elements"]
        self.CK = self.CV = None
        self.H = self.W = self.HW = None
        self.hidden: Optional[np.ndarray] = None  # [1, n, h, w, Ch]
        self.work_mem = KeyValueMemoryStore(count_usage=self.enable_long_term)
        if self.enable_long_term:
            self.long_mem = KeyValueMemoryStore(
                count_usage=self.enable_long_term_usage)

    def match_memory(self, query_key: np.ndarray,
                     selection: Optional[np.ndarray]) -> np.ndarray:
        """query_key/selection [1, h, w, CK] -> readout [1, num_obj, h, w, CV]."""
        num_groups = self.work_mem.num_groups
        h, w = query_key.shape[1:3]
        qk = jnp.asarray(query_key.reshape(1, h * w, -1))
        qe = (jnp.asarray(selection.reshape(1, h * w, -1))
              if selection is not None else None)

        use_long = self.enable_long_term and self.long_mem.engaged()
        if use_long:
            long_size = self.long_mem.size
            mk = np.concatenate([self.long_mem.k, self.work_mem.k], 1)
            ms = np.concatenate([self.long_mem.s, self.work_mem.s], 1)
        else:
            long_size = 0
            mk, ms = self.work_mem.k, self.work_mem.s

        sim = np.asarray(key_similarity(  # [1, P, N]
            jnp.asarray(mk), jnp.asarray(ms), qk, qe))
        work_sim = sim[:, :, long_size:]
        long_sim = sim[:, :, :long_size]

        def _long_group_engaged(gi):
            return (use_long and gi < self.long_mem.num_groups
                    and self.long_mem.v[gi] is not None)

        def _long_cols(gi):
            # exact key slots of group gi's long-term values (v_idx); the
            # valid-prototype subset is generally not a suffix of the store
            idx = self.long_mem.v_idx[gi]
            return np.take(long_sim, idx, axis=-1)

        affinities: List[np.ndarray] = []
        # group 0 owns every work slot; its affinity also yields usage
        if _long_group_engaged(0):
            g0 = np.concatenate([_long_cols(0), work_sim], -1)
        else:
            g0 = work_sim
        aff0, usage = _match_kernel_from_sim(g0, self.top_k)
        affinities.append(np.asarray(aff0))
        usage = np.asarray(usage)

        for gi in range(1, num_groups):
            work_part = work_sim[:, :, work_sim.shape[-1] - self.work_mem.get_v_size(gi):]
            if _long_group_engaged(gi):
                gsim = np.concatenate([_long_cols(gi), work_part], -1)
            else:
                gsim = work_part
            affinities.append(np.asarray(_suffix_affinity(jnp.asarray(gsim),
                                                          self.top_k)))

        if use_long:
            values = []
            for gi in range(num_groups):
                if _long_group_engaged(gi):
                    values.append(np.concatenate(
                        [self.long_mem.v[gi], self.work_mem.v[gi]], 1))
                else:
                    values.append(self.work_mem.v[gi])
            # usage bookkeeping: usage vector covers [long g0 cols; work]
            work_usage = usage[0, usage.shape[1] - self.work_mem.size:]
            self.work_mem.update_usage(work_usage)
            if self.enable_long_term_usage:
                long_usage = np.zeros(long_size, np.float32)
                if _long_group_engaged(0):
                    idx0 = self.long_mem.v_idx[0]
                    long_usage[idx0] = usage[0, :idx0.size]
                self.long_mem.update_usage(long_usage)
        else:
            values = self.work_mem.v
            if self.enable_long_term:
                self.work_mem.update_usage(usage[0])

        readouts = [
            np.asarray(_readout_kernel(jnp.asarray(affinities[gi]),
                                       jnp.asarray(values[gi])))
            for gi in range(num_groups)
        ]
        out = np.concatenate(readouts, 0)  # [num_obj_total, P, CV]
        return out.reshape(1, out.shape[0], h, w, -1)

    def add_memory(self, key, shrinkage, value, objects: List[int],
                   selection=None):
        """key/shrinkage/selection [1,h,w,*]; value [1,num_obj,h,w,CV]."""
        if self.H is None:
            self.H, self.W = key.shape[1:3]
            self.HW = self.H * self.W
            if self.enable_long_term:
                self.min_work_elements = self.min_mt_frames * self.HW
                self.max_work_elements = self.max_mt_frames * self.HW

        key = key.reshape(1, -1, key.shape[-1])
        shrinkage = shrinkage.reshape(1, -1)
        value = value[0].reshape(value.shape[1], -1, value.shape[-1])
        self.CK, self.CV = key.shape[-1], value.shape[-1]
        if selection is not None:
            selection = selection.reshape(1, -1, selection.shape[-1])

        self.work_mem.add(key, value, shrinkage, selection, objects)

        if self.enable_long_term and self.work_mem.size >= self.max_work_elements:
            if self.long_mem.size >= self.max_long_elements - self.num_prototypes:
                self.long_mem.remove_obsolete_features(
                    self.max_long_elements - self.num_prototypes)
            self.compress_features()

    def compress_features(self):
        HW = self.HW
        total = self.work_mem.size
        candidate_value = []
        for gv in self.work_mem.v:
            n_g = gv.shape[1]
            if n_g == total:
                candidate_value.append(gv[:, HW:-self.min_work_elements + HW])
            elif n_g > self.min_work_elements + HW:
                candidate_value.append(gv[:, HW:-self.min_work_elements + HW])
            else:
                candidate_value.append(None)

        pk, pv, ps, pidx = self.consolidation(
            *self.work_mem.get_all_sliced(HW, -self.min_work_elements + HW),
            candidate_value)
        self.work_mem.sieve_by_range(HW, -self.min_work_elements + HW,
                                     min_size=self.min_work_elements + HW)
        self.long_mem.add(pk, pv, ps, selection=None, objects=None,
                          value_key_idx=pidx)

    def consolidation(self, cand_key, cand_shrinkage, cand_selection, usage,
                      candidate_value):
        """Distill candidate tokens into usage-ranked prototypes
        (memory_manager.py:245-285).  cand_key [1,N,CK]; usage [N]."""
        n = cand_key.shape[1]
        k = min(self.num_prototypes, n)
        proto_idx = np.argsort(-usage)[:k]

        validity = [proto_idx >= (n - gv.shape[1]) if gv is not None else None
                    for gv in candidate_value]

        proto_key = cand_key[:, proto_idx]
        proto_sel = (cand_selection[:, proto_idx]
                     if cand_selection is not None else None)

        # potentiate: candidates attend onto prototypes ([1, P=proto, N=cand])
        sim = np.asarray(key_similarity(
            jnp.asarray(cand_key), jnp.asarray(cand_shrinkage),
            jnp.asarray(proto_key),
            jnp.asarray(proto_sel) if proto_sel is not None else None))

        proto_value, proto_value_idx, affinity0 = [], [], None
        for gi, gv in enumerate(candidate_value):
            if gv is None:
                proto_value.append(None)
                proto_value_idx.append(None)
                continue
            valid = validity[gi]
            gsim = sim[:, valid][:, :, n - gv.shape[1]:]
            if gsim.shape[1] == 0:
                proto_value.append(None)
                proto_value_idx.append(None)
                continue
            aff = np.asarray(_suffix_affinity(jnp.asarray(gsim), None))
            if gi == 0:
                affinity0 = aff
            proto_value.append(
                np.asarray(_readout_kernel(jnp.asarray(aff), jnp.asarray(gv))))
            # positions of this group's values within the k appended
            # prototype keys (NOT a suffix: validity follows usage order)
            proto_value_idx.append(np.nonzero(valid)[0].astype(np.int64))

        proto_shrinkage = (
            np.einsum("xpn,xn->xp", affinity0, cand_shrinkage)
            if affinity0 is not None and cand_shrinkage is not None else None)
        return proto_key, proto_value, proto_shrinkage, proto_value_idx

    # hidden state -----------------------------------------------------------
    def create_hidden_state(self, n: int, sample_key: np.ndarray):
        h, w = sample_key.shape[1:3]
        if self.hidden is None:
            self.hidden = np.zeros((1, n, h, w, self.hidden_dim), np.float32)
        elif self.hidden.shape[1] != n:
            extra = np.zeros((1, n - self.hidden.shape[1], h, w,
                              self.hidden_dim), np.float32)
            self.hidden = np.concatenate([self.hidden, extra], 1)

    def set_hidden(self, hidden):
        self.hidden = np.asarray(hidden)

    def get_hidden(self):
        return self.hidden


def _match_kernel_from_sim(sim: np.ndarray, top_k: Optional[int]):
    aff, usage = _topk_with_usage(jnp.asarray(sim), top_k)
    return aff, usage


@functools.partial(jax.jit, static_argnames=("top_k",))
def _topk_with_usage(sim, top_k: Optional[int]):
    return topk_softmax(sim, top_k, return_usage=True)


# ---------------------------------------------------------------------------
# Inference core (reference tracker/inference/inference_core.py)
# ---------------------------------------------------------------------------

class XMemInferenceCore:
    """Per-frame stepping: encode key, read memory, segment, write memory
    every ``mem_every`` frames with synchronized deep hidden updates."""

    def __init__(self, model: XMem, params, config: Dict = DEFAULT_CONFIG):
        self.model = model
        self.params = params
        self.config = dict(config)
        self.mem_every = self.config["mem_every"]
        self.deep_update_every = self.config["deep_update_every"]
        self.enable_long_term = self.config["enable_long_term"]
        self.deep_update_sync = self.deep_update_every < 0

        self._encode_key = jax.jit(
            lambda p, f, sk, ek: model.apply(p, f, sk, ek,
                                             method=model.encode_key),
            static_argnames=("sk", "ek"))
        self._encode_value = jax.jit(
            lambda p, f, f16, h, m, deep: model.apply(
                p, f, f16, h, m, deep, method=model.encode_value),
            static_argnames=("deep",))
        self._segment = jax.jit(
            lambda p, f16, f8, f4, mem, h, h_out: model.apply(
                p, f16, f8, f4, mem, h, h_out, False, method=model.segment),
            static_argnames=("h_out",))

        self.clear_memory()
        self.all_labels: Optional[List[int]] = None

    def clear_memory(self):
        self.curr_ti = -1
        self.last_mem_ti = 0
        if not self.deep_update_sync:
            self.last_deep_update_ti = -self.deep_update_every
        self.memory = MemoryManager(self.config)

    def set_all_labels(self, all_labels: List[int]):
        self.all_labels = list(all_labels)

    def step(self, image01: np.ndarray, mask: Optional[np.ndarray] = None,
             valid_labels: Optional[List[int]] = None, end: bool = False):
        """image01: [H,W,3] float32 in [0,1] (RGB); mask: [num_obj,H,W] float
        one-hot (no background) on frames that introduce objects.
        Returns prob_with_bg [num_obj+1, H, W]."""
        self.curr_ti += 1
        frame = np.asarray(normalize_imagenet(jnp.asarray(image01)))
        frame, self.pad = pad_divide_by(frame, 16)
        frame_b = frame[None]

        is_mem_frame = ((self.curr_ti - self.last_mem_ti >= self.mem_every)
                        or (mask is not None)) and not end
        need_segment = self.curr_ti > 0 and (
            valid_labels is None or len(self.all_labels) != len(valid_labels))
        is_deep_update = ((self.deep_update_sync and is_mem_frame) or (
            not self.deep_update_sync
            and self.curr_ti - self.last_deep_update_ti >= self.deep_update_every
        )) and not end
        is_normal_update = (not self.deep_update_sync or not is_deep_update) \
            and not end

        key, shrinkage, selection, f16, f8, f4 = map(
            lambda x: None if x is None else np.asarray(x),
            self._encode_key(self.params, jnp.asarray(frame_b),
                             is_mem_frame,
                             (self.enable_long_term or need_segment)))

        pred_prob_with_bg = None
        if need_segment:
            mem_readout = self.memory.match_memory(key, selection)
            hidden, _logits, prob = self._segment(
                self.params, jnp.asarray(f16), jnp.asarray(f8),
                jnp.asarray(f4), jnp.asarray(mem_readout),
                jnp.asarray(self.memory.get_hidden()), is_normal_update)
            pred_prob_with_bg = np.asarray(prob)[0]  # [num_obj+1, H, W]
            if is_normal_update:
                self.memory.set_hidden(hidden)

        if mask is not None:
            mask, _ = pad_divide_by(mask.astype(np.float32), 16)
            if pred_prob_with_bg is not None:
                pred_no_bg = pred_prob_with_bg[1:].copy()
                pred_no_bg[:, mask.sum(0) > 0.5] = 0.0
                mask = mask.astype(pred_no_bg.dtype)
                if valid_labels is not None:
                    for i in range(pred_no_bg.shape[0]):
                        if (i + 1) not in valid_labels:
                            mask[i] = pred_no_bg[i]
            pred_prob_with_bg = np.asarray(
                aggregate(jnp.asarray(mask), axis=0))
            self.memory.create_hidden_state(len(self.all_labels), key)

        if is_mem_frame:
            value, hidden = self._encode_value(
                self.params, jnp.asarray(frame_b), jnp.asarray(f16),
                jnp.asarray(self.memory.get_hidden()),
                jnp.asarray(pred_prob_with_bg[1:][None]), is_deep_update)
            self.memory.add_memory(
                key, shrinkage, np.asarray(value), self.all_labels,
                selection=selection if self.enable_long_term else None)
            self.last_mem_ti = self.curr_ti
            if is_deep_update:
                self.memory.set_hidden(hidden)
                self.last_deep_update_ti = self.curr_ti

        return unpad(pred_prob_with_bg, self.pad, 1, 2)


def xmem_propagator(params, config: Dict = DEFAULT_CONFIG):
    """Adapter for the tracking facade (tracking.py): returns a function
    ``(frames_rgb uint8 list, first_mask bool [H,W]) -> list of bool masks``
    that propagates the first-frame mask through the clip with XMem."""
    model = XMem()
    core = XMemInferenceCore(model, params, config)

    def propagate(frames_rgb: Sequence[np.ndarray], first_mask: np.ndarray):
        core.clear_memory()
        core.set_all_labels([1])
        masks = []
        for ti, frame in enumerate(frames_rgb):
            img = frame.astype(np.float32) / 255.0
            if ti == 0:
                prob = core.step(img, mask=first_mask[None].astype(np.float32))
                masks.append(first_mask.astype(bool))
            else:
                prob = core.step(img)
                masks.append(np.asarray(prob[1:]).sum(0) > 0.5)
        return masks

    return propagate
