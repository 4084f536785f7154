"""Raw Bridge -> flat instance folders (``NNNNNN/im_*.jpg`` + ``policy_out.pkl``
+ ``lang.txt``).

Replicates reference curation_pipeline/prepare_bridge_v{1,2}.py: walk the raw
tree down to ``raw/traj_group0/traj*/``, keep only trajectories that carry
both ``policy_out.pkl`` and ``lang.txt``, copy the ``images0`` camera folder
to ``<dst>/<index>/`` and the aux files alongside.  v1 nests one directory
level less than v2 (v1:30-45 vs v2:30-49).
"""

from __future__ import annotations

import os
import shutil
from typing import Iterator


def _iter_traj_dirs(dataset_path: str, version: int) -> Iterator[str]:
    # levels above the time-clock dir: v2 = scene/task/order, v1 one less
    depth = 3 if version == 1 else 4
    stack = [(dataset_path, 0)]
    while stack:
        path, d = stack.pop()
        if d < depth:
            if os.path.isdir(path):
                for name in sorted(os.listdir(path)):
                    stack.append((os.path.join(path, name), d + 1))
            continue
        # time-clock level
        if os.path.basename(path) == "lmdb" or not os.path.isdir(path):
            continue
        group = os.path.join(path, "raw", "traj_group0")
        if not os.path.isdir(group):
            continue
        for traj in sorted(os.listdir(group)):
            traj_path = os.path.join(group, traj)
            if os.path.isdir(traj_path):
                yield traj_path


def flatten_bridge(dataset_path: str, destination_path: str, version: int = 2,
                   camera: str = "images0") -> int:
    """Returns the number of flattened instances."""
    if os.path.exists(destination_path):
        shutil.rmtree(destination_path)
    os.makedirs(destination_path)
    idx = 0
    for traj_path in _iter_traj_dirs(dataset_path, version):
        policy = os.path.join(traj_path, "policy_out.pkl")
        lang = os.path.join(traj_path, "lang.txt")
        images = os.path.join(traj_path, camera)
        if not (os.path.exists(policy) and os.path.exists(lang) and os.path.isdir(images)):
            continue
        target = os.path.join(destination_path, str(idx))
        if os.path.exists(target):
            shutil.rmtree(target)
        shutil.copytree(images, target)
        shutil.copy(policy, os.path.join(target, "policy_out.pkl"))
        shutil.copy(lang, os.path.join(target, "lang.txt"))
        idx += 1
    return idx


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--dataset_path", required=True)
    p.add_argument("--destination_path", required=True)
    p.add_argument("--version", type=int, choices=[1, 2], default=2)
    args = p.parse_args(argv)
    n = flatten_bridge(args.dataset_path, args.destination_path, args.version)
    print(f"flattened {n} instances")


if __name__ == "__main__":
    main()
