"""Flow-backend substitution artifact (VERDICT r3 missing #3).

Runs curation/flow_eval.py over the four real Bridge_example fixture images
(known-motion clips built from their pixels) and emits ONE JSON with:
  * Farneback (the shipped no-weights fallback) trajectory endpoint error
    vs exact ground truth, per fixture;
  * the chaining code's own error on perfect flows (isolates chain vs
    backend);
  * endpoint drift induced by flow noise at EPE 0.5/1.0/2.0 px — the bound
    on what the published RAFT-vs-FlowFormer EPE gap (~0.5 px on Sintel)
    can do to a curated trajectory.

    python perf_r4/flow_substitution.py > perf_r4/flow_substitution.json
"""

import glob
import json
import sys

import cv2
import numpy as np

from this_and_that_vdm_tpu.curation import flow_eval
from this_and_that_vdm_tpu.curation.detectors import farneback_flow

FIXTURES = sorted(glob.glob(
    "/root/reference/__assets__/Bridge_example/*/im_0.jpg"))


def main():
    per_fixture = []
    for path in FIXTURES:
        img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        img = cv2.resize(img, (256, 192))
        frames, gt_flows, _ = flow_eval.make_moving_patch_clip(
            img, n_frames=12, velocity=(4.0, 2.0))
        r = flow_eval.evaluate_backend_on_clip(
            frames, gt_flows, (4.0, 2.0), farneback_flow)
        r["fixture"] = path.split("/")[-2]
        per_fixture.append(r)

    # EPE sensitivity on the first fixture's geometry (chain property, not
    # image property — identical gt_flows structure across fixtures)
    img = cv2.cvtColor(cv2.imread(FIXTURES[0]), cv2.COLOR_BGR2RGB)
    img = cv2.resize(img, (256, 192))
    _, gt_flows, _ = flow_eval.make_moving_patch_clip(
        img, n_frames=12, velocity=(4.0, 2.0))
    sweep = flow_eval.epe_sensitivity(gt_flows)

    out = dict(
        clip=dict(n_frames=12, velocity=[4.0, 2.0], resolution="192x256",
                  travel_px=per_fixture[0]["travel_px"]),
        farneback=per_fixture,
        epe_sensitivity=sweep,
        note=("published EPE (Sintel-clean): RAFT ~1.4, FlowFormer ~0.9; "
              "the 0.5-1.0 px rows bound the substitution's trajectory "
              "effect"),
    )
    json.dump(out, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
