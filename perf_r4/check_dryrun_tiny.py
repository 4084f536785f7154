"""Code-path check for __graft_entry__.dryrun_multichip's donation-safety
fix at TINY model scale: monkeypatch the mid-size builders down to tiny so
the sharded-vs-single cross-check (the exact code path that hit the
deleted-array bug) runs in minutes, not tens of minutes.  The full mid-size
dryrun is validated separately (the driver also runs it at round end)."""

import sys

sys.path.insert(0, "/root/repo")

import __graft_entry__ as g  # noqa: E402

g._mid_unet = g._tiny_unet

from this_and_that_vdm_tpu.models.controlnet import ControlNetConfig  # noqa: E402

ControlNetConfig.mid = ControlNetConfig.tiny

g.dryrun_multichip(8)
print("TINY_DRYRUN_OK")
