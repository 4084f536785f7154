"""Fast code-path check for __graft_entry__.dryrun_multichip: monkeypatch
the mid-size builders down to tiny so the sharded-vs-single cross-check
(the exact code path that hit the donated-array bug) runs in minutes, not
tens of minutes.  The full mid-size dryrun is validated separately (the
driver also runs it at round end)."""

import sys

sys.path.insert(0, "/root/repo")

import __graft_entry__ as g  # noqa: E402

g._mid_unet = g._tiny_unet
g._CTX_MID = g._CTX_TINY

from this_and_that_vdm_tpu.models.controlnet import ControlNetConfig  # noqa: E402

ControlNetConfig.mid = ControlNetConfig.tiny

g.dryrun_multichip(8)
print("TINY_DRYRUN_OK")
