"""Full-chain weights rehearsal (round 3, VERDICT r2 next #6): synthesized
HF-layout repo -> cli.inference --pretrained render -> cli.eval PSNR gate,
with a perturbed-weights negative control that must fail the gate.

This is the egress-free dress rehearsal of the exact path the published
HikariDawn/This-and-That-1.1 weights will take (reference
test_code/inference.py:296-381)."""

import os
import shutil

import pytest


@pytest.mark.slow
def test_rehearsal_chain_tiny(tmp_path):
    from this_and_that_vdm_tpu.cli import rehearsal

    # one instance keeps the three renders quick (tiny models; frames stay
    # 14 — the fixture's data.txt gesture indices land at frames 4/10)
    src = "/root/reference/__assets__/Bridge_example/Task1_v1_511"
    val = tmp_path / "val" / "Task1_v1_511"
    shutil.copytree(src, val)

    rc = rehearsal.main([
        "--out", str(tmp_path / "rehearsal"), "--scale", "tiny",
        "--steps", "2", "--height", "64", "--width", "128",
        "--validation-path", str(tmp_path / "val"),
    ])
    assert rc == 0


def test_synthesize_layout_contract(tmp_path):
    """The synthesized tree must carry the published repos' exact layout:
    subfolder names, fp16 variant file naming, tokenizer files, YAMLs."""
    from this_and_that_vdm_tpu.cli.rehearsal import synthesize_hf_repo

    repo = synthesize_hf_repo(str(tmp_path / "w"), "tiny", variant="fp16")
    for sub, stem in [
        ("unet", "diffusion_pytorch_model.fp16.safetensors"),
        ("gesturenet", "diffusion_pytorch_model.fp16.safetensors"),
        ("vae", "diffusion_pytorch_model.fp16.safetensors"),
        ("image_encoder", "model.fp16.safetensors"),
        ("text_encoder", "model.fp16.safetensors"),
    ]:
        assert os.path.exists(os.path.join(repo, sub, stem)), (sub, stem)
    for f in ("tokenizer/vocab.json", "tokenizer/merges.txt",
              "train_image2video.yaml", "train_image2video_gesturenet.yaml"):
        assert os.path.exists(os.path.join(repo, f)), f

    # the tokenizer is a real loadable CLIPTokenizer
    from transformers import CLIPTokenizer

    tok = CLIPTokenizer.from_pretrained(repo, subfolder="tokenizer")
    ids = tok(["pick this up"], max_length=tok.model_max_length,
              padding="max_length", return_tensors="np").input_ids
    assert ids.shape == (1, 77)

    # fp16 shards load back as fp32 params (storage-format upcast)
    from this_and_that_vdm_tpu.weights import loader

    params = loader.load_unet_params(repo)
    import jax
    import numpy as np

    leaves = jax.tree.leaves(params)
    assert leaves and all(
        np.asarray(l).dtype != np.float16 for l in leaves)
