"""Interactive This&That demo — the reference ``app.py`` redesigned.

Gradio Blocks UI: upload an image, click up to two gesture points
("this" -> red, "that" -> green), type a prompt, get an mp4.  Unlike the
reference (which rebuilds the accelerator + all models on every Run click,
app.py:188-271), the pipeline is built ONCE and kept resident; each run is a
single jitted call.

Gesture frame indices are ``[4, 10]`` for two points (reference app.py:159).

Falls back to a CLI one-shot mode when gradio isn't installed:
    python app.py --image img.jpg --points 120,80 200,160 \
        --prompt "put the cup on the plate" --out demo.mp4
"""

import argparse
import os
import tempfile

try:  # annotation resolution for on_select's evt: "gr.SelectData" —
    # gradio inspects type hints against THIS module's globals; without a
    # module-level binding the select handler never receives event data
    import gradio as gr  # noqa: F401
except ImportError:  # CLI one-shot mode works without gradio
    gr = None
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from this_and_that_vdm_tpu.cli.inference import configure_jax_runtime

configure_jax_runtime()  # honor JAX_PLATFORMS + persistent compile cache

import numpy as np
import cv2

HEIGHT, WIDTH, FRAMES = 256, 384, 14
GESTURE_FRAME_IDXS = [4, 10]


def build_pipeline(pretrained=None, random_weights=False, dtype="bf16"):
    from this_and_that_vdm_tpu.cli.inference import build_pipeline as _bp, _tokenizer

    args = argparse.Namespace(
        model_type="GestureNet", pretrained=pretrained,
        random_weights=random_weights, dtype=dtype,
        num_frames=FRAMES, height=HEIGHT, width=WIDTH,
    )
    return _bp(args), _tokenizer(args)


def prepare_inputs(tokenize, image_rgb_uint8, points, prompt):
    """Raster + resize + tokenize one request (points in display coords)."""
    from this_and_that_vdm_tpu.data.rasterize import rasterize_gesture_points

    oh, ow = image_rgb_uint8.shape[:2]
    gesture = [
        (GESTURE_FRAME_IDXS[i], float(x), float(y))
        for i, (x, y) in enumerate(points[:2])
    ]
    cond = rasterize_gesture_points(gesture, (oh, ow), (HEIGHT, WIDTH), FRAMES)
    img = cv2.resize(image_rgb_uint8, (WIDTH, HEIGHT), interpolation=cv2.INTER_CUBIC)
    img = img.astype(np.float32) / 127.5 - 1.0
    return img, np.asarray(cond), np.asarray(tokenize(prompt)).reshape(-1)


SAMPLING_DEFAULTS = dict(num_frames=FRAMES, motion_bucket_id=200,
                         noise_aug_strength=0.1, decode_chunk_size=8,
                         output_type="uint8")


def run_generation(pipe, tokenize, image_rgb_uint8, points, prompt, seed=42,
                   num_inference_steps=25):
    """CLI one-shot path (direct pipeline call)."""
    import jax.random as jr

    img, cond, ids = prepare_inputs(tokenize, image_rgb_uint8, points, prompt)
    frames = pipe(
        img[None], cond, prompt_ids=ids[None],
        num_inference_steps=num_inference_steps, key=jr.PRNGKey(seed),
        **SAMPLING_DEFAULTS,
    )
    return frames[0]  # [F, H, W, 3] uint8


def export_mp4(frames, path, fps=4):
    from this_and_that_vdm_tpu.utils.video_io import export_mp4 as _export

    return _export(frames, path, fps=fps)  # cv2/GIF fallback sans ffmpeg


def launch_gradio(pretrained=None, random_weights=False):
    import gradio as gr

    from this_and_that_vdm_tpu.serving import VideoGenServer

    pipe, tokenize = build_pipeline(pretrained, random_weights)
    # resident micro-batching server: concurrent gradio users with the same
    # resolution/steps share ONE pipeline invocation (serving/server.py) —
    # vs the reference demo rebuilding every model per click (app.py:188-271)
    server = VideoGenServer(pipe, max_batch=4, max_delay_s=0.25,
                            **SAMPLING_DEFAULTS)
    POINT_COLORS = [(255, 0, 0), (0, 255, 0)]  # display RGB: this=red, that=green

    def on_select(img, points, evt: "gr.SelectData"):
        points = (points or []) + [tuple(evt.index)]
        points = points[:2]
        vis = img.copy()
        for i, (x, y) in enumerate(points):
            cv2.circle(vis, (int(x), int(y)), 8, POINT_COLORS[min(i, 1)], -1)
        return vis, points

    def on_clear(img):
        return img, []

    def on_run(orig, points, prompt, seed, steps):
        if orig is None:
            raise gr.Error("upload an image first")
        if not points:
            raise gr.Error("click at least one gesture point")
        img, cond, ids = prepare_inputs(tokenize, orig, points, prompt)
        fut = server.submit(img, condition=cond, prompt_ids=ids,
                            seed=int(seed), num_inference_steps=int(steps))
        frames = fut.result()
        # unique output per run: concurrent users (queue concurrency 4) must
        # not overwrite each other's mp4 while gradio serves it
        fd, out_path = tempfile.mkstemp(prefix="demo_output_", suffix=".mp4")
        os.close(fd)
        out = export_mp4(frames, out_path)
        return out

    with gr.Blocks(title="This&That (TPU)") as demo:
        gr.Markdown("## This&That — language-gesture video generation (TPU-native)")
        points = gr.State([])
        orig = gr.State(None)
        with gr.Row():
            image = gr.Image(label="first frame (click ≤2 points)")
            video = gr.Video(label="generated clip")
        prompt = gr.Textbox(label="prompt", value="put this to there")
        with gr.Row():
            seed = gr.Number(value=42, label="seed")
            steps = gr.Number(value=25, label="steps")
            clear = gr.Button("clear points")
            run = gr.Button("run", variant="primary")
        image.upload(lambda im: (im, im, []), [image], [image, orig, points])
        image.select(on_select, [orig, points], [image, points])
        clear.click(on_clear, [orig], [image, points])
        run.click(on_run, [orig, points, prompt, seed, steps], [video])
    # concurrency so simultaneous users reach the batcher together
    demo.queue(default_concurrency_limit=4).launch()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pretrained", default=None)
    p.add_argument("--random-weights", action="store_true")
    p.add_argument("--image", default=None, help="CLI mode: input image path")
    p.add_argument("--points", nargs="+", default=[], help="CLI mode: x,y pairs")
    p.add_argument("--prompt", default="put this to there")
    p.add_argument("--out", default="demo_output.mp4")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--steps", type=int, default=25)
    args = p.parse_args()

    if args.image is None:
        try:
            import gradio  # noqa: F401
        except ImportError:
            p.error("gradio is not installed; use CLI mode (--image ...)")
        launch_gradio(args.pretrained, args.random_weights)
        return

    pipe, tokenize = build_pipeline(args.pretrained, args.random_weights)
    img = cv2.cvtColor(cv2.imread(args.image), cv2.COLOR_BGR2RGB)
    pts = [tuple(map(float, s.split(","))) for s in args.points]
    frames = run_generation(pipe, tokenize, img, pts, args.prompt, args.seed, args.steps)
    out = export_mp4(frames, args.out)
    print(f"wrote {out} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
