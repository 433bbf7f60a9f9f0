"""Command-line interface (headless ≙ the reference's windowed app + UI).

The reference exposes render quality/scene/display controls through ImGui
tabs (UserInterface.cpp); this CLI exposes the same control surface as
subcommands:

  pt list-scenes                      scene catalog (≙ Scenes tab)
  pt render ...                       offline render (≙ Offline Render modal)
  pt debug ...                        debug view modes (≙ Debug tab)
  pt stats                            stat board dump (≙ Statistics tab)

Run as `python -m pt.run.cli <command>`.
"""

from __future__ import annotations

import argparse
import sys

from pt.core.config import Config, set_config


def _parse_size(s: str):
    w, _, h = s.partition("x")
    return int(w), int(h or w)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="pt",
                                description="TPU-native path tracer")
    p.add_argument("-A", "--assets", default=None)
    p.add_argument("-S", "--scenes", default=None)
    sub = p.add_subparsers(dest="command", required=True)

    sub.add_parser("list-scenes", help="list the scene catalog")

    r = sub.add_parser("render", help="offline render to image/video")
    r.add_argument("--scene", default="Test Scenes/Default",
                   help='"Group/Name" from list-scenes, or a '
                        '.gltf/.glb/.obj/.fbx path')
    r.add_argument("--out", default="render.png")
    r.add_argument("--size", type=_parse_size, default=(1280, 720),
                   metavar="WxH")
    r.add_argument("--spp", type=int, default=256,
                   help="max samples (≙ UI max samples, ≤10000)")
    r.add_argument("--max-time", type=float, default=None,
                   help="per-frame time budget in seconds")
    r.add_argument("--bounces", type=int, default=5)
    r.add_argument("--frames", type=int, default=1,
                   help=">1 renders an animation (mp4 or numbered frames)")
    r.add_argument("--camera", type=int, default=0,
                   help="scene camera index (≙ the Settings-tab camera "
                        "list)")
    r.add_argument("--framerate", type=float, default=30.0)
    r.add_argument("--format", default=None,
                   choices=[None, "png", "jpg", "tga", "hdr", "mp4"])
    r.add_argument("--exposure", type=float, default=1.0)
    r.add_argument("--bloom-threshold", type=float, default=1.0)
    r.add_argument("--bloom-intensity", type=float, default=0.1)
    r.add_argument("--no-bloom", action="store_true")
    r.add_argument("--lens-radius", type=float, default=0.0)
    r.add_argument("--focal-distance", type=float, default=1.0)
    r.add_argument("--backend", default="pallas",
                   choices=["pallas", "bvh", "brute"])
    r.add_argument("--checkpoint", default=None,
                   help="film checkpoint file for long single-frame "
                        "renders: resumed if present, saved every 5 min, "
                        "deleted on success")
    r.add_argument("--hdr", action="store_true",
                   help="HDR10 PQ output encoding")
    r.add_argument("--adaptive", type=float, default=None, metavar="TOL",
                   help="noise-driven per-pixel stopping: pixels stop "
                        "sampling once their 95%% CI (tonemapped) is below "
                        "TOL; --spp becomes the per-pixel cap")
    r.add_argument("--adaptive-mse", type=float, default=None, metavar="MSE",
                   help="stop at an estimated global tonemapped-MSE "
                        "target instead of per-pixel CIs (the BASELINE "
                        "contract metric); overrides --adaptive")

    d = sub.add_parser("debug", help="debug visualization render")
    d.add_argument("--scene", default="Test Scenes/Default")
    d.add_argument("--mode", default="normal",
                   choices=["color", "world-position", "normal", "tex-coords",
                            "mips", "geometry", "primitive", "instance"])
    d.add_argument("--out", default="debug.png")
    d.add_argument("--size", type=_parse_size, default=(640, 480),
                   metavar="WxH")
    # ≙ the Debug tab's raygen/hit flag checkboxes (UserInterface.cpp:1700+)
    d.add_argument("--force-opaque", action="store_true")
    d.add_argument("--cull-backfaces", action="store_true")
    d.add_argument("--disable-color-texture", action="store_true")
    d.add_argument("--disable-shadows", action="store_true")

    sub.add_parser("stats", help="render one frame and dump the stat board")

    v = sub.add_parser("view", help="live browser viewer with fly camera")
    v.add_argument("--scene", default="Test Scenes/Default")
    v.add_argument("--size", type=_parse_size, default=(640, 480),
                   metavar="WxH")
    v.add_argument("--bounces", type=int, default=5)
    v.add_argument("--backend", default="pallas",
                   choices=["pallas", "bvh", "brute"])
    v.add_argument("--host", default="127.0.0.1")
    v.add_argument("--port", type=int, default=8000)
    v.add_argument("--duration", type=float, default=1e30,
                   help="stop after this many seconds (default: run forever)")
    v.add_argument("--adaptive", type=float, default=None, metavar="TOL",
                   help="adaptive progressive refinement: converged pixels "
                        "stop sampling; a fully-converged still view idles")
    return p


def _load_app(args, width, height):
    from pt.run.app import Application
    cfg = Config.create(
        (["-A", args.assets] if args.assets else [])
        + (["-S", args.scenes] if args.scenes else []))
    app = Application(cfg)
    scene = getattr(args, "scene", "Test Scenes/Default")
    if scene.endswith((".gltf", ".glb", ".obj", ".fbx")):
        from pt.scene.manager import SceneDescription
        loader = SceneDescription("cli", [scene]).to_loader()
        if loader is None:
            print(f"error: scene file not found: {scene}", file=sys.stderr)
            raise SystemExit(2)
        app.scene_manager.register("CLI", "file", loader)
        group, name = "CLI", "file"
    else:
        group, _, name = scene.partition("/")
        if not name:
            print('error: --scene must be "Group/Name" or a .gltf path',
                  file=sys.stderr)
            raise SystemExit(2)
    app.init(group, name, width, height)
    return app


def cmd_list_scenes(args) -> int:
    from pt.scene.manager import SceneManager
    cfg = Config.create(
        (["-A", args.assets] if args.assets else [])
        + (["-S", args.scenes] if args.scenes else []))
    set_config(cfg)
    mgr = SceneManager()
    for group, scenes in mgr.groups.items():
        print(group)
        for name in scenes:
            print(f"  {group}/{name}")
    return 0


def cmd_render(args) -> int:
    from pt.out.saver import OutputInfo
    from pt.post.pipeline import PostProcessSettings
    from pt.render.integrator import PathTracingSettings
    from pt.run.offline import RenderSettings

    width, height = args.size
    fmt = args.format or args.out.rsplit(".", 1)[-1].lower()
    app = _load_app(args, width, height)
    settings = PathTracingSettings(
        sample_count=1, bounce_count=args.bounces,
        lens_radius=args.lens_radius, focal_distance=args.focal_distance,
        backend=args.backend)
    post = PostProcessSettings(exposure=args.exposure,
                               bloom_threshold=args.bloom_threshold,
                               bloom_intensity=args.bloom_intensity,
                               enable_bloom=not args.no_bloom)
    rs = RenderSettings(
        output=OutputInfo(args.out, width, height, args.framerate, fmt),
        frame_count=args.frames, max_sample_count=args.spp,
        max_time_seconds=args.max_time, hdr=args.hdr,
        checkpoint_path=args.checkpoint, adaptive_tol=args.adaptive,
        adaptive_target_mse=args.adaptive_mse)

    def progress(frame, total, samples):
        print(f"\rframe {frame + 1}/{total}  {samples}/{args.spp} spp",
              end="", file=sys.stderr)

    app.renderer.camera_index = args.camera
    frames = app.render_offline(rs, settings, post, progress)
    print(f"\nwrote {frames} frame(s) to {args.out}", file=sys.stderr)
    app.shutdown()
    return 0 if frames else 1


def cmd_debug(args) -> int:
    import numpy as np

    from pt.out.saver import write_image
    from pt.render.debug import (DebugFlags, DebugRenderMode,
                                 render_debug_image)

    width, height = args.size
    app = _load_app(args, width, height)
    mode = DebugRenderMode[args.mode.upper().replace("-", "_")]
    flags = DebugFlags(force_opaque=args.force_opaque,
                       cull_backfaces=args.cull_backfaces,
                       disable_color_texture=args.disable_color_texture,
                       disable_shadows=args.disable_shadows)
    cam = app.renderer.scene.cameras[0]
    cam.on_resize(width, height)
    img = render_debug_image(app.renderer.ds, app.renderer.tex,
                             cam.inv_view.astype("float32"),
                             cam.inv_proj.astype("float32"),
                             width, height, mode, flags=flags)
    write_image(args.out, np.asarray(img))
    print(f"wrote {args.out}", file=sys.stderr)
    return 0


def cmd_stats(args) -> int:
    from pt.core.stats import Stats
    from pt.render.integrator import PathTracingSettings
    app = _load_app(args, 256, 256)
    # diagnostic command: favor fast startup over kernel throughput
    app.renderer.set_settings(PathTracingSettings(
        sample_count=1, bounce_count=3, backend="brute"))
    app.run(target_frames=2)
    for key, value in sorted(Stats.get_stats().items()):
        print(f"{key}: {value}")
    return 0


def cmd_view(args) -> int:
    from pt.render.integrator import PathTracingSettings
    from pt.run.viewer import run_viewer

    width, height = args.size
    app = _load_app(args, width, height)
    app.renderer.set_settings(PathTracingSettings(
        sample_count=1, bounce_count=args.bounces, backend=args.backend))
    run_viewer(app, args.host, args.port, duration_seconds=args.duration,
               adaptive_tol=args.adaptive)
    app.shutdown()
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    handlers = {"list-scenes": cmd_list_scenes, "render": cmd_render,
                "debug": cmd_debug, "stats": cmd_stats, "view": cmd_view}
    return handlers[args.command](args)


if __name__ == "__main__":
    raise SystemExit(main())
