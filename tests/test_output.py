"""Output saver, offline renderer, scene manager, and app shell tests."""

import os
import time

import numpy as np
import pytest

from pt.out.saver import (OutputInfo, OutputSaver, write_image,
                          write_radiance_hdr)
from pt.scene.textures import read_radiance_hdr


def test_write_read_hdr_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = (rng.random((8, 12, 3)) * 50).astype(np.float32)
    path = str(tmp_path / "out.hdr")
    write_radiance_hdr(path, img)
    back = read_radiance_hdr(open(path, "rb").read())
    rel = np.abs(back - img) / np.maximum(img.max(-1, keepdims=True), 1e-6)
    assert rel.max() < 0.01


@pytest.mark.parametrize("fmt", ["png", "jpg", "tga"])
def test_write_ldr_formats(tmp_path, fmt):
    img = np.zeros((4, 4, 3), np.float32)
    img[1, 2] = (1.0, 0.5, 0.25)
    path = str(tmp_path / f"out.{fmt}")
    write_image(path, img)
    from PIL import Image
    back = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255
    if fmt != "jpg":
        np.testing.assert_allclose(back[1, 2], [1.0, 0.5, 0.25], atol=0.01)


def test_saver_async_image(tmp_path):
    saver = OutputSaver()
    path = str(tmp_path / "frame.png")
    saver.register_output(OutputInfo(path, 8, 8, 30.0, "png"))
    saver.submit_frame(np.full((8, 8, 3), 0.5, np.float32))
    saver.end_output()
    assert os.path.exists(path)


def test_saver_cancel_deletes_partial(tmp_path):
    saver = OutputSaver()
    path = str(tmp_path / "frame.png")
    saver.register_output(OutputInfo(path, 8, 8, 30.0, "png"))
    saver.submit_frame(np.zeros((8, 8, 3), np.float32))
    time.sleep(0.2)
    saver.cancel_output()
    assert not os.path.exists(path)          # ≙ CancelOutput deletes file
    assert not saver.active


def test_scene_manager_async_and_failure():
    from pt.scene.manager import SceneDescription, SceneManager
    mgr = SceneManager()
    assert "Default" in mgr.groups["Test Scenes"]
    mgr.set_active_scene("Test Scenes", "Default")   # async
    mgr.wait()
    scene = mgr.get_active_scene()
    assert scene is not None and scene.name == "Default"

    # missing file → to_loader None (validation, ≙ SceneManager.cpp:66-94)
    assert SceneDescription("x", ["/nope/missing.gltf"]).to_loader() is None

    # loader that throws keeps the previous scene
    class Boom:
        def load(self, b):
            raise RuntimeError("boom")
    mgr.register("Test Scenes", "Broken", Boom())
    mgr.set_active_scene("Test Scenes", "Broken", blocking=True)
    assert mgr.get_active_scene().name == "Default"


def test_offline_render_sample_budget(tmp_path):
    from pt.render.integrator import PathTracingSettings
    from pt.run.offline import OfflineRenderer, RenderSettings
    from pt.run.renderer import Renderer
    from pt.scene.examples import make_default_scene

    r = Renderer(PathTracingSettings(sample_count=2, bounce_count=3,
                                     backend="brute"))
    r.set_scene(make_default_scene())
    path = str(tmp_path / "offline.png")
    off = OfflineRenderer(r)
    frames = off.render(RenderSettings(
        output=OutputInfo(path, 24, 24, 30.0, "png"),
        frame_count=1, max_sample_count=8, samples_per_step=4))
    assert frames == 1
    assert os.path.exists(path)
    assert r.total_samples >= 8


def test_offline_time_budget(tmp_path):
    from pt.render.integrator import PathTracingSettings
    from pt.run.offline import OfflineRenderer, RenderSettings
    from pt.run.renderer import Renderer
    from pt.scene.examples import make_default_scene

    r = Renderer(PathTracingSettings(sample_count=1, bounce_count=2,
                                     backend="brute"))
    r.set_scene(make_default_scene())
    path = str(tmp_path / "timed.png")
    frames = OfflineRenderer(r).render(RenderSettings(
        output=OutputInfo(path, 16, 16, 30.0, "png"),
        frame_count=1, max_sample_count=100000,
        max_time_seconds=0.05, samples_per_step=1))
    assert frames == 1
    assert r.total_samples < 100000          # time budget cut it short


def test_app_boot_and_progressive_loop():
    from pt.render.integrator import PathTracingSettings
    from pt.run.app import Application

    app = Application()
    app.renderer.set_settings(PathTracingSettings(
        sample_count=1, bounce_count=2, backend="brute"))
    app.init(width=24, height=24)
    # the boot scene streams its embedded textures; wait for the loader so
    # the accumulation-resetting swap lands before frame 1, keeping the
    # progressive counter deterministic
    t = getattr(app.renderer, "_tex_thread", None)
    if t is not None:
        t.join()
    snapshots = []
    app.run(target_frames=2,
            on_frame=lambda img, total: snapshots.append((img.copy(), total)))
    assert len(snapshots) == 2
    assert snapshots[1][1] > snapshots[0][1]       # samples accumulate
    assert np.isfinite(snapshots[-1][0]).all()
    app.shutdown()


def test_cli_list_scenes(capsys):
    from pt.run.cli import main
    assert main(["list-scenes"]) == 0
    out = capsys.readouterr().out
    assert "Test Scenes/Default" in out


def test_debug_modes_render():
    from pt.render.debug import DebugRenderMode, render_debug_image
    from pt.render.integrator import PathTracingSettings
    from pt.render.textures import default_texture_pool
    from pt.scene.examples import make_default_scene
    from pt.scene.flatten import flatten_scene
    import jax.numpy as jnp

    scene = make_default_scene()
    ds = flatten_scene(scene)
    tex = default_texture_pool()
    cam = scene.cameras[0]
    cam.on_resize(24, 24)
    iv = jnp.asarray(cam.inv_view, jnp.float32)
    ip = jnp.asarray(cam.inv_proj, jnp.float32)
    images = {}
    for mode in DebugRenderMode:
        img = np.asarray(render_debug_image(ds, tex, iv, ip, 24, 24, mode))
        assert np.isfinite(img).all(), mode
        images[mode] = img
    # normals differ from ids differ from color
    assert not np.allclose(images[DebugRenderMode.NORMAL],
                           images[DebugRenderMode.PRIMITIVE])
    assert not np.allclose(images[DebugRenderMode.COLOR],
                           images[DebugRenderMode.NORMAL])


def test_checkpoint_resume(tmp_path):
    from pt.render.integrator import PathTracingSettings
    from pt.run.renderer import Renderer
    from pt.scene.examples import make_default_scene

    st = PathTracingSettings(sample_count=1, bounce_count=3, backend="brute")
    r = Renderer(st)
    r.set_scene(make_default_scene(), stream_textures=False)
    r.on_resize(24, 24)
    r.render(2)
    path = str(tmp_path / "ckpt.npz")
    r.save_checkpoint(path)
    r.render(2)
    full = np.asarray(r.accum)

    r2 = Renderer(st)
    r2.set_scene(make_default_scene(), stream_textures=False)
    r2.load_checkpoint(path)
    assert r2.total_samples == 2
    r2.render(2)
    # resumed render continues the exact RNG stream → bit-identical film
    np.testing.assert_array_equal(np.asarray(r2.accum), full)


def test_texture_streaming_placeholder_swap():
    import io
    import time as _time
    from PIL import Image as PILImage
    from pt.render.integrator import PathTracingSettings
    from pt.run.renderer import Renderer
    from pt.scene.builder import SceneBuilder
    from pt.scene.examples import _add_quad_list
    from pt.scene.types import (Geometry, MeshInfo,
                                MetallicRoughnessMaterial, SCENE_TEXTURE_OFFSET,
                                TextureInfo, TextureType)

    buf = io.BytesIO()
    PILImage.fromarray(np.full((8, 8, 3), 200, np.uint8)).save(buf, "PNG")
    b = SceneBuilder("stream")
    tex_idx = b.add_texture(TextureInfo(name="c", type=TextureType.COLOR,
                                        data=buf.getvalue(), is_srgb=True))
    assert tex_idx == SCENE_TEXTURE_OFFSET
    quad = [((0, 0, 2), (0, 0), (0, 0, -1), (1, 0, 0), (0, 1, 0)),
            ((1, 0, 2), (1, 0), (0, 0, -1), (1, 0, 0), (0, 1, 0)),
            ((1, 1, 2), (1, 1), (0, 0, -1), (1, 0, 0), (0, 1, 0)),
            ((0, 1, 2), (0, 1), (0, 0, -1), (1, 0, 0), (0, 1, 0))]
    geo = _add_quad_list(b, quad)
    mid = b.add_material("m", MetallicRoughnessMaterial(color_idx=tex_idx))
    model = b.add_model([MeshInfo(geo, mid)])
    node = b.add_scene_node(0, np.eye(4))
    b.add_model_instance(model, node)
    scene = b.create_scene()

    r = Renderer(PathTracingSettings(1, 2, backend="brute"))
    r.set_scene(scene, stream_textures=True)
    # placeholder pool active immediately (defaults only = 9 slots)
    assert r.tex.count == 9
    r.wait_for_textures()
    assert r.tex.count == 10           # real pool swapped in
    r.on_resize(8, 8)
    r.render(1)                        # renders with the streamed texture
    assert np.isfinite(np.asarray(r.accum)).all()


def test_offline_animation_frames(tmp_path):
    """Multi-frame offline render of an animated scene: deterministic
    fixed-dt stepping produces distinct frames (≙ the offline video flow,
    Application.cpp:333-335 + Renderer.cpp:1785-1807)."""
    import json as _json
    from tests.test_gltf import _tri_gltf
    from pt.render.integrator import PathTracingSettings
    from pt.run.offline import OfflineRenderer, RenderSettings
    from pt.run.renderer import Renderer
    from pt.scene.builder import SceneBuilder
    from pt.scene.gltf import import_gltf
    from pt.core.camera import InputCamera

    path = _tri_gltf(tmp_path)
    b = SceneBuilder("anim")
    import_gltf(b, path)
    b.add_camera(InputCamera(45, 0.1, 100, (0.5, 0.5, -8.0), (0, 0, 1)))
    scene = b.create_scene()
    assert scene.graph.has_animations

    r = Renderer(PathTracingSettings(sample_count=1, bounce_count=2,
                                     backend="brute"))
    r.set_scene(scene)
    out = str(tmp_path / "anim.png")
    frames = OfflineRenderer(r).render(RenderSettings(
        output=OutputInfo(out, 16, 16, framerate=2.0, format="png"),
        frame_count=3, max_sample_count=2, samples_per_step=2))
    assert frames == 3
    import pathlib
    files = sorted(pathlib.Path(tmp_path).glob("anim_*.png"))
    assert len(files) == 3   # numbered frame sequence
    imgs = [np.asarray(__import__("PIL.Image", fromlist=["Image"])
                       .open(f)) for f in files]
    # animation moves the quad → frames differ
    assert not np.array_equal(imgs[0], imgs[-1])


def test_cli_render_and_debug_smoke(tmp_path):
    from pt.run.cli import main
    out = str(tmp_path / "cli.png")
    assert main(["render", "--scene", "Test Scenes/Default", "--out", out,
                 "--size", "16x16", "--spp", "2", "--bounces", "2",
                 "--backend", "brute"]) == 0
    assert os.path.exists(out)
    dbg = str(tmp_path / "dbg.png")
    assert main(["debug", "--scene", "Test Scenes/Default", "--mode",
                 "normal", "--out", dbg, "--size", "16x16"]) == 0
    assert os.path.exists(dbg)


def test_video_without_ffmpeg_writes_mjpeg_avi(tmp_path, monkeypatch):
    """mp4 requested with no ffmpeg → a real, well-formed MJPEG AVI video
    (pt/out/avi.py), not an image-sequence downgrade."""
    import struct

    from PIL import Image
    from pt.out import saver as S

    monkeypatch.setattr(S, "ffmpeg_available", lambda: False)
    out = S.OutputSaver()
    out.register_output(OutputInfo(str(tmp_path / "clip.mp4"),
                                   32, 16, framerate=24.0, format="mp4"))
    gx = np.broadcast_to(np.linspace(0, 1, 32, np.float32)[None, :],
                         (16, 32))
    gy = np.broadcast_to(np.linspace(0, 1, 16, np.float32)[:, None],
                         (16, 32))
    frames = [np.stack([np.full_like(gx, k / 3.0), gx, gy], axis=-1)
              for k in range(3)]
    for fr in frames:
        out.submit_frame(fr)
    out.end_output()

    path = tmp_path / "clip.avi"
    data = path.read_bytes()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    riff_size = struct.unpack("<I", data[4:8])[0]
    assert riff_size == len(data) - 8            # patched size is exact
    avih = data.index(b"avih") + 8            # start of the payload
    usec, _, _, flags, total_frames, init, streams, bufsize, w, h = \
        struct.unpack("<10I", data[avih:avih + 40])
    assert total_frames == 3 and streams == 1
    assert (w, h) == (32, 16)
    assert usec == round(1e6 / 24.0)
    assert flags & 0x10                       # AVIF_HASINDEX
    assert bufsize > 0
    strh = data.index(b"strh") + 8
    assert data[strh:strh + 8] == b"vidsMJPG"
    scale, rate = struct.unpack("<II", data[strh + 20:strh + 28])
    assert rate / scale == 24.0
    length = struct.unpack("<I", data[strh + 32:strh + 36])[0]
    assert length == 3
    assert b"MJPG" in data and b"idx1" in data

    # decode the first frame chunk and compare to the submitted frame
    p = data.index(b"00dc")
    size = struct.unpack("<I", data[p + 4:p + 8])[0]
    jpeg = data[p + 8:p + 8 + size]
    img = np.asarray(Image.open(__import__("io").BytesIO(jpeg)))
    assert img.shape == (16, 32, 3)
    want = (np.clip(frames[0], 0, 1) * 255 + 0.5).astype(np.uint8)
    assert np.abs(img.astype(np.int32) - want.astype(np.int32)).mean() < 8


def test_video_cancel_deletes_partial_avi(tmp_path, monkeypatch):
    from pt.out import saver as S

    monkeypatch.setattr(S, "ffmpeg_available", lambda: False)
    out = S.OutputSaver()
    out.register_output(OutputInfo(str(tmp_path / "clip.mp4"),
                                   8, 8, format="mp4"))
    out.submit_frame(np.zeros((8, 8, 3), np.float32))
    out.cancel_output()
    assert not (tmp_path / "clip.avi").exists()
    assert not (tmp_path / "clip.mp4").exists()


def test_offline_checkpoint_resume_bit_exact(tmp_path):
    """A long offline render interrupted mid-way resumes from its film
    checkpoint and lands on the SAME image as an uninterrupted run
    (seeding is (pixel, total_samples), so the stream continues exactly)."""
    from pt.render.integrator import PathTracingSettings
    from pt.run.offline import OfflineRenderer, RenderSettings
    from pt.run.renderer import Renderer
    from pt.scene.examples import make_default_scene

    st = PathTracingSettings(sample_count=1, bounce_count=3, backend="brute")
    ckpt = str(tmp_path / "film.ckpt.npz")

    # uninterrupted 4-spp reference
    r0 = Renderer(st)
    r0.set_scene(make_default_scene(), stream_textures=False)
    path0 = str(tmp_path / "full.png")
    OfflineRenderer(r0).render(RenderSettings(
        output=OutputInfo(path0, 24, 24, 30.0, "png"),
        frame_count=1, max_sample_count=4, samples_per_step=2))
    full = np.asarray(r0.accum)

    # "interrupted" run: 2 spp, then a checkpoint is left behind
    r1 = Renderer(st)
    r1.set_scene(make_default_scene(), stream_textures=False)
    r1.on_resize(24, 24)
    r1.render(2)
    r1.save_checkpoint(ckpt)

    # resumed run picks the checkpoint up and finishes to 4 spp
    r2 = Renderer(st)
    r2.set_scene(make_default_scene(), stream_textures=False)
    path2 = str(tmp_path / "resumed.png")
    OfflineRenderer(r2).render(RenderSettings(
        output=OutputInfo(path2, 24, 24, 30.0, "png"),
        frame_count=1, max_sample_count=4, samples_per_step=2,
        checkpoint_path=ckpt))
    assert r2.total_samples == 4
    np.testing.assert_array_equal(np.asarray(r2.accum), full)
    assert not os.path.exists(ckpt)      # deleted on success


def test_offline_checkpoint_written_periodically(tmp_path):
    from pt.render.integrator import PathTracingSettings
    from pt.run.offline import OfflineRenderer, RenderSettings
    from pt.run.renderer import Renderer
    from pt.scene.examples import make_default_scene

    st = PathTracingSettings(sample_count=1, bounce_count=2, backend="brute")
    ckpt = str(tmp_path / "p.ckpt.npz")
    r = Renderer(st)
    r.set_scene(make_default_scene(), stream_textures=False)
    off = OfflineRenderer(r)
    seen = []

    def progress(frame, total, samples):
        # interval 0 → a checkpoint lands after every non-final step
        if samples < 6:
            seen.append(os.path.exists(ckpt))
        if samples >= 4:
            off.cancel()

    off.render(RenderSettings(
        output=OutputInfo(str(tmp_path / "x.png"), 16, 16, 30.0, "png"),
        frame_count=1, max_sample_count=6, samples_per_step=2,
        checkpoint_path=ckpt, checkpoint_interval_seconds=0.0), progress)
    assert os.path.exists(ckpt)          # kept after cancellation
    assert any(seen[1:])                 # written during the run


# ---------------------------------------------------------------------------
# ffmpeg-PRESENT branch (VERDICT r3 task 7): a stub `ffmpeg` executable on
# PATH exercises the spawn/pipe/flush and cancel-kills-and-deletes paths of
# OutputSaver that a host without ffmpeg never runs
# (≙ OutputSaver.cpp:64-111, 183-225).
# ---------------------------------------------------------------------------

def _install_stub_ffmpeg(tmp_path, monkeypatch, block=False):
    """Create a fake `ffmpeg` on PATH. It records its argv, touches the
    output target (like the real ffmpeg), consumes stdin to a capture
    file, then on clean EOF writes the 'encoded' output + a sentinel.
    With block=False the stub still blocks in `cat` until stdin EOF or
    kill — exactly the real encoder's lifecycle."""
    import stat

    stubdir = tmp_path / "bin"
    stubdir.mkdir()
    argv_file = tmp_path / "argv.txt"
    stdin_file = tmp_path / "stdin.bin"
    sentinel = tmp_path / "done.txt"
    script = stubdir / "ffmpeg"
    script.write_text(
        "#!/bin/sh\n"
        f"printf '%s\\n' \"$@\" > '{argv_file}'\n"
        "for a; do last=$a; done\n"
        ": > \"$last\"\n"                       # partial file appears early
        f"cat > '{stdin_file}'\n"               # blocks until EOF or kill
        "printf 'encoded' > \"$last\"\n"
        f"printf 'ok' > '{sentinel}'\n")
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH",
                       str(stubdir) + os.pathsep + os.environ.get("PATH", ""))
    return argv_file, stdin_file, sentinel


def test_video_with_ffmpeg_spawns_pipes_and_flushes(tmp_path, monkeypatch):
    from pt.out import saver as S

    argv_file, stdin_file, sentinel = _install_stub_ffmpeg(tmp_path,
                                                           monkeypatch)
    assert S.ffmpeg_available()              # the stub IS found via PATH
    out = S.OutputSaver()
    target = tmp_path / "clip.mp4"
    out.register_output(OutputInfo(str(target), 8, 4, framerate=24.0,
                                   format="mp4"))
    frames = [np.full((4, 8, 3), k / 3.0, np.float32) for k in range(3)]
    for fr in frames:
        out.submit_frame(fr)
    out.end_output()                         # joins writer, closes stdin,
    assert sentinel.read_text() == "ok"      # waits → stub saw clean EOF

    argv = argv_file.read_text().splitlines()
    # the reference's exact encoder contract (OutputSaver.cpp:64-111)
    assert argv[argv.index("-s") + 1] == "8x4"
    assert argv[argv.index("-r") + 1] == "24.0"
    assert argv[argv.index("-vcodec") + 1] == "libx264"
    assert argv[argv.index("-preset") + 1] == "veryslow"
    assert argv[argv.index("-crf") + 1] == "17"
    assert argv[argv.index("-pix_fmt") + 1] == "rgba"   # input pix fmt
    assert argv[-1] == str(target)

    raw = stdin_file.read_bytes()            # 3 frames of 8*4 RGBA
    assert len(raw) == 3 * 8 * 4 * 4
    first = np.frombuffer(raw[: 8 * 4 * 4], np.uint8).reshape(4, 8, 4)
    want = (np.clip(frames[0], 0, 1) * 255 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(first[..., :3], want)
    np.testing.assert_array_equal(first[..., 3], 255)   # opaque alpha
    assert target.read_bytes() == b"encoded"
    assert not out.active                    # sink fully closed


def test_video_with_ffmpeg_cancel_kills_and_deletes(tmp_path, monkeypatch):
    from pt.out import saver as S

    _, stdin_file, sentinel = _install_stub_ffmpeg(tmp_path, monkeypatch)
    out = S.OutputSaver()
    target = tmp_path / "clip.mp4"
    out.register_output(OutputInfo(str(target), 8, 4, format="mp4"))
    out.submit_frame(np.zeros((4, 8, 3), np.float32))
    # wait until the writer thread has actually piped the frame → the
    # stub has started and touched the partial output file
    deadline = time.time() + 10.0
    while not target.exists() and time.time() < deadline:
        time.sleep(0.01)
    assert target.exists()                   # partial file on disk
    out.cancel_output()                      # kill + join + delete
    assert not target.exists()               # partial file removed
    assert not sentinel.exists()             # stub was killed, not flushed
    assert not out.active
    # a new registration works after cancel
    out.register_output(OutputInfo(str(tmp_path / "c2.mp4"), 8, 4,
                                   format="mp4"))
    out.cancel_output()
