"""Offline frame sink: PNG/JPG/TGA/HDR images and MP4 video.

Counterpart of the reference's OutputSaver (Renderer/OutputSaver.cpp):
RegisterOutput allocates the sink and (for mp4) spawns an ffmpeg subprocess
with `-vcodec libx264 -preset veryslow -crf 17` reading raw RGBA from stdin
(OutputSaver.cpp:64-111); frames are handed off to a writer thread
(StartOutputWait → WriteImage, OutputSaver.cpp:113-181, 227-257); EndOutput
joins + flushes, CancelOutput kills ffmpeg and deletes the partial file
(OutputSaver.cpp:183-225).

Here the GPU blit/readback chain is a `jax.device_get` on the writer
thread; still images go through PIL (stbi analogue) and HDR through a
native Radiance RGBE writer. ffmpeg is optional — absence downgrades video
to a native MJPEG AVI next to the target path (pt/out/avi.py), so video
output stays real video without an external encoder.
"""

from __future__ import annotations

import os
import pathlib
import queue
import shutil
import subprocess
import threading
from typing import NamedTuple, Optional

import numpy as np

from pt.core.stats import Stats


class OutputInfo(NamedTuple):
    """≙ OutputInfo (Renderer.h): target path, extent, framerate, format."""
    path: str
    width: int
    height: int
    framerate: float = 30.0
    format: str = "png"          # png | jpg | tga | hdr | mp4
    sequence: bool = False       # image formats with >1 frame → numbered


def write_radiance_hdr(path: str, rgb: np.ndarray) -> None:
    """Radiance RGBE writer (flat scanlines; ≙ stbi_write_hdr)."""
    rgb = np.asarray(rgb, np.float32)
    h, w = rgb.shape[:2]
    maxc = rgb.max(axis=-1)
    exp = np.where(maxc > 1e-32,
                   np.floor(np.log2(np.maximum(maxc, 1e-38))) + 1,
                   0).astype(np.int32)
    scale = np.where(maxc > 1e-32, 2.0 ** (8 - exp), 0.0)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.clip(rgb * scale[..., None], 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(maxc > 1e-32, exp + 128, 0).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())


def write_image(path: str, image: np.ndarray, fmt: Optional[str] = None) -> None:
    """Write one frame. `image` is float (H, W, 3) — display-encoded [0,1]
    for LDR formats, linear radiance for hdr (≙ WriteImage,
    OutputSaver.cpp:227-257)."""
    fmt = (fmt or pathlib.Path(path).suffix.lstrip(".")).lower()
    if fmt == "hdr":
        write_radiance_hdr(path, image)
        return
    from PIL import Image
    u8 = (np.clip(image, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    img = Image.fromarray(u8)
    if fmt in ("jpg", "jpeg"):
        img.save(path, quality=95)
    elif fmt == "tga":
        img.save(path, format="TGA")
    else:
        img.save(path, format="PNG")


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


class OutputSaver:
    """Async frame sink with a writer thread (≙ OutputSaver)."""

    def __init__(self):
        self._queue: "queue.Queue" = queue.Queue(maxsize=4)
        self._thread: Optional[threading.Thread] = None
        self._ffmpeg: Optional[subprocess.Popen] = None
        self._avi = None
        self._info: Optional[OutputInfo] = None
        self._frame_index = 0
        self._error: Optional[Exception] = None

    @property
    def active(self) -> bool:
        return self._info is not None

    def register_output(self, info: OutputInfo) -> None:
        """≙ RegisterOutput (OutputSaver.cpp:64-111)."""
        if self.active:
            raise RuntimeError("output already registered")
        self._info = info
        self._frame_index = 0
        self._error = None
        if info.format == "mp4":
            if ffmpeg_available():
                self._ffmpeg = subprocess.Popen(
                    ["ffmpeg", "-y", "-f", "rawvideo", "-pix_fmt", "rgba",
                     "-s", f"{info.width}x{info.height}",
                     "-r", str(info.framerate), "-i", "-",
                     "-vcodec", "libx264", "-preset", "veryslow",
                     "-crf", "17", "-pix_fmt", "yuv420p", info.path],
                    stdin=subprocess.PIPE,
                    stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            else:
                from pt.out.avi import MjpegAviWriter
                avi_path = str(pathlib.Path(info.path).with_suffix(".avi"))
                self._avi = MjpegAviWriter(avi_path, info.width, info.height,
                                           info.framerate)
                Stats.add_stat("Output",
                               "ffmpeg unavailable → native MJPEG AVI")
        self._thread = threading.Thread(target=self._writer, daemon=True)
        self._thread.start()

    def submit_frame(self, image) -> None:
        """Queue one frame; `image` may be a jax array — conversion happens
        on the writer thread (≙ the fence-wait + readback jthread,
        OutputSaver.cpp:164-181)."""
        if not self.active:
            raise RuntimeError("no output registered")
        while True:
            if self._error:
                raise self._error
            try:
                self._queue.put(image, timeout=0.25)
                return
            except queue.Full:
                continue

    def end_output(self) -> None:
        """≙ EndOutput (OutputSaver.cpp:183-203): drain, flush, close."""
        if not self.active:
            return
        self._queue.put(None)
        if self._thread:
            self._thread.join()
        if self._ffmpeg:
            self._ffmpeg.stdin.close()
            self._ffmpeg.wait()
            self._ffmpeg = None
        if self._avi:
            self._avi.close()
            self._avi = None
        self._info = None
        self._thread = None
        if self._error:
            raise self._error

    def cancel_output(self) -> None:
        """≙ CancelOutput (OutputSaver.cpp:204-225): kill encoder, delete
        the partial file."""
        if not self.active:
            return
        info = self._info
        if self._ffmpeg:
            self._ffmpeg.kill()   # unblocks a writer stuck in stdin.write
        self._queue.put(None)
        if self._thread:
            self._thread.join()
        if self._ffmpeg:
            self._ffmpeg.wait()
            self._ffmpeg = None
        avi_path = None
        if self._avi:
            avi_path = self._avi.path
            self._avi.close()
            self._avi = None
        self._info = None
        self._thread = None
        try:
            if info and os.path.exists(info.path):
                os.remove(info.path)
            if avi_path and os.path.exists(avi_path):
                os.remove(avi_path)         # partial video is deleted too
        except OSError:
            pass

    # ------------------------------------------------------------------
    def _writer(self) -> None:
        info = self._info
        while True:
            item = self._queue.get()
            if item is None:
                return
            try:
                frame = np.asarray(item)       # device→host here, off-main
                if info.format == "mp4":
                    self._write_video_frame(info, frame)
                elif self._is_video_sequence(info):
                    base = pathlib.Path(info.path)
                    path = base.with_name(
                        f"{base.stem}_{self._frame_index:05d}{base.suffix}")
                    write_image(str(path), frame, info.format)
                else:
                    write_image(info.path, frame, info.format)
                self._frame_index += 1
            except Exception as exc:            # surfaced on next submit
                self._error = exc
                # keep DRAINING (discarding) until the sentinel: producers
                # block on the bounded queue, so exiting here would leave
                # submit_frame/end_output stuck in put() forever
                while self._queue.get() is not None:
                    pass
                return

    @staticmethod
    def _is_video_sequence(info: OutputInfo) -> bool:
        return info.sequence

    def _write_video_frame(self, info: OutputInfo, frame: np.ndarray) -> None:
        if frame.shape[:2] != (info.height, info.width):
            # ffmpeg reads fixed-size rawvideo frames; a mismatched frame
            # would silently shear the whole stream
            raise ValueError(
                f"frame {frame.shape[:2]} != registered "
                f"{(info.height, info.width)}")
        if self._ffmpeg is not None:
            u8 = (np.clip(frame, 0, 1) * 255.0 + 0.5).astype(np.uint8)
            rgba = np.concatenate(
                [u8, np.full_like(u8[..., :1], 255)], axis=-1)
            self._ffmpeg.stdin.write(rgba.tobytes())
        else:
            # ffmpeg missing: native MJPEG AVI fallback
            u8 = (np.clip(frame, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
            self._avi.write_frame(u8)
