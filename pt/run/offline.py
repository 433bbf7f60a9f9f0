"""Offline rendering: sample/time-budgeted frames to images or video.

Counterpart of the reference's offline-render flow (SURVEY §3.4): the UI's
Render button sets RenderSettings{OutputInfo, FrameCount, MaxSampleCount,
MaxTime} (Renderer.cpp:836-852) and each main-loop iteration accumulates
until TotalSamples ≥ MaxSampleCount or the time budget is hit
(Renderer.cpp:1696-1704), saves the frame, advances the animation by the
fixed 1/framerate step (deterministic video stepping,
Application.cpp:333-335), and finishes after FrameCount frames
(Renderer.cpp:1785-1807). Input is disabled during rendering
(BeginOfflineRendering, Application.cpp:412-439).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

from pt.core.camera import InputCamera
from pt.core.stats import Stats
from pt.out.saver import OutputInfo, OutputSaver
from pt.run.renderer import Renderer


@dataclasses.dataclass
class RenderSettings:
    """≙ RenderSettings (Renderer.h): output + budgets."""
    output: OutputInfo
    frame_count: int = 1                 # >1 → animation frames / video
    max_sample_count: int = 256          # ≤10000 in the reference UI
    max_time_seconds: Optional[float] = None
    samples_per_step: int = 8            # accumulation granularity
    hdr: bool = False                    # tonemap mode for the saved frame
    # periodic film checkpointing for long single-frame renders (SURVEY
    # §5 checkpoint/resume; an upgrade over the reference): an existing
    # checkpoint is resumed with the exact RNG stream, deleted on success
    checkpoint_path: Optional[str] = None     # frame_count == 1 only
    checkpoint_interval_seconds: float = 300.0
    # noise-driven per-pixel stopping (render_adaptive): pixels stop at a
    # 95% CI below this tonemapped tolerance instead of running the full
    # max_sample_count everywhere. None = uniform accumulation. Runs as
    # one budgeted call per frame honoring max_time_seconds at allocation-
    # round granularity; periodic checkpointing and cancel() cannot
    # interrupt mid-call (the film stays valid at whatever spp it reached).
    adaptive_tol: Optional[float] = None
    # global-MSE stopping instead (render_adaptive target_mse); wins over
    # adaptive_tol when both are set
    adaptive_target_mse: Optional[float] = None


class OfflineRenderer:
    """Drives a Renderer through the offline state machine."""

    def __init__(self, renderer: Renderer, saver: Optional[OutputSaver] = None):
        self.renderer = renderer
        self.saver = saver or OutputSaver()
        self._cancelled = False

    def cancel(self) -> None:
        """≙ CancelRendering (Renderer.cpp:810-823)."""
        self._cancelled = True

    def render(self, settings: RenderSettings,
               progress: Optional[Callable[[int, int, int], None]] = None) -> int:
        """Run to completion (or cancellation). Returns frames written.
        progress(frame, total_frames, samples) is called per step."""
        r = self.renderer
        out = settings.output
        if settings.frame_count > 1 and out.format != "mp4":
            out = out._replace(sequence=True)   # numbered image frames
        self._cancelled = False

        ckpt = settings.checkpoint_path if settings.frame_count == 1 else None
        InputCamera.disable_input()
        r.on_resize(out.width, out.height)
        self.saver.register_output(out)
        frames_written = 0
        try:
            for frame in range(settings.frame_count):
                r.reset_accumulation()
                if ckpt and frame == 0:
                    import os
                    if os.path.exists(ckpt):
                        try:
                            r.load_checkpoint(ckpt)
                            want_adaptive = (
                                settings.adaptive_tol is not None
                                or settings.adaptive_target_mse is not None)
                            have_adaptive = r._spp_map is not None
                            if (r.total_samples
                                    and want_adaptive != have_adaptive):
                                # the film types are incompatible (an
                                # adaptive resume needs the per-pixel
                                # counts + moments); without this check
                                # the render loop would silently reset
                                # right after reporting a resume
                                import logging
                                logging.getLogger("pt").warning(
                                    "checkpoint %s holds a%s film but "
                                    "--adaptive is%s set: cannot resume, "
                                    "starting fresh", ckpt,
                                    "n adaptive" if have_adaptive
                                    else " uniform",
                                    "" if want_adaptive else " not")
                                r.reset_accumulation()
                            else:
                                Stats.add_stat(
                                    "Rendering",
                                    f"resumed at {r.total_samples} spp")
                        except Exception as exc:
                            import logging
                            logging.getLogger("pt").warning(
                                "checkpoint %s unusable (%s); starting "
                                "fresh", ckpt, exc)
                            r.reset_accumulation()
                start = time.perf_counter()
                last_ckpt = start
                if (settings.adaptive_tol is not None
                        or settings.adaptive_target_mse is not None):
                    r.render_adaptive(
                        tol=(5e-3 if settings.adaptive_tol is None
                             else settings.adaptive_tol),
                        target_mse=settings.adaptive_target_mse,
                        max_spp=settings.max_sample_count,
                        min_spp=min(16, settings.max_sample_count),
                        max_seconds=settings.max_time_seconds)
                    if progress:
                        progress(frame, settings.frame_count,
                                 r.total_samples)
                else:
                    while (not self._cancelled
                           and r.total_samples < settings.max_sample_count):
                        # clamp the last step so a resume never overshoots
                        # the requested budget
                        step = min(settings.samples_per_step,
                                   settings.max_sample_count
                                   - r.total_samples)
                        r.render(step)
                        if progress:
                            progress(frame, settings.frame_count,
                                     r.total_samples)
                        if r.total_samples >= settings.max_sample_count:
                            break
                        now = time.perf_counter()
                        if (settings.max_time_seconds is not None
                                and now - start
                                >= settings.max_time_seconds):
                            break
                        if ckpt and (now - last_ckpt
                                     >= settings.checkpoint_interval_seconds):
                            r.save_checkpoint(ckpt)
                            last_ckpt = now
                if self._cancelled:
                    break
                # save through the post stack; HDR output keeps linear
                # radiance for .hdr files
                if out.format == "hdr":
                    image = r.film_mean()
                else:
                    image = r.snapshot(hdr=settings.hdr)
                self.saver.submit_frame(image)
                frames_written += 1
                Stats.add_stat("Rendering", f"{frames_written}/{settings.frame_count}")

                # deterministic fixed-dt animation stepping between frames
                if settings.frame_count > 1 and r.scene is not None:
                    changed = r.scene.update(1.0 / out.framerate)
                    r.update_scene_data(scene_changed=changed)
            completed = True
        except BaseException:
            completed = False
            raise
        finally:
            if self._cancelled or not completed:
                # cancelled OR died mid-render (Ctrl-C, OOM, ...): delete
                # the partial output but KEEP a checkpoint so the render
                # can resume — the old code treated any exception as
                # success, finalizing the output and destroying the
                # checkpoint the feature exists to protect
                self.saver.cancel_output()
                if ckpt and r.total_samples > 0:
                    try:
                        r.save_checkpoint(ckpt)
                    except Exception:
                        pass
            else:
                self.saver.end_output()
                if ckpt:
                    import contextlib
                    import os
                    with contextlib.suppress(OSError):
                        os.remove(ckpt)
            InputCamera.enable_input()
        return frames_written
