"""Application shell: lifecycle + frame loop (headless).

Counterpart of the reference's Application (Application.{h,cpp}): ordered
init of config → scene manager → renderer (Application.cpp:193-249), the
main loop (scene update → UpdateSceneData → OnUpdate → Render,
Application.cpp:251-365), background-task progress counters
(Application.h:15-36), and the offline-rendering entry point
(BeginOfflineRendering, Application.cpp:412-439). The GLFW/ImGui window is
replaced by headless progressive rendering with periodic snapshot
callbacks (the CLI and tests drive it; a live viewer can subscribe).
"""

from __future__ import annotations

import threading
import time
from typing import Callable, Dict, Optional

import numpy as np

from pt.core.config import Config, set_config
from pt.core.stats import Stats, Timer
from pt.render.integrator import PathTracingSettings
from pt.post.pipeline import PostProcessSettings
from pt.run.offline import OfflineRenderer, RenderSettings
from pt.run.renderer import Renderer
from pt.scene.manager import SceneManager


class BackgroundTasks:
    """Atomic {total, done} progress counters per task type
    (≙ BackgroundTask, Application.h:15-36)."""

    TYPES = ("ShaderCompilation", "TextureUpload", "SceneImport", "Rendering")

    def __init__(self):
        self._lock = threading.Lock()
        self._tasks: Dict[str, list] = {t: [0, 0] for t in self.TYPES}

    def begin(self, task: str, total: int) -> None:
        with self._lock:
            self._tasks[task] = [total, 0]

    def advance(self, task: str, done: int = 1) -> None:
        with self._lock:
            self._tasks[task][1] += done

    def set_progress(self, task: str, done: int) -> None:
        with self._lock:
            self._tasks[task][1] = done

    def progress(self, task: str):
        with self._lock:
            total, done = self._tasks[task]
        return done, total


class Application:
    """≙ Application::Init/Run/Shutdown."""

    def __init__(self, config: Optional[Config] = None):
        self.config = config or Config()
        set_config(self.config)
        self.tasks = BackgroundTasks()
        self.scene_manager = SceneManager()
        self.scene_manager.on_scene_loaded(
            lambda _scene: self.tasks.advance("SceneImport"))
        self.renderer = Renderer(
            min_refresh_rate=self.config.min_refresh_rate,
            max_samples_per_frame=self.config.max_samples_per_frame)
        self._running = False
        self._idle_published = False
        # live debug-pipeline switch (≙ SetDebugRaytracingPipeline + the
        # Debug tab's mode/flag radio buttons, UserInterface.cpp:1700-1764):
        # when set, run() presents single-trace debug frames instead of
        # accumulating path-traced samples
        self.debug_mode = None            # DebugRenderMode | None
        self.debug_flags = None           # DebugFlags | None

    # -- lifecycle -------------------------------------------------------
    def init(self, group: str = "Test Scenes", scene: str = "Default",
             width: int = 1280, height: int = 720) -> None:
        """≙ Application::Init boot sequence (ends with the Default scene
        active, SceneManager.cpp:100-105)."""
        self.scene_manager.set_active_scene(group, scene, blocking=True)
        sc = self.scene_manager.get_active_scene()
        if sc is None:
            raise RuntimeError(f"failed to load scene {group}/{scene}")
        self.renderer.set_scene(sc)
        self.renderer.on_resize(width, height)

    def set_scene(self, group: str, name: str, blocking: bool = True) -> None:
        self.tasks.begin("SceneImport", 1)
        self.scene_manager.set_active_scene(group, name, blocking=blocking)
        if blocking:
            sc = self.scene_manager.get_active_scene()
            if sc is not None:
                self.renderer.set_scene(sc)
            self.tasks.advance("SceneImport")
        # async: the manager keeps the PREVIOUS scene active until its
        # worker finishes, so attaching here would re-upload the old
        # scene and never show the new one — the run loop's Update step
        # adopts the new active scene when it lands (≙ the reference
        # reading SceneManager::GetActiveScene every frame), and the
        # persistent on_scene_loaded callback advances the task counter.

    # -- interactive-ish loop --------------------------------------------
    def run(self, duration_seconds: float = 1.0,
            on_frame: Optional[Callable[[np.ndarray, int], None]] = None,
            target_frames: Optional[int] = None,
            adaptive_tol: Optional[float] = None,
            adaptive_frame_seconds: float = 0.25) -> int:
        """Progressive loop (≙ Application::Run): scene update → renderer
        update → one accumulation step; `on_frame(snapshot, total_samples)`
        is the swapchain-present stand-in. Returns frames looped.

        `adaptive_tol` switches the accumulation step to the adaptive film
        (render_adaptive) with `adaptive_frame_seconds` of refinement per
        frame: noisy pixels keep sampling, converged ones stop, and a
        fully-converged view idles instead of burning samples. Camera or
        scene changes reset the per-pixel statistics like any other
        accumulation reset."""
        self._running = True
        frames = 0
        start = time.perf_counter()
        last = start
        while self._running:
            now = time.perf_counter()
            dt = now - last
            last = now
            with Timer("Frame total"):
                idle = False
                with Timer("Update"):
                    sc = self.scene_manager.get_active_scene()
                    if sc is not None and sc is not self.renderer.scene:
                        # an async scene switch finished: adopt it
                        self.renderer.set_scene(sc)
                    cam_changed = anim_changed = False
                    if self.renderer.scene:
                        cam_changed, anim_changed = \
                            self.renderer.scene.update_split(dt)
                    self.renderer.update_scene_data(scene_changed=anim_changed)
                    if cam_changed:
                        # camera-only move: reset accumulation, keep accel
                        self.renderer.reset_accumulation()
                    if cam_changed or anim_changed:
                        self._idle_published = False
                self.renderer.on_update(dt)
                # render()/render_adaptive() time themselves under the
                # "Render" stat — wrapping them here again would double-
                # count every frame on the same key
                if self.debug_mode is not None:
                    # debug pipeline active: present a single-trace debug
                    # frame, no accumulation (≙ the reference swapping the
                    # active RT pipeline while the Debug tab is enabled)
                    if on_frame is not None:
                        on_frame(self._render_debug_frame(),
                                 self.renderer.total_samples)
                    idle = True      # the film publish below is skipped
                elif adaptive_tol is not None:
                    stats = self.renderer.render_adaptive(
                        tol=adaptive_tol,
                        max_seconds=adaptive_frame_seconds,
                        min_spp=4, check_every=1)
                    if stats["steps"] == 0:
                        # fully converged still view: idle; after the
                        # first converged publish the film cannot have
                        # changed, so skip the postprocess+transfer too
                        time.sleep(0.05)
                        idle = self._idle_published
                        self._idle_published = True
                    else:
                        self._idle_published = False
                else:
                    self.renderer.render()
                if on_frame is not None and not idle:
                    on_frame(self.renderer.snapshot(), self.renderer.total_samples)
            Stats.flush_timers()
            frames += 1
            if target_frames is not None:
                if frames >= target_frames:
                    break
            elif time.perf_counter() - start >= duration_seconds:
                break
        self._running = False
        return frames

    def stop(self) -> None:
        self._running = False

    def reload_shaders(self) -> None:
        """Dev hot-reload (≙ Renderer::ReloadShaders, Renderer.cpp:756,
        bound to the H key): re-import the shader-equivalent modules
        (shading/bsdf/sampling/materials/rays/differentials/rng, the post
        stack, and the integrator that composes them) from disk, then
        rebuild the renderer module's cached stage jits against the
        reloaded code and restart accumulation — the analogue of
        recompiling changed GLSL and relinking the pipelines
        (ShaderLibrary::RecompileIfChanged, ShaderLibrary.cpp:224-298).

        Scope: the accel/kernel modules (pt.accel.*) are NOT reloaded —
        their structures live inside the built accel objects the way the
        reference's BLASes survive a shader reload — so existing accels
        stay type-compatible. Modules that from-imported integrator
        symbols elsewhere (pt.dist.mesh, pt.render.debug) keep the old
        code until process restart; the production render path does not.
        """
        import importlib

        from pt.post import pipeline as post_pipeline
        from pt.render import (bsdf, differentials, integrator, materials,
                               rays, rng, sampling, shading, textures)
        # leaf modules first so the integrator re-imports fresh symbols
        for mod in (shading, rng, rays, sampling, bsdf, materials,
                    differentials, textures, post_pipeline, integrator):
            importlib.reload(mod)
        import pt.run.renderer as renderer_mod
        reloaded = importlib.reload(renderer_mod)
        # migrate the live instance onto the reloaded class: its state
        # (scene, film, accel, settings) survives, its methods now call
        # the fresh stage jits (old compiled variants are dropped with
        # the old module's jit wrappers)
        self.renderer.__class__ = reloaded.Renderer
        if self.renderer.width:
            self.renderer.reset_accumulation()

    def _render_debug_frame(self) -> np.ndarray:
        """One frame through the debug renderer at the film size with the
        active camera (≙ RecordPathTracingCommands with the debug pipeline
        bound)."""
        from pt.render.debug import DebugFlags, render_debug_image
        r = self.renderer
        inv_view, inv_proj = r._camera_mats()
        img = render_debug_image(r.ds, r.tex, inv_view, inv_proj,
                                 r.width, r.height, self.debug_mode,
                                 flags=self.debug_flags or DebugFlags())
        return np.clip(np.asarray(img), 0.0, 1.0)

    # -- offline ----------------------------------------------------------
    def render_offline(self, settings: RenderSettings,
                       path_settings: Optional[PathTracingSettings] = None,
                       post: Optional[PostProcessSettings] = None,
                       progress=None) -> int:
        """≙ the UI Render button flow (SURVEY §3.4)."""
        if path_settings is not None or post is not None:
            self.renderer.set_settings(path_settings, post)
        self.tasks.begin("Rendering", settings.frame_count)
        offline = OfflineRenderer(self.renderer)

        def wrapped_progress(frame, total, samples):
            # frame is the 0-based index of the frame IN PROGRESS; the
            # task counter reports completed frames
            self.tasks.set_progress("Rendering", frame)
            if progress:
                progress(frame, total, samples)

        frames = offline.render(settings, wrapped_progress)
        self.tasks.set_progress("Rendering", frames)
        return frames

    def shutdown(self) -> None:
        self.scene_manager.wait()
