"""Compile-watchdog + bench failure-containment tests (VERDICT r4 task 1).

The round-4 official perf record was lost to ONE transient remote-compile
error in the last bench arm (`BENCH_r04.json`: rc=1, parsed=null), and a
`pt render` through the public CLI wedged 18+ minutes on the same
service. These tests pin the two defenses:

* `pt.core.compilewatch.stage_call` retries transient tunnel errors
  (and only those) around every renderer stage jit;
* `bench.py` emits its JSON line with all COMPLETED arms' fields even
  when a later arm dies (the kill-the-tunnel-mid-bench test, via the
  PT_BENCH_FAIL_ARM injection knob).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from pt.core import compilewatch
from pt.core.compilewatch import FakeTransientError, is_transient, stage_call

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(autouse=True)
def _fast_backoff(monkeypatch):
    monkeypatch.setenv("PT_COMPILE_BACKOFF_S", "0.01")
    monkeypatch.delenv("PT_FAKE_TRANSIENT_FAILS", raising=False)
    compilewatch._reset_fake_failures()
    yield
    compilewatch._reset_fake_failures()


def test_transient_classifier():
    assert is_transient(RuntimeError(
        "INTERNAL: http://127.0.0.1:8093/remote_compile: read body: "
        "response body closed before all bytes were read"))
    assert is_transient(FakeTransientError("x"))
    assert not is_transient(ValueError("shape mismatch"))


def test_stage_call_retries_transients(monkeypatch):
    monkeypatch.setenv("PT_FAKE_TRANSIENT_FAILS", "2")
    compilewatch._reset_fake_failures()
    calls = []

    def fn(x):
        calls.append(x)
        return x + 1

    # two injected transient failures consume two attempts; the third
    # attempt reaches fn
    assert stage_call(fn, 41, what="test stage") == 42
    assert calls == [41]


def test_stage_call_propagates_real_errors():
    def bad():
        raise ValueError("real bug")

    with pytest.raises(ValueError):
        stage_call(bad, what="test stage", retries=3)


def test_stage_call_exhausts_retries(monkeypatch):
    monkeypatch.setenv("PT_FAKE_TRANSIENT_FAILS", "10")
    compilewatch._reset_fake_failures()
    with pytest.raises(FakeTransientError):
        stage_call(lambda: 1, what="test stage", retries=2)


def test_render_survives_transient_compile_failures(monkeypatch):
    """A render() whose first stage invocations hit transient tunnel
    errors must complete (≙ ShaderLibrary.cpp:246-257: the reference
    warns and keeps rendering on shader-compile failure)."""
    from pt.render.integrator import PathTracingSettings
    from pt.run.renderer import Renderer
    from pt.scene.examples import make_default_scene

    r = Renderer(PathTracingSettings(sample_count=1, bounce_count=2))
    r.set_scene(make_default_scene(), stream_textures=False)
    r.on_resize(32, 32)
    monkeypatch.setenv("PT_FAKE_TRANSIENT_FAILS", "3")
    compilewatch._reset_fake_failures()
    r.render(1)
    img = r.snapshot()
    assert np.isfinite(img).all() and img.max() > 0


def test_bench_emits_partial_json_when_arm_dies():
    """Kill-the-tunnel-mid-bench: inject a failure into the full-path
    courtyard arm; the heightfield headline and the arms AFTER the dead
    one must still land in the one JSON line (the r4 failure mode was
    losing everything)."""
    env = dict(os.environ)
    env.update({
        "PT_BENCH_TINY": "1",
        "PT_BENCH_FAIL_ARM": "courtyard_full",
        "JAX_PLATFORMS": "cpu",
        "PT_COMPILE_BACKOFF_S": "0.01",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
    })
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, text=True, timeout=600,
                       env=env, cwd=REPO)
    line = r.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["metric"] == "path_tracing_throughput"
    assert out["value"] > 0                        # headline survived
    assert "errors" in out and "courtyard_full" in out["errors"]
    assert "injected failure" in out["errors"]["courtyard_full"]
    # arms ordered AFTER the failed one still ran and landed
    assert "courtyard_preview_1bounce_mrays" in out
    assert "courtyard_spp_per_s_1080p" in out
    assert r.returncode == 0                       # partial == success
