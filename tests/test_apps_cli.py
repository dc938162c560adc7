"""CLI smoke: every app parses --help (imports resolve, flags register).

Cheap guard against the class of breakage a flag/refactor can cause in
entry points that the functional tests don't all exercise."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")
APPS = sorted(
    f for f in os.listdir(os.path.join(ROOT, "apps"))
    if f.endswith(".py") and not f.startswith("_")
)


@pytest.mark.parametrize("app", APPS)
def test_help(app):
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "apps", app), "--help"],
        capture_output=True, text=True, timeout=120,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, f"{app}: {r.stderr[-1500:]}"
    assert "usage" in r.stdout.lower()


def test_platform_flag_present():
    # every compute app must expose --platform (utils/runtime.py): the TPU
    # plugin on this image overrides JAX_PLATFORMS, so the in-process pin is
    # the only reliable backend switch for CPU replay/CI
    compute_apps = [
        "run_mapping_offline.py", "run_slam_offline.py", "run_localization.py",
        "run_kitti.py", "align_bench.py", "construct_full_map.py",
        "run_mapping_online.py",
    ]
    for app in compute_apps:
        src = open(os.path.join(ROOT, "apps", app)).read()
        assert "add_platform_arg" in src, f"{app} missing --platform"
