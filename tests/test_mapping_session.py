"""Session-orchestration CLI (apps/mapping_session.py) — the reference
`scripts/` layer: mapping.sh session dirs + symlinks, save_map.sh,
set_floor_label.sh, register_conf.sh, *_stop.sh."""

import argparse
import importlib.util
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "mapping_session", os.path.join(REPO, "apps", "mapping_session.py"))
ms = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(ms)


def _start_args(root, **kw):
    return argparse.Namespace(
        root=str(root), map_name=kw.get("map_name", "Proj-Loc"),
        activate=kw.get("activate", "y"), mode=kw.get("mode", "fast"),
        data_dir="", synthetic=4, run=kw.get("run", False), session="")


class TestStart:
    def test_creates_session_and_symlinks(self, tmp_path, capsys):
        session = ms.cmd_start(_start_args(tmp_path))
        assert os.path.isdir(os.path.join(session, "details", "frames"))
        assert os.path.basename(session).startswith("Proj-Loc-")
        default = tmp_path / "system" / "maps" / "default"
        assert os.path.islink(default) and os.path.realpath(default) == os.path.realpath(session)
        # activate=y also points the system map at the session (mapping.sh:47-52)
        active = tmp_path / "system" / "map"
        assert os.path.islink(active) and os.path.realpath(active) == os.path.realpath(session)
        # dry run prints the pipeline it would launch (fast -> LIO pipeline)
        out = capsys.readouterr().out
        assert "run_mapping_offline.py" in out

    def test_non_symlink_default_is_backed_up(self, tmp_path):
        maps = tmp_path / "system" / "maps"
        os.makedirs(maps / "default")
        (maps / "default" / "keep.txt").write_text("x")
        ms.cmd_start(_start_args(tmp_path, activate="n"))
        backups = [d for d in os.listdir(maps) if d.startswith("default-")]
        assert len(backups) == 1, "real default dir must be backed up, not deleted"
        assert (maps / backups[0] / "keep.txt").exists()
        assert os.path.islink(maps / "default")

    def test_indoor_mode_composes_slam_pipeline(self, tmp_path, capsys):
        ms.cmd_start(_start_args(tmp_path, mode="indoor", activate="n"))
        out = capsys.readouterr().out
        assert "run_slam_offline.py" in out and "--save_artifacts" in out


class TestRegisterConf:
    def test_registers_by_lidar_type_and_is_idempotent(self, tmp_path):
        conf = tmp_path / "system" / "conf"
        os.makedirs(conf)
        (conf / "lidar_type").write_text("velodyne\n")
        args = argparse.Namespace(root=str(tmp_path), lidar_type="")
        ms.cmd_register_conf(args)
        lio_params = conf / "slam" / "jueying_lio" / "params.yaml"
        assert lio_params.exists()
        ref = open(os.path.join(REPO, "configs", "lio", "velodyne.yaml")).read()
        assert lio_params.read_text() == ref
        # jueying_slam has no velodyne.yaml -> falls back to a shipped config
        assert (conf / "slam" / "jueying_slam" / "params.yaml").exists()
        # idempotent: user-edited params survive re-registration
        lio_params.write_text("edited: true\n")
        ms.cmd_register_conf(args)
        assert lio_params.read_text() == "edited: true\n"


class TestSessionCommands:
    def test_floor_label_and_save_map(self, tmp_path, capsys):
        session = ms.cmd_start(_start_args(tmp_path))
        ns = argparse.Namespace(root=str(tmp_path), session="", label=2)
        ms.cmd_set_floor_label(ns)
        assert (open(os.path.join(session, "details", "floor_label")).read().strip() == "2")
        hist = open(os.path.join(session, "details", "floor_label_history.csv")).read()
        assert hist.strip().endswith(",2")

        # fake occupancy product inside the session -> save-map publishes it
        with open(os.path.join(session, "details", "occ.pgm"), "wb") as f:
            f.write(b"P5\n2 2\n255\n\x00\x00\x00\x00")
        with open(os.path.join(session, "details", "occ.yaml"), "w") as f:
            f.write("resolution: 0.1\n")
        ms.cmd_save_map(argparse.Namespace(root=str(tmp_path), session="", name="jueying"))
        assert (tmp_path / "system" / "map" / "jueying.pgm").exists()
        assert (tmp_path / "system" / "map" / "jueying.yaml").exists()

    def test_stop_kills_only_recorded_pids(self, tmp_path):
        session = ms.cmd_start(_start_args(tmp_path, activate="n"))
        p = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(60)"])
        with open(os.path.join(session, "details", "pids"), "w") as f:
            f.write(f"{p.pid}\n")
        ms.cmd_stop(argparse.Namespace(root=str(tmp_path), session=""))
        t0 = time.time()
        while p.poll() is None and time.time() - t0 < 5:
            time.sleep(0.05)
        assert p.poll() is not None, "recorded pid must be terminated"
        assert p.returncode == -signal.SIGTERM
        assert not os.path.exists(os.path.join(session, "details", "pids"))

    def test_save_map_without_product_errors(self, tmp_path):
        ms.cmd_start(_start_args(tmp_path, activate="n"))
        with pytest.raises(SystemExit):
            ms.cmd_save_map(argparse.Namespace(root=str(tmp_path), session="", name="jueying"))


class TestReviewRegressions:
    """Fixes from the round-3 session-4 code review."""

    def test_save_map_rewrites_yaml_image_field(self, tmp_path):
        session = ms.cmd_start(_start_args(tmp_path, activate="n"))
        with open(os.path.join(session, "details", "occ.pgm"), "wb") as f:
            f.write(b"P5\n2 2\n255\n\x00\x00\x00\x00")
        with open(os.path.join(session, "details", "occ.yaml"), "w") as f:
            f.write(f"image: {session}/details/occ.pgm\nresolution: 0.1\n")
        ms.cmd_save_map(argparse.Namespace(root=str(tmp_path), session="", name="pub"))
        y = (tmp_path / "system" / "map" / "pub.yaml").read_text()
        assert "image: pub.pgm" in y, y          # not the stale session path
        assert str(session) not in y

    def test_start_backs_up_published_map_dir(self, tmp_path):
        # save-map makes <root>/system/map a REAL directory; a later
        # `start --activate y` must back it up, never rmtree it
        session = ms.cmd_start(_start_args(tmp_path, activate="n"))
        with open(os.path.join(session, "details", "occ.pgm"), "wb") as f:
            f.write(b"P5\n2 2\n255\n\x00\x00\x00\x00")
        with open(os.path.join(session, "details", "occ.yaml"), "w") as f:
            f.write("resolution: 0.1\n")
        ms.cmd_save_map(argparse.Namespace(root=str(tmp_path), session="", name="keepme"))
        assert (tmp_path / "system" / "map" / "keepme.pgm").exists()
        ms.cmd_start(_start_args(tmp_path, map_name="Second"))
        # the published pair survives in a backup directory
        backups = [d for d in (tmp_path / "system").iterdir() if d.name.startswith("map-")]
        assert backups, "published map dir was destroyed instead of backed up"
        assert any((b / "keepme.pgm").exists() for b in backups)

    def test_interactive_menu_dispatches(self, tmp_path, monkeypatch, capsys):
        # option 1 (start) + option 3 (floor label) + q — the interactive
        # namespace must carry every attribute the handlers read
        answers = iter(["1", "IMap", "n", "fast", "3", "7", "q"])
        monkeypatch.setattr("builtins.input", lambda *a: next(answers))
        ms.cmd_interactive(argparse.Namespace(root=str(tmp_path), session=""))
        out = capsys.readouterr().out
        assert "session:" in out
        maps = list((tmp_path / "system" / "maps").iterdir())
        assert any(d.name.startswith("IMap-") for d in maps)


def test_pub_occ_map_validates_and_publishes(tmp_path, capsys):
    from pointcloud_slam_tpu.maps import occupancy as occ

    session = ms.cmd_start(_start_args(tmp_path, activate="n"))
    cfg = occ.OccupancyConfig(size=32, resolution=0.25, max_range=5.0)
    occ.save_pgm(cfg, occ.create(cfg), os.path.join(session, "details", "occ"))
    ms.cmd_pub_occ_map(argparse.Namespace(root=str(tmp_path), session="", name="pub"))
    out = capsys.readouterr().out
    assert "publishing" in out and "32x32" in out
    assert (tmp_path / "system" / "map" / "pub.pgm").exists()
