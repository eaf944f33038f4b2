"""File-driven golden test: TUM-format dataset on disk -> run_tum.py ->
CameraTrajectory.txt -> evaluate_ate.py, with a known ground truth.

The round-2 gap: run_tum.py had never been exercised end-to-end on a
TUM-format directory. Real TUM sequences become a drop-in the day they are
available (reference golden artifact:
/root/reference/results/CameraTrajectory.txt).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import tests.conftest  # noqa: F401

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_tum_pipeline_from_files(tmp_path):
    from scripts.make_tum_dataset import generate

    seq = str(tmp_path / "seq")
    n = 40
    generate(seq, n_frames=n, seed=0)
    assert os.path.exists(os.path.join(seq, "rgb"))
    assert os.path.exists(os.path.join(seq, "associate.txt"))

    out = str(tmp_path / "results")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_tum.py"),
         os.path.join(seq, "settings.yaml"),
         os.path.join(seq, "associate.txt"), "--out", out],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    traj = os.path.join(out, "CameraTrajectory.txt")
    assert os.path.exists(traj)
    assert os.path.exists(os.path.join(out, "KeyFrameTrajectory.txt"))
    with open(traj) as f:
        rows = [l for l in f if l.strip()]
    assert len(rows) == n, f"{len(rows)}/{n} trajectory rows"

    ev = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "evaluate_ate.py"),
         traj, os.path.join(seq, "groundtruth.txt")],
        capture_output=True, text=True, timeout=120, env=env, cwd=REPO,
    )
    assert ev.returncode == 0, ev.stdout + ev.stderr
    line = next(l for l in ev.stdout.splitlines()
                if l.startswith("absolute_translational_error.rmse"))
    rmse = float(line.split()[1])
    n_pairs = int(next(l for l in ev.stdout.splitlines()
                       if l.startswith("compared_pose_pairs")).split()[1])
    assert n_pairs == n
    assert rmse < 0.03, f"file-driven ATE {rmse*100:.2f}cm"


@pytest.mark.slow
def test_file_driven_orbit_healing(tmp_path):
    """Loopy golden (round-3 gap): a 200-frame full-turn revisit sequence
    through the FILE pipeline (PNGs -> run_tum.py with async workers ->
    savers). The saved trajectory is HEALED (recomposed against corrected
    keyframe poses); on a drift-accumulating orbit the healed ATE must
    beat the raw as-tracked ATE and stay bounded. Stand-in for the
    reference's loopy fr1_room golden artifact
    (results/CameraTrajectory.txt) until real TUM data exists."""
    from scripts.make_tum_dataset import generate

    seq = str(tmp_path / "seq")
    n = 200
    generate(seq, n_frames=n, seed=3, orbit=True)
    out = str(tmp_path / "results")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_tum.py"),
         os.path.join(seq, "settings.yaml"),
         os.path.join(seq, "associate.txt"), "--out", out, "--save-raw"],
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]

    def ate(traj):
        ev = subprocess.run(
            [sys.executable,
             os.path.join(REPO, "scripts", "evaluate_ate.py"),
             traj, os.path.join(seq, "groundtruth.txt")],
            capture_output=True, text=True, timeout=120, env=env, cwd=REPO)
        assert ev.returncode == 0, ev.stdout + ev.stderr
        return float(next(
            l for l in ev.stdout.splitlines()
            if l.startswith("absolute_translational_error.rmse")).split()[1])

    healed = ate(os.path.join(out, "CameraTrajectory.txt"))
    raw = ate(os.path.join(out, "CameraTrajectoryRaw.txt"))
    # corrections (fusion/local BA/loop) must reach the saved file: healed
    # is at least as good as raw, and absolutely bounded on this scene
    assert healed <= raw + 0.005, (
        f"healed {healed*100:.1f}cm worse than raw {raw*100:.1f}cm")
    assert healed < 0.10, f"orbit healed ATE {healed*100:.1f}cm"


@pytest.mark.verylong
@pytest.mark.skipif(not os.environ.get("PLSLAM_VERYLONG"),
                    reason="reference-artifact-length run (~1h on 2 CPUs); "
                           "set PLSLAM_VERYLONG=1")
def test_reference_length_golden(tmp_path):
    """Reference-artifact-length validation: ~1,350 frames — the length of
    the reference's committed fr1_room run
    (/root/reference/results/CameraTrajectory.txt, 1,352 poses) — as a
    3-lap orbit WITH sensor realism (photometric noise, motion blur,
    depth holes), loop closing live and arena compaction mid-run. Checks:
    every frame gets a pose, the healed ATE stays bounded, and the
    landmark arenas never exhaust (the compaction path keeps the run
    unbounded)."""
    from scripts.make_tum_dataset import generate

    seq = str(tmp_path / "seq")
    n = 1350
    generate(seq, n_frames=n, seed=3, orbit=True, laps=3.0, realism=True)
    out = str(tmp_path / "results")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_tum.py"),
         os.path.join(seq, "settings.yaml"),
         os.path.join(seq, "associate.txt"), "--out", out,
         "--compact-every", "400"],
        capture_output=True, text=True, timeout=7200, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    traj = os.path.join(out, "CameraTrajectory.txt")
    with open(traj) as f:
        rows = [l for l in f if l.strip()]
    assert len(rows) == n, f"{len(rows)}/{n} trajectory rows"
    ev = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "evaluate_ate.py"),
         traj, os.path.join(seq, "groundtruth.txt")],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO)
    assert ev.returncode == 0, ev.stdout + ev.stderr
    rmse = float(next(
        l for l in ev.stdout.splitlines()
        if l.startswith("absolute_translational_error.rmse")).split()[1])
    # upstream ORB-SLAM2's fr1-class ATE is ~0.01 m East (BASELINE.md); a
    # noisy 3-lap synthetic orbit with loop closing should land well
    # inside 10 cm after healing
    assert rmse < 0.10, f"reference-length healed ATE {rmse*100:.1f}cm"
