"""Figure-pipeline surface smoke (ref evaluation_scripts/wccm2024/
generate_training_screenshots.py + paper/generate_main_html.py roles):
the training-screenshot sweep produces both asset types and the report
builder emits a navigable index.html."""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *args):
    return subprocess.run(
        [sys.executable, os.path.join(ROOT, script), *args],
        cwd=ROOT, capture_output=True, text=True, timeout=600)


def test_training_screenshots_assets(tmp_path):
    r = _run("evaluation_scripts/training_screenshots.py",
             "--family", "corner", "--cpu", "--res", "32",
             "--mesh-n", "20", "--values", "0.4", "0.7",
             "--out", str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "training_sdfs_corner.png").exists()
    assert (tmp_path / "training_tiles_corner.png").exists()


def test_build_report_index(tmp_path):
    # collect-only mode: no --run, sections render with placeholders
    r = _run("evaluation_scripts/build_report.py", "--out", str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    index = tmp_path / "index.html"
    assert index.exists()
    text = index.read_text()
    assert "Training screenshots" in text and "Sections" in text


def test_simple_analysis_figures(tmp_path):
    # ref paper/06 role: distorted-beam FEM + field renders + derivative check
    r = _run("evaluation_scripts/simple_analysis_figure.py",
             "--cpu", "--res", "9", "--out", str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    for f in ("base_u_mag.png", "base_sed.png",
              "distorted_u_mag.png", "distorted_sed.png"):
        assert (tmp_path / f).exists(), f
    assert "Delta compliance" in r.stdout


def test_boundary_conditions_figures(tmp_path):
    # ref paper/09 role: schematic only (no experiment -> plain box outline)
    r = _run("evaluation_scripts/boundary_conditions_figure.py",
             "--out", str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "boundary_conditions_3d.png").exists()
    assert (tmp_path / "boundary_conditions_side.png").exists()


def test_complex_analysis_figures(tmp_path):
    # ref paper/07 role: microstructure FEM + dVertices arrows; small
    # tiling + coarse grid keeps it in the default tier
    r = _run("evaluation_scripts/complex_analysis_figure.py",
             "--cpu", "--tiling", "2", "1", "1", "--n-base", "12",
             "-e", "experiments/round_cross_big_network",
             "--out", str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    for f in ("u_mag.png", "sed.png", "dvertices_0.png"):
        assert (tmp_path / f).exists(), f
    assert "Compliance of deformed mesh" in r.stdout


def test_trajectory_parity_figure(tmp_path):
    # round-5 artifact: ours-vs-reference normalized trajectories; works
    # without the reference tree (panels then carry only our curves)
    out = tmp_path / "parity.png"
    r = _run("evaluation_scripts/trajectory_parity_figure.py",
             "--out", str(out), "--ref", str(tmp_path / "no_ref"))
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists()
