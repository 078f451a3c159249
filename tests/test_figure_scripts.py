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
