#!/usr/bin/env python3
"""Evaluation report builder (role parity with ref
evaluation_scripts/paper/bash_process_all_notebooks.sh +
generate_main_html.py): the reference executed its analysis notebooks
with nbconvert and stitched the resulting HTML files into a
sidebar-navigation index.html. Here the analysis surface is plain
scripts, so the builder (a) optionally runs each registered figure
script, (b) collects every PNG it produced, and (c) writes a single
self-contained index.html with a sidebar of sections and inline
figures.

    python evaluation_scripts/build_report.py --run --cpu \
        --out evaluation_scripts/report
"""

import argparse
import base64
import html
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (section title, script relative to repo root, extra args, out_kind,
# supports_cpu) — out_kind "dir" scripts write PNGs into --out/, "file"
# scripts take a single output-file --out; supports_cpu flags scripts
# whose CLI accepts --cpu (probing the source text mis-fired on
# comments); sections mirror the ref notebook list (00..09 + wccm2024).
SCRIPTS = [
    ("Training screenshots",
     "evaluation_scripts/training_screenshots.py",
     ["--family", "snappy"], "dir", True),
    ("Graded-tile interpolation",
     "evaluation_scripts/graded_tile_figure.py", [], "dir", True),
    ("Derivative plots",
     "evaluation_scripts/plot_derivatives.py",
     ["-e", "experiments/double_lattice_3D_no_topo", "-N", "12"],
     "file", False),
    ("Optimization screenshots",
     "evaluation_scripts/optimization_screenshots.py",
     ["optimization_runs/opti_double_lattice_8x4"], "dir", False),
    ("Latent-space analysis",
     "evaluation_scripts/latent_space_analysis.py",
     ["-e", "experiments/double_lattice_3D"], "file", False),
    ("Paper figures",
     "evaluation_scripts/paper_figures.py",
     ["interpolation", "-e", "experiments/double_lattice_3D_no_topo"],
     "file", True),
    ("Simple analysis results",
     "evaluation_scripts/simple_analysis_figure.py", [], "dir", True),
    ("Complex analysis results",
     "evaluation_scripts/complex_analysis_figure.py",
     ["-e", "experiments/round_cross_big_network"], "dir", True),
    ("Boundary conditions",
     "evaluation_scripts/boundary_conditions_figure.py",
     ["-e", "experiments/round_cross_big_network"], "dir", True),
    ("Optimization trajectory parity",
     "evaluation_scripts/trajectory_parity_figure.py", [], "file", False),
]

PAGE = """<!DOCTYPE html>
<html lang="en"><head><meta charset="UTF-8">
<title>deepsdf-tpu evaluation report</title>
<style>
 body {{ font-family: sans-serif; margin: 0; display: flex; }}
 nav {{ width: 260px; background: #f4f4f4; padding: 14px; height: 100vh;
       position: sticky; top: 0; overflow-y: auto; }}
 nav a {{ display: block; padding: 8px; color: #333; text-decoration: none;
         border-radius: 4px; }}
 nav a:hover {{ background: #ddd; }}
 main {{ padding: 20px; max-width: 1100px; }}
 img {{ max-width: 100%; border: 1px solid #ccc; margin: 6px 0; }}
 h2 {{ border-bottom: 1px solid #ccc; padding-bottom: 4px; }}
 .meta {{ color: #777; font-size: 0.85em; }}
</style></head><body>
<nav><h3>Sections</h3>{nav}</nav>
<main><h1>deepsdf-tpu evaluation report</h1>{body}</main>
</body></html>
"""


def _slug(title):
    return "".join(c if c.isalnum() else "-" for c in title.lower())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="evaluation_scripts/report")
    ap.add_argument("--run", action="store_true",
                    help="execute the registered figure scripts first")
    ap.add_argument("--cpu", action="store_true",
                    help="pass --cpu to scripts that support it")
    ap.add_argument("--timeout", type=int, default=900,
                    help="per-script timeout in seconds")
    args = ap.parse_args()

    figdir = os.path.join(args.out, "figures")
    os.makedirs(figdir, exist_ok=True)

    sections = []
    for title, script, extra, out_kind, supports_cpu in SCRIPTS:
        sec_dir = os.path.join(figdir, _slug(title))
        note = ""
        if args.run:
            os.makedirs(sec_dir, exist_ok=True)
            out_arg = (sec_dir if out_kind == "dir"
                       else os.path.join(sec_dir, _slug(title) + ".png"))
            cmd = [sys.executable, os.path.join(REPO, script),
                   *extra, "--out", out_arg]
            if args.cpu and supports_cpu:
                cmd.append("--cpu")
            print(f"[{title}] running {' '.join(cmd[1:])}")
            try:
                r = subprocess.run(cmd, cwd=REPO, capture_output=True,
                                   text=True, timeout=args.timeout)
                if r.returncode != 0:
                    note = f"script failed (rc {r.returncode}): " \
                           f"{html.escape(r.stderr.strip().splitlines()[-1] if r.stderr.strip() else '')}"
            except subprocess.TimeoutExpired:
                note = f"script timed out after {args.timeout}s"
        pngs = []
        if os.path.isdir(sec_dir):
            pngs = sorted(
                os.path.join(sec_dir, f) for f in os.listdir(sec_dir)
                if f.endswith(".png"))
        sections.append((title, script, note, pngs))

    nav, body = [], []
    for title, script, note, pngs in sections:
        sid = _slug(title)
        nav.append(f'<a href="#{sid}">{html.escape(title)}</a>')
        body.append(f'<h2 id="{sid}">{html.escape(title)}</h2>')
        body.append(f'<p class="meta">{html.escape(script)}</p>')
        if note:
            body.append(f'<p class="meta">{note}</p>')
        if not pngs:
            body.append('<p class="meta">no figures produced</p>')
        for p in pngs:
            with open(p, "rb") as f:
                b64 = base64.b64encode(f.read()).decode()
            body.append(
                f'<figure><img src="data:image/png;base64,{b64}">'
                f"<figcaption class=\"meta\">{html.escape(os.path.basename(p))}"
                f"</figcaption></figure>")

    index = os.path.join(args.out, "index.html")
    with open(index, "w") as f:
        f.write(PAGE.format(nav="\n".join(nav), body="\n".join(body)))
    n_figs = sum(len(p) for *_r, p in sections)
    print(f"wrote {index} ({len(sections)} sections, {n_figs} figures)")


if __name__ == "__main__":
    main()
