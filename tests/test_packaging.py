"""Packaging: the framework must be installable (the reference ships an
installable package — MANIFEST.in / dist/*.egg / build/lib) and importable
away from the source checkout, with console entry points for the apps."""

import configparser
import glob
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_wheel_builds_and_imports_outside_checkout(tmp_path):
    wheel_dir = tmp_path / "wheels"
    r = subprocess.run(
        [sys.executable, "-m", "pip", "wheel", REPO, "--no-deps",
         "--no-build-isolation", "-w", str(wheel_dir)],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    wheels = glob.glob(str(wheel_dir / "tacotron2_subword_tpu-*.whl"))
    assert len(wheels) == 1, wheels

    site = tmp_path / "site"
    r = subprocess.run(
        [sys.executable, "-m", "pip", "install", "--no-deps",
         "--target", str(site), wheels[0]],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]

    # import from the installed location with the checkout NOT importable
    # (cwd = /, no repo on sys.path)
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import tacotron2_subword_tpu; "
        "from tacotron2_subword_tpu.apps import check_bert_emb; "
        "from tacotron2_subword_tpu.data.dataset import PrefetchLoader; "
        "assert %r in tacotron2_subword_tpu.__file__, "
        "tacotron2_subword_tpu.__file__; "
        "print('installed-import-ok')" % (str(site), str(site)))
    r = subprocess.run([sys.executable, "-c", code], cwd="/",
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "installed-import-ok" in r.stdout

    # console entry points for every app the reference exposes as a script
    dist_info = glob.glob(str(site / "tacotron2_subword_tpu-*.dist-info"))
    assert dist_info, os.listdir(site)
    cp = configparser.ConfigParser()
    cp.read(os.path.join(dist_info[0], "entry_points.txt"))
    scripts = dict(cp["console_scripts"]) if "console_scripts" in cp else {}
    for name in ("tacotron2-tpu-train", "tacotron2-tpu-inference",
                 "tacotron2-tpu-gta", "tacotron2-tpu-train-hifigan",
                 "tacotron2-tpu-best-checkpoint",
                 "tacotron2-tpu-check-bert-emb"):
        assert name in scripts, (name, scripts)
