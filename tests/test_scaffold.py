"""Scaffolder (gr_modtool-add equivalent): the generated module + test pair
must run green as-written, for all three kinds. Mirrors the reference's
blocklib codegen role (SURVEY.md §2.5) in decorator-registration form.
"""

import runpy
import subprocess
import sys

import pytest

from gnuradio4_tpu.core.errors import GrError
from gnuradio4_tpu.utils.scaffold import new_block


@pytest.mark.parametrize("kind,name", [
    ("device", "MyGainStage"),
    ("sink", "MyProbeSink"),
    ("source", "MyRampSource"),
])
def test_generated_pair_runs(tmp_path, kind, name):
    mod_path, test_path = new_block(name, kind=kind, out_dir=str(tmp_path))
    ns = runpy.run_path(test_path)
    fns = [v for k, v in ns.items() if k.startswith("test_") and callable(v)]
    assert fns, "generated test file defines no test function"
    for fn in fns:
        fn()


def test_refuses_overwrite_and_bad_names(tmp_path):
    new_block("Once", out_dir=str(tmp_path))
    with pytest.raises(GrError, match="overwrite"):
        new_block("Once", out_dir=str(tmp_path))
    with pytest.raises(GrError, match="CamelCase"):
        new_block("snake_case", out_dir=str(tmp_path))
    with pytest.raises(GrError, match="kind"):
        new_block("Fine", kind="mystery", out_dir=str(tmp_path))


def test_cli_new_block(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "gnuradio4_tpu", "new-block", "CliMade",
         "--kind", "sink", "--dir", str(tmp_path)],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert (tmp_path / "cli_made.py").exists()
    assert (tmp_path / "test_cli_made.py").exists()
