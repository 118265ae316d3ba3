"""Execute doc/GettingStarted.ipynb headless (the reference ships its
Getting Started flow as a notebook, reference doc/Getting Started.ipynb;
ours must actually run, not just render)."""

import os

import pytest

nbformat = pytest.importorskip("nbformat")
pytest.importorskip("nbconvert")

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


@pytest.mark.slow
def test_getting_started_executes(tmp_path):
    from nbconvert.preprocessors import ExecutePreprocessor

    nb = nbformat.read(os.path.join(ROOT, "doc", "GettingStarted.ipynb"),
                       as_version=4)
    ep = ExecutePreprocessor(timeout=600, kernel_name="python3")
    env = dict(os.environ, PYTHONPATH=ROOT + os.pathsep
               + os.environ.get("PYTHONPATH", ""))
    os.environ.update(env)
    ep.preprocess(nb, {"metadata": {"path": str(tmp_path)}})
    # the overlay cell must have produced frames
    txt = "\n".join(
        "".join(o.get("text", "") for o in c.get("outputs", []))
        for c in nb.cells if c.cell_type == "code")
    assert "overlay frames: 24" in txt
    assert "done" in txt
