"""Execute doc/GettingStarted.ipynb headless (the reference ships its
Getting Started flow as a notebook, reference doc/Getting Started.ipynb;
ours must actually run, not just render)."""

import os

import pytest

nbformat = pytest.importorskip("nbformat")
pytest.importorskip("nbconvert")

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _execute(relpath, tmp_path):
    from nbconvert.preprocessors import ExecutePreprocessor

    nb = nbformat.read(os.path.join(ROOT, *relpath), as_version=4)
    ep = ExecutePreprocessor(timeout=600, kernel_name="python3")
    env = dict(os.environ, PYTHONPATH=ROOT + os.pathsep
               + os.environ.get("PYTHONPATH", ""))
    os.environ.update(env)
    ep.preprocess(nb, {"metadata": {"path": str(tmp_path)}})
    return "\n".join(
        "".join(o.get("text", "") for o in c.get("outputs", []))
        for c in nb.cells if c.cell_type == "code")


@pytest.mark.slow
def test_getting_started_executes(tmp_path):
    txt = _execute(("doc", "GettingStarted.ipynb"), tmp_path)
    # the overlay cell must have produced frames
    assert "overlay frames: 24" in txt
    assert "done" in txt


@pytest.mark.slow
def test_general_pipeline_notebook(tmp_path):
    """Reference notebooks/general_pipeline.ipynb mirror: populate over a
    project filter across multiple videos."""
    txt = _execute(("notebooks", "general_pipeline.ipynb"), tmp_path)
    assert "general pipeline done" in txt


@pytest.mark.slow
def test_general_annotate_notebook(tmp_path):
    """Reference notebooks/general_annotate.ipynb mirror: annotation-gate
    discovery, overlay aids, commit, resume."""
    txt = _execute(("notebooks", "general_annotate.ipynb"), tmp_path)
    assert "1 found to annotate" in txt
    assert "annotation workflow done" in txt


@pytest.mark.slow
def test_human36_notebook(tmp_path):
    """Reference notebooks/human36.ipynb mirror: import → pipeline →
    GT scoring."""
    txt = _execute(("notebooks", "human36.ipynb"), tmp_path)
    assert "h36m workflow done" in txt
