"""Executed-notebook regression (C34/C35 closure): every code cell of
examples/tutorial.ipynb must execute cleanly end-to-end.

The reference pins its notebook behaviour by committing expected output
images (docs/_images/JupyterNotebook_*.png); here the notebook itself is
executed under pytest.  The tutorial's full-size models (201x201, rays
at subgrid 9 -> 1801x1801 fine nodes) are a multi-minute TPU job, so CI
executes the IDENTICAL cells with the size constants scaled down (a
source-text substitution of the ``n = 201`` / ``subgrid_size=9``
declarations only); the full-size notebook is exercised manually /
on TPU.  Every API call, material path and plot in the tutorial runs
either way.
"""

import os
import re

import nbformat
from nbclient import NotebookClient

HERE = os.path.dirname(os.path.abspath(__file__))
NB_PATH = os.path.join(HERE, "..", "examples", "tutorial.ipynb")


def _shrink(src: str) -> str:
    """Scale the tutorial's size constants down for CI execution."""
    src = re.sub(r"^n = 201$", "n = 61", src, flags=re.M)
    src = src.replace("subgrid_size=9", "subgrid_size=3")
    # keep the 3-transducer geometry inside the smaller grid
    src = src.replace(
        "np.array([40.0, 100.0, 160.0])", "np.array([12.0, 30.0, 48.0])"
    )
    return src


def test_tutorial_notebook_executes():
    nb = nbformat.read(NB_PATH, as_version=4)
    n_code = 0
    for cell in nb.cells:
        if cell.cell_type == "code":
            cell.source = _shrink(cell.source)
            n_code += 1
    assert n_code >= 7, "tutorial lost its code cells?"

    # the kernel inherits env (JAX_PLATFORMS=cpu from conftest) but not
    # this process's jax.config -- enable the persistent compile cache in
    # the kernel so reruns don't pay cold CPU compiles
    nb.cells.insert(
        0,
        nbformat.v4.new_code_cell(
            "import os\n"
            "os.environ['MPLBACKEND'] = 'Agg'\n"
            "from alifmm_tpu.utils.io import enable_compile_cache\n"
            f"enable_compile_cache({os.path.join(HERE, '..', '.jax_cache')!r})\n"
        ),
    )

    # the spawned kernel inherits this process's environment: conftest
    # already pins JAX_PLATFORMS=cpu (+ x64 + compile cache); add a
    # headless matplotlib backend for the plotting cells
    os.environ["MPLBACKEND"] = "Agg"
    # the kernel's cwd is examples/, so the repo root must be importable
    # explicitly -- relying on ambient PYTHONPATH broke the moment the
    # session env stopped including it (round-5 suite run)
    repo = os.path.abspath(os.path.join(HERE, ".."))
    prev = os.environ.get("PYTHONPATH", "")
    os.environ["PYTHONPATH"] = repo + (os.pathsep + prev if prev else "")
    client = NotebookClient(
        nb, timeout=1200, kernel_name="python3",
        resources={"metadata": {"path": os.path.dirname(NB_PATH)}},
    )
    client.execute()

    # every code cell produced no error output
    for cell in nb.cells:
        if cell.cell_type != "code":
            continue
        for out in cell.get("outputs", []):
            assert out.get("output_type") != "error", out
