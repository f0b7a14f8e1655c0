"""Docs-site build + API-reference sync tests (C35 closure).

The reference commits a rendered Sphinx HTML site; here docs/build.py
renders the markdown sources to browsable HTML, and this test (a) builds
the site and checks the pages, (b) verifies every public ``ALI_FMM``
method is documented in docs/api_reference.md with a signature whose
parameter names match the live code (so the reference page cannot drift
silently -- the autodoc property Sphinx would have given us).
"""

import importlib.util
import inspect
import os
import re

HERE = os.path.dirname(os.path.abspath(__file__))
DOCS = os.path.join(HERE, "..", "docs")
API_MD = os.path.join(DOCS, "api_reference.md")


def _load_builder():
    spec = importlib.util.spec_from_file_location(
        "docs_build", os.path.join(DOCS, "build.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_docs_site_builds(tmp_path):
    builder = _load_builder()
    pages = builder.build(str(tmp_path))
    names = {os.path.basename(p) for p in pages}
    assert {"index.html", "setup.html", "architecture.html",
            "api_reference.html"} <= names, names
    api_html = (tmp_path / "api_reference.html").read_text()
    # rendered, not raw markdown: headings became anchored h3s, code
    # fences became pre blocks, tables became table rows
    assert '<h2 id="class-ali_fmm">' in api_html
    assert "<pre><code>" in api_html
    assert "<table><tr><th>" in api_html
    assert "```" not in api_html
    index_html = (tmp_path / "index.html").read_text()
    assert "<nav>" in index_html


def _documented_signatures():
    """{method name: [parameter names]} parsed from api_reference.md
    ### headings of the form ALI_FMM.name(arg, arg=default, ...)."""
    with open(API_MD) as f:
        text = f.read()
    sigs = {}
    for m in re.finditer(r"ALI_FMM\.(\w+)\(([^)]*)\)", text):
        name, args = m.group(1), m.group(2)
        if args.strip() == "...":
            sigs.setdefault(name, None)  # documented by reference only
            continue
        if sigs.get(name) is not None and name in sigs:
            continue  # keep the first full signature (the ### heading)
        params = []
        for part in args.split(","):
            part = part.split("=")[0].strip()
            if part:
                params.append(part)
        sigs[name] = params
    return sigs


def test_api_reference_in_sync():
    from alifmm_tpu import ALI_FMM

    documented = _documented_signatures()
    public = {
        n for n, _ in inspect.getmembers(ALI_FMM, inspect.isfunction)
        if not n.startswith("_") or n == "__init__"
    }
    missing = public - set(documented)
    assert not missing, f"public ALI_FMM methods missing from docs: {missing}"

    for name, doc_params in documented.items():
        if doc_params is None or not hasattr(ALI_FMM, name):
            continue
        real = [
            p for p in inspect.signature(
                getattr(ALI_FMM, name)
            ).parameters
            if p != "self"
        ]
        assert doc_params == real, (
            f"api_reference.md signature drift for ALI_FMM.{name}: "
            f"documented {doc_params}, code has {real}"
        )


def test_module_functions_documented():
    with open(API_MD) as f:
        text = f.read()
    for fn in ["solve_ttf", "make_model", "trace_rays", "SolveConfig",
               "solve_ttf_halo", "solve_ttf_sharded"]:
        assert fn in text, f"{fn} missing from api_reference.md"
