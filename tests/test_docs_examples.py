"""Executable documentation: every fenced ``python`` block in docs/*.md
runs as a test (the role of the reference docs' ``command-output`` /
``plot`` directives, reference docs/index.rst:88,133-144 — documented
outputs are asserted by the snippets themselves)."""

import os
import re

import pytest

DOCS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs")
_FENCE = re.compile(r"```python\n(.*?)```", re.S)


def _doc_blocks():
    cases = []
    for name in sorted(os.listdir(DOCS)):
        if not name.endswith(".md"):
            continue
        text = open(os.path.join(DOCS, name)).read()
        for i, block in enumerate(_FENCE.findall(text)):
            cases.append(pytest.param(block, id=f"{name}#{i}"))
    return cases


@pytest.mark.parametrize("block", _doc_blocks())
def test_doc_block_executes(block):
    exec(compile(block, "<doc-snippet>", "exec"), {"__name__": "__doc__"})


def test_docs_have_executable_blocks():
    assert len(_doc_blocks()) >= 6


def test_docs_html_build(tmp_path):
    """The static HTML documentation build (the reference's sphinx-build
    analog) renders every page with nav and rewritten intra-repo links."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "docs_build", os.path.join(os.path.dirname(__file__), "..",
                                   "docs", "build.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    pages = mod.build(str(tmp_path))
    assert len(pages) == len(mod.PAGES)
    index = (tmp_path / "index.html").read_text()
    assert "muse-psfr-tpu" in index and "<nav>" in index
    assert 'href="parity.html"' in index          # nav link
    parity = (tmp_path / "parity.html").read_text()
    assert "<table>" in parity                    # tables rendered
