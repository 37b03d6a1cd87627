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
