"""The sphinx-free docs gate (tools/check_docs.py) catches seeded rot.

The dev image has no sphinx, so ``make lint`` relies on this checker to
keep docs/source and docs/*.md from rotting; each test seeds one error
class and asserts it is reported.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import check_docs  # noqa: E402


def _rst_problems(tmp_path, text):
    p = tmp_path / "seeded.rst"
    p.write_text(text)
    return check_docs.check_rst(p)


def test_clean_tree_passes():
    assert check_docs.main() == 0


def test_short_underline(tmp_path):
    probs = _rst_problems(tmp_path, "Long section title\n=====\n")
    assert any("underline shorter" in p for p in probs)


def test_single_colon_directive(tmp_path):
    probs = _rst_problems(tmp_path, ".. autofunction: viabel_tpu.bbvi\n")
    assert any("double colon" in p for p in probs)


def test_unknown_directive(tmp_path):
    probs = _rst_problems(tmp_path, ".. autofnuction:: viabel_tpu.bbvi\n")
    assert any("unknown directive" in p for p in probs)


def test_unresolvable_autodoc_target(tmp_path):
    probs = _rst_problems(
        tmp_path, ".. currentmodule:: viabel_tpu\n\n"
        ".. autofunction:: bbvi_RENAMED\n")
    assert any("does not resolve" in p for p in probs)


def test_resolvable_autodoc_target(tmp_path):
    probs = _rst_problems(
        tmp_path, ".. currentmodule:: viabel_tpu\n\n"
        ".. autofunction:: bbvi\n")
    assert probs == []


def test_bad_members_entry(tmp_path):
    probs = _rst_problems(
        tmp_path, ".. automodule:: viabel_tpu.parallel\n"
        "   :members: multistart_faso, multistart_GONE\n")
    assert any("multistart_GONE" in p for p in probs)


def test_missing_toctree_entry(tmp_path):
    probs = _rst_problems(
        tmp_path, ".. toctree::\n   :maxdepth: 2\n\n   nonexistent_page\n")
    assert any("toctree entry" in p for p in probs)


def test_unbalanced_inline_literal(tmp_path):
    probs = _rst_problems(
        tmp_path, "A paragraph with an ``unclosed literal.\n")
    assert any("unbalanced" in p for p in probs)


def test_markdown_dead_link(tmp_path):
    p = tmp_path / "seeded.md"
    p.write_text("# Title\n\nsee [gone](missing_file.md)\n")
    probs = check_docs.check_markdown(p)
    assert any("missing_file.md" in p_ for p_ in probs)


def test_markdown_dead_anchor(tmp_path):
    p = tmp_path / "seeded.md"
    p.write_text("# Only Heading\n\nsee [x](#no-such-heading)\n")
    probs = check_docs.check_markdown(p)
    assert any("no-such-heading" in p_ for p_ in probs)


def test_markdown_good_anchor(tmp_path):
    p = tmp_path / "seeded.md"
    p.write_text("# Only Heading\n\nsee [x](#only-heading)\n")
    assert check_docs.check_markdown(p) == []
