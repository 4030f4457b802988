"""Sphinx-free structural validation of the docs tree (stdlib-only).

The dev image has no sphinx or docutils, so the CI docs job
(.github/workflows/ci.yml, ``sphinx-build -W``) cannot run here.  This
check catches doc rot locally instead:

RST (docs/source/*.rst):
- section underlines at least as long as their titles
- directive syntax (``.. name::`` — a single colon is a silent no-op in
  sphinx) and an allowlist of the directives the tree uses
- every autodoc target (``autoclass``/``autofunction``/``automodule``
  with ``:members:``) actually resolves by import — the strongest rot
  signal available without sphinx: a renamed or deleted symbol fails here
- ``toctree`` entries point at existing documents
- per-paragraph balance of ``inline literal`` markers

Markdown (docs/*.md, README.md):
- relative links resolve to existing files
- ``#anchor`` fragments match a real heading's GitHub-style slug

Exit code 1 on any finding.  Run: ``python tools/check_docs.py``.
"""

import importlib
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_KNOWN_DIRECTIVES = {
    "currentmodule", "module", "automodule", "autoclass", "autofunction",
    "automethod", "autodata", "toctree", "code-block", "code", "math",
    "note", "warning", "image", "figure", "include", "literalinclude",
}
_ADORNMENT = set("=-`:'\"~^_*+#<>.")


def _resolve_symbol(dotted, current_module):
    """Import-resolve an autodoc target; returns an error string or None."""
    candidates = []
    if "." in dotted:
        candidates.append(dotted)
    if current_module:
        candidates.append(f"{current_module}.{dotted}")
    candidates.append(dotted)
    last_err = None
    for cand in candidates:
        mod_name, _, attr = cand.rpartition(".")
        if not mod_name:
            # bare module target (automodule:: viabel_tpu)
            mod_name, attr = cand, None
        try:
            mod = importlib.import_module(mod_name)
        except ImportError as exc:
            last_err = str(exc)
            continue
        if attr is None or hasattr(mod, attr):
            return None
        last_err = f"module {mod_name!r} has no attribute {attr!r}"
    return last_err or f"cannot resolve {dotted!r}"


def check_rst(path):
    problems = []
    lines = path.read_text().splitlines()
    current_module = None
    pending_members_of = None

    for i, line in enumerate(lines):
        lineno = i + 1
        # underline check: a nonempty line followed by a pure-adornment line
        if (i + 1 < len(lines) and line.strip() and lines[i + 1].strip()
                and set(lines[i + 1].strip()) <= _ADORNMENT
                and len(set(lines[i + 1].strip())) == 1
                and len(lines[i + 1].strip()) >= 3
                and not line.startswith((" ", ".."))):
            if len(lines[i + 1].rstrip()) < len(line.rstrip()):
                problems.append(
                    f"{path}:{lineno + 1}: section underline shorter than "
                    f"its title")

        m = re.match(r"^\s*\.\.\s+([\w-]+)(::?)\s*(.*)$", line)
        if m:
            name, colons, arg = m.groups()
            if colons == ":":
                problems.append(
                    f"{path}:{lineno}: directive '.. {name}:' needs a "
                    f"double colon")
                continue
            if name not in _KNOWN_DIRECTIVES:
                problems.append(
                    f"{path}:{lineno}: unknown directive '{name}'")
                continue
            if name in ("currentmodule", "module"):
                current_module = arg.strip()
            elif name in ("autoclass", "autofunction", "automethod",
                          "autodata"):
                err = _resolve_symbol(arg.strip(), current_module)
                if err is not None:
                    problems.append(
                        f"{path}:{lineno}: {name} target {arg.strip()!r} "
                        f"does not resolve ({err})")
            elif name == "automodule":
                err = _resolve_symbol(arg.strip(), None)
                if err is not None:
                    problems.append(
                        f"{path}:{lineno}: automodule {arg.strip()!r} does "
                        f"not import ({err})")
                    pending_members_of = None
                else:
                    pending_members_of = arg.strip()
            elif name == "toctree":
                # entries: subsequent indented non-option lines
                j = i + 1
                while j < len(lines) and (not lines[j].strip()
                                          or lines[j].startswith(" ")):
                    entry = lines[j].strip()
                    j += 1
                    if not entry or entry.startswith(":"):
                        continue
                    target = path.parent / entry
                    if not (target.with_suffix(".rst").exists()
                            or target.with_suffix(".md").exists()
                            or target.exists()):
                        problems.append(
                            f"{path}:{j}: toctree entry {entry!r} has no "
                            f"document")
            continue

        # :members: list under the automodule just seen
        m = re.match(r"^\s+:members:\s*(.+)$", line)
        if m and pending_members_of:
            mod = importlib.import_module(pending_members_of)
            for sym in re.split(r"[,\s]+", m.group(1)):
                # the option value may continue over indented lines; those
                # are handled by the same regex failing — collect greedily
                if sym and not hasattr(mod, sym):
                    problems.append(
                        f"{path}:{lineno}: {pending_members_of}.{sym} "
                        f"listed in :members: does not exist")
        elif line.strip() and not line.startswith(" "):
            pending_members_of = None

    # continuation lines of :members: (indented beyond the option)
    text = path.read_text()
    for m in re.finditer(
            r"\.\.\s+automodule::\s*(\S+)\n(?:\s+:[\w-]+:.*\n)*?"
            r"\s+:members:\s*((?:.+\n)(?:\s{6,}.+\n)*)", text):
        mod_name, members_blob = m.groups()
        try:
            mod = importlib.import_module(mod_name)
        except ImportError:
            continue  # already reported above
        for sym in re.split(r"[,\s]+", members_blob.strip()):
            if sym and not hasattr(mod, sym):
                lineno = text[:m.start()].count("\n") + 1
                msg = (f"{path}:{lineno}: {mod_name}.{sym} listed in "
                       f":members: does not exist")
                if msg not in problems:
                    problems.append(msg)

    # inline-literal balance per paragraph (outside literal blocks)
    paragraph, in_literal = [], False
    for i, line in enumerate(lines + [""]):
        if line.strip():
            if not (in_literal and line.startswith(" ")):
                in_literal = False
                paragraph.append((i + 1, line))
        else:
            if paragraph:
                blob = " ".join(text for _, text in paragraph)
                if blob.count("``") % 2:
                    problems.append(
                        f"{path}:{paragraph[0][0]}: unbalanced `` inline "
                        f"literal in paragraph")
                if blob.rstrip().endswith("::"):
                    in_literal = True
            paragraph = []
    return problems


def _md_slug(heading):
    s = heading.strip().lower()
    s = re.sub(r"[^\w\s-]", "", s)
    return re.sub(r"\s+", "-", s)


def check_markdown(path):
    problems = []
    text = path.read_text()
    # strip fenced code blocks so example links aren't validated
    stripped = re.sub(r"```.*?```", "", text, flags=re.DOTALL)
    slugs = {_md_slug(m.group(1))
             for m in re.finditer(r"^#{1,6}\s+(.+)$", text, re.MULTILINE)}
    for m in re.finditer(r"\[[^\]]*\]\(([^)\s]+)\)", stripped):
        target = m.group(1)
        lineno = text[:text.find(m.group(0))].count("\n") + 1
        if target.startswith(("http://", "https://", "mailto:")):
            continue
        file_part, _, anchor = target.partition("#")
        if file_part:
            dest = (path.parent / file_part).resolve()
            if not dest.exists():
                problems.append(
                    f"{path}:{lineno}: link target {file_part!r} missing")
                continue
            if anchor and dest.suffix == ".md":
                dest_slugs = {
                    _md_slug(h.group(1)) for h in re.finditer(
                        r"^#{1,6}\s+(.+)$", dest.read_text(), re.MULTILINE)}
                if anchor not in dest_slugs:
                    problems.append(
                        f"{path}:{lineno}: anchor #{anchor} not found in "
                        f"{file_part}")
        elif anchor and anchor not in slugs:
            problems.append(
                f"{path}:{lineno}: anchor #{anchor} matches no heading")
    return problems


def main():
    sys.path.insert(0, str(REPO))
    problems = []
    n = 0
    for rst in sorted((REPO / "docs" / "source").glob("*.rst")):
        n += 1
        problems.extend(check_rst(rst))
    md_files = sorted((REPO / "docs").glob("*.md")) + [REPO / "README.md"]
    for md in md_files:
        if md.exists():
            n += 1
            problems.extend(check_markdown(md))
    for p in problems:
        print(p)
    print(f"check_docs: {n} files, {len(problems)} problem(s)")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
