"""Driver-window rotation analysis (VERDICT r7 directive 5).

The round driver records correctness for only the FIRST 50
``queries()`` entries, so registration order is a proof-coverage
decision. The rule this module automates (and
``tests/test_rotation.py`` enforces) ranks entries by how badly they
need a fresh driver record:

* **P0 — never driver-proven**: entries absent from EVERY
  ``CORRECTNESS_r{N}.json`` (new this round). They MUST be in the
  current window — no older record can stand in.
* **P0b — rotated out**: proven in some earlier round but absent
  from the LATEST record; recording them keeps the two-round union
  covering everything (their older record + the local sweep remain
  evidence if one overflows in a heavy-addition round).
* **P1 — changed since the seal**: in the latest record, but the
  implementation changed since the last sealed round — either the
  entry's source CLOSURE in ``__spark_entry__.py`` differs, or any
  ``toshokan_spark`` module in the entry's TRANSITIVE import set
  (static AST analysis, intra-package import graph) was modified.
  Their record proves stale code.
* **P2 — proven in the latest record and unchanged.**

The window fills strictly by class: all of P0, then P0b, then P1,
then P2. When a class straddles the boundary the registry chooses
which members wait (they keep their older record + the full local
sweep and rotate in next round); the test enforces the filling
property — no entry of a lower class inside the window while a
higher-class entry is outside — and hard-fails only if P0 alone
cannot fit.

The seal commit is the driver's most recent ``round N: ...`` commit,
found from git history — no builder bookkeeping to forget.
"""

from __future__ import annotations

import ast
import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "toshokan_spark"
WINDOW = 50


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout


def seal_commit() -> str:
    """The last round-seal boundary: the driver's most recent
    ``round N: verdict/...`` commit."""
    out = _git("log", "--grep=^round [0-9]*:", "-n", "1", "--format=%H")
    if not out.strip():
        raise RuntimeError("no driver seal commit found in history")
    return out.strip()


def changed_files(since: str) -> set[str]:
    """Repo-relative paths changed between *since* and the WORKING
    TREE (committed-this-round and uncommitted edits both count —
    the driver records the tree it finds)."""
    committed = _git("diff", "--name-only", since).splitlines()
    untracked = _git(
        "ls-files", "--others", "--exclude-standard"
    ).splitlines()
    return {p for p in committed + untracked if p}


def _module_name(path: str) -> str | None:
    if not path.endswith(".py") or not path.startswith(f"{PKG}/"):
        return None
    mod = path[: -len(".py")].replace("/", ".")
    return mod[: -len(".__init__")] if mod.endswith(".__init__") else mod


def package_import_graph() -> dict[str, set[str]]:
    """module -> set of intra-package modules it imports (direct)."""
    graph: dict[str, set[str]] = {}
    for dirpath, _dirs, files in os.walk(os.path.join(REPO, PKG)):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.relpath(os.path.join(dirpath, fn), REPO)
            mod = _module_name(path)
            if mod is None:
                continue
            tree = ast.parse(open(os.path.join(REPO, path)).read())
            graph[mod] = _imports_of(tree)
    return graph


def _imports_of(tree: ast.AST) -> set[str]:
    out: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                if a.name.startswith(PKG):
                    out.add(a.name)
        elif isinstance(node, ast.ImportFrom):
            if node.module and node.module.startswith(PKG):
                out.add(node.module)
                # `from toshokan_spark.operators import sampling`
                # imports MODULES, not names — add both readings;
                # nonexistent module names just never match a file
                for a in node.names:
                    out.add(f"{node.module}.{a.name}")
    return out


def _closure(mods: set[str], graph: dict[str, set[str]]) -> set[str]:
    seen = set()
    stack = [m for m in mods]
    while stack:
        m = stack.pop()
        if m in seen:
            continue
        seen.add(m)
        stack.extend(graph.get(m, ()))
        # imported NAMES arrive fully qualified
        # (toshokan_spark.query.compile_query) — their owning module
        # is the dotted prefix; walk up so the module's own imports
        # are followed too
        if "." in m:
            stack.append(m.rsplit(".", 1)[0])
    return seen


class _EntryAnalyzer:
    """Per-entry dependency + source extraction from one
    ``__spark_entry__.py`` source text."""

    def __init__(self, source: str):
        self.tree = ast.parse(source)
        self.source = source
        self.funcs: dict[str, ast.FunctionDef] = {
            n.name: n
            for n in self.tree.body
            if isinstance(n, ast.FunctionDef)
        }
        # module-level aliases: `from toshokan_spark.operators import
        # text as textops` -> {'textops': 'toshokan_spark.operators.text'}
        self.aliases: dict[str, str] = {}
        for node in self.tree.body:
            if isinstance(node, ast.ImportFrom) and node.module and node.module.startswith(PKG):
                for a in node.names:
                    self.aliases[a.asname or a.name] = f"{node.module}.{a.name}"
            elif isinstance(node, ast.Import):
                for a in node.names:
                    if a.name.startswith(PKG):
                        self.aliases[a.asname or a.name.split(".")[0]] = a.name

    def registry(self) -> list[str]:
        """Registration order: the dict literal returned by queries()."""
        q = self.funcs["queries"]
        for node in ast.walk(q):
            if isinstance(node, ast.Return) and isinstance(node.value, ast.Dict):
                return [
                    k.value
                    for k in node.value.keys
                    if isinstance(k, ast.Constant)
                ]
        raise RuntimeError("queries() return dict not found")

    def entry_funcs(self) -> dict[str, str]:
        """entry name -> function name (from the queries() dict)."""
        q = self.funcs["queries"]
        for node in ast.walk(q):
            if isinstance(node, ast.Return) and isinstance(node.value, ast.Dict):
                return {
                    k.value: v.id
                    for k, v in zip(node.value.keys, node.value.values)
                    if isinstance(k, ast.Constant) and isinstance(v, ast.Name)
                }
        raise RuntimeError("queries() return dict not found")

    def _direct_deps(self, fn: ast.FunctionDef) -> tuple[set[str], set[str]]:
        """(package modules, local helper functions) referenced."""
        mods = _imports_of(fn)
        helpers: set[str] = set()
        for node in ast.walk(fn):
            if isinstance(node, ast.Name):
                if node.id in self.aliases:
                    mods.add(self.aliases[node.id])
                elif node.id in self.funcs and node.id != fn.name:
                    helpers.add(node.id)
        return mods, helpers

    def entry_modules(self, fn_name: str) -> set[str]:
        """All package modules an entry touches, following local
        helper calls (e.g. _search -> compile_query -> query.py)."""
        mods: set[str] = set()
        seen: set[str] = set()
        stack = [fn_name]
        while stack:
            name = stack.pop()
            if name in seen or name not in self.funcs:
                continue
            seen.add(name)
            m, helpers = self._direct_deps(self.funcs[name])
            mods |= m
            stack.extend(helpers)
        return mods

    def func_source(self, fn_name: str) -> str:
        fn = self.funcs.get(fn_name)
        if fn is None:
            return ""
        return ast.get_source_segment(self.source, fn) or ""

    def source_closure(self, fn_name: str) -> str:
        """Source text of the entry function AND every local helper
        it transitively calls (e.g. _t, _search, _docs_bm25_index) —
        staleness must look through helpers, or editing a shared
        helper would leave its dependents misclassified as
        proven-and-unchanged (review finding r8)."""
        seen: set[str] = set()
        stack = [fn_name]
        while stack:
            name = stack.pop()
            if name in seen or name not in self.funcs:
                continue
            seen.add(name)
            _mods, helpers = self._direct_deps(self.funcs[name])
            stack.extend(helpers)
        return "\n".join(self.func_source(n) for n in sorted(seen))


def analyze(seal: str | None = None) -> dict:
    """Classify every entry as P0/P1/P2 against the seal commit."""
    import glob
    import json

    seal = seal or seal_commit()
    cur_src = open(os.path.join(REPO, "__spark_entry__.py")).read()
    cur = _EntryAnalyzer(cur_src)
    try:
        old_src = _git("show", f"{seal}:__spark_entry__.py")
        old = _EntryAnalyzer(old_src)
    except subprocess.CalledProcessError:
        old = None

    graph = package_import_graph()
    changed = changed_files(seal)
    changed_mods = {m for m in (_module_name(p) for p in changed) if m}

    # driver records: the latest (current proof) and the union of all
    # (has this entry EVER been driver-proven?)
    recs = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r[0-9]*.json")))
    proven_latest = set(json.load(open(recs[-1]))) if recs else set()
    proven_ever: set[str] = set()
    for r in recs:
        proven_ever |= set(json.load(open(r)))

    order = cur.registry()
    efuncs = cur.entry_funcs()
    out = {
        "order": order, "p0": [], "p0b": [], "p1": [], "p2": [],
        "seal": seal,
    }
    for name in order:
        fn = efuncs.get(name)
        if name not in proven_ever:
            out["p0"].append(name)
            continue
        if name not in proven_latest:
            out["p0b"].append(name)
            continue
        deps = _closure(cur.entry_modules(fn), graph)
        src_changed = old is None or cur.source_closure(fn) != old.source_closure(fn)
        if src_changed or (deps & changed_mods):
            out["p1"].append(name)
        else:
            out["p2"].append(name)
    return out


def window_violations(a: dict) -> list[str]:
    """Violations of the class-priority filling property (shared by
    the CLI report and tests/test_rotation.py)."""
    w = set(a["order"][:WINDOW])
    classes = ["p0", "p0b", "p1", "p2"]
    out: list[str] = []
    if len(a["p0"]) > WINDOW:
        out.append(
            f"{len(a['p0'])} never-proven entries exceed the "
            f"{WINDOW}-slot window"
        )
    for hi_i in range(len(classes)):
        hi_out = set(a[classes[hi_i]]) - w
        if not hi_out:
            continue
        for lo in classes[hi_i + 1:]:
            lo_in = set(a[lo]) & w
            if lo_in:
                out.append(
                    f"{classes[hi_i]} entries {sorted(hi_out)} outside "
                    f"the window while {lo} entries {sorted(lo_in)} are "
                    "inside"
                )
    return out


if __name__ == "__main__":
    import json

    a = analyze()
    w = set(a["order"][:WINDOW])
    print(f"window={WINDOW}  p0={len(a['p0'])}  p0b={len(a['p0b'])}  "
          f"p1={len(a['p1'])}  p2={len(a['p2'])}")
    for cls in ("p0", "p0b", "p1"):
        print(f"{cls} outside window:", sorted(set(a[cls]) - w))
    v = window_violations(a)
    print("violations:", v or "none")
